"""Synthetic serve target for the socket-level load probe.

Builds the same bench flagship setup (bert-base VDR bi-encoder +
200k-passage bag-of-token index, synthetic wiki-like corpus) and serves
it over HTTP on --port. Prints ``READY <port>`` on stdout once warm so
the orchestrator (scripts/probe_serve_load.py) can start load.

Warmup covers every coalescer batch bucket (1..max_queries powers of
two) for rerank=False and the small buckets for rerank=True, so the
load phases measure steady-state serving, not jit compiles — exactly
what a production deploy pays after its own warmup sweep.

Run alone on the TPU (the orchestrator does this for you):
    env -u JAX_PLATFORMS python scripts/probe_serve_server.py --port 8123
"""
import argparse
import sys
import threading
import time

sys.path.insert(0, ".")

from vsearch_tpu.utils.claim_guard import register_tpu_process

register_tpu_process("serve")
from vsearch_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8123)
    ap.add_argument("--num-passages", type=int, default=200_000)
    ap.add_argument("--no-coalesce", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp

    from bench import get_bench_tokenizer, make_corpus
    from vsearch_tpu.retriever import Retriever, RetrieverConfig
    from vsearch_tpu.serve import serve

    corpus = make_corpus(args.num_passages)
    tokenizer, _ = get_bench_tokenizer()
    enc = {"type": "vdr", "max_len": 128, "topk": 768,
           "shift_vocab_num": 999, "vocab_size": tokenizer.vocab_size,
           "hidden_size": 768, "num_hidden_layers": 12,
           "num_attention_heads": 12, "intermediate_size": 3072,
           "max_position_embeddings": 512, "dtype": jnp.bfloat16}
    cfg = RetrieverConfig(encoder_q=dict(enc), encoder_p=dict(enc),
                          shared_encoder=True)
    retriever = Retriever(cfg, tokenizer=tokenizer)
    retriever.build_index(corpus, batch_size=256,
                          index_type="bag_of_token")

    srv = serve(retriever, host="127.0.0.1", port=args.port,
                default_k=100, coalesce=not args.no_coalesce)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()

    # warm every coalescer bucket the load phases can hit
    service = srv.service
    qs = [" ".join(c.split()[:12]) for c in corpus[:256]]
    t0 = time.time()
    for b in (1, 2, 4, 8, 16, 32, 64, 128, 256):
        service.search(qs[:b], k=100, rerank=False)
    for b in (1, 2, 4, 8, 16, 32):
        service.search(qs[:b], k=100, rerank=True)
    print(f"# warmup {time.time() - t0:.1f}s", file=sys.stderr,
          flush=True)
    print(f"READY {srv.server_address[1]}", flush=True)
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        pass
    finally:
        srv.shutdown()


if __name__ == "__main__":
    main()

"""Quick-start smoke script (counterpart of reference
test/quick_start.py:1-45).

With a converted checkpoint (see docs/CHECKPOINTS.md), embeds a query and
a few passages, scores them, runs alpha and beta retrieval, and prints
token-level attributions. Falls back to a tiny randomly-initialized model
when no checkpoint is given, so the script always runs end-to-end.
"""
import argparse
import os
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

# honor JAX_PLATFORMS even when the environment pre-imports jax (some
# containers initialize a default accelerator backend eagerly; the env
# var alone is read too late there)
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def make_tiny_retriever():
    sys.path.insert(0, os.path.join(_ROOT, "tests"))
    from helpers import make_tokenizer, tiny_bert_config

    from vsearch_tpu.retriever import Retriever, RetrieverConfig

    tok = make_tokenizer()
    enc = {
        "type": "vdr", "max_len": 32, "topk": 16, "shift_vocab_num": 5,
        **{k: v for k, v in vars(tiny_bert_config(tok.vocab_size)).items()
           if k in ("vocab_size", "hidden_size", "num_hidden_layers",
                    "num_attention_heads", "intermediate_size",
                    "max_position_embeddings")},
    }
    cfg = RetrieverConfig(encoder_q=dict(enc), encoder_p=dict(enc),
                          shared_encoder=True)
    return Retriever(cfg, tokenizer=tok)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None,
                    help="native or reference-torch checkpoint dir")
    args = ap.parse_args()

    if args.checkpoint:
        from vsearch_tpu.retriever import Retriever

        ir = Retriever.from_pretrained(args.checkpoint)
    else:
        print("(no checkpoint given; using a tiny random model)")
        ir = make_tiny_retriever()

    query = "what is green tea good for"
    passages = [
        "green tea is a drink with many benefits",
        "the red planet mars has ice water on the surface",
        "einstein wrote the famous theory of relativity",
    ]

    q_emb = ir.encoder_q.embed([query])
    p_emb = ir.encoder_p.embed(passages)
    print("scores:", (q_emb @ p_emb.T).round(4))

    ir.build_index(passages, index_type="sparse")
    res = ir.retrieve([query], k=3)
    print("alpha search ids:", np.asarray(res.ids)[0].tolist())

    ir.build_index(passages, index_type="bag_of_token")
    res = ir.retrieve([query], k=3, rerank=True)
    print("beta search ids:", np.asarray(res.ids)[0].tolist())

    print("top attributions:",
          dict(list(ir.explain(query, passages[0], topk=32).items())[:5]))


if __name__ == "__main__":
    main()

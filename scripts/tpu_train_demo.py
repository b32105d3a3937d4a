"""Real-TPU training demo: synthetic contrastive corpus, measurable
convergence.

Builds a synthetic word-overlap retrieval task over the bench vocab
(queries share content words with exactly one positive passage), trains
a mid-size VDR bi-encoder (4x256 BERT, real 30,522-entry vocab space)
with the production trainer, and reports loss, step time, and top-1
retrieval accuracy before/after. This is the "training works on real
hardware" evidence run — quality numbers on public datasets need the
published checkpoints/corpora (zero-egress here; see BASELINE.md).

Usage:  python scripts/tpu_train_demo.py [--steps-per-epoch ...]
Prints one JSON line at the end.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def make_task(num_topics: int, words_per_passage: int, seed: int = 0):
    """Each topic owns a disjoint set of content words; the query uses a
    sampled subset of its topic's words (no verbatim copying)."""
    sys.path.insert(0, _ROOT)
    from bench import _BASE_WORDS

    rng = np.random.default_rng(seed)
    vocab = np.array(_BASE_WORDS + [f"word{i:05d}" for i in range(25_000)])
    perm = rng.permutation(len(vocab))
    per_topic = 24
    topics = [perm[i * per_topic:(i + 1) * per_topic]
              for i in range(num_topics)]
    passages, queries = [], []
    for t in topics:
        p_words = vocab[rng.choice(t, size=words_per_passage)]
        q_words = vocab[rng.choice(t, size=6, replace=False)]
        passages.append(" ".join(p_words))
        queries.append("which passage talks about " + " ".join(q_words))
    return queries, passages


def main():
    import logging

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(message)s")
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-topics", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--out", default="/tmp/tpu_train_demo")
    args = ap.parse_args()

    import jax

    from bench import build_wordpiece_vocab
    from vsearch_tpu.data import BiEncoderDataset
    from vsearch_tpu.retriever import Retriever, RetrieverConfig
    from vsearch_tpu.tokenization.wordpiece import WordPieceTokenizer
    from vsearch_tpu.train.trainer import RetrieverTrainer, TrainConfig

    try:
        from vsearch_tpu.tokenization.native import NativeWordPieceTokenizer
        tok = NativeWordPieceTokenizer(build_wordpiece_vocab())
    except Exception:
        tok = WordPieceTokenizer(build_wordpiece_vocab())

    queries, passages = make_task(args.num_topics, words_per_passage=48)
    # train rows: each query's positive is its topic passage; hard
    # negative is another topic's passage
    rng = np.random.default_rng(1)
    os.makedirs(args.out, exist_ok=True)
    train_path = os.path.join(args.out, "train.jsonl")
    with open(train_path, "w") as f:
        for i, q in enumerate(queries):
            j = (i + 1 + int(rng.integers(0, args.num_topics - 2))) \
                % args.num_topics
            f.write(json.dumps({
                "question": q, "answers": [],
                "positive_ctxs": [{"text": passages[i]}],
                "negative_ctxs": [],
                "hard_negative_ctxs": [{"text": passages[j]}],
            }) + "\n")

    # norm=True + temperature: random-init elu1p scores are huge and
    # saturate the softmax (pretrained-BERT starts, as the reference
    # uses, don't have this problem); L2-normed scores with a 0.05
    # temperature give the standard healthy contrastive gradient
    enc = {"type": "vdr", "model_id": "demo", "max_len": 64,
           "topk": 128, "shift_vocab_num": 999, "vocab_size": 30522,
           "norm": True,
           "hidden_size": args.hidden, "num_hidden_layers": args.layers,
           "num_attention_heads": max(2, args.hidden // 64),
           "intermediate_size": 4 * args.hidden,
           "max_position_embeddings": 128}
    cfg = RetrieverConfig(encoder_q=dict(enc), encoder_p=dict(enc),
                          shared_encoder=True)
    retriever = Retriever(cfg, tokenizer=tok)

    def top1_acc():
        retriever.build_index(passages, index_type="sparse",
                              batch_size=64)
        res = retriever.retrieve(queries, k=1, batch_size=64)
        return float(np.mean(np.asarray(res.ids)[:, 0]
                             == np.arange(len(queries))))

    acc_before = top1_acc()
    ds = BiEncoderDataset(train_path)
    tcfg = TrainConfig(
        batch_size=args.batch_size, num_train_epochs=args.epochs,
        learning_rate=args.lr, num_warmup_epochs=1, temperature=0.05,
        num_epoch_to_save=1000, hard_negatives=1, other_negatives=0,
        log_batch_step=10_000, train_rolling_loss_step=10_000,
        output_dir=args.out, seed=7)
    trainer = RetrieverTrainer(retriever, tcfg, [ds])

    t0 = time.perf_counter()
    trainer.run_train()
    train_s = time.perf_counter() - t0
    steps = int(trainer.state.step)
    acc_after = top1_acc()

    # beta search: tokenizer-only binary index + neural rerank — the
    # SVDR semi-parametric path the 4-term loss trains for
    retriever.build_index(passages, index_type="bag_of_token",
                          batch_size=64)
    res = retriever.retrieve(queries, k=10, rerank=True, batch_size=64)
    acc_beta = float(np.mean(np.asarray(res.ids)[:, 0]
                             == np.arange(len(queries))))

    out = {
        "metric": "tpu_train_demo",
        "steps": steps,
        "train_seconds": round(train_s, 1),
        "steps_per_s": round(steps / train_s, 2),
        "queries_per_s": round(steps * args.batch_size / train_s, 1),
        "top1_before": acc_before,
        "top1_after": acc_after,
        "top1_beta_after": acc_beta,
        "num_topics": args.num_topics,
        "model": f"{args.layers}L-{args.hidden}H-30522V",
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    from vsearch_tpu.utils.claim_guard import register_tpu_process
    register_tpu_process('tpu_train_demo')
    from vsearch_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402
    enable_compilation_cache()
    main()

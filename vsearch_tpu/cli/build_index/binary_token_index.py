"""Build a bag-of-token binary index (tokenizer-only, no neural net).

Counterpart of the reference's documented CLI
``python -m inference.build_index.binary_token_index`` (reference:
test/svdr_wiki21m/build_binary_token_index.sh:3). Emits either the
reference-compatible scipy ``.npz`` CSR or the native ``.ell.npz``.
"""
from __future__ import annotations

import argparse
import logging
import time

from ..common import (read_jsonl_texts, setup_logging, shard_slice)

logger = logging.getLogger("vsearch_tpu.cli.binary_token_index")


def main(argv=None):
    setup_logging()
    ap = argparse.ArgumentParser()
    ap.add_argument("--text_file", required=True)
    ap.add_argument("--save_file", required=True)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--num_shift", type=int, default=999)
    ap.add_argument("--max_len", type=int, default=128)
    ap.add_argument("--max_token", type=int, default=None)
    ap.add_argument("--tokenizer", default="bert-base-uncased")
    ap.add_argument("--num_shard", type=int, default=1)
    ap.add_argument("--shard_id", type=int, default=0)
    ap.add_argument("--num_workers", type=int, default=None)
    args = ap.parse_args(argv)

    t_start = time.perf_counter()
    texts = read_jsonl_texts(args.text_file)
    texts = shard_slice(texts, args.num_shard, args.shard_id)
    io_s = time.perf_counter() - t_start
    logger.info("loaded %d texts", len(texts))

    from ...index.bot_build import build_bot_ell, save_bot_host
    from ...tokenization import get_tokenizer

    tokenizer = get_tokenizer(args.tokenizer)
    t0 = time.perf_counter()
    # host arrays end-to-end: the index build + save never touches the
    # accelerator (tokenize -> ELL rows -> npz)
    ell, cols_np, nnz_np = build_bot_ell(
        tokenizer, texts, max_len=args.max_len, shift=args.num_shift,
        batch_size=args.batch_size, max_token=args.max_token,
        num_workers=args.num_workers, return_host=True,
        device=False)
    build_s = time.perf_counter() - t0
    logger.info("***** Finish Indexing *****")
    logger.info("***** Time for indexing (exclude i/o): %.0f s *****",
                build_s)
    logger.info("***** Time for indexing (include i/o): %.0f s *****",
                build_s + io_s)
    save_bot_host(args.save_file, cols_np, nnz_np,
                  num_cols=tokenizer.vocab_size - args.num_shift)
    n, v = len(texts), tokenizer.vocab_size - args.num_shift
    import numpy as np
    nnz_total = int(np.asarray(nnz_np).sum())
    logger.info("***** Index save to: %s *****", args.save_file)
    logger.info("***** Index matrix shape: (%d, %d) *****", n, v)
    logger.info("***** Index sparsity rate: %.2f%% *****",
                100.0 * nnz_total / max(n * v, 1))  # n=0: empty shard


if __name__ == "__main__":
    main()

"""Build a dense index with a retriever checkpoint.

Counterpart of the documented ``inference.build_index.dense_index``
(reference: examples/inference_dense/README.md §1).
"""
from __future__ import annotations

import argparse
import logging
import time

from ..common import (load_retriever, read_jsonl_texts, setup_logging,
                      shard_slice)

logger = logging.getLogger("vsearch_tpu.cli.dense_index")


def main(argv=None):
    setup_logging()
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--text_file", required=True)
    ap.add_argument("--save_file", required=True)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--max_len", type=int, default=None)
    ap.add_argument("--num_shard", type=int, default=1)
    ap.add_argument("--shard_id", type=int, default=0)
    ap.add_argument("--device", default=None)
    args = ap.parse_args(argv)

    texts = read_jsonl_texts(args.text_file)
    texts = shard_slice(texts, args.num_shard, args.shard_id)
    logger.info("embedding %d texts", len(texts))

    retriever = load_retriever(args.checkpoint)
    t0 = time.perf_counter()
    index = retriever.build_index(texts, batch_size=args.batch_size,
                                  index_type="dense",
                                  max_len=args.max_len)
    logger.info("***** Finish Indexing (%.0f s) *****",
                time.perf_counter() - t0)
    index.save(args.save_file)
    logger.info("***** Index save to: %s *****", args.save_file)


if __name__ == "__main__":
    main()

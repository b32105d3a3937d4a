"""Convert a reference-style HF torch checkpoint dir to a native one.

The reference ships checkpoints as HF ``save_pretrained`` dirs
(config.json + pytorch_model.bin / model.safetensors with encoder_q./
encoder_p.-prefixed keys — reference src/ir/training/train_ir.py:205-215).
``Retriever.from_pretrained`` converts those on the fly; this CLI runs
the conversion once and writes the native msgpack checkpoint (plus the
tokenizer vocab) so TPU deployments skip the torch dependency and the
per-load conversion cost.

Usage:
  python -m vsearch_tpu.cli.convert_checkpoint \
      --torch_dir /path/to/vsearch-style-ckpt --out /path/to/native
"""
from __future__ import annotations

import argparse
import logging

from .common import setup_logging

logger = logging.getLogger("vsearch_tpu.cli.convert_checkpoint")


def main(argv=None):
    setup_logging()
    ap = argparse.ArgumentParser(
        description="convert an HF torch bi-encoder checkpoint dir to "
                    "the native msgpack format")
    ap.add_argument("--torch_dir", required=True,
                    help="reference-style HF checkpoint dir (also "
                         "accepts an already-native dir, making this a "
                         "re-save)")
    ap.add_argument("--out", required=True,
                    help="output dir for the native checkpoint")
    args = ap.parse_args(argv)

    from ..retriever import Retriever

    model = Retriever.from_pretrained(args.torch_dir)
    model.save_pretrained(args.out)
    logger.info("converted %s -> %s", args.torch_dir, args.out)
    print(f"native checkpoint written to {args.out}")


if __name__ == "__main__":
    main()

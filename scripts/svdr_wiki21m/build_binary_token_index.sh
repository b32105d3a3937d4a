#!/usr/bin/env bash
# Counterpart of reference test/svdr_wiki21m/build_binary_token_index.sh:
# tokenizer-only bag-of-token index build over the wiki21m corpus.
set -euo pipefail
TEXT=${TEXT:-data/corpus/wiki21m.jsonl}
SAVE=${SAVE:-data/index/wiki21m_bow.npz}
python -m vsearch_tpu.cli.build_index.binary_token_index \
    --text_file="$TEXT" --save_file="$SAVE" \
    --batch_size=1024 --num_shift=999

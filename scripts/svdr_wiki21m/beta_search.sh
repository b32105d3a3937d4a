#!/usr/bin/env bash
# Counterpart of reference test/svdr_wiki21m/beta_search.sh: semi-
# parametric retrieval over the binary token index with neural rerank.
set -euo pipefail
CKPT=${CKPT:-checkpoints/svdr-nq}
TEXT=${TEXT:-data/corpus/wiki21m.jsonl}
INDEX=${INDEX:-data/index/wiki21m_bow.npz}
SAVE=${SAVE:-data/results/svdr-beta-wiki21m.json}
python -m vsearch_tpu.cli.search.beta_search --checkpoint="$CKPT" \
    --query_file=data/eval/wiki21m/nq-test-questions.jsonl \
    --text_file="$TEXT" --index_file="$INDEX" --save_file="$SAVE" \
    --num_rerank=100

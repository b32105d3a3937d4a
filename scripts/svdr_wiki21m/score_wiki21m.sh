#!/usr/bin/env bash
# Counterpart of reference test/svdr_wiki21m/score_wiki21m.sh: top-k
# retrieval accuracy over the search results.
set -euo pipefail
TEXT=${TEXT:-data/corpus/wiki21m.jsonl}
RESULT=${RESULT:-data/results/svdr-beta-wiki21m.json}
QA=${QA:-data/eval/wiki21m/nq-test.qa.csv}
python -m vsearch_tpu.cli.score.eval_wiki21m \
    --result_file="$RESULT" --text_file="$TEXT" --qa_file="$QA"

#!/bin/bash
# Round-5 campaign remainder, reordered by VERDICT-r4 priority so the
# highest-value rows land first if the round clock runs out:
# 2k KV-bound regime (#3), qwen3 (#4), mistral + SBFP first-ever rows
# (#5), remaining families, then the batch sweep (informational).
set -u
OUT=${1:-BENCH_CAMPAIGN_r05.jsonl}
LOG=/tmp/campaign_r05.log
run() {
  echo ">>> bench.py $*" | tee -a "$LOG" >&2
  timeout 3600 python bench.py "$@" 2>> "$LOG" | tail -1 | tee -a "$OUT"
}
# run opt-1.3b basic  # (in flight when the resume script took over)
run opt-125m weights long
run opt-1.3b weights long
run qwen3-0.6b basic
run mistral-1b basic
run opt-125m sbfp
run opt-1.3b sbfp
run llama-1.1b basic
run gemma-2b basic
run gpt2 basic
run opt-125m weights batch=1
run opt-125m weights batch=32
run opt-1.3b weights batch=1
echo "campaign remainder done -> $OUT" >&2

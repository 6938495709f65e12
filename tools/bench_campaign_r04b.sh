#!/bin/bash
# Final round-4 measurement campaign (second capture): every README perf
# row re-measured at the post-restructure HEAD (single-copy packed
# storage, weight-split jit args, generalized fused SDPA, fused RMS
# heads).  The first capture (BENCH_CAMPAIGN_r04.jsonl) predates those
# fixes and is kept as the before-record.
# Each bench.py invocation measures its OWN fp32 baseline leg (same
# batch, same context), so every vs_baseline ratio has an honest
# denominator.
set -u
OUT=${1:-BENCH_CAMPAIGN_r04b.jsonl}
LOG=/tmp/campaign_r04b.log
run() {
  echo ">>> bench.py $*" | tee -a "$LOG" >&2
  timeout 3600 python bench.py "$@" 2>> "$LOG" | tail -1 | tee -a "$OUT"
}
# headline x3 consecutive (VERDICT r3 ask #1 protocol), then modes
run opt-125m weights
run opt-125m weights
run opt-125m weights
run opt-125m basic
run opt-1.3b weights
run opt-1.3b basic
# KV-bound regime: ~2k context (VERDICT r3 ask #2)
run opt-125m weights long
run opt-1.3b weights long
# per-family BASIC decode (VERDICT r3 ask #6) — all six families
run llama-1.1b basic
run gemma-2b basic
run qwen3-0.6b basic
run gpt2 basic
run mistral-1b basic
# HBM-utilization batch sweep (VERDICT r3 weak #7 / r2 ask #10)
run opt-125m weights batch=1
run opt-125m weights batch=32
run opt-1.3b weights batch=1
echo "campaign done -> $OUT" >&2

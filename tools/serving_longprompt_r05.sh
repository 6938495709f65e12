#!/bin/bash
# Long-prompt serving leg: the regime chunked prefill exists for.
# At prompt 96 a monolithic 125m prefill fits inside one decode step, so
# chunking has no stall to bound and only costs slot idle time; at
# prompt 512 the monolithic prefill stalls resident decoders a full
# dispatch, and the chunked path (128-token chunks) bounds it.
set -u
LOG=${1:-/tmp/serving_long.log}
run() {
  echo ">>> serving_bench.py $*" >&2
  timeout 3600 python examples/serving_bench.py "$@" 2>/dev/null | tail -1
}
run opt-125m weights --prompt 512 --burst 32 --gen 128 --requests 48 --spread
run opt-125m weights --prompt 512 --chunk 128 --burst 32 --gen 128 --requests 48 --spread

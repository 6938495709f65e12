"""Summarize a BENCH_CAMPAIGN_*.jsonl into the README table values.

Each bench.py row is already the median of its reps; the headline rows
(repeated invocations of the same metric) are reduced to the median of
medians with min/max spread, matching the r3 campaign protocol.

Usage: python tools/summarize_campaign.py [BENCH_CAMPAIGN_r05.jsonl]
"""

import json
import statistics
import sys
from collections import defaultdict


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_CAMPAIGN_r05.jsonl"
    groups = defaultdict(list)
    for line in open(path):
        if not line.strip():
            continue
        r = json.loads(line)
        key = (r["metric"], r.get("batch"), r.get("context") or r.get("S"))
        groups[key].append(r)
    for (metric, batch, ctx), rows in groups.items():
        vals = [r["value"] for r in rows]
        ratios = [r["vs_baseline"] for r in rows]
        utils = [r.get("hbm_util") for r in rows if r.get("hbm_util")]
        med = statistics.median(vals)
        tag = f"{metric} (batch {batch}"
        tag += f", ctx {ctx})" if ctx else ")"
        spread = (
            f"  [{min(vals):.0f}..{max(vals):.0f}, n={len(vals)}]"
            if len(vals) > 1 else ""
        )
        util = f"  util {statistics.median(utils):.3f}" if utils else ""
        print(
            f"{tag:68s} {med:10.1f} tok/s  "
            f"{statistics.median(ratios):5.2f}x{util}{spread}"
        )


if __name__ == "__main__":
    main()

#!/usr/bin/env bash
# Doc-claims checker: every artifact a doc cites must exist in the tree.
#
# Three rounds of README/ROADMAP citing measurement artifacts that were
# never committed (SERVING_r03.json in r3, SERVING_r04.json in r4 —
# VERDICT r4 weak #2) earned this automation: grep the docs for
# ALLCAPS_rNN.json[l]-style artifact names and fail if any named file is
# absent from the repo root.  Wired into the verify skill; run before any
# doc-touching commit.
set -u
cd "$(dirname "$0")/.."

docs=$(ls README.md docs/*.md 2>/dev/null)
status=0
claimed=$(grep -hoE '[A-Z][A-Z0-9_]+_r[0-9]+[a-z]?\.(json|jsonl)' $docs | sort -u)
for f in $claimed; do
    if [ ! -e "$f" ]; then
        echo "MISSING artifact cited in docs: $f" >&2
        grep -ln "$f" $docs | sed 's/^/  cited in: /' >&2
        status=1
    fi
done
if [ $status -eq 0 ]; then
    echo "doc-claims OK: $(echo "$claimed" | grep -c .) cited artifacts all present"
fi
exit $status

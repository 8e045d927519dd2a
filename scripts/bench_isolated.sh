#!/bin/bash
# Isolated min-of-3 bench of the heaviest catalog queries (VERDICT r11
# item 7): the shared-catalog bench runs 150 queries back-to-back on a
# busy box, so round-over-round regressions on the expensive tail are
# hard to adjudicate from BENCH_r*.json alone. This records each heavy
# query alone, min-of-3, into BENCH_r<N>_isolated.json — one JSON line
# per query plus a merged summary — using the Bench main's existing
# SPARK_GRAFT_ONLY / SPARK_GRAFT_REPS path.
#
#   scripts/bench_isolated.sh <round> [sfDir]
#
# Queries: the five heaviest by the r11/r12 records plus the two
# serving-cadence families (cheap but regression-prone).
set -euo pipefail
ROUND="${1:?usage: bench_isolated.sh <round> [sfDir]}"
SF="${2:-/root/testdata/sf0.1}"
OUT="BENCH_r${ROUND}_isolated.json"
QUERIES=(q146_cadence_e2e q137_curation_e2e q53_dedup_clusters
         q58_dedup_survivors q60_dedup_report q98_leakage_safe_split
         q149_bm25_state q150_lm_state)
: > "$OUT.tmp"
# The Bench main emits TWO parseable lines since r14: a "[bench] health"
# diagnostics line (errors/failed/health counters/calibration) and the
# minimal driver-contract line ({"metric",...}) — merge both per query.
for q in "${QUERIES[@]}"; do
  echo "[bench_isolated] $q ..." >&2
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_ONLY="$q" SPARK_GRAFT_REPS=3 \
    sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep -oE '^(\[bench\] health )?\{"(metric|errors)".*}' >> "$OUT.tmp"
done
python3 - "$OUT.tmp" "$OUT" <<'EOF'
import json, sys
rows, health = [], []
for l in open(sys.argv[1]):
    l = l.strip()
    if l.startswith("[bench] health "):
        health.append(json.loads(l[len("[bench] health "):]))
    elif l:
        rows.append(json.loads(l))
merged = {"metric": "isolated_min_of_3", "unit": "sec", "queries": {},
          "failed": sum(h.get("failed", 0) for h in health),
          "sf": rows[0]["sf"] if rows else None,
          "calibration": [h.get("calibration", {}).get("pre") for h in health]}
for r in rows:
    merged["queries"].update(r.get("queries", {}))
merged["value"] = round(sum(merged["queries"].values()), 3)
with open(sys.argv[2], "w") as f:
    f.write(json.dumps(merged) + "\n")
print(json.dumps(merged))
EOF
rm -f "$OUT.tmp"

#!/bin/bash
# Third-scale-factor hash gate (VERDICT r12 #6): run the heaviest
# queries' DuckDB oracles against graft.Verify dumps on the
# content-disjoint 10x ScaleProbe fixture, one query at a time with a
# per-query timeout (a few oracles are DELIBERATELY quadratic SQL
# replays that are infeasible at 10x — the per-query driver surfaces
# them as TIMEOUT instead of wedging the sweep; q_st_hamming_ann's
# full-quadratic replay oracle is excluded up front for the same
# reason, its 10x evidence is the ScaleProbe PROBE row).
#
# Usage:
#   sbt "runMain graft.ScaleProbe /root/testdata/sf0.1 /tmp/graft_scale10 10 none"
#   sbt "runMain graft.Verify /tmp/graft_scale10 /tmp/vout_sf1 <heavy,prefixes>"
#   tools/check10x.sh /tmp/graft_scale10 /tmp/vout_sf1 [timeoutSec]
set -u
SF_DIR=${1:?10x fixture dir}
OUT_DIR=${2:?verify out dir}
TMO=${3:-600}
cd "$(dirname "$0")/.."
for q in $(ls -d "$OUT_DIR"/q_* 2>/dev/null | xargs -n1 basename); do
  if [ "$q" = "q_st_hamming_ann" ]; then
    echo "SKIP  $q (deliberately quadratic oracle; see SCALE.md)"
    continue
  fi
  timeout "$TMO" python3 -u tools/check.py "$SF_DIR" "$OUT_DIR" "$q" \
    2>&1 | grep -E "^(PASS|FAIL)"
  if [ "${PIPESTATUS[0]}" -eq 124 ]; then
    echo "TIMEOUT $q (oracle > ${TMO}s at 10x)"
  fi
done

#!/bin/bash
# Round-12 graph-family three-decade ladder: per-query ISOLATED calm
# captures (one JVM per query per scale — the 9-query family sweep in one
# JVM died at sf10 from accumulated localCheckpoint storage; see
# probes/r12 commit e45abb6) at sf1/sf10/sf100, all within ONE probing
# session so probe_index.py prints every adjacent-scale ratio.
# Usage: graph_ladder.sh [sessionId] [queries...]
set -u
cd "$(dirname "$0")/.."
export SPARK_GRAFT_SESSION="${1:-r12g3}"
shift || true
QUERIES=("$@")
[ ${#QUERIES[@]} -eq 0 ] && QUERIES=(graph_pagerank graph_sssp \
  graph_assortativity graph_triangles graph_kcore graph_link_predict \
  graph_cc_incremental graph_label_spread graph_modularity)
# the pre-rebuild graph captures ran at heap 69 (SPARK_DRIVER_MEM=70g);
# keep the same budget so cells stay comparable within the family
export SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-70g}"
for q in "${QUERIES[@]}"; do
  for sf in sf1 sf10 sf100; do
    out="probes/r12/probe_g3_${q#graph_}_${sf}.json"
    if [ -f "$out" ]; then echo "[graph_ladder] skip existing $out" >&2; continue; fi
    echo "[graph_ladder] === $q @ $sf ===" >&2
    scripts/calm_probe.sh "/dev/shm/graft_${sf}" "$q" "$out" 400 6 \
      || echo "[graph_ladder] FAILED: $q @ $sf" >&2
  done
done
echo "[graph_ladder] ladder complete" >&2

#!/bin/bash
# Builder-side probe harness for the contended build host: wait for a calm
# hypervisor-steal window, run one filtered Bench probe, and accept the
# capture only if its own steal_delta stays under the threshold — otherwise
# wait and retry. Usage:
#   calm_probe.sh <sfDir> <onlyCsv> <outFile> [maxStealDelta] [tries]
# Export SPARK_GRAFT_SESSION=<id> once before a probing sitting: Bench
# echoes it into every capture's "session_id", and probe_index.py prints
# adjacent-scale ratios only between captures of the SAME session — round
# number alone proved too coarse (two r11 captures of one query differed
# 4x across sittings; ADVICE r11 #4). Unset, each capture gets a per-probe
# fallback id, so cross-probe ratios stay suppressed rather than wrong.
set -u
export SPARK_GRAFT_SESSION="${SPARK_GRAFT_SESSION:-solo-$$-$(date +%s)}"
SFDIR=$1; ONLY=$2; OUT=$3; MAXSTEAL=${4:-400}; TRIES=${5:-6}
steal() { awk '/^cpu /{print $9; exit}' /proc/stat; }
for i in $(seq 1 "$TRIES"); do
  # gate: < 30 steal ticks over 30 s before even starting
  while :; do
    s0=$(steal); sleep 30; s1=$(steal)
    d=$((s1 - s0))
    echo "[calm_probe] gate: ${d} ticks/30s" >&2
    [ "$d" -lt 30 ] && break
    sleep 60
  done
  # keep exactly the LAST matching line: sbt warnings or a duplicate
  # capture line would otherwise concatenate into unparseable JSON, and
  # the silent json.load failure used to masquerade as steal_delta=999999
  # and burn a retry on a healthy run (ADVICE r7 #5)
  SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-32g}" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR="$SFDIR" \
    SPARK_GRAFT_ONLY="$ONLY" sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep '"metric"' | sed 's/^\[info\] //' | tail -n 1 > "$OUT.tmp"
  sd=$(python3 -c "import json,sys;print(json.load(open('$OUT.tmp'))['steal_delta'])" 2>&1) || {
    echo "[calm_probe] try $i: PARSE FAILURE (not contention): $sd" >&2
    sd=999999
  }
  echo "[calm_probe] try $i: steal_delta=$sd" >&2
  if [ "$sd" -lt "$MAXSTEAL" ]; then mv "$OUT.tmp" "$OUT"; echo "[calm_probe] accepted -> $OUT" >&2; exit 0; fi
  sleep 60
done
echo "[calm_probe] gave up after $TRIES contended tries; last capture left at $OUT.tmp" >&2
exit 1

#!/bin/bash
# End-of-round preflight gate (VERDICT r8 ask #3): never snapshot a tree
# that doesn't compile or that plans a banned shape. Run this before ANY
# round-ending commit, and after every edit that adds a `Declared`.
#
#   scripts/preflight.sh          # compile (main+test) + PlanAuditSpec (~3 min)
#   scripts/preflight.sh --full   # full `sbt test` instead of the audit only
#
# Exit 0 = safe to snapshot. Anything else = fix before committing.
set -euo pipefail
cd "$(dirname "$0")/.."
# sbt commands as an ARRAY — the earlier single-string form word-split
# 'testOnly graft.PlanAuditSpec' into tokens with literal quote chars,
# which sbt 1.10 refuses to parse, so the gate failed on every default run
TARGET=(Test/compile 'testOnly graft.PlanAuditSpec')
[ "${1:-}" = "--full" ] && TARGET=(test)
echo "[preflight] sbt compile + ${TARGET[*]}" >&2
sbt -batch compile "${TARGET[@]}"
# INDEX drift: every probes/r*/ capture must be represented in INDEX.md
python3 scripts/probe_index.py --check
echo "[preflight] OK — tree is snapshot-safe" >&2

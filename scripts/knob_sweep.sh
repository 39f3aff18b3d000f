#!/bin/bash
# Perf-knob sweep: runs AFTER tpu_battery.sh exits (pass its PID as $1).
# Round-4 outcomes (recorded in BASELINE.md "knob sweep outcomes"):
#   SPHERHARM_STAGE2_BF16=1 — no measurable gain at n=100k (kept as an
#     experiment flag only);
#   SPHERHARM_KBLOCK=128    — Mosaic VMEM OOM (dead at current kernel
#     footprint).
# Round 5 sweeps the surviving structural knob instead: rebuild-
# transient chunking (Simulation rebuild_chunk via BENCH_REBUILD_CHUNK).
# Logs to /tmp/battery/knob_*.log; summary appended to the battery log.
set -u
cd /root/repo
mkdir -p /tmp/battery
if [ $# -ge 1 ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi
log=/tmp/battery/summary.log
run() {
  name=$1; shift
  echo "--- knob $name: $* $(date -u +%T)" | tee -a $log
  # No timeout: a mid-TPU-dispatch kill can wedge the device and poison
  # every later leg (HANDOFF rule). bench.py itself fails fast when the
  # relay is down (require_tpu_or_die) and bounds per-dispatch work via
  # BENCH_BLOCK, so the worst case is one slow cold compile.
  "$@" > "/tmp/battery/knob_$name.log" 2>&1
  rc=$?
  grep -v "WARNING\|E08" "/tmp/battery/knob_$name.log" | tail -3 | tee -a $log
  echo "--- knob $name rc=$rc" | tee -a $log
}
run rebuildchunk_auto env python bench.py
run rebuildchunk_262k env BENCH_REBUILD_CHUNK=262144 python bench.py
run rebuild_R40       env BENCH_REBUILD_EVERY=40 python bench.py
echo "=== knob sweep done $(date -u +%FT%TZ)" | tee -a $log

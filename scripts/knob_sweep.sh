#!/bin/bash
# Round-4 perf-knob sweep: runs AFTER tpu_battery.sh exits (pass its
# PID as $1). Measures the two designed-but-unvalidated hot-kernel
# knobs on real TPU at the headline config (n=100k, conservative):
#   1. SPHERHARM_STAGE2_BF16=1  — bfloat16 Horner chains, f32 assembly
#   2. SPHERHARM_KBLOCK=128    — 2x kernel block (VMEM freed by the
#      power tables may now fit it)
# Logs to /tmp/battery/knob_*.log; summary appended to the battery log.
set -u
cd /root/repo
if [ $# -ge 1 ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi
log=/tmp/battery/summary.log
run() {
  name=$1; shift
  echo "--- knob $name: $* $(date -u +%T)" | tee -a $log
  timeout 2400 "$@" > "/tmp/battery/knob_$name.log" 2>&1
  rc=$?
  grep -v "WARNING\|E08" "/tmp/battery/knob_$name.log" | tail -3 | tee -a $log
  echo "--- knob $name rc=$rc" | tee -a $log
}
# Highest-value first: the profile says the step path is 64.9 ms and an
# UNCHUNKED rebuild is 394 ms/20, i.e. ~85 ms/step total — while the
# chunked bench measured 183 ms/step. pair_chunk=65536 serializes the
# rebuild probe at n=100k where the unchunked transients fit HBM fine.
run pairchunk0  env BENCH_PAIR_CHUNK=0 python bench.py
# bf16 parity gate first at small n (cheap compile), then the headline.
run bf16_smoke  env SPHERHARM_STAGE2_BF16=1 BENCH_N=2000 BENCH_STEPS=50 python bench.py
run bf16_100k   env SPHERHARM_STAGE2_BF16=1 BENCH_PAIR_CHUNK=0 python bench.py
run kblock128   env SPHERHARM_KBLOCK=128 BENCH_PAIR_CHUNK=0 python bench.py
echo "=== knob sweep done $(date -u +%FT%TZ)" | tee -a $log

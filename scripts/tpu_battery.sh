#!/bin/bash
# Round-3 TPU measurement battery. Run when the axon service is up.
# Serial, each stage bounded; logs to /tmp/battery/.
set -u
mkdir -p /tmp/battery
cd /root/repo

echo "=== battery start $(date -u +%FT%TZ)" | tee -a /tmp/battery/summary.log

run() {
  name=$1; shift
  echo "--- $name: $* $(date -u +%T)" | tee -a /tmp/battery/summary.log
  timeout "$TMO" "$@" > "/tmp/battery/$name.log" 2>&1
  rc=$?
  tail -4 "/tmp/battery/$name.log" | tee -a /tmp/battery/summary.log
  echo "--- $name rc=$rc" | tee -a /tmp/battery/summary.log
}

# 1. smoke (validates wall kernel + prefilter lowering on real TPU)
TMO=1200 run smoke env BENCH_N=2000 BENCH_STEPS=50 python bench.py

# 2. full bench n=100k (the headline; conservative mode default)
TMO=3000 run bench100k python bench.py

# 3. per-stage profile at n=100k
TMO=3000 run profile python scripts/profile_step.py

# 4. capacity ceiling: n=1M completes on one chip (short run)
TMO=3600 run bench1m env BENCH_N=1000000 BENCH_STEPS=50 BENCH_BLOCK=25 python bench.py

echo "=== battery done $(date -u +%FT%TZ)" | tee -a /tmp/battery/summary.log

#!/bin/bash
# Round-5 perf captures (VERDICT r4 #1/#7) — STRICTLY SERIAL, one TPU
# process at a time. Host core count is recorded with every figure
# (VERDICT #7: pipeline numbers are host-dependent).
set -u
cd /root/repo
OUT=artifacts/perf_r5
mkdir -p $OUT
echo "host_cpus=$(nproc)" | tee $OUT/host.txt

run() { # name, env..., bench
  local name=$1; shift
  echo "=== $name ($*)" | tee -a $OUT/summary.log
  env "$@" python bench.py >$OUT/$name.log 2>&1
  tail -n 3 $OUT/$name.log | tee -a $OUT/summary.log
}

# 1. kernel operating-point sweep (refine-only line)
run kernel_sweep BENCH_SKIP_PIPELINE=1 BENCH_BATCHES=512,1024,2048,4096,8192

# 2. pipeline: current default (192 frames, ims=64)
run pipe_default BENCH_SKIP_KERNEL=1

# 3. pipeline: REAL275-scale frame count (fixed-cost amortization),
#    ims sweep at exact-divisor group sizes (2752 = 86*32 = 43*64)
run pipe_2752_ims32 BENCH_SKIP_KERNEL=1 BENCH_PIPE_FRAMES=2752 BENCH_PIPE_IMS=32
run pipe_2752_ims64 BENCH_SKIP_KERNEL=1 BENCH_PIPE_FRAMES=2752 BENCH_PIPE_IMS=64

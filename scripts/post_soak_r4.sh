#!/bin/bash
# Round-4 post-soak TPU queue (strictly serial — ONE TPU process at a time):
# 1-3: pipeline re-capture with the loader host-path cuts (commit 3542fb1)
#      at bench shape, repeat, and REAL275 full-split scale;
# 4:   ims=1 reference-protocol confirm;
# 5:   sampler-randomness parity spread (VERDICT r3 #4) with the soak ckpt.
set -u
cd /root/repo
OUT=artifacts/perf_r4
mkdir -p "$OUT"
run() {
  local name=$1; shift
  echo "=== $(date +%H:%M:%S) $name ==="
  env "$@" timeout 3600 python bench.py >"$OUT/$name.log" 2>&1
  echo "rc=$? $(grep -o '"value": [0-9.]*' "$OUT/$name.log" | tail -2 | tr '\n' ' ')"
}
run r4b_default BENCH_NOOP=0
run r4b_repeat BENCH_SKIP_KERNEL=1
run r4b_fullsplit BENCH_SKIP_KERNEL=1 BENCH_PIPE_FRAMES=2752 BENCH_PIPE_IMS=32
run r4b_ims1_packed BENCH_SKIP_KERNEL=1 BENCH_PIPE_IMS=1 BENCH_PIPE_FRAMES=96
echo "=== $(date +%H:%M:%S) sampler_spread ==="
timeout 5400 python -m catre_tpu.tools.sampler_spread \
  --out artifacts/spread_r4 --platform tpu --ckpt output/soak_r4/ckpt \
  --frames 160 --seeds 8 --ref-seeds 4 --ims-per-batch 32 \
  > artifacts/spread_r4.log 2>&1
echo "rc=$?"
tail -20 artifacts/spread_r4.log
echo "=== $(date +%H:%M:%S) ALL DONE ==="

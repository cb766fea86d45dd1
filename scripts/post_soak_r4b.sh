#!/bin/bash
# Round-4 follow-up pipeline A/Bs (run strictly after post_soak_r4.sh):
# with the loader host-path cuts landing 4609 obj/s at ims=64/prefetch=2,
# probe whether bigger flush groups or deeper prefetch buy more overlap.
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
run r4b_ims128 BENCH_SKIP_KERNEL=1 BENCH_PIPE_IMS=128
run r4b_prefetch3 BENCH_SKIP_KERNEL=1 BENCH_PIPE_PREFETCH=3
run r4b_ims128_pf3 BENCH_SKIP_KERNEL=1 BENCH_PIPE_IMS=128 BENCH_PIPE_PREFETCH=3
echo "=== $(date +%H:%M:%S) FOLLOW-UP DONE ==="

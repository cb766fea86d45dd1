#!/bin/bash
# Round-4 queued pipeline A/Bs (VERDICT r3 #1/#7): fused window on/off,
# packed_sort selection, auto/zero window, ims=1 reference protocol incl.
# packed-inputs A/B. ONE TPU process at a time: strictly serial, one log
# file per config under artifacts/perf_r4/ (a first attempt that appended
# everything to one shared log produced interleaved, truncated lines and
# had to be discarded — attribution was unreliable).
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
run full_default BENCH_NOOP=0                 # full bench incl. kernel headline
run default_repeat BENCH_SKIP_KERNEL=1        # run-to-run variance
run fused_window_off BENCH_SKIP_KERNEL=1 CATRE_DISABLE_FUSED_WINDOW=1
run packed_sort BENCH_SKIP_KERNEL=1 CATRE_WINDOW_SELECTION=packed_sort
run window_auto BENCH_SKIP_KERNEL=1 BENCH_PIPE_WINDOW=-1
run window_full BENCH_SKIP_KERNEL=1 BENCH_PIPE_WINDOW=0
run ims1_packed BENCH_SKIP_KERNEL=1 BENCH_PIPE_IMS=1 BENCH_PIPE_FRAMES=96
run ims1_unpacked BENCH_SKIP_KERNEL=1 BENCH_PIPE_IMS=1 BENCH_PIPE_FRAMES=96 BENCH_PIPE_PACKED=0
echo "=== $(date +%H:%M:%S) ALL DONE ==="

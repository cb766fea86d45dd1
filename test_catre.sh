#!/usr/bin/env bash
# Mirror of the reference eval script (`core/catre/test_catre.sh`):
#   ./test_catre.sh <config> <nchips> <checkpoint> [opts...]
set -e
CFG=$1
NCHIPS=${2:-0}
CKPT=$3
shift 3 || true
exec python -m catre_tpu.main --config-file "$CFG" --num-chips "$NCHIPS" --eval-only \
  --opts MODEL.WEIGHTS="$CKPT" "$@"

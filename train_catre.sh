#!/usr/bin/env bash
# Mirror of the reference launch script (`core/catre/train_catre.sh`):
#   ./train_catre.sh <config> [opts...]
# TPU SPMD is single-process; the GPU-count argument becomes --num-chips.
set -e
CFG=$1
shift || true
NCHIPS=${1:-0}
if [[ "$NCHIPS" =~ ^[0-9]+$ ]]; then shift || true; else NCHIPS=0; fi
exec python -m catre_tpu.main --config-file "$CFG" --num-chips "$NCHIPS" "$@"

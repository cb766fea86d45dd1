#!/usr/bin/env bash
# One-command released-checkpoint reproduction on NOCS REAL275
# (north-star parity check; reference repro command `README.md:44-46`):
#
#   scripts/repro_real275.sh [DATA_ROOT] [OUT_DIR]
#
# Steps: asset check (fetch_assets) -> torch->flax conversion smoke ->
# full-split eval with the SPD initial poses (test_catre.sh semantics) ->
# per-iteration metric tables in OUT_DIR. If CATRE_REF_SUMMARY_JSON points at
# a json of reference-regenerated numbers ({"IoU75": .., "re5te2": ..}, the
# printed table names), the final-iteration summary is diffed within the
# 0.5 pt parity budget (BASELINE.md).
#
# The released checkpoint and REAL275 frames ship out-of-band (no network
# egress here) — fetch_assets prints exactly what to drop where.
set -euo pipefail
cd "$(dirname "$0")/.."

DATA_ROOT=${1:-${CATRE_DATA_ROOT:-datasets}}
OUT=${2:-output/repro_real275}
CKPT="$DATA_ROOT/checkpoints/model_final_wo_optim-82cf930e.pth"
CFG=catre_tpu/configs/nocs_real/aug05_kpsMS_r9d_catreDisR_shared_tspcl_convPerRot_scaleexp_120e.py

python -m catre_tpu.tools.fetch_assets --data-root "$DATA_ROOT"

echo "== converting released checkpoint =="
CATRE_DATA_ROOT="$DATA_ROOT" python - "$CKPT" << 'PY'
import sys
from catre_tpu.utils.checkpoint import load_torch_checkpoint
import jax
params = load_torch_checkpoint(sys.argv[1])
n = sum(x.size for x in jax.tree_util.tree_leaves(params))
print(f"converted: {n/1e6:.2f}M parameters")
PY

echo "== full-split eval (SPD init) =="
CATRE_DATA_ROOT="$DATA_ROOT" ./test_catre.sh "$CFG" 1 "$CKPT" \
  OUTPUT_DIR="$OUT" \
  DATASETS.INIT_POSE_FILES_TEST="('$DATA_ROOT/NOCS/test_init_poses/init_pose_spd_nocs_real.json',)"

echo "== tables =="
ls "$OUT"/metrics_tab_iter*.txt
cat "$OUT"/metrics_tab_iter4.txt

if [[ -n "${CATRE_REF_SUMMARY_JSON:-}" ]]; then
  echo "== parity diff vs $CATRE_REF_SUMMARY_JSON (0.5 pt budget) =="
  # Sampler RNG contributes ~0.15 pt noise at this split size (measured:
  # docs/DATA.md "Sampler-randomness parity tolerance"; cross-sampler bias
  # vs the imported reference crop_ball_from_pts ~0 — artifacts/spread_r4/).
  # bf16 eval compute contributes <= 0.17 pt (measured: docs/DATA.md "bf16
  # compute parity term"; artifacts/spread_r5_dtype/). If the diff lands
  # within 0.2 pt of the budget edge, re-run the eval in f32 by appending
  # MODEL.BF16=False to the test_catre.sh opts above and diff again.
  python -m catre_tpu.tools.repro_diff "$OUT" "$CATRE_REF_SUMMARY_JSON"
fi

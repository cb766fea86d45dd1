"""Convert a reference torch checkpoint (.pth) to a catre_tpu orbax
checkpoint directory.

Run:
  python -m catre_tpu.tools.convert_checkpoint model_final_wo_optim.pth out_ckpt/
"""

from __future__ import annotations

import argparse

from ..utils.checkpoint import load_torch_checkpoint, save_checkpoint


def main():
    parser = argparse.ArgumentParser(description="torch .pth -> orbax converter")
    parser.add_argument("torch_ckpt")
    parser.add_argument("out_dir")
    parser.add_argument("--step", type=int, default=0)
    args = parser.parse_args()

    params = load_torch_checkpoint(args.torch_ckpt)
    save_checkpoint(args.out_dir, args.step, {"params": params})
    print(f"converted {args.torch_ckpt} -> {args.out_dir} (step {args.step})")


if __name__ == "__main__":
    main()

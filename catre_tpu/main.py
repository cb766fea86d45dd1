"""CLI entry point.

Behavioral reference: `core/catre/main_catre.py:44-193` — config load/merge,
auto OUTPUT_DIR derivation, seeding, config dump, train/test dispatch — minus
the GPU/DDP machinery (TPU SPMD needs one process; `--num-chips` selects the
mesh size).

Usage:
  python -m catre_tpu.main --config-file catre_tpu/configs/nocs_real/...py
  python -m catre_tpu.main --config-file ... --eval-only --opts MODEL.WEIGHTS=path
"""

from __future__ import annotations

import argparse
import logging
import os
import os.path as osp
import sys


def my_default_argument_parser():
    """Mirrors `core/utils/default_args_setup.py:20-97` (the launcher options
    collapse to --num-chips under SPMD)."""
    p = argparse.ArgumentParser(description="catre_tpu")
    p.add_argument("--config-file", required=True, metavar="FILE")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--num-chips", type=int, default=0,
                   help="devices in the data-parallel mesh (0 = all)")
    # multi-host launch (mirrors the reference's --num-machines/--machine-rank/
    # --dist-url, `default_args_setup.py:73-90`; TPU pods auto-detect these,
    # so they are only needed for manual/CPU clusters)
    p.add_argument("--num-machines", type=int, default=1,
                   help="number of processes in the multi-host job")
    p.add_argument("--machine-rank", type=int, default=0,
                   help="this process's rank")
    p.add_argument("--dist-url", default="",
                   help="coordinator address host:port (empty = auto/TPU detection)")
    p.add_argument("--fp16-allreduce", action="store_true",
                   help="accepted for reference-CLI compat (no-op: XLA manages collectives)")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[],
                   help="dotted config overrides KEY.SUBKEY=value")
    return p


def setup(args):
    from catre_tpu.config.loader import apply_overrides, dump_config, load_config

    cfg = load_config(args.config_file)
    cfg = apply_overrides(cfg, [o for o in args.opts if "=" in o])

    from catre_tpu.config.build import validate_config

    validate_config(cfg)  # warn (or raise under STRICT_CFG) on unknown keys

    # auto OUTPUT_DIR from config path (`main_catre.py:51-56`)
    if not cfg.get("OUTPUT_DIR"):
        base = osp.splitext(osp.basename(args.config_file))[0]
        cfg["OUTPUT_DIR"] = osp.join(cfg.get("OUTPUT_ROOT", "output"), "catre_tpu", base)
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)

    from catre_tpu.parallel import comm as _comm

    rank = _comm.get_rank()
    log_name = "log.txt" if rank == 0 else f"log.rank{rank}.txt"
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s: %(message)s",
        handlers=[
            logging.StreamHandler(sys.stdout),
            logging.FileHandler(osp.join(cfg.OUTPUT_DIR, log_name)),
        ],
    )

    if cfg.get("DEBUG", False):
        # DEBUG mode (`main_catre.py:104-109`): tighten feedback loops
        cfg["TRAIN"]["PRINT_FREQ"] = 1
        cfg["DATALOADER"]["NUM_WORKERS"] = 0

    seed = cfg.get("SEED", -1)
    if seed < 0:
        import time as _t

        seed = int(_t.time()) % (2 ** 31)
        from catre_tpu.parallel import comm

        if comm.get_world_size() > 1:
            # every rank must shuffle/augment from the same base seed
            # (the reference broadcasts via `seed_all_rng`/shared_random_seed)
            seed = int(comm.all_gather(seed)[0])
        cfg["SEED"] = seed
    import numpy as _np
    import random as _random

    _np.random.seed(seed)
    _random.seed(seed)

    if _comm.is_main_process():
        dump_config(cfg, osp.join(cfg.OUTPUT_DIR, "config_dump.py"))
    return cfg


def main(args=None):
    args = my_default_argument_parser().parse_args(args)

    import jax

    try:  # persistent compile cache (remote compiles are slow in this image)
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    # multi-host init must precede any other jax use (and setup()'s seed
    # broadcast); single-machine launches skip it entirely
    from catre_tpu.parallel import comm

    if args.num_machines > 1 or args.dist_url:
        comm.init_dist(
            coordinator_address=args.dist_url or None,
            num_processes=args.num_machines,
            process_id=args.machine_rank,
        )

    cfg = setup(args)

    from catre_tpu.engine.runner import do_test, do_train

    cfg["NUM_CHIPS"] = int(args.num_chips)
    if args.eval_only:
        return do_test(cfg)
    return do_train(cfg, resume=args.resume)


if __name__ == "__main__":
    main()

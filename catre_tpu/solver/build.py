"""Optimizer factory from a SOLVER config dict.

Mirrors `core/utils/solver_utils.py:28-99` (build_optimizer_with_params) for
the optimizer types exercised by the shipped configs, plus standard optax
optimizers for the rest of the registry surface.  Per-head LR multipliers
(`models/model_utils.py:66-167` param groups) are supported via a label map
over top-level parameter collections.
"""

from __future__ import annotations

import optax

from . import extra
from .ranger import ranger


def _base_optimizer(opt_cfg: dict) -> tuple:
    """Return (factory(lr) -> GradientTransformation, base_lr)."""
    typ = str(opt_cfg.get("type", "Ranger")).lower()
    lr = float(opt_cfg.get("lr", 1e-4))
    wd = float(opt_cfg.get("weight_decay", 0.0))

    if typ == "ranger":
        def make(lr_):
            return ranger(
                learning_rate=lr_,
                weight_decay=wd,
                b1=float(opt_cfg.get("betas", (0.95, 0.999))[0]),
                b2=float(opt_cfg.get("betas", (0.95, 0.999))[1]),
                eps=float(opt_cfg.get("eps", 1e-5)),
                k=int(opt_cfg.get("k", 6)),
                alpha=float(opt_cfg.get("alpha", 0.5)),
                use_gc=bool(opt_cfg.get("use_gc", True)),
            )
    elif typ == "adam":
        def make(lr_):
            return optax.adamw(lr_, weight_decay=wd) if wd else optax.adam(lr_)
    elif typ == "adamw":
        def make(lr_):
            return optax.adamw(lr_, weight_decay=wd)
    elif typ == "sgd":
        def make(lr_):
            return optax.sgd(lr_, momentum=float(opt_cfg.get("momentum", 0.9)))
    elif typ == "radam":
        def make(lr_):
            return optax.radam(lr_)
    elif typ == "adabelief":
        def make(lr_):
            return optax.adabelief(lr_, eps=float(opt_cfg.get("eps", 1e-16)))
    elif typ in ("nadam", "nadamw"):
        def make(lr_):
            f = optax.nadamw if typ == "nadamw" else optax.nadam
            return f(lr_, weight_decay=wd) if typ == "nadamw" else f(lr_)
    elif typ in ("rmsprop", "rmsprop_tf"):
        # optax's default eps_in_sqrt=True IS the tf/caffe2 variant the
        # reference ships as rmsprop_tf (lib/torch_utils/solver/rmsprop_tf.py)
        def make(lr_):
            return optax.rmsprop(lr_, momentum=float(opt_cfg.get("momentum", 0.0)) or None)
    elif typ == "lamb":
        def make(lr_):
            return optax.lamb(lr_, weight_decay=wd)
    elif typ == "lars":
        def make(lr_):
            return optax.lars(lr_, weight_decay=wd)
    elif typ == "ralamb":
        def make(lr_):
            return extra.ralamb(lr_, weight_decay=wd)
    elif typ in ("over9000", "rangerlars"):
        def make(lr_):
            return extra.over9000(
                lr_, k=int(opt_cfg.get("k", 6)),
                alpha=float(opt_cfg.get("alpha", 0.5)), weight_decay=wd)
    elif typ == "madgrad":
        def make(lr_):
            return extra.madgrad(lr_, momentum=float(opt_cfg.get("momentum", 0.9)),
                                 weight_decay=wd)
    elif typ == "adamp":
        def make(lr_):
            return extra.adamp(lr_, weight_decay=wd)
    elif typ == "sgdp":
        def make(lr_):
            return extra.sgdp(lr_, momentum=float(opt_cfg.get("momentum", 0.9)),
                              weight_decay=wd)
    elif typ in ("sgd_gc", "sgd_gcc"):
        def make(lr_):
            return extra.sgd_gc(lr_, momentum=float(opt_cfg.get("momentum", 0.9)),
                                weight_decay=wd)
    elif typ == "ranger2020":
        from .ranger_family import ranger2020

        def make(lr_):
            return ranger2020(
                lr_, weight_decay=wd,
                b1=float(opt_cfg.get("betas", (0.95, 0.999))[0]),
                b2=float(opt_cfg.get("betas", (0.95, 0.999))[1]),
                eps=float(opt_cfg.get("eps", 1e-5)),
                k=int(opt_cfg.get("k", 6)), alpha=float(opt_cfg.get("alpha", 0.5)),
                use_gc=bool(opt_cfg.get("use_gc", True)),
                gc_conv_only=bool(opt_cfg.get("gc_conv_only", False)),
                gc_loc=bool(opt_cfg.get("gc_loc", True)))
    elif typ in ("rangeradabelief", "ranger_adabelief"):
        from .ranger_family import ranger_adabelief

        def make(lr_):
            return ranger_adabelief(
                lr_, weight_decay=wd,
                b1=float(opt_cfg.get("betas", (0.95, 0.999))[0]),
                b2=float(opt_cfg.get("betas", (0.95, 0.999))[1]),
                eps=float(opt_cfg.get("eps", 1e-5)),
                k=int(opt_cfg.get("k", 6)), alpha=float(opt_cfg.get("alpha", 0.5)),
                use_gc=bool(opt_cfg.get("use_gc", True)),
                adabelief=bool(opt_cfg.get("adabelief", True)),
                weight_decouple=bool(opt_cfg.get("weight_decouple", True)))
    elif typ == "badam":
        from .ranger_family import badam

        def make(lr_):
            return badam(
                # reference badam.py:35 defaults weight_decay=1e-2 only
                # when the key is ABSENT; an explicit 0.0 disables decay
                lr_, weight_decay=float(opt_cfg.get("weight_decay", 1e-2)),
                b1=float(opt_cfg.get("betas", (0.9, 0.999))[0]),
                b2=float(opt_cfg.get("betas", (0.9, 0.999))[1]),
                eps=float(opt_cfg.get("eps", 1e-6)),
                avg_sq_init=float(opt_cfg.get("avg_sq_init", 1e-3)))
    elif typ == "ranger21":
        from .ranger_family import ranger21

        def make(lr_):
            return ranger21(
                # reference ranger21.py:111 default (absent-key only)
                lr_, weight_decay=float(opt_cfg.get("weight_decay", 1e-4)),
                b1=float(opt_cfg.get("betas", (0.9, 0.999))[0]),
                b2=float(opt_cfg.get("betas", (0.9, 0.999))[1]),
                eps=float(opt_cfg.get("eps", 1e-8)),
                lookahead_mergetime=int(opt_cfg.get("lookahead_mergetime", 5)),
                lookahead_alpha=float(opt_cfg.get("lookahead_blending_alpha", 0.5)),
                use_adaptive_gradient_clipping=bool(
                    opt_cfg.get("use_adaptive_gradient_clipping", True)),
                using_gc=bool(opt_cfg.get("using_gc", True)),
                using_normgc=bool(opt_cfg.get("using_normgc", True)),
                normloss_active=bool(opt_cfg.get("normloss_active", True)),
                normloss_factor=float(opt_cfg.get("normloss_factor", 1e-4)))
    elif typ == "lookahead":
        inner_cfg = dict(opt_cfg.get("inner", {"type": "adam", "lr": lr}))
        inner_cfg.setdefault("lr", lr)
        inner_make, _ = _base_optimizer(inner_cfg)

        def make(lr_):
            return extra.lookahead_wrap(
                inner_make(lr_), k=int(opt_cfg.get("k", 6)),
                alpha=float(opt_cfg.get("alpha", 0.5)))
    else:
        raise NotImplementedError(f"optimizer type {opt_cfg.get('type')}")
    return make, lr


def build_optimizer(solver_cfg: dict, lr_mults: dict | None = None,
                    frozen: tuple = ()) -> optax.GradientTransformation:
    """Build the optimizer with the lr exposed as an injectable hyperparam.

    Args:
      solver_cfg: the SOLVER config dict (OPTIMIZER_CFG inside).
      lr_mults: optional {top_level_param_key: multiplier}; multiplies the
        update of that subtree (reference LR_MULT param groups,
        `models/model_utils.py:66-167`).
      frozen: top-level param keys whose updates are zeroed (the FREEZE
        flags; the reference's freeze path is broken —
        `CATRE_disR_shared.py:301-304` iterates the config — this one works).
    """
    opt_cfg = dict(solver_cfg.get("OPTIMIZER_CFG", {"type": "Ranger", "lr": 1e-4}))
    make, base_lr = _base_optimizer(opt_cfg)
    mults = dict(lr_mults or {})
    for k in frozen:
        mults[k] = 0.0

    def factory(learning_rate):
        tx = make(learning_rate)
        if mults and any(m != 1.0 for m in mults.values()):
            def scale_tree(updates, state, params=None):
                del params
                import jax

                def scale(path, u):
                    key = path[0].key if hasattr(path[0], "key") else str(path[0])
                    return u * mults.get(key, 1.0)

                return jax.tree_util.tree_map_with_path(scale, updates), state

            mult = optax.GradientTransformation(lambda p: optax.EmptyState(), scale_tree)
            tx = optax.chain(tx, mult)
        return tx

    tx = optax.inject_hyperparams(factory)(learning_rate=base_lr)

    clip_cfg = solver_cfg.get("CLIP_GRADIENTS", {})
    if clip_cfg.get("ENABLED", False):
        ctype = clip_cfg.get("CLIP_TYPE", "value")
        cval = float(clip_cfg.get("CLIP_VALUE", 1.0))
        if ctype == "value":
            tx = optax.chain(optax.clip(cval), tx)
        elif ctype in ("norm", "full_model"):
            tx = optax.chain(optax.clip_by_global_norm(cval), tx)
    return tx

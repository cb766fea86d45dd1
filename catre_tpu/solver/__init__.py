from .ranger import RangerState, make_ranger, ranger
from .schedule import build_lr_fn, flat_and_anneal_factor
from .build import build_optimizer

__all__ = [
    "RangerState", "make_ranger", "ranger", "build_lr_fn",
    "flat_and_anneal_factor", "build_optimizer",
]

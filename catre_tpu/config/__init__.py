from .build import (
    loader_config_from,
    loss_config_from,
    model_config_from,
    noise_config_from,
)
from .loader import Config, apply_overrides, dump_config, load_config, merge_a_into_b

__all__ = [
    "Config", "apply_overrides", "dump_config", "load_config", "merge_a_into_b",
    "loader_config_from", "loss_config_from", "model_config_from",
    "noise_config_from",
]

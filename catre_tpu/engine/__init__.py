from .refiner import make_refine_fn
from .train import InputNoiseConfig, TrainState, make_train_step, prepare_train_batch

__all__ = [
    "make_refine_fn", "InputNoiseConfig", "TrainState", "make_train_step",
    "prepare_train_batch", "build_model", "do_test", "do_train",
]


def __getattr__(name):
    # runner imports config.build which imports engine.train — lazy-load the
    # runner symbols to avoid the package-init cycle
    if name in ("build_model", "do_test", "do_train"):
        from . import runner

        return getattr(runner, name)
    raise AttributeError(name)

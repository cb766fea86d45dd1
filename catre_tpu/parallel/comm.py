"""Multi-host / cross-process communication helpers.

Behavioral reference: `core/utils/my_comm.py` (init_dist:174, reduce_dict:27,
all_gather:70, synchronize:82, rank accessors:251-297).  Under SPMD most of
the reference's collectives disappear — gradient averaging is XLA's job —
but the host-side surface (process identity, metric reduction, eval gather)
still needs an API.
"""

from __future__ import annotations

import logging

import numpy as np

import jax

logger = logging.getLogger(__name__)

_INITIALIZED = False


def init_dist(coordinator_address: str | None = None, num_processes: int | None = None,
              process_id: int | None = None) -> None:
    """Initialize multi-host JAX (`jax.distributed`), the TPU-native analogue
    of the reference's `init_dist(launcher, backend)` NCCL setup.

    No-op on single-process setups (all args None and no cluster env)."""
    global _INITIALIZED
    if _INITIALIZED:
        return
    if coordinator_address is None and num_processes is None:
        # single-process (the common case on one host / one slice)
        _INITIALIZED = True
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _INITIALIZED = True
    logger.info("jax.distributed initialized: process %d/%d", get_rank(), get_world_size())


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return get_rank() == 0


def is_dist_avail_and_initialized() -> bool:
    return get_world_size() > 1


def synchronize() -> None:
    """Barrier across processes (ref `my_comm.py:82-96`)."""
    if get_world_size() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("catre_tpu.synchronize")


def all_gather(data) -> list:
    """Gather arbitrary picklable data from all processes (ref
    `my_comm.py:70-171`: pickle, pad to the max length, exchange, unpickle)."""
    if get_world_size() == 1:
        return [data]
    import pickle

    from jax.experimental import multihost_utils

    buf = np.frombuffer(pickle.dumps(data), dtype=np.uint8)
    local_size = np.asarray([buf.size], dtype=np.int64)
    sizes = np.asarray(multihost_utils.process_allgather(local_size)).reshape(-1)
    max_size = int(sizes.max())
    padded = np.zeros(max_size, dtype=np.uint8)
    padded[: buf.size] = buf
    gathered = np.asarray(multihost_utils.process_allgather(padded)).reshape(-1, max_size)
    return [pickle.loads(gathered[i, : int(sizes[i])].tobytes()) for i in range(len(sizes))]


def gather_arrays(x: np.ndarray) -> np.ndarray:
    """Gather a numpy array from all processes -> concatenated along axis 0."""
    if get_world_size() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x)).reshape((-1,) + x.shape[1:])


def inference_slice(n: int, rank: int | None = None, world_size: int | None = None):
    """Exact contiguous per-process split of n test records (the reference's
    `InferenceSampler`, `my_distributed_sampler.py:172-200`): every record
    appears on exactly one process."""
    rank = get_rank() if rank is None else rank
    world_size = get_world_size() if world_size is None else world_size
    shard_size = (n - 1) // world_size + 1
    begin = min(shard_size * rank, n)
    end = min(shard_size * (rank + 1), n)
    return slice(begin, end)


def reduce_dict(metrics: dict, average: bool = True) -> dict:
    """Average scalar metrics across processes (ref `my_comm.py:27-67`).
    Under jit the loss reductions already psum over the mesh; this is for
    host-side scalars."""
    if get_world_size() == 1:
        return metrics
    from jax.experimental import multihost_utils

    keys = sorted(metrics)
    vec = np.asarray([float(metrics[k]) for k in keys], dtype=np.float32)
    gathered = np.asarray(multihost_utils.process_allgather(vec))
    red = gathered.mean(axis=0) if average else gathered.sum(axis=0)
    return {k: float(v) for k, v in zip(keys, red)}

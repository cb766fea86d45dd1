"""Device mesh + sharding helpers.

TPU-native replacement for the reference's NCCL DDP stack
(`core/utils/my_comm.py`, SURVEY.md §2.11): one single-program jit over a
1-D data-parallel mesh; the gradient mean the reference gets from DDP
all-reduce falls out of XLA's GSPMD partitioner (the masked-mean reductions
in the loss become psums over the `dp` axis), and eval gather is a
`jax.device_get` of an addressable replicated array.

The model is ~4.3M params (SURVEY.md §2.2): parameters are replicated and
instances are sharded — TP/PP/SP have no surface here (no attention, no
sequence axis; SURVEY.md §5).  The point axis is a documented seam: if point
counts grew by orders of magnitude, shard axis=1 of the clouds and psum at
the encoder max-pool.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DP_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (instance) axis across the mesh."""
    return NamedSharding(mesh, P(DP_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """device_put every batch array with its leading axis sharded."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate_tree(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sh = replicated(mesh)
    return jax.device_put(tree, sh)


def make_global_batch(mesh: Mesh, batch: dict) -> dict:
    """Batch arrays -> global arrays sharded on the leading (instance) axis.

    Single-process: a plain sharded device_put. Multi-process: each process's
    local batch becomes its shard of the global array (the SPMD analogue of
    the reference's per-rank DDP loader split,
    `core/utils/dataset_utils.py:391-452`); global row count = world_size x
    local rows.
    """
    if jax.process_count() == 1:
        return shard_batch(mesh, batch)
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec

    pspec = PartitionSpec(DP_AXIS)
    return {
        k: multihost_utils.host_local_array_to_global_array(np.asarray(v), mesh, pspec)
        for k, v in batch.items()
    }


def pad_to_multiple(batch: dict, multiple: int) -> dict:
    """Pad the leading axis of every array to a multiple (for even sharding),
    extending the 'valid' mask with False."""
    import numpy as _np

    n = next(iter(batch.values())).shape[0]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return batch
    pad = target - n
    out = {}
    for k, v in batch.items():
        v = _np.asarray(v)
        if k == "valid":
            out[k] = _np.concatenate([v, _np.zeros(pad, dtype=bool)])
        else:
            widths = [(0, pad)] + [(0, 0)] * (v.ndim - 1)
            out[k] = _np.pad(v, widths, mode="edge" if v.ndim else "constant")
    return out

"""Checkpointing: torch .pth -> flax params conversion + orbax save/load.

The reference releases weight-only torch checkpoints
(`model_final_wo_optim-82cf930e.pth`, README.md:42) whose state-dict keys
follow the module structure of `CATRE_disR_shared` (SURVEY.md §3.5):
  pcl_net.{stn,fstn,conv1..4}.*,
  rot_head.rot_head_{x,y}.{layers,neck,conv_p}.*,
  ts_head.{linears,fc_t,fc_s}.*
This module maps them onto catre_tpu's flax parameter tree.
"""

from __future__ import annotations

import os
from typing import Any, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    """torch tensor / ndarray -> float32 ndarray."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _dense(sd: Mapping[str, Any], torch_prefix: str) -> dict:
    """torch Linear or Conv1d(k=1) -> flax Dense {kernel (in,out), bias}."""
    w = _np(sd[f"{torch_prefix}.weight"])
    if w.ndim == 3:  # Conv1d: (out, in, 1)
        w = w[:, :, 0]
    out = {"kernel": w.T}
    bkey = f"{torch_prefix}.bias"
    if bkey in sd:
        out["bias"] = _np(sd[bkey])
    return out


def _gn(sd: Mapping[str, Any], torch_prefix: str) -> dict:
    return {"scale": _np(sd[f"{torch_prefix}.weight"]), "bias": _np(sd[f"{torch_prefix}.bias"])}


def _stn(sd: Mapping[str, Any], prefix: str) -> dict:
    return {
        name: _dense(sd, f"{prefix}.{name}")
        for name in ["conv1", "conv2", "conv3", "fc1", "fc2", "fc3"]
    }


def _wrap_dense(tree: dict) -> dict:
    """Our TorchDense/HeadDense modules nest an nn.Dense as 'Dense_0'."""
    return {"Dense_0": tree}


def _rot_head(sd: Mapping[str, Any], prefix: str) -> dict:
    """rot_head_{x,y}: layers.[0 Conv,1 GN,2 act,3 Conv,4 GN,5 act], neck.0, conv_p.

    layer0 is stored flat ({layer0_kernel, layer0_bias}) because the flax
    RotHead splits its weight along the input channels (see models/heads.py).
    """
    l0 = _dense(sd, f"{prefix}.layers.0")
    out = {
        "layer0_kernel": l0["kernel"],
        "layer0_bias": l0["bias"],
        "gn0": _gn(sd, f"{prefix}.layers.1"),
        "layer1": _wrap_dense(_dense(sd, f"{prefix}.layers.3")),
        "gn1": _gn(sd, f"{prefix}.layers.4"),
        "neck": _wrap_dense(_dense(sd, f"{prefix}.neck.0")),
        "point_weight": _np(sd[f"{prefix}.conv_p.weight"])[0, :, 0],
    }
    bkey = f"{prefix}.conv_p.bias"
    if bkey in sd:
        out["point_bias_param"] = _np(sd[bkey])
    return out


def torch_state_dict_to_params(sd: Mapping[str, Any]) -> dict:
    """Convert a reference-format torch state dict to catre_tpu flax params.

    Accepts torch tensors or numpy arrays as values; strips a leading
    'module.' (DDP) prefix.
    """
    sd = {k[len("module."):] if k.startswith("module.") else k: v for k, v in sd.items()}

    pcl_net: dict = {"stn": {k: _wrap_dense(v) for k, v in _stn(sd, "pcl_net.stn").items()}}
    if any(k.startswith("pcl_net.fstn.") for k in sd):
        pcl_net["fstn"] = {k: _wrap_dense(v) for k, v in _stn(sd, "pcl_net.fstn").items()}
    for name in ["conv1", "conv2", "conv3", "conv4"]:
        pcl_net[name] = _wrap_dense(_dense(sd, f"pcl_net.{name}"))

    rot_head = {
        "rot_head_x": _rot_head(sd, "rot_head.rot_head_x"),
        "rot_head_y": _rot_head(sd, "rot_head.rot_head_y"),
    }

    ts_head = {
        "linear0": _wrap_dense(_dense(sd, "ts_head.linears.0")),
        "gn0": _gn(sd, "ts_head.linears.1"),
        "linear1": _wrap_dense(_dense(sd, "ts_head.linears.3")),
        "gn1": _gn(sd, "ts_head.linears.4"),
        "fc_t": _wrap_dense(_dense(sd, "ts_head.fc_t")),
        "fc_s": _wrap_dense(_dense(sd, "ts_head.fc_s")),
    }

    return {"pcl_net": pcl_net, "rot_head": rot_head, "ts_head": ts_head}


def _strip_ddp_prefix(sd: Mapping[str, Any]) -> Mapping[str, Any]:
    """Drop a uniform 'module.' prefix (DDP-saved state dicts; the reference
    strips it via consume_prefix_in_state_dict_if_present,
    `my_checkpoint.py:76-79`)."""
    keys = [k for k in sd.keys() if isinstance(k, str)]
    if keys and all(k.startswith("module.") for k in keys):
        return {k[len("module."):]: v for k, v in sd.items()}
    return sd


def load_torch_state_dict(path: str) -> Mapping[str, Any]:
    """Load a reference-format checkpoint container into a flat state dict.

    Mirrors `core/utils/my_checkpoint.py:48-84` (_load_file): torch .pth
    (bare or {'model': ...} fvcore container), detectron2 model-zoo .pkl
    ({'model', '__author__'}), Caffe2/Detectron1 .pkl ('blobs' +
    *_momentum/weight_order pruning), torchvision:// names and http(s) URLs
    (resolved through torch.hub's checkpoint cache).
    """
    import pickle

    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        if "model" in data and "__author__" in data:
            sd = data["model"]  # detectron2 model-zoo format
        else:
            if "blobs" in data:  # Caffe2 / Detectron1
                data = data["blobs"]
            sd = {k: v for k, v in data.items() if not str(k).endswith("_momentum")}
            sd.pop("weight_order", None)
    elif path.startswith("torchvision://"):
        try:
            import torchvision.models as tvm
        except ImportError as e:
            raise RuntimeError(
                "torchvision:// checkpoints need torchvision installed "
                "(the reference resolves them through mmcv's torchvision "
                "model zoo, my_checkpoint.py:70-71)") from e
        name = path[len("torchvision://"):]
        weights = tvm.get_model_weights(name).DEFAULT
        import torch.hub

        sd = torch.hub.load_state_dict_from_url(weights.url, map_location="cpu")
    elif path.startswith(("http://", "https://")):
        import torch.hub

        sd = torch.hub.load_state_dict_from_url(path, map_location="cpu")
    else:
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(ckpt, dict) and "model" in ckpt and not any("." in k for k in ckpt):
            sd = ckpt["model"]
        else:
            sd = ckpt
    return _strip_ddp_prefix(sd)


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference checkpoint (any `my_checkpoint.py:48-84` container
    format) and convert to flax params."""
    return torch_state_dict_to_params(load_torch_state_dict(path))


# ------------------------- orbax native checkpoints -------------------------

def save_checkpoint(ckpt_dir: str, step: int, state: Any, keep: int = 5) -> None:
    """Save a train state pytree with orbax (async-safe single-host)."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(
        ckpt_dir, options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True)
    ) as mngr:
        mngr.save(step, args=ocp.args.StandardSave(state))
        mngr.wait_until_finished()


def load_checkpoint(ckpt_dir: str, abstract_state: Any, step: int | None = None) -> Any:
    """Restore the latest (or given) step; returns the restored pytree."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(ckpt_dir) as mngr:
        if step is None:
            step = mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {ckpt_dir}")
        return mngr.restore(step, args=ocp.args.StandardRestore(abstract_state))


def latest_step(ckpt_dir: str) -> int | None:
    import orbax.checkpoint as ocp

    if not os.path.isdir(ckpt_dir):
        return None
    with ocp.CheckpointManager(os.path.abspath(ckpt_dir)) as mngr:
        return mngr.latest_step()

"""Checkpoint-format parity: reference-architecture torch weights converted
via torch_state_dict_to_params must produce bit-close outputs from the flax
model."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from catre_tpu.models import CATREConfig, CATREDisRShared
from catre_tpu.models.pointnet import PointNetFeat
from catre_tpu.utils.checkpoint import torch_state_dict_to_params

from torch_mirror import TorchCATRE, TorchPointNetFeat

RNG = np.random.default_rng(42)


def test_pointnet_parity():
    torch.manual_seed(3)
    tm = TorchPointNetFeat().eval()
    # convert just the encoder by faking the full-prefix state dict
    sd = {f"pcl_net.{k}": v for k, v in tm.state_dict().items()}
    # need head keys present? converter requires rot/ts heads — build full model instead
    full = TorchCATRE().eval()
    full.pcl_net.load_state_dict(tm.state_dict())
    params = torch_state_dict_to_params(full.state_dict())

    x = RNG.normal(size=(2, 1024, 3)).astype(np.float32) * 0.2
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 2, 1))).numpy()  # (B, 1088, P)

    fm = PointNetFeat(out_dim=1024, global_feat=False, feature_transform=True)
    ours = np.asarray(fm.apply({"params": params["pcl_net"]}, jnp.asarray(x)))  # (B, P, 1088)
    np.testing.assert_allclose(ours.transpose(0, 2, 1), ref, atol=2e-4)


def test_full_model_parity():
    torch.manual_seed(4)
    tm = TorchCATRE().eval()
    params = torch_state_dict_to_params(tm.state_dict())

    B = 3
    x = (RNG.normal(size=(B, 1024, 3)) * 0.15).astype(np.float32)
    kps = (RNG.normal(size=(B, 1024, 3)) * 0.1).astype(np.float32)
    s = RNG.uniform(0.05, 0.4, size=(B, 3)).astype(np.float32)

    with torch.no_grad():
        rot_ref, trans_ref, scale_ref = tm(
            torch.from_numpy(x.transpose(0, 2, 1)),
            torch.from_numpy(kps.transpose(0, 2, 1)),
            torch.from_numpy(s),
        )

    cfg = CATREConfig()
    model = CATREDisRShared(cfg)
    rot, trans, scale = model.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(kps), jnp.asarray(s), jnp.zeros((B, 3))
    )
    np.testing.assert_allclose(np.asarray(rot), rot_ref.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(trans), trans_ref.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(scale), scale_ref.numpy(), atol=2e-4)


def test_init_shapes_match_converted():
    """Randomly initialized flax params must have identical tree/shapes to the
    converted torch params (guards the converter against drift)."""
    from catre_tpu.models import init_params

    cfg = CATREConfig()
    model = CATREDisRShared(cfg)
    ours = init_params(model, cfg, jax.random.PRNGKey(0))
    theirs = torch_state_dict_to_params(TorchCATRE().state_dict())

    flat_ours = jax.tree_util.tree_flatten_with_path(ours)[0]
    flat_theirs = jax.tree_util.tree_flatten_with_path(theirs)[0]
    paths_ours = {jax.tree_util.keystr(p): v.shape for p, v in flat_ours}
    paths_theirs = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in flat_theirs}
    assert paths_ours == paths_theirs

"""Checkpoint container formats (`core/utils/my_checkpoint.py:48-84`):
d2 model-zoo .pkl, Caffe2 'blobs' .pkl, DDP 'module.' prefixes, URL routing —
validated on the FULL reference-layout state dict from the torch mirror."""

import pickle

import numpy as np
import pytest
import torch

from catre_tpu.utils.checkpoint import (
    load_torch_checkpoint,
    load_torch_state_dict,
    torch_state_dict_to_params,
)

from torch_mirror import TorchCATRE


@pytest.fixture(scope="module")
def mirror_sd():
    torch.manual_seed(0)
    return TorchCATRE().state_dict()


def _assert_params_equal(a, b):
    import jax

    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_d2_pkl_container(tmp_path, mirror_sd):
    """Detectron2 model-zoo format: {'model': sd, '__author__': ...} with
    numpy values (d2 pkls store numpy, not tensors)."""
    sd_np = {k: v.numpy() for k, v in mirror_sd.items()}
    path = tmp_path / "model.pkl"
    with open(path, "wb") as f:
        pickle.dump({"model": sd_np, "__author__": "Detectron2",
                     "matching_heuristics": True}, f)
    params = load_torch_checkpoint(str(path))
    _assert_params_equal(params, torch_state_dict_to_params(mirror_sd))


def test_caffe2_blobs_pkl(tmp_path, mirror_sd):
    """Caffe2/Detectron1 format: {'blobs': sd} with *_momentum and
    weight_order entries pruned."""
    sd_np = {k: v.numpy() for k, v in mirror_sd.items()}
    blobs = dict(sd_np)
    blobs["pcl_net.conv1.weight_momentum"] = np.zeros(3, np.float32)
    blobs["weight_order"] = ["x"]
    path = tmp_path / "caffe2.pkl"
    with open(path, "wb") as f:
        pickle.dump({"blobs": blobs}, f)
    params = load_torch_checkpoint(str(path))
    _assert_params_equal(params, torch_state_dict_to_params(mirror_sd))


def test_ddp_module_prefix(tmp_path, mirror_sd):
    """A DDP-saved dict carries 'module.' on every key; the loader strips it
    in every container format."""
    sd_ddp = {f"module.{k}": v for k, v in mirror_sd.items()}
    path = tmp_path / "ddp.pth"
    torch.save({"model": sd_ddp}, str(path))
    params = load_torch_checkpoint(str(path))
    _assert_params_equal(params, torch_state_dict_to_params(mirror_sd))


def test_url_routes_through_torch_hub(monkeypatch, mirror_sd):
    called = {}

    def fake_load(url, map_location=None):
        called["url"] = url
        return dict(mirror_sd)

    monkeypatch.setattr(torch.hub, "load_state_dict_from_url", fake_load)
    sd = load_torch_state_dict("https://example.org/model_final.pth")
    assert called["url"].startswith("https://example.org/")
    assert set(sd) == set(mirror_sd)


def test_torchvision_scheme_error_without_torchvision():
    try:
        import torchvision  # noqa: F401

        pytest.skip("torchvision installed; scheme would resolve")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="torchvision"):
        load_torch_state_dict("torchvision://resnet50")


def test_repro_diff_tool(tmp_path, capsys):
    """scripts/repro_real275.sh's parity diff: parses the dumped table and
    applies the 0.5 pt budget."""
    import json

    from catre_tpu.tools.repro_diff import main

    table = (
        "objects  bottle  bowl  camera  can  laptop  mug  Avg(6)\n"
        "IoU75    10.00   20.00 30.00   40.0 50.00   60.0 43.60\n"
        "re5te2   1.00    2.00  3.00    4.00 5.00    6.00 45.80\n")
    (tmp_path / "metrics_tab_iter4.txt").write_text(table)
    ref = tmp_path / "ref.json"
    ref.write_text(json.dumps({"IoU75": 43.3, "re5te2": 45.9}))
    assert main([str(tmp_path), str(ref)]) == 0
    ref.write_text(json.dumps({"IoU75": 42.0}))
    assert main([str(tmp_path), str(ref)]) == 1

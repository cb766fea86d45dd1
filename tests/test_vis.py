"""Visualization utilities smoke tests."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from catre_tpu.utils.vis import draw_projected_box3d, grid_show, heatmap


def test_heatmap():
    d = np.random.default_rng(0).uniform(0, 2, (48, 64)).astype(np.float32)
    img = heatmap(d)
    assert img.shape == (48, 64, 3) and img.dtype == np.uint8


def test_draw_projected_box3d():
    K = np.array([[577.5, 0, 319.5], [0, 577.5, 239.5], [0, 0, 1]], np.float32)
    img = np.zeros((480, 640, 3), dtype=np.uint8)
    pose = np.concatenate([np.eye(3), [[0], [0], [1.0]]], axis=1).astype(np.float32)
    scale = np.array([0.2, 0.3, 0.2], np.float32)
    out = draw_projected_box3d(img, scale, pose, K)
    assert out.sum() > 0  # something was drawn
    assert img.sum() == 0  # input untouched


def test_grid_show_saves(tmp_path):
    imgs = [np.zeros((16, 16, 3), dtype=np.uint8), np.ones((16, 16), dtype=np.float32)]
    path = grid_show(imgs, ["a", "b"], row=1, col=2, save_path=str(tmp_path / "g.png"))
    import os.path as osp

    assert osp.exists(path)


def test_draw_projected_kps():
    from catre_tpu.utils.vis import draw_projected_kps

    K = np.array([[577.5, 0, 319.5], [0, 577.5, 239.5], [0, 0, 1]], np.float32)
    img = np.zeros((480, 640, 3), dtype=np.uint8)
    pose = np.concatenate([np.eye(3), [[0], [0], [1.0]]], axis=1).astype(np.float32)
    scale = np.array([0.2, 0.3, 0.2], np.float32)
    kps = np.random.default_rng(0).uniform(-0.5, 0.5, (128, 3)).astype(np.float32)
    out = draw_projected_kps(img, kps, scale, pose, K, color=(255, 0, 0))
    assert out.sum() > 0
    # dots are red only (reference draws (0,0,255) BGR = red in RGB space)
    assert out[..., 0].sum() > 0 and out[..., 1].sum() == 0


def test_event_storage_images(tmp_path):
    """put_image queues images; TensorboardWriter flushes them to the event
    file with image tags readable by the tensorboard event reader."""
    from catre_tpu.utils.events import EventStorage, TensorboardWriter

    storage = EventStorage(0)
    storage.put_scalar("loss", 1.0)
    storage.put_image("input_image", np.zeros((8, 8, 3), dtype=np.uint8))
    assert len(storage._images) == 1
    w = TensorboardWriter(str(tmp_path / "tb"))
    w.write(storage)
    w.close()
    assert storage._images == []  # flushed

    from tensorboard.backend.event_processing import event_accumulator

    ea = event_accumulator.EventAccumulator(str(tmp_path / "tb"))
    ea.Reload()
    assert "input_image" in ea.Tags().get("images", [])

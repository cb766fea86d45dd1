"""Golden tests: our NOCS fixed-IoU mAP implementation vs the reference's
standalone `test_utils.py` (importable without torch/mmcv) on randomized
synthetic predictions."""

import sys

import numpy as np
import pytest

from catre_tpu.eval.nocs_eval import (
    SYNSET_NAMES,
    compute_3d_iou_new,
    compute_RT_degree_cm_symmetry,
    compute_ap_from_matches_scores,
    compute_independent_mAP,
)

sys.path.insert(0, "/root/reference")

ref_tu = pytest.importorskip("core.catre.engine.test_utils")

RNG = np.random.default_rng(5)


def _rand_rot():
    a = RNG.normal(size=(3, 3))
    q, r = np.linalg.qr(a)
    q = q * np.sign(np.diagonal(r))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q


def _rand_rt():
    RT = np.eye(4)
    RT[:3, :3] = _rand_rot()
    RT[:3, 3] = RNG.normal(size=3) * 0.3 + [0, 0, 1]
    return RT


def _rand_result(n_gt=4, n_pred=5):
    gt_class_ids = RNG.integers(1, 7, size=n_gt)
    pred_class_ids = RNG.integers(1, 7, size=n_pred)
    # make some predictions overlap gt
    gt_RTs = np.stack([_rand_rt() for _ in range(n_gt)])
    pred_RTs = np.stack([_rand_rt() for _ in range(n_pred)])
    for i in range(min(n_gt, n_pred) - 1):
        pred_RTs[i] = gt_RTs[i].copy()
        pred_RTs[i][:3, 3] += RNG.normal(size=3) * 0.01
        pred_class_ids[i] = gt_class_ids[i]
    gt_scales = RNG.uniform(0.1, 0.4, size=(n_gt, 3))
    pred_scales = gt_scales[: n_pred].copy() if n_pred <= n_gt else np.concatenate(
        [gt_scales, RNG.uniform(0.1, 0.4, size=(n_pred - n_gt, 3))]
    )
    pred_scales = pred_scales * RNG.uniform(0.9, 1.1, size=pred_scales.shape)
    return {
        "gt_class_ids": gt_class_ids.astype(np.int32),
        "gt_RTs": gt_RTs,
        "gt_scales": gt_scales,
        "gt_handle_visibility": RNG.integers(0, 2, size=n_gt),
        "pred_bboxes": RNG.uniform(1, 400, size=(n_pred, 4)),
        "pred_class_ids": pred_class_ids.astype(np.int32),
        "pred_scales": pred_scales,
        "pred_scores": RNG.uniform(0.3, 1.0, size=n_pred),
        "pred_RTs": pred_RTs,
    }


def test_iou_matches_reference():
    for _ in range(20):
        RT1, RT2 = _rand_rt(), _rand_rt()
        s1 = RNG.uniform(0.1, 0.4, size=3)
        s2 = RNG.uniform(0.1, 0.4, size=3)
        for cname, hv in [("bottle", 1), ("mug", 0), ("mug", 1), ("camera", 1)]:
            ours = compute_3d_iou_new(RT1, RT2, s1, s2, hv, cname, cname)
            ref = ref_tu.compute_3d_iou_new(RT1, RT2, s1, s2, hv, cname, cname)
            assert ours == pytest.approx(ref, abs=1e-9), (cname, hv)


def test_rt_error_matches_reference():
    for _ in range(20):
        RT1, RT2 = _rand_rt(), _rand_rt()
        for cls_id in range(1, 7):
            for hv in (0, 1):
                ours = compute_RT_degree_cm_symmetry(RT1, RT2, cls_id, hv, SYNSET_NAMES)
                ref = ref_tu.compute_RT_degree_cm_symmetry(RT1, RT2, cls_id, hv, SYNSET_NAMES)
                np.testing.assert_allclose(ours, ref, atol=1e-9)


def test_ap_matches_reference():
    for _ in range(10):
        n = 20
        pred_match = RNG.choice([-1, 0, 1, 2], size=n).astype(float)
        scores = RNG.uniform(size=n)
        gt_match = RNG.choice([-1, 0, 1], size=8).astype(float)
        ours = compute_ap_from_matches_scores(pred_match.copy(), scores.copy(), gt_match.copy())
        ref = ref_tu.compute_ap_from_matches_scores(pred_match.copy(), scores.copy(), gt_match.copy())
        assert ours == pytest.approx(ref, abs=1e-12)


def test_full_map_matches_reference():
    results = [_rand_result(4, 5), _rand_result(3, 3), _rand_result(5, 2)]
    kwargs = dict(
        degree_thresholds=[5, 10],
        shift_thresholds=[2, 5],
        iou_3d_thresholds=[0.10, 0.25, 0.50, 0.75],
    )
    ours_iou, ours_pose = compute_independent_mAP(
        [dict(r) for r in results], SYNSET_NAMES, **kwargs
    )
    ref_iou, ref_pose = ref_tu.compute_independent_mAP(
        [dict(r) for r in results], SYNSET_NAMES, **kwargs
    )
    np.testing.assert_allclose(ours_iou, ref_iou, atol=1e-9)
    np.testing.assert_allclose(ours_pose, ref_pose, atol=1e-9)


def test_pairwise_ious_match_scalar_reference():
    """Vectorized (P,G) IoU kernel == per-pair reference calls at 1e-9,
    including mixed classes and mug handle visibility."""
    from catre_tpu.eval.nocs_eval import _sym_pair_mask, pairwise_3d_ious

    for trial in range(5):
        P, G = 6, 4
        pred_RTs = np.stack([_rand_rt() for _ in range(P)])
        gt_RTs = np.stack([_rand_rt() for _ in range(G)])
        pred_scales = RNG.uniform(0.1, 0.4, size=(P, 3))
        gt_scales = RNG.uniform(0.1, 0.4, size=(G, 3))
        pred_cls = RNG.integers(1, 7, size=P)
        gt_cls = RNG.integers(1, 7, size=G)
        gt_hv = RNG.integers(0, 2, size=G)

        sym = _sym_pair_mask(pred_cls, gt_cls, gt_hv, SYNSET_NAMES)
        ours = pairwise_3d_ious(pred_RTs, pred_scales, gt_RTs, gt_scales, sym)
        for i in range(P):
            for j in range(G):
                ref = ref_tu.compute_3d_iou_new(
                    pred_RTs[i], gt_RTs[j], pred_scales[i], gt_scales[j],
                    gt_hv[j], SYNSET_NAMES[pred_cls[i]], SYNSET_NAMES[gt_cls[j]],
                )
                assert ours[i, j] == pytest.approx(ref, abs=1e-9), (i, j)


def test_pairwise_degree_cm_matches_scalar_reference():
    from catre_tpu.eval.nocs_eval import pairwise_degree_cm

    for trial in range(5):
        P, G = 5, 4
        pred_RTs = np.stack([_rand_rt() for _ in range(P)])
        gt_RTs = np.stack([_rand_rt() for _ in range(G)])
        gt_cls = RNG.integers(1, 7, size=G)
        gt_hv = RNG.integers(0, 2, size=G)
        ours = pairwise_degree_cm(pred_RTs, gt_RTs, gt_cls, gt_hv, SYNSET_NAMES)
        for i in range(P):
            for j in range(G):
                ref = ref_tu.compute_RT_degree_cm_symmetry(
                    pred_RTs[i], gt_RTs[j], gt_cls[j], gt_hv[j], SYNSET_NAMES
                )
                np.testing.assert_allclose(ours[i, j], ref, atol=1e-9)


def test_pairwise_degree_cm_180_symmetry_arccos_edge():
    """Near-exact y-flips push the flip trace epsilon-outside [-1, 1]; the
    vectorized branch must reproduce the scalar reference's python-min NaN
    ordering (min(valid, nan) -> valid) bit-for-bit."""
    from catre_tpu.eval.nocs_eval import pairwise_degree_cm

    synset = ["BG", "phone", "eggbox", "glue", "ape", "bottle", "mug"]
    y180 = np.diag([-1.0, 1.0, -1.0])
    n_nan_t2 = 0
    for trial in range(50):
        gt = _rand_rt()
        pred = gt.copy()
        pred[:3, :3] = gt[:3, :3] @ y180  # exact flip: both traces at edges
        ours = float(pairwise_degree_cm(pred[None], gt[None], [1], [1],
                                        synset)[0, 0, 0])
        # python-min oracle over the SAME trace formulation as the kernel
        # (min(t1, nan)=t1 but nan t1 propagates — the reference's exact
        # decision tree, `test_utils.py:676-679`):
        R1 = pred[:3, :3] / np.cbrt(np.linalg.det(pred[:3, :3]))
        R2 = gt[:3, :3] / np.cbrt(np.linalg.det(gt[:3, :3]))
        tr = np.einsum("pik,gik->pg", R1[None], R2[None])[0, 0]
        tr180 = np.einsum("pij,jk,gik->pg", R1[None], y180, R2[None])[0, 0]
        with np.errstate(invalid="ignore"):
            t1 = np.arccos((tr - 1.0) / 2.0)
            t2 = np.arccos((tr180 - 1.0) / 2.0)
        expect = float(min(t1, t2)) * 180.0 / np.pi  # python min semantics
        n_nan_t2 += int(np.isnan(t2))
        np.testing.assert_allclose(ours, expect, atol=1e-9, equal_nan=True)
    # the crafted flips must actually exercise the nan-second-arg branch
    # (where np.minimum would have wrongly propagated NaN)
    assert n_nan_t2 > 0


def test_pairwise_degree_cm_180_symmetry_classes():
    """phone/eggbox/glue take the 180-degree-flip min branch
    (`test_utils.py:676-679`) — LINEMOD-style synsets reachable through the
    synset_names parameter."""
    from catre_tpu.eval.nocs_eval import pairwise_degree_cm

    synset = ["BG", "phone", "eggbox", "glue", "ape", "bottle", "mug"]
    for trial in range(5):
        P, G = 4, 6
        pred_RTs = np.stack([_rand_rt() for _ in range(P)])
        gt_RTs = np.stack([_rand_rt() for _ in range(G)])
        gt_cls = RNG.integers(1, 7, size=G)
        gt_hv = RNG.integers(0, 2, size=G)
        ours = pairwise_degree_cm(pred_RTs, gt_RTs, gt_cls, gt_hv, synset)
        for i in range(P):
            for j in range(G):
                ref = ref_tu.compute_RT_degree_cm_symmetry(
                    pred_RTs[i], gt_RTs[j], gt_cls[j], gt_hv[j], synset
                )
                np.testing.assert_allclose(ours[i, j], ref, atol=1e-9)


def test_combination_map_matches_reference():
    """Joint (IoU AND degree AND shift) mAP golden vs the imported reference
    (`test_utils.py:394-520`)."""
    from catre_tpu.eval.nocs_eval import compute_combination_mAP

    results = [_rand_result(n_gt=RNG.integers(1, 5), n_pred=RNG.integers(1, 6))
               for _ in range(12)]
    ours = compute_combination_mAP(
        results, SYNSET_NAMES, degree_thresholds=[5, 10, 20],
        shift_thresholds=[0.05, 0.1, 0.2], iou_3d_thresholds=[0.25, 0.5, 0.75])
    theirs = ref_tu.compute_combination_mAP(
        results, SYNSET_NAMES, degree_thresholds=[5, 10, 20],
        shift_thresholds=[0.05, 0.1, 0.2], iou_3d_thresholds=[0.25, 0.5, 0.75])
    np.testing.assert_allclose(ours, theirs, atol=1e-9)


def test_standalone_scorer_cli(tmp_path, capsys):
    """`python -m catre_tpu.eval.nocs_eval results.pkl` scores a pkl like the
    reference's `evaluate(path)` tool (`test_utils.py:927-965`)."""
    import pickle

    from catre_tpu.eval.nocs_eval import _main

    results = {f"scene/{i:04d}": _rand_result(3, 3) for i in range(6)}
    path = tmp_path / "results.pkl"
    with open(path, "wb") as f:
        pickle.dump(results, f)
    assert _main([str(path)]) == 0
    out = capsys.readouterr().out
    assert "3D IoU at 75" in out and "5 degree, 2cm" in out
    assert _main([str(path), "--combination"]) == 0

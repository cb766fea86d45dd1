"""Data pipeline: dataset dicts -> padded, static-shape instance batches.

Behavioral reference: `core/catre/datasets/data_loader.py`
(read_data_train:403, read_data_test:660, builders:877/926) and
`core/catre/engine/batching.py` (instance flattening).

TPU-native split of responsibilities:
  host   — image/depth/mask decode, gt assembly
  device — backprojection + depth augmentation + per-instance ball-crop
           sampling (`ops.sampling.batch_ball_crop`), everything downstream
The reference does all of this per-instance on CPU dataloader workers
(`data_loader.py:576-611`); here the gathers run vectorized on the chip and
the host only ships (u16 depth, bit-packed masks) once per image — or, with
`cache_decoded="device"`, nothing at all after a one-time preload.

RNG design: every random draw is POSITION-ADDRESSABLE — seeded from
(seed, stream, position) rather than drawn from sequential stateful
generators. `skip(n)` therefore fast-forwards the loader exactly (no decode,
no replay), which makes `--resume` training bit-deterministic: a resumed run
consumes the identical record/augmentation stream a straight-through run
would have (the reference's torch DataLoader cannot do this — its worker RNG
state is lost on restart).
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from . import assets, meta
from .nocs import rle_to_binary_mask

logger = logging.getLogger(__name__)

# RNG stream tags for the (seed, stream, position) seeding scheme
_STREAM_HOST = 0     # per-record host-stage draws (test occlusion ablation)
_STREAM_KEYS = 1     # per-image device sampler/aug PRNG key material
_STREAM_EPOCH = 2    # per-epoch shuffle permutations (rank-shared)
_STREAM_COLOR = 3    # per-image color/background augmentation


def _derive_rng(seed: int, stream: int, pos: int) -> np.random.Generator:
    return np.random.default_rng(np.random.SeedSequence((seed, stream, pos)))


@dataclass
class LoaderConfig:
    """INPUT.* data-pipeline knobs of the shipped config."""

    num_pcl: int = 1024
    depth_sample_ball_ratio: float = 0.6
    sample_depth_from_ball: bool = True
    fps_sample: bool = False
    # INPUT.SAMPLE_WINDOW: per-instance mask-bbox-centered candidate window
    # (0 = full image; -1 = auto, the smallest exactness-preserving window
    # for the split's annotation bboxes; see auto_sample_window and
    # ops/sampling.py batch_ball_crop)
    sample_window: int = 0
    aug_depth: bool = True
    drop_depth_prob: float = 0.5
    drop_depth_ratio: float = 0.2
    add_noise_depth_prob: float = 0.9
    add_noise_depth_level: float = 0.01  # reference default (common_base.py:38)
    occlude_mask_test: bool = False
    # INPUT.KPS_TYPE: "fps" makes the loader ship per-instance
    # `obj_fps_points` looked up by inst_name (ref `data_loader.py:623-650`
    # train / `:737-752` test — the "use gt model at test" ablation);
    # other types ship nothing extra (kps built downstream)
    kps_type: str = "mean_shape"
    num_kps: int = 1024  # INPUT.NUM_KPS (fps pickle key / axis-kps count)
    # INPUT.USE_CMRA_MODEL (ref default True, `catre_base.py:70`): on cmra
    # (CAMERA) records the prior points are the PER-INSTANCE model points
    # from MEAN_MODEL_PATH instead of the category mean shape
    # (`data_loader.py:633-637`)
    use_cmra_model: bool = True
    with_nocs: bool = False  # sample aligned NOCS coords (nocs-head variants)
    pcl_with_color: bool = False  # sample aligned RGB (INPUT.PCL_WITH_COLOR)
    color_aug_prob: float = 0.0   # INPUT.COLOR_AUG_PROB (train, RGB path)
    # INPUT.COLOR_AUG_SYN_ONLY: restrict color aug to synthetic images.
    # NOTE the reference's gate is a NO-OP BUG — both branches of
    # `data_loader.py:501-504` apply the identical augmentation; implemented
    # here with the INTENDED semantics (real images skipped when set)
    color_aug_syn_only: bool = False
    color_aug_type: str = "aae"   # INPUT.COLOR_AUG_TYPE (roi10d|aae|code)
    color_aug_code: str = ""      # INPUT.COLOR_AUG_CODE (for type "code")
    change_bg_prob: float = 0.0   # INPUT.CHANGE_BG_PROB (train, RGB path)
    truncate_fg: bool = False     # INPUT.TRUNCATE_FG (bg-replace occlusion)
    bg_image_dir: str = ""        # INPUT.BG_IMGS_ROOT (pool root)
    bg_type: str = "file_dir"     # INPUT.BG_TYPE: VOC_table|coco|VOC|SUN2012|file_dir
    num_bg_imgs: int = 10000      # INPUT.NUM_BG_IMGS (pool subsample)
    bg_keep_aspect_ratio: bool = True  # INPUT.BG_KEEP_ASPECT_RATIO
    max_objs_per_image: int = 8
    # DATALOADER.SAMPLER_TRAIN: TrainingSampler | RepeatFactorTrainingSampler
    # (`my_distributed_sampler.py:12-55,172-200`)
    sampler_train: str = "TrainingSampler"
    # ship per-instance (M, num_pcl, 3) mean-shape POINTS in every batch.
    # The packed/table test path gathers keypoints on device from the ONE
    # resident (C, K, 3) table instead (eval/evaluator.py run_inference), so
    # eval loaders set this False: the per-image host gather + the 6.3 MB
    # per-batch concat/upload they'd otherwise pay is the single biggest
    # host cost on a 1-CPU machine (docs/PERF.md "Round-4 TPU captures").
    # obj_mean_scales (tiny, consumed by the packed refine args) always ship.
    ship_mean_points: bool = True
    repeat_threshold: float = 0.0  # DATALOADER.REPEAT_THRESHOLD
    # decoded-tensor cache (DATALOADER.CACHE_DECODED): "" = decode every
    # epoch (reference behavior); "ram" = memoize the host decode per record
    # (u16 depth + bit-packed masks, ~1 MB/frame — skips cv2 from epoch 2);
    # "device" = additionally keep the stacked per-record tensors resident in
    # HBM, so steady-state training ships only PRNG keys + record indices per
    # step (the answer to input-starved chips on low-bandwidth hosts)
    cache_decoded: str = ""
    # optional per-frame previous-frame estimates for the last_frame init
    # mode (INPUT.INIT_POSE_TRAIN_PATH): dict scene_im_id -> (n_inst, 3, 5)
    # [R | t | s] arrays aligned with annotation order
    init_pose_train_path: str = ""
    bbox_type_test: str = "est"       # est | gt
    init_pose_type_test: str = "est"  # est | gt_noise | canonical
    # gt_noise test mode (validation without external detections)
    noise_rot_std_test: float = 15.0
    noise_rot_max_test: float = 45.0
    noise_trans_std_test: tuple = ((0.01, 0.01, 0.005), (0.01, 0.01, 0.01), (0.005, 0.005, 0.01))
    noise_scale_std_test: tuple = ((0.001, 0.005, 0.001), (0.005, 0.001, 0.005), (0.01, 0.01, 0.01))


def repeat_factors_from_category_frequency(dataset_dicts: list,
                                           repeat_thresh: float) -> np.ndarray:
    """Per-image repeat factors r(I) = max_{c in I} max(1, sqrt(t / f(c)))
    from category image-frequencies (LVIS oversampling;
    `my_distributed_sampler.py:85-130`)."""
    from collections import defaultdict

    category_freq: dict = defaultdict(int)
    for rec in dataset_dicts:
        for cat_id in {a["category_id"] for a in rec.get("annotations", [])}:
            category_freq[cat_id] += 1
    num_images = len(dataset_dicts)
    category_rep = {
        cat_id: max(1.0, np.sqrt(repeat_thresh / (freq / num_images)))
        for cat_id, freq in category_freq.items()
    }
    return np.asarray([
        max({category_rep[c] for c in
             {a["category_id"] for a in rec.get("annotations", [])}} or {1.0})
        for rec in dataset_dicts
    ], dtype=np.float64)


def auto_sample_window(dataset_dicts: list, phase: str) -> int:
    """Resolve INPUT.SAMPLE_WINDOW=-1: the smallest multiple of 32 covering
    every annotation bbox in the split (test uses the detection bbox_est the
    masks come from; train the gt bbox, which IS the gt mask's bbox). A
    window that covers each instance's mask bbox makes the windowed
    ball-crop EXACTLY equal to the full-field sampler (candidates are
    mask∧depth pixels), so auto mode keeps reference-exact semantics while
    paying only the window-sized per-instance cost. Returns 0 (full frame)
    when any annotation lacks a usable bbox."""
    m = 0.0
    for rec in dataset_dicts:
        for a in rec.get("annotations", []):
            bb = a.get("bbox_est" if phase == "test" else "bbox",
                       a.get("bbox"))
            if bb is None:
                return 0
            x1, y1, x2, y2 = [float(v) for v in bb]
            m = max(m, x2 - x1, y2 - y1)
    if m <= 0:
        return 0
    return int(-(-(m + 2.0) // 32) * 32)  # +2 px slack, ceil to mult of 32


def _quiet_cv2():
    """cv2 with its thread pool disabled: the decode work runs on our own
    loader threads and opencv's internal pool oversubscribes the host
    (reference guard: `main_catre.py:17-20` cv2.setNumThreads(0))."""
    import cv2

    try:
        cv2.setNumThreads(0)
    except Exception:
        pass
    return cv2


def load_depth(path: str) -> np.ndarray:
    """16-bit depth png -> meters; handles the encoded-3ch variant
    (`cat_data_utils.py:447-460`)."""
    cv2 = _quiet_cv2()

    depth = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if depth is None:
        raise FileNotFoundError(path)
    if depth.ndim == 3:
        # NOTE: encoded depth: high byte in G, low byte in B
        depth16 = depth[:, :, 1].astype(np.uint16) * 256 + depth[:, :, 2].astype(np.uint16)
        depth = depth16
    return depth.astype(np.float32) / 1000.0


def occlude_mask_by_bbox(rng: np.random.Generator, mask: np.ndarray, bbox) -> np.ndarray:
    """Test-time occlusion ablation (INPUT.OCCLUDE_MASK_TEST): zero one
    quadrant of the bbox region, trying the reference's 4 variants in order
    until the mask actually shrinks (`cat_data_utils.py:15-48`; note the
    reference indexes rows with x and columns with y — reproduced)."""
    x1, y1, x2, y2 = [int(v) for v in bbox]
    for a in (0, 1, 2, 3):
        occluded = mask.copy()
        top_x = int(x1 * 0.75 + x2 * 0.25)
        end_x = int(x1 * 0.25 + x2 * 0.75)
        top_y = int(y1 * 0.75 + y2 * 0.25)
        end_y = int(y1 * 0.25 + y2 * 0.75)
        if a == 0:
            occluded[top_x:x2, top_y:y2] = 0
        elif a == 1:
            occluded[x1:end_x, top_y:y2] = 0
        elif a == 2:
            occluded[x1:end_x, y1:end_y] = 0
        else:
            occluded[top_x:x2, y1:end_y] = 0
        if mask.sum() > 0 and occluded.sum() / mask.sum() < 1.0:
            return occluded
    return mask


def mask_from_annotation(anno: dict, h: int, w: int) -> np.ndarray:
    """Instance mask: RLE segmentation if present, else filled bbox region
    (the `boxes_to_masks` fallback, `engine_utils.py:323-333`)."""
    if "segmentation" in anno and anno["segmentation"] is not None:
        return rle_to_binary_mask(anno["segmentation"])
    bbox = anno.get("bbox_est", anno.get("bbox"))
    m = np.zeros((h, w), dtype=bool)
    if bbox is not None:
        x1, y1, x2, y2 = [int(round(v)) for v in bbox]
        x1, x2 = max(0, x1), min(w - 1, x2)
        y1, y2 = max(0, y1), min(h - 1, y2)
        m[y1 : y2 + 1, x1 : x2 + 1] = True
    return m


def _mask_pack_dtype(m: int):
    """Narrowest uint dtype with >= m bits (bit-per-instance mask packing),
    or None when m > 32 — the caller then ships unpacked (M, H, W) bool masks
    (REAL275 never exceeds ~20 instances; the packed path is a transfer
    optimization, not a capability limit)."""
    for dt, bits in ((np.uint8, 8), (np.uint16, 16), (np.uint32, 32)):
        if m <= bits:
            return dt
    return None


def _pack_masks(masks: np.ndarray):
    """(M, H, W) bool -> (H, W) uint with bit i set where instance i is
    masked; passthrough (the bool stack itself) when M > 32."""
    dt = _mask_pack_dtype(masks.shape[0])
    if dt is None:
        return masks
    p = np.zeros(masks.shape[1:], dtype=dt)
    for i in range(masks.shape[0]):
        p |= masks[i].astype(dt) << dt(i)
    return p


def _quantize_depth(depth: np.ndarray) -> np.ndarray:
    """f32 meters -> raw uint16 millimeters when exactly representable (depth
    decoded by load_depth always is: u16/1000 -> round(x*1000) round-trips
    bit-identically). Returns f32 unchanged otherwise (synthetic depth with
    out-of-range values)."""
    if float(depth.max()) * 1000.0 < 65535.5 and float(depth.min()) >= 0.0:
        return np.round(depth * 1000.0).astype(np.uint16)
    return depth


def _wants_mask_bbox(cfg: LoaderConfig, phase: str) -> bool:
    """True when the sampler's fused windowed path will actually read the
    host-precomputed mask bounds (matches `fused_window` in
    `_make_one_image_fn`); otherwise the per-instance full-frame reductions
    are skipped and the sentinel rows ship as-is (the non-fused windowed
    path re-derives the bbox on device)."""
    return (cfg.sample_window > 0 and not cfg.fps_sample
            and not (cfg.aug_depth and phase == "train")
            and not os.environ.get("CATRE_DISABLE_FUSED_WINDOW"))


def _gather_image_record(record: dict, cfg: LoaderConfig, phase: str,
                         rng: np.random.Generator, mean_points: np.ndarray,
                         mean_scales: np.ndarray) -> dict | None:
    """Host part of one image: decode + per-instance gt assembly, padded to
    cfg.max_objs_per_image. Depth augmentation happens DEVICE-side (inside
    the group sampler) so depth ships as u16 (`depth_ship`) in both phases."""
    annos = record.get("annotations", [])
    if not annos:
        return None
    annos = annos[: cfg.max_objs_per_image]
    n = len(annos)
    h, w = record["height"], record["width"]
    m = cfg.max_objs_per_image

    depth = load_depth(record["depth_file"])

    masks = np.zeros((m, h, w), dtype=bool)
    classes = np.zeros(m, dtype=np.int32)
    poses = np.tile(np.eye(3, 4, dtype=np.float32), (m, 1, 1))
    poses[:, 2, 3] = 1.0
    scales = np.full((m, 3), 0.1, dtype=np.float32)
    sym = np.zeros(m, dtype=bool)
    handles = np.ones(m, dtype=np.int32)
    bboxes = np.zeros((m, 4), dtype=np.float32)
    scores = np.zeros(m, dtype=np.float32)
    pose_est = poses.copy()
    scale_est = scales.copy()
    valid = np.zeros(m, dtype=bool)
    # per-instance mask bounds for the windowed sampler (empty-instance
    # sentinel matches the device-side reduction: min over h / max over -1)
    mask_bbox = np.empty((m, 4), dtype=np.int32)
    mask_bbox[:, 0], mask_bbox[:, 1] = h, -1
    mask_bbox[:, 2], mask_bbox[:, 3] = w, -1

    ship_fps = cfg.kps_type.lower() == "fps"
    fps_pts = np.zeros((m, cfg.num_kps, 3), dtype=np.float32) if ship_fps else None
    # INPUT.USE_CMRA_MODEL: per-instance model points replace the category
    # mean shape as the prior on cmra records (`data_loader.py:633-637`
    # train; the test twin `:743-744` reads `inst_name` BEFORE its only
    # assignment `:751` — a latent reference NameError; the intended
    # per-instance lookup is implemented here for both phases)
    inst_prior = cfg.use_cmra_model and "cmra" in record.get("dataset_name", "")

    for i, anno in enumerate(annos):
        classes[i] = anno["category_id"]
        handles[i] = anno.get("mug_handle", 1)
        obj_name = meta.ID2OBJ[anno["category_id"] + 1]
        sym[i] = meta.sym_flag(obj_name, handles[i])
        masks[i] = mask_from_annotation(anno, h, w)
        if phase == "test" and cfg.occlude_mask_test:
            bb = anno.get("bbox_est", anno.get("bbox"))
            if bb is not None:
                masks[i] = occlude_mask_by_bbox(rng, masks[i], bb)
        scores[i] = anno.get("score", 1.0)
        valid[i] = True
        if phase == "train" or "pose" in anno:
            poses[i] = anno["pose"]
            scales[i] = anno["scale"]
        if "pose_est" in anno:
            pose_est[i] = anno["pose_est"]
            scale_est[i] = anno["scale_est"]
        bb = anno.get("bbox_est", anno.get("bbox"))
        if bb is not None:
            bboxes[i] = bb
        if ship_fps:
            if "inst_name" not in anno:
                raise KeyError(
                    f"INPUT.KPS_TYPE='fps' needs per-instance 'inst_name' in "
                    f"every annotation (the reference's gt-model ablation, "
                    f"data_loader.py:751) — missing on {record.get('scene_im_id')}")
            fps_pts[i] = assets.get_fps_points(anno["inst_name"], cfg.num_kps)
        if _wants_mask_bbox(cfg, phase):
            rows = masks[i].any(axis=1)
            if rows.any():
                cols = masks[i].any(axis=0)
                rnz, cnz = np.flatnonzero(rows), np.flatnonzero(cols)
                mask_bbox[i] = (rnz[0], rnz[-1], cnz[0], cnz[-1])
                if max(rnz[-1] - rnz[0], cnz[-1] - cnz[0]) >= cfg.sample_window:
                    global _WINDOW_TRUNC_WARNED
                    if not _WINDOW_TRUNC_WARNED:
                        _WINDOW_TRUNC_WARNED = True
                        logger.warning(
                            "SAMPLE_WINDOW=%d smaller than a %dx%d mask bbox "
                            "(%s) — border pixels of such instances are "
                            "excluded from the ball-crop candidates; use a "
                            "larger window, -1 (auto), or 0 for exactness",
                            cfg.sample_window, rnz[-1] - rnz[0] + 1,
                            cnz[-1] - cnz[0] + 1, record.get("scene_im_id"))

    mp = None
    if cfg.ship_mean_points or inst_prior:
        mp = mean_points[classes]  # fancy-index copy: safe to overwrite rows
        if inst_prior:
            shapes = assets.load_mean_shapes()
            for i, anno in enumerate(annos):
                pts = shapes.get(anno.get("inst_name", ""))
                if pts is None:
                    # graceful degradation (the reference would KeyError):
                    # keep the category mean when the instance has no entry
                    global _CMRA_FALLBACK_WARNED
                    if not _CMRA_FALLBACK_WARNED:
                        _CMRA_FALLBACK_WARNED = True
                        logger.warning(
                            "USE_CMRA_MODEL: no per-instance model points for "
                            "%r in MEAN_MODEL_PATH — falling back to the "
                            "category mean shape", anno.get("inst_name"))
                elif pts.shape != mp[i].shape:
                    raise ValueError(
                        f"USE_CMRA_MODEL: model points for "
                        f"{anno.get('inst_name')!r} have shape {pts.shape}, "
                        f"expected {mp[i].shape}")
                else:
                    mp[i] = pts

    return {
        "depth_ship": _quantize_depth(depth),
        "masks_packed": _pack_masks(masks),
        "mask_bbox": mask_bbox,
        "fg_any": masks.any(axis=0) if (cfg.pcl_with_color and cfg.change_bg_prob > 0) else None,
        "K": np.asarray(record["cam"], dtype=np.float32),
        "obj_cls": classes,
        "obj_pose": poses,
        "obj_scale": scales,
        "sym_flag": sym,
        "mug_handle": handles,
        "obj_bbox": bboxes,
        "score": scores,
        "obj_pose_est": pose_est,
        "obj_scale_est": scale_est,
        "valid": valid,
        **({"obj_mean_points": mp} if mp is not None else {}),
        **({"obj_fps_points": fps_pts} if ship_fps else {}),
        **({"cmra_prior": True} if inst_prior else {}),
        "obj_mean_scales": mean_scales[classes],
        "scene_im_id": record["scene_im_id"],
        "file_name": record.get("file_name", ""),
        "n_insts": n,
    }


# jitted samplers shared across loader instances, keyed by the config fields
# they close over: a fresh jax.jit per CATRELoader would re-trace (and pay a
# compile-cache round trip) for every loader built — one per periodic eval
_SAMPLER_CACHE: dict = {}

# once-per-process window-truncation warning (see _gather_image_record)
_WINDOW_TRUNC_WARNED = False

# once-per-process USE_CMRA_MODEL missing-instance fallback warning
_CMRA_FALLBACK_WARNED = False

# Decoded-tensor caches shared ACROSS loader instances of the same dataset +
# config (round-4: the e2e eval pipeline on a 1-CPU host spent ~half of a
# warm pass re-decoding and re-uploading a cache an earlier loader instance
# already built — docs/PERF.md "Round-4 TPU captures"). Keyed by the dataset
# list identity + every cfg field `_gather_image_record`/`_build_device_cache`
# depend on; the registry holds a strong ref to at most _DECODED_CACHE_MAX
# entries (insertion-order eviction). The cache stores DECODED RECORD TENSORS
# only — never RNG state — so positional-key determinism (resume contract) is
# unaffected. In-place mutation of a dataset's annotations between loader
# constructions would go stale here: disable with CATRE_SHARE_DECODED_CACHE=0
# (the test-time est-injection tools build their dicts before any loader).
_DECODED_CACHE_REGISTRY: dict = {}
_DECODED_CACHE_MAX = 4


def clear_decoded_caches() -> None:
    """Drop every registry entry (and its pinned dataset dicts / HBM stacks —
    freed once no live loader still references them). Insertion-order
    eviction only runs on new inserts, so tools that sweep many datasets or
    configs in one process should call this between sweeps to release the
    multi-GB device-cache stacks eagerly."""
    _DECODED_CACHE_REGISTRY.clear()


def _sampler_cache_key(cfg: LoaderConfig, kind: str, train_aug: bool):
    key = (kind, cfg.depth_sample_ball_ratio, cfg.num_pcl, cfg.fps_sample,
           cfg.max_objs_per_image, train_aug, cfg.sample_window,
           bool(os.environ.get("CATRE_DISABLE_FUSED_WINDOW")),
           os.environ.get("CATRE_WINDOW_SELECTION", "topk"))
    if train_aug:
        key += (cfg.drop_depth_prob, cfg.drop_depth_ratio,
                cfg.add_noise_depth_prob, cfg.add_noise_depth_level)
    return key


def _make_one_image_fn(cfg: LoaderConfig, train_aug: bool):
    """Device pipeline for one image: u16 decode -> (train) depth aug ->
    backproject -> masked ball-crop. `packed` is the bit-packed (H, W) uint
    mask word, or the unpacked (M, H, W) bool stack when M > 32.

    With a window and no depth aug (the windowed test path), the whole
    per-image pipeline runs through `batch_ball_crop_from_depth`: each
    instance slices its own depth/mask-word window using the host-computed
    `mask_bbox`, so the full-frame cloud, the unpacked masks, and the
    per-instance full-frame bbox reductions never materialize (bit-identical
    outputs). Depth aug keeps the full-frame path — its drop/noise fields
    are frame-aligned."""
    from .aug import aug_depth
    from ..geom.transforms import backproject
    from ..ops.sampling import batch_ball_crop, batch_ball_crop_from_depth

    M = cfg.max_objs_per_image
    # CATRE_DISABLE_FUSED_WINDOW=1 forces the materialized-cloud windowed
    # path (bit-identical output) — kept for perf A/Bs of the fused path
    fused_window = (cfg.sample_window > 0 and not train_aug
                    and not cfg.fps_sample
                    and not os.environ.get("CATRE_DISABLE_FUSED_WINDOW"))
    # CATRE_WINDOW_SELECTION=packed_sort switches the windowed in-ball
    # selection to the packed-u32 single-operand sort (see ball_crop_indices)
    selection = os.environ.get("CATRE_WINDOW_SELECTION", "topk")

    def one(key, depth, K, packed, poses, scales, mask_bbox):
        h, w = depth.shape
        if fused_window and (cfg.sample_window < h or cfg.sample_window < w):
            return batch_ball_crop_from_depth(
                key, depth, K, packed, mask_bbox, poses, scales,
                ratio=cfg.depth_sample_ball_ratio, num_points=cfg.num_pcl,
                window_size=cfg.sample_window, selection=selection,
            )
        if depth.dtype == jnp.uint16:
            # depth ships as raw millimeters (half the bytes of f32);
            # f32(u16)/1000 is exactly rounded, bit-identical to the host's
            # load_depth value
            depth = depth.astype(jnp.float32) / 1000.0
        if train_aug:
            # train-phase depth aug runs here, device-side (reference does it
            # on host workers, `data_loader.py:530-543`, which would force an
            # f32 depth transfer)
            key, k_aug = jax.random.split(key)
            depth = aug_depth(
                k_aug, depth, drop_depth_prob=cfg.drop_depth_prob,
                drop_depth_ratio=cfg.drop_depth_ratio,
                add_noise_depth_prob=cfg.add_noise_depth_prob,
                add_noise_depth_level=cfg.add_noise_depth_level,
            )
        cloud = backproject(depth, K)
        if packed.ndim == 3:  # unpacked (M, H, W) bool fallback for M > 32
            masks = packed
        else:
            bits = jnp.arange(M, dtype=packed.dtype)[:, None, None]
            masks = (jnp.right_shift(packed[None, :, :], bits) & 1).astype(bool)
        return batch_ball_crop(
            key, cloud, masks, poses, scales,
            ratio=cfg.depth_sample_ball_ratio, num_points=cfg.num_pcl,
            fps_sample=cfg.fps_sample, window_size=cfg.sample_window,
        )

    return one


def _make_group_sampler(cfg: LoaderConfig, train_aug: bool):
    """Group-level device pipeline vmapped over a whole flush group of images
    in ONE jitted dispatch. Per-image dispatches dominate the input pipeline
    on remote/high-latency device links (measured 4.7 img/s per-image vs one
    call per ims_per_batch group); batching them amortizes the launch latency
    and gives XLA G x M instances of parallel work instead of M."""
    ck = _sampler_cache_key(cfg, "group", train_aug)
    if ck in _SAMPLER_CACHE:
        return _SAMPLER_CACHE[ck]

    one = _make_one_image_fn(cfg, train_aug)

    @jax.jit
    def sample(keys, depths, Ks, packed, poses, scales, mask_bboxes):
        # NOTE: do NOT fold the (G, M, P, 3) -> (G*M, P, 3) flatten into this
        # program — measured 1393 -> 935 obj/s pipeline e2e (the reshape
        # breaks the sampler's output fusion / layout; the eager reshape in
        # _flatten fully overlaps with device work and is free in practice).
        return jax.vmap(one)(keys, depths, Ks, packed, poses, scales,
                             mask_bboxes)

    _SAMPLER_CACHE[ck] = sample
    return sample


def _make_cached_group_sampler(cfg: LoaderConfig, train_aug: bool):
    """Device-cache variant: the per-record tensors live in HBM; the host
    ships only (keys, record indices) per group and the gathers happen
    on-device."""
    ck = _sampler_cache_key(cfg, "cached_group", train_aug)
    if ck in _SAMPLER_CACHE:
        return _SAMPLER_CACHE[ck]

    one = _make_one_image_fn(cfg, train_aug)

    @jax.jit
    def sample(depth_all, packed_all, K_all, pose_all, scale_all, bbox_all,
               keys, idx):
        def one_i(key, i):
            return one(key, depth_all[i], K_all[i], packed_all[i],
                       pose_all[i], scale_all[i], bbox_all[i])

        # no in-program flatten — see the note in _make_group_sampler
        return jax.vmap(one_i)(keys, idx)

    _SAMPLER_CACHE[ck] = sample
    return sample


def _make_candidates_builder(cfg: LoaderConfig):
    """One-time jit that extracts the deterministic ball-crop half
    (`ops.sampling.batch_ball_crop_candidates`) for a chunk of device-cache
    rows. Run once per record at frozen-plan build; eval passes then pay
    only the randomized selection (docs/PERF.md round-5: the candidate body
    is ~2/3 of the sampler's device time)."""
    ck = _sampler_cache_key(cfg, "cand_build", False)
    if ck in _SAMPLER_CACHE:
        return _SAMPLER_CACHE[ck]

    from ..ops.sampling import batch_ball_crop_candidates

    @jax.jit
    def build(depth_all, packed_all, K_all, pose_all, scale_all, bbox_all,
              idx):
        def one_i(i):
            return batch_ball_crop_candidates(
                depth_all[i], K_all[i], packed_all[i], bbox_all[i],
                pose_all[i], scale_all[i],
                ratio=cfg.depth_sample_ball_ratio,
                window_size=cfg.sample_window)

        return jax.vmap(one_i)(idx)

    _SAMPLER_CACHE[ck] = build
    return build


def _make_presampled_group_sampler(cfg: LoaderConfig, img_w: int, wsw: int):
    """Frozen-eval group sampler over precomputed candidates: ships
    (keys, rows) like the cached sampler but replays only the randomized
    selection + gather. Bit-identical outputs to `_make_cached_group_sampler`
    (same per-image key split, same priority draw, same selection — pinned
    by tests/test_sampling.py::test_presampled_bit_identical)."""
    ck = _sampler_cache_key(cfg, f"presel_{img_w}_{wsw}", False)
    if ck in _SAMPLER_CACHE:
        return _SAMPLER_CACHE[ck]

    from ..ops.sampling import batch_select_from_candidates

    selection = os.environ.get("CATRE_WINDOW_SELECTION", "topk")

    @jax.jit
    def sample(pts_all, inside_all, nin_all, org_all, keys, idx):
        def one_i(key, i):
            return batch_select_from_candidates(
                key, pts_all[i], inside_all[i], nin_all[i], org_all[i],
                num_points=cfg.num_pcl, img_w=img_w, wsw=wsw,
                selection=selection)

        return jax.vmap(one_i)(keys, idx)

    _SAMPLER_CACHE[ck] = sample
    return sample


class CATRELoader:
    """Builds flattened instance batches for train or test.

    Train (`build_catre_train_loader`, `data_loader.py:877-923`): infinite
    shuffled epochs over images; batches of `ims_per_batch` images flattened
    into one padded object batch. Ball radius uses the GT pose/scale
    (train) or the external estimate (test), matching `read_data_train:584`
    vs `read_data_test:758`.
    """

    def __init__(self, dataset_dicts: list, cfg: LoaderConfig, phase: str = "train",
                 ims_per_batch: int = 16, seed: int = 0, max_objs_train: int = 128,
                 num_workers: int = 0, rank: int = 0, world_size: int = 1,
                 device_batches: bool = False, defer_selection: bool = False):
        assert phase in ("train", "test")
        self.dicts = dataset_dicts
        if cfg.sample_window == -1:
            from dataclasses import replace

            cfg = replace(cfg, sample_window=auto_sample_window(
                dataset_dicts, phase))
            logger.info("SAMPLE_WINDOW=-1 resolved to %d", cfg.sample_window)
        self.cfg = cfg
        self.phase = phase
        self.ims_per_batch = ims_per_batch
        self.max_objs_train = max_objs_train
        self.num_workers = num_workers
        self.rank = rank
        self.world_size = world_size
        self.seed = int(seed)
        # device_batches: leave the sampled clouds ON DEVICE (single-process,
        # train OR test): the consumer jits over them directly, skipping the
        # sampler-output fetch AND the batch re-upload (2 x ~12 MB per B=512
        # batch through a 78 MB/s relay link; at test, 2 x ~3 MB per
        # 32-image group). Incompatible with the per-point-index paths
        # (nocs/rgb) and the multi-process global-batch assembly
        # (host_local_array_to_global_array wants host numpy).
        self.device_batches = bool(device_batches)
        # defer_selection: frozen-eval batches carry the presampled candidate
        # refs + per-group keys/rows instead of a sampled pcl; the consumer
        # (run_inference) fuses selection + refine into ONE device dispatch
        # per group (docs/PERF.md round-5: two programs per group leave a
        # measurable inter-dispatch gap on the relay-attached chip). Falls
        # back to normal frozen batches when the presampled path is inactive.
        self.defer_selection = bool(defer_selection)
        if self.device_batches and (cfg.with_nocs or cfg.pcl_with_color):
            raise ValueError("device_batches is incompatible with WITH_NOCS /"
                             " PCL_WITH_COLOR (they consume host pixel indices)")
        # position counter of this rank's record stream; skip() advances it.
        # All randomness derives from (seed, stream, position) so the stream
        # is identical whether positions are consumed or skipped.
        self._pos = 0
        self._train_aug = cfg.aug_depth and phase == "train"
        self._sampler = _make_group_sampler(cfg, self._train_aug)
        self._mean_points = assets.mean_shape_array()
        self._mean_scales = meta.mean_scales_array()
        self._perm_cache: tuple | None = None  # (epoch, index array)
        self._epoch_cum = [0]  # cumulative epoch sizes for _index_at
        self._rep_factors = None
        if phase == "train" and cfg.sampler_train == "RepeatFactorTrainingSampler":
            self._rep_factors = repeat_factors_from_category_frequency(
                dataset_dicts, cfg.repeat_threshold)
        elif phase == "train" and cfg.sampler_train not in ("", "TrainingSampler"):
            raise ValueError(f"unknown SAMPLER_TRAIN {cfg.sampler_train!r}")
        self._color_augmentor = None
        if cfg.pcl_with_color and cfg.color_aug_prob > 0 and phase == "train":
            from .aug_color import build_color_augmentor

            self._color_augmentor = build_color_augmentor(
                cfg.color_aug_type, cfg.color_aug_code, seed=seed)
        self._last_frame = None
        if cfg.init_pose_train_path:
            import pickle

            with open(cfg.init_pose_train_path, "rb") as f:
                self._last_frame = pickle.load(f)

        self.cache_mode = cfg.cache_decoded or ""
        if self.cache_mode not in ("", "ram", "device"):
            raise ValueError(f"unknown cache_decoded mode {self.cache_mode!r}")
        if self.cache_mode:
            if cfg.occlude_mask_test and phase == "test":
                raise ValueError("cache_decoded is incompatible with "
                                 "OCCLUDE_MASK_TEST (per-epoch mask mutation)")
            if cfg.with_nocs or cfg.pcl_with_color:
                raise ValueError("cache_decoded supports the depth-only path "
                                 "(WITH_NOCS / PCL_WITH_COLOR need per-point "
                                 "pixel indices and image decode)")
        self._ram_cache: dict = {}
        self._dev = None
        # positional image keys are pure functions of (seed, g): memoize at
        # test time (bounded by the dataset size; reset_stream / repeated
        # eval passes redraw the identical stream) — SeedSequence+PCG64
        # construction is ~50 us/image of pure host serial work
        self._key_memo: dict | None = {} if phase == "test" else None
        shared = None
        if self.cache_mode and os.environ.get(
                "CATRE_SHARE_DECODED_CACHE", "1") != "0":
            ck = self._decoded_cache_key()
            shared = _DECODED_CACHE_REGISTRY.get(ck)
            # the key leads with id(self.dicts): the entry pins the dicts
            # list alive (strong ref) so the id cannot be recycled by a NEW
            # dataset after GC — verify identity anyway, evict on mismatch
            if shared is not None and shared["dicts"] is not self.dicts:
                _DECODED_CACHE_REGISTRY.pop(ck, None)
                shared = None
            if shared is None:
                while len(_DECODED_CACHE_REGISTRY) >= _DECODED_CACHE_MAX:
                    _DECODED_CACHE_REGISTRY.pop(
                        next(iter(_DECODED_CACHE_REGISTRY)))
                shared = {"ram": {}, "dev": None, "keys": {},
                          "dicts": self.dicts}
                _DECODED_CACHE_REGISTRY[ck] = shared
            self._ram_cache = shared["ram"]
            if self._key_memo is not None:
                self._key_memo = shared["keys"]
        # frozen-eval plans (see _frozen_eligible), shared across loader
        # instances of the same dataset+config like the decoded caches
        self._plan_store = (shared.setdefault("plans", {})
                            if shared is not None else {})
        # presampled ball-crop candidates (see _ensure_candidates); keyed by
        # the candidate-relevant cfg fields the decoded-cache key omits
        self._cand_store = (shared.setdefault("cand", {})
                            if shared is not None else {})
        if self.cache_mode == "device":
            if shared is not None and shared["dev"] is not None:
                self._dev, self._dev_row = shared["dev"]
                self._cached_sampler = _make_cached_group_sampler(
                    self.cfg, self._train_aug)
            else:
                self._build_device_cache()
                if shared is not None:
                    shared["dev"] = (self._dev, self._dev_row)

    def _decoded_cache_key(self):
        """Registry key: dataset identity + the cfg/phase fields the decoded
        tensors depend on (see _gather_image_record and _build_device_cache).
        `_wants_mask_bbox` is part of the key because it decides whether the
        cached mask_bbox rows are real bounds or the empty sentinel — two
        loaders differing only in fps_sample / train aug_depth / the
        CATRE_DISABLE_FUSED_WINDOW env toggle must not share an entry (a
        fused-window loader adopting sentinel bounds would silently treat
        every instance as empty)."""
        cfg = self.cfg
        return (id(self.dicts), len(self.dicts), self.phase, self.cache_mode,
                cfg.max_objs_per_image, cfg.sample_window, cfg.with_nocs,
                cfg.pcl_with_color, cfg.change_bg_prob > 0,
                cfg.ship_mean_points, _wants_mask_bbox(cfg, self.phase),
                cfg.kps_type.lower() == "fps", cfg.num_kps,
                cfg.use_cmra_model)

    # ---------------------------------------------------------------- RNG
    def _record_rng(self, g: int) -> np.random.Generator:
        return _derive_rng(self.seed, _STREAM_HOST, g)

    def _image_key(self, g: int) -> np.ndarray:
        """Raw (2,) uint32 PRNG key for image at global stream position g
        (host-built: jax.random.split round trips cost two device hops per
        group on the relay). Test-phase keys are memoized per (seed, g) —
        same value, skips the SeedSequence construction on repeat passes."""
        if self._key_memo is not None:
            k = self._key_memo.get((self.seed, g))
            if k is None:
                k = _derive_rng(self.seed, _STREAM_KEYS, g).integers(
                    0, 2 ** 32, size=2, dtype=np.uint32)
                self._key_memo[(self.seed, g)] = k
            return k
        return _derive_rng(self.seed, _STREAM_KEYS, g).integers(
            0, 2 ** 32, size=2, dtype=np.uint32)

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        """Shared-seed epoch index stream: same on every rank so the
        rank-strided split partitions one global shuffle
        (`my_distributed_sampler.py:12-55`).

        TrainingSampler (default): one shuffled permutation per epoch.
        RepeatFactorTrainingSampler (`my_distributed_sampler.py:172-200`):
        per-image repeat factors r(I) = max_c sqrt(thresh / f(c)) with
        stochastic rounding per epoch, then shuffled — epochs vary slightly
        in length, so positions map through cumulative epoch sizes."""
        if self._perm_cache is not None and self._perm_cache[0] == epoch:
            return self._perm_cache[1]
        rng = _derive_rng(self.seed, _STREAM_EPOCH, epoch)
        if self._rep_factors is None:
            idx = rng.permutation(len(self.dicts))
        else:
            int_part = np.floor(self._rep_factors)
            frac = self._rep_factors - int_part
            rep = (int_part + (rng.random(len(frac)) < frac)).astype(np.int64)
            idx = np.repeat(np.arange(len(self.dicts)), rep)
            idx = idx[rng.permutation(len(idx))]
        self._perm_cache = (epoch, idx)
        return idx

    def _index_at(self, g: int) -> int:
        """Dataset index at global stream position g (variable epoch sizes
        with repeat-factor sampling)."""
        from bisect import bisect_right

        while g >= self._epoch_cum[-1]:
            e = len(self._epoch_cum) - 1
            self._epoch_cum.append(self._epoch_cum[-1] + len(self._epoch_indices(e)))
        e = bisect_right(self._epoch_cum, g) - 1
        return int(self._epoch_indices(e)[g - self._epoch_cum[e]])

    def skip(self, n_images: int) -> None:
        """Fast-forward the stream by n_images records (this rank's count)
        without decoding — used by --resume to reproduce the exact
        record/augmentation stream of an uninterrupted run."""
        self._pos += int(n_images)

    def reset_stream(self) -> None:
        """Rewind to record 0 so a finished (test) loader can be iterated
        again — periodic eval reuses one loader instance to keep the
        decoded-tensor caches (RAM / HBM) warm across evals. Sampling keys
        are positional, so every pass draws the identical stream."""
        self._pos = 0

    # ------------------------------------------------------------- streams
    def _train_records(self):
        """Rank-strided slice of the infinite shuffled index stream (the
        reference's `TrainingSampler`, `my_distributed_sampler.py:12-55`).
        Yields (g, didx, record): global stream position, dataset index."""
        while True:
            g = self.rank + self._pos * self.world_size
            didx = self._index_at(g)
            self._pos += 1
            yield g, didx, self.dicts[didx]

    def _test_records(self):
        for didx in range(self._pos, len(self.dicts)):
            self._pos = didx + 1
            yield didx, didx, self.dicts[didx]

    def _host_part(self, g: int, didx: int, record: dict) -> dict | None:
        """Thread-safe host stage: decode + gt assembly. With a cache mode,
        the decode is memoized per dataset index (the host stage is
        deterministic per record — all augmentation is positional or
        device-side)."""
        if self.cache_mode and didx in self._ram_cache:
            cached = self._ram_cache[didx]
            if cached is None:
                return None
            data = dict(cached)
            # recomputed on hit: (M, 1024, 3) per record would triple the
            # cache footprint for an indexed view of a (6, 1024, 3) constant.
            # cmra per-instance priors are NOT an indexed view — they stay
            # stored in the entry (see _host_part's store path)
            if self.cfg.ship_mean_points and "obj_mean_points" not in data:
                data["obj_mean_points"] = self._mean_points[data["obj_cls"]]
            data["obj_mean_scales"] = self._mean_scales[data["obj_cls"]]
            return data
        data = _gather_image_record(
            record, self.cfg, self.phase, self._record_rng(g),
            self._mean_points, self._mean_scales,
        )
        if self.cache_mode:
            if data is None:
                self._ram_cache[didx] = None
            else:
                strip = ("obj_mean_scales",) if data.get("cmra_prior") else (
                    "obj_mean_points", "obj_mean_scales")
                stripped = {k: v for k, v in data.items() if k not in strip}
                self._ram_cache[didx] = stripped
                data = dict(data)
        return data

    def _host_stream(self, records):
        """Host-stage stream, threaded when num_workers > 0 (cv2/pickle
        release the GIL — the reference uses torch DataLoader worker
        processes, `DATALOADER.NUM_WORKERS`). Yields (g, record, data)."""
        if self.num_workers <= 0:
            for g, didx, rec in records:
                yield g, rec, self._host_part(g, didx, rec)
            return
        import collections
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            queue = collections.deque()
            records = iter(records)
            try:
                for _ in range(2 * self.num_workers):
                    g, didx, rec = next(records)
                    queue.append((g, rec, pool.submit(self._host_part, g, didx, rec)))
            except StopIteration:
                records = iter(())
            while queue:
                g, rec, fut = queue.popleft()
                try:
                    gn, didxn, nxt = next(records)
                    queue.append((gn, nxt, pool.submit(self._host_part, gn, didxn, nxt)))
                except StopIteration:
                    pass
                yield g, rec, fut.result()

    def _crop_args(self, data: dict):
        # ball center/radius: gt pose at train, estimate at test
        if self.phase == "train":
            return data["obj_pose"], data["obj_scale"]
        return data["obj_pose_est"], data["obj_scale_est"]

    # ------------------------------------------------------- device stage
    def _dispatch_group(self, items: list):
        """Launch the device stage for a whole flush group in ONE jitted
        dispatch (stacked + vmapped ball-crop; see _make_group_sampler) and
        return a handle WITHOUT fetching — the caller finalizes one group
        behind, overlapping device work with the next group's host decode.
        The stack is padded to ims_per_batch so the sampler compiles exactly
        once; padding rows are discarded. items: [(g, record, data), ...]."""
        G = len(items)
        pad = max(self.ims_per_batch, G)
        datas = [d for _, _, d in items]

        def stack(arrs):
            a = np.stack(arrs)
            if G < pad:
                a = np.concatenate([a, np.repeat(a[:1], pad - G, axis=0)])
            return a

        crop = [self._crop_args(d) for d in datas]
        keys = stack([self._image_key(g) for g, _, _ in items])
        depth_s = [d["depth_ship"] for d in datas]
        if any(d.dtype != np.uint16 for d in depth_s):
            # mixed-representability group (synthetic out-of-range depth):
            # ship everything f32
            depth_s = [d.astype(np.float32) / 1000.0 if d.dtype == np.uint16 else d
                       for d in depth_s]
        outs = self._sampler(
            keys, stack(depth_s), stack([d["K"] for d in datas]),
            stack([d["masks_packed"] for d in datas]),
            stack([p for p, _ in crop]), stack([s for _, s in crop]),
            stack([d["mask_bbox"] for d in datas]),
        )
        return items, outs

    def _finalize_group(self, handle) -> list:
        """Fetch a dispatched group's results (single round trip) and run the
        per-image host post stage. In device_batches mode nothing is fetched:
        the stacked cloud stays on device and rides to _flatten via the first
        image's "_pcl_group" slot."""
        items, (pcls, idx, n_inside) = handle
        if self.device_batches:
            out = []
            for i, (g, record, data) in enumerate(items):
                data["pcl"] = None
                data["pcl_idx"] = None
                data["n_inside"] = None
                out.append(self._post_device(g, record, data))
            out[0]["_pcl_group"] = pcls
            return out
        # the per-point pixel indices are only needed by the aligned-nocs /
        # aligned-rgb paths
        if self.cfg.with_nocs or self.cfg.pcl_with_color:
            pcls, idx, n_inside = jax.device_get((pcls, idx, n_inside))
        else:
            pcls, n_inside = jax.device_get((pcls, n_inside))
            idx = None
        out = []
        for i, (g, record, data) in enumerate(items):
            data["pcl"] = pcls[i]
            data["pcl_idx"] = None if idx is None else idx[i]
            data["n_inside"] = n_inside[i]
            out.append(self._post_device(g, record, data))
        return out

    def _device_group(self, items: list) -> list:
        """Synchronous device stage (dispatch + finalize) for one group."""
        return self._finalize_group(self._dispatch_group(items))

    def _pipelined_groups(self, records, yield_empty: bool = False,
                          flush_partial: bool = False):
        """Shared double-buffered pipeline over a record stream (one state
        machine for the train and test branches of __iter__). Groups are
        yielded in record order relative to each other, but an "empty" marker
        is yielded as soon as its record is decoded — i.e. BEFORE an earlier
        group still in flight on the device (consumers key results by
        scene_im_id and must not rely on empty/group interleaving order).
        Yields tagged items:
          ("group", [finalized image dicts])   full groups
          ("empty", marker dict)               undecodable records (test)
          ("partial", [(g, record, data), ...]) trailing un-dispatched group
        """
        pending, handle = [], None
        for g, record, data in self._host_stream(records):
            if data is None:
                if yield_empty:
                    yield "empty", {"scene_im_ids": [record["scene_im_id"]],
                                    "empty": True, "record": record}
                continue
            pending.append((g, record, data))
            if len(pending) == self.ims_per_batch:
                new_handle = self._dispatch_group(pending)
                pending = []
                if handle is not None:
                    yield "group", self._finalize_group(handle)
                handle = new_handle
        if handle is not None:
            yield "group", self._finalize_group(handle)
        if flush_partial and pending:
            yield "partial", pending

    # ------------------------------------------------------- device cache
    def _build_device_cache(self) -> None:
        """One-time preload: host-decode every record (threaded), stack the
        transfer tensors and put them in HBM. Steady-state iteration then
        ships only (keys, indices) per group."""
        n = len(self.dicts)
        datas = [None] * n

        def work(i):
            # position i is only consumed by the (cache-incompatible) test
            # occlusion rng — any non-negative value works here
            datas[i] = self._host_part(i, i, self.dicts[i])

        if self.num_workers > 0:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                list(pool.map(work, range(n)))
        else:
            for i in range(n):
                work(i)

        keep = [i for i in range(n) if datas[i] is not None]
        if len(keep) < n:
            logger.warning("device cache: %d/%d records empty/undecodable",
                           n - len(keep), n)
        kept = [datas[i] for i in keep]
        shapes = {d["depth_ship"].shape for d in kept}
        if len(shapes) != 1:
            raise ValueError(f"cache_decoded='device' needs uniform image "
                             f"shapes, got {shapes}")
        if any(d["depth_ship"].dtype != np.uint16 for d in kept):
            depth = np.stack([
                d["depth_ship"].astype(np.float32) / 1000.0
                if d["depth_ship"].dtype == np.uint16 else d["depth_ship"]
                for d in kept])
        else:
            depth = np.stack([d["depth_ship"] for d in kept])
        packed = np.stack([d["masks_packed"] for d in kept])
        crop = [self._crop_args(d) for d in kept]
        dev = {
            "depth": depth,
            "packed": packed,
            "K": np.stack([d["K"] for d in kept]),
            "pose": np.stack([p for p, _ in crop]),
            "scale": np.stack([s for _, s in crop]),
            "mask_bbox": np.stack([d["mask_bbox"] for d in kept]),
        }
        nbytes = sum(a.nbytes for a in dev.values())
        logger.info("device cache: %d records, %.2f GB resident", len(keep),
                    nbytes / 2 ** 30)
        self._dev = {k: jnp.asarray(v) for k, v in dev.items()}
        # didx -> row in the cache stacks (None rows are dropped)
        self._dev_row = {didx: row for row, didx in enumerate(keep)}
        self._cached_sampler = _make_cached_group_sampler(self.cfg, self._train_aug)
        # the transfer tensors now live in HBM — drop the redundant RAM
        # copies (~0.9 MB/frame) from the host cache entries
        for entry in self._ram_cache.values():
            if entry is not None:
                entry.pop("depth_ship", None)
                entry.pop("masks_packed", None)

    def _dispatch_group_cached(self, items: list):
        """Device-cache twin of _dispatch_group: items carry no host tensors;
        the transfer is (pad, 2) uint32 keys + (pad,) int32 rows."""
        G = len(items)
        pad = max(self.ims_per_batch, G)
        keys = np.stack([self._image_key(g) for g, _, _ in items])
        rows = np.asarray([self._dev_row[didx] for _, didx, _ in items], np.int32)
        if G < pad:
            keys = np.concatenate([keys, np.repeat(keys[:1], pad - G, axis=0)])
            rows = np.concatenate([rows, np.repeat(rows[:1], pad - G)])
        d = self._dev
        outs = self._cached_sampler(d["depth"], d["packed"], d["K"], d["pose"],
                                    d["scale"], d["mask_bbox"], keys, rows)
        return items, outs

    def _finalize_group_cached(self, handle) -> list:
        items, (pcls, idx, n_inside) = handle
        if not self.device_batches:
            pcls, n_inside = jax.device_get((pcls, n_inside))
        out = []
        for i, (g, didx, data) in enumerate(items):
            data["pcl"] = None if self.device_batches else pcls[i]
            data["pcl_idx"] = None
            data["n_inside"] = None if self.device_batches else n_inside[i]
            out.append(self._post_device(g, self.dicts[didx], data))
        if self.device_batches:
            out[0]["_pcl_group"] = pcls
        return out

    def _cached_groups(self, records):
        """Double-buffered group stream over the device cache. The host part
        per record is a RAM-cache dict copy — no decode, no big transfer.
        A trailing partial group is dispatched padded (the sampler repeats
        row 0; __iter__ marks the pad images valid=False) so every record is
        accounted for — REAL275's 2754 test images are not divisible by the
        production group sizes."""
        pending, handle = [], None
        for g, didx, rec in records:
            data = self._host_part(g, didx, rec)  # RAM-cache hit (tiny)
            if data is None:
                continue
            pending.append((g, didx, data))
            if len(pending) == self.ims_per_batch:
                new_handle = self._dispatch_group_cached(pending)
                pending = []
                if handle is not None:
                    yield self._finalize_group_cached(handle)
                handle = new_handle
        tail = self._dispatch_group_cached(pending) if pending else None
        if handle is not None:
            yield self._finalize_group_cached(handle)
        if tail is not None:
            yield self._finalize_group_cached(tail)

    # ------------------------------------------------------- host post
    def _post_device(self, g: int, record: dict, data: dict) -> dict:
        # aligned per-point extras: nocs coords (train variants with a nocs
        # loss, `data_loader.py:584-611` samples nocs with the same indices)
        if record.get("coord_file") and self.cfg.with_nocs:
            cv2 = _quiet_cv2()

            from ..tools.pose_data import decode_coord_map

            coord_bgr = cv2.imread(record["coord_file"], cv2.IMREAD_COLOR)
            if coord_bgr is not None:
                nocs_map = decode_coord_map(coord_bgr).reshape(-1, 3)
                nocs = nocs_map[data["pcl_idx"]]
                # mug NOCS remap s0*(nocs + t0) per instance (`:606-609`)
                try:
                    mug_meta = assets.load_mug_meta()
                except FileNotFoundError:
                    mug_meta = {}
                for i, anno in enumerate(record.get("annotations", [])[: self.cfg.max_objs_per_image]):
                    name = anno.get("inst_name", "")
                    key = name[: -len("_norm")] if name.endswith("_norm") else name
                    if key in mug_meta:
                        t0, s0 = mug_meta[key]
                        nocs[i] = s0 * (nocs[i] + t0[None, :])
                data["nocs"] = nocs.astype(np.float32)
        if self.cfg.pcl_with_color:
            # aligned RGB in [0,1] per sampled point (INPUT.PCL_WITH_COLOR;
            # the reference's crop_ball_from_depth_image returns rgb too)
            cv2 = _quiet_cv2()

            bgr = cv2.imread(record["file_name"], cv2.IMREAD_COLOR)
            if bgr is not None:
                rgb = bgr[:, :, ::-1]
                if self.phase == "train":
                    # image-space color/bg aug (base_data_loader.py:233-553;
                    # off in shipped configs, same gating here)
                    from .aug_color import color_augment, replace_background

                    rng = _derive_rng(self.seed, _STREAM_COLOR, g)
                    if (self.cfg.change_bg_prob > 0 and self.cfg.bg_image_dir
                            and rng.random() < self.cfg.change_bg_prob):
                        fg = np.asarray(data["fg_any"])
                        rgb = replace_background(
                            rng, rgb, fg, self.cfg.bg_image_dir,
                            truncate_fg=self.cfg.truncate_fg,
                            bg_type=self.cfg.bg_type,
                            num_bg_imgs=self.cfg.num_bg_imgs,
                            keep_aspect=self.cfg.bg_keep_aspect_ratio)
                    # COLOR_AUG_SYN_ONLY: skip real images (intended
                    # semantics; the reference gate is a no-op bug — both
                    # branches of data_loader.py:501-504 are identical)
                    if (self.cfg.color_aug_prob > 0
                            and not (self.cfg.color_aug_syn_only
                                     and record.get("img_type", "real") == "real")
                            and rng.random() < self.cfg.color_aug_prob):
                        rgb = color_augment(rng, np.ascontiguousarray(rgb),
                                            augmentor=self._color_augmentor)
                rgb_map = rgb.reshape(-1, 3).astype(np.float32) / 255.0
                data["pcl_rgb"] = rgb_map[data["pcl_idx"]]
        if self._last_frame is not None:
            m = self.cfg.max_objs_per_image
            lf = np.tile(np.eye(3, 5, dtype=np.float32), (m, 1, 1))
            lf[:, 2, 3] = 1.0
            lf[:, :, 4] = 0.1
            prev = self._last_frame.get(record["scene_im_id"])
            if prev is not None:
                n = min(len(prev), m)
                lf[:n] = np.asarray(prev, dtype=np.float32)[:n]
            data["last_frame_poses"] = lf
        return data

    def _flatten(self, images: list, defer_pcl: bool = False) -> dict:
        """Concatenate per-image padded instance arrays into one object batch.
        In device_batches mode the cloud never touched the host: the group's
        stacked (pad, M, P, 3) device array is reshaped on device instead of
        concatenated from per-image numpy slices. defer_pcl=True builds the
        HOST side only (the frozen-eval plan attaches a fresh device pcl per
        pass, see _frozen_test_iter)."""
        keys = ["pcl", "obj_cls", "obj_pose", "obj_scale", "sym_flag", "mug_handle",
                "obj_bbox", "score", "obj_pose_est", "obj_scale_est", "valid",
                "obj_mean_scales"]
        if "obj_mean_points" in images[0]:  # ship_mean_points=False drops it
            keys = keys + ["obj_mean_points"]
        if "obj_fps_points" in images[0]:  # KPS_TYPE="fps" only
            keys = keys + ["obj_fps_points"]
        group_pcl = images[0].pop("_pcl_group", None)
        if group_pcl is not None or defer_pcl:
            keys = [k for k in keys if k != "pcl"]
        if self._last_frame is not None:
            keys = keys + ["last_frame_poses"]
        if all("nocs" in im for im in images):
            keys = keys + ["nocs"]
        if all("pcl_rgb" in im for im in images):
            keys = keys + ["pcl_rgb"]
        batch = {k: np.concatenate([im[k] for im in images], axis=0) for k in keys}
        m = self.cfg.max_objs_per_image
        if group_pcl is not None:
            g = len(images)
            batch["pcl"] = group_pcl[:g].reshape(g * m, group_pcl.shape[2], 3)
        batch["K"] = np.concatenate(
            [np.tile(im["K"][None], (m, 1, 1)) for im in images], axis=0
        )
        batch["im_id"] = np.concatenate(
            [np.full(m, i, dtype=np.int32) for i, im in enumerate(images)]
        )
        batch["inst_id"] = np.concatenate([np.arange(m, dtype=np.int32) for _ in images])
        batch["scene_im_ids"] = [im["scene_im_id"] for im in images]
        batch["file_names"] = [im.get("file_name", "") for im in images]
        return batch

    # -------------------------------------------------- frozen eval batches
    def _frozen_eligible(self) -> bool:
        """The device-cache + device-batches test path is fully deterministic
        per pass: group composition, every host-side batch field, and the
        cache rows depend only on (dicts, cfg); the PRNG keys only on
        (seed, position). The whole host side can therefore be built ONCE and
        replayed — steady-state host work per group drops to one sampler
        dispatch + a shallow dict copy (VERDICT r4 #1: pre-packed flush
        groups). Batches share numpy arrays across passes: consumers must
        treat them read-only (run_inference/evaluator do)."""
        return (self.phase == "test" and self._dev is not None
                and self.device_batches and self._last_frame is None
                and self._pos == 0
                and not os.environ.get("CATRE_DISABLE_FROZEN_EVAL"))

    def _freeze_group(self, items: list) -> dict:
        ims = self.ims_per_batch
        rows = np.asarray([self._dev_row[didx] for _, didx, _ in items], np.int32)
        if len(items) < ims:
            rows = np.concatenate([rows, np.repeat(rows[:1], ims - len(items))])
        images = []
        for g, didx, data in items:
            data = dict(data, pcl=None, pcl_idx=None, n_inside=None)
            images.append(self._post_device(g, self.dicts[didx], data))
        while len(images) < ims:  # padded tail group (valid=False rows)
            pad_im = dict(images[0])
            pad_im["valid"] = np.zeros_like(images[0]["valid"])
            pad_im["scene_im_id"] = None
            images.append(pad_im)
        return {"gs": [g for g, _, _ in items], "rows": rows, "keys": {},
                "host": self._flatten(images, defer_pcl=True), "memo": {}}

    def _frozen_plan(self) -> list:
        store = self._plan_store
        plan = store.get(self.ims_per_batch)
        if plan is not None:
            return plan
        plan, pending = [], []
        for g, didx, rec in self._test_records():
            data = self._host_part(g, didx, rec)
            if data is None:
                continue
            pending.append((g, didx, data))
            if len(pending) == self.ims_per_batch:
                plan.append(self._freeze_group(pending))
                pending = []
        if pending:
            plan.append(self._freeze_group(pending))
        store[self.ims_per_batch] = plan
        return plan

    def _frozen_keys(self, grp: dict) -> np.ndarray:
        keys = grp["keys"].get(self.seed)
        if keys is None:
            keys = np.stack([self._image_key(g) for g in grp["gs"]])
            if keys.shape[0] < self.ims_per_batch:
                keys = np.concatenate([keys, np.repeat(
                    keys[:1], self.ims_per_batch - keys.shape[0], axis=0)])
            grp["keys"][self.seed] = keys
        return keys

    def _ensure_candidates(self):
        """Build (once, shared across loader instances like the decoded
        caches) the deterministic ball-crop half for every device-cache row:
        window points, in-ball mask, n_inside, window origin. Legal because
        the frozen-eval inputs (init pose/scale estimates, depth, masks) are
        pure functions of the record — only the priority draw is per-pass.
        Returns (cand dict, sampler) or None when the fused windowed path is
        inactive (full-frame sampling, fps_sample), when disabled via
        CATRE_DISABLE_PRESAMPLED_EVAL, or when the candidate stack would
        exceed CATRE_PRESAMPLED_MAX_GB (default 6)."""
        cfg = self.cfg
        d = self._dev
        h, w = d["depth"].shape[1:3]
        wsh, wsw = min(cfg.sample_window, h), min(cfg.sample_window, w)
        fused_window = (cfg.sample_window > 0 and not cfg.fps_sample
                        and (cfg.sample_window < h or cfg.sample_window < w)
                        and not os.environ.get("CATRE_DISABLE_FUSED_WINDOW"))
        if not fused_window or os.environ.get("CATRE_DISABLE_PRESAMPLED_EVAL"):
            return None
        key = (cfg.depth_sample_ball_ratio, cfg.sample_window,
               os.environ.get("CATRE_WINDOW_SELECTION", "topk"))
        cand = self._cand_store.get(key)
        if cand is None:
            rows = d["depth"].shape[0]
            m = cfg.max_objs_per_image
            est_gb = rows * m * wsh * wsw * 13 / 2 ** 30  # f32 pts + bool
            max_gb = float(os.environ.get("CATRE_PRESAMPLED_MAX_GB", "6"))
            if est_gb > max_gb:
                logger.info("presampled candidates skipped: %.1f GB > %.1f",
                            est_gb, max_gb)
                self._cand_store[key] = False  # don't re-estimate per pass
                return None
            build = _make_candidates_builder(cfg)
            chunks = []
            step = max(1, min(rows, 256))
            for c0 in range(0, rows, step):
                idx = jnp.arange(c0, min(c0 + step, rows), dtype=jnp.int32)
                chunks.append(build(d["depth"], d["packed"], d["K"],
                                    d["pose"], d["scale"], d["mask_bbox"],
                                    idx))
            pts, inside, nin, org = (jnp.concatenate(xs) if len(xs) > 1
                                     else xs[0] for xs in zip(*chunks))
            cand = {"pts": pts, "inside": inside, "n_inside": nin,
                    "origin": org}
            logger.info("presampled candidates: %d rows, %.2f GB resident",
                        rows, est_gb)
            self._cand_store[key] = cand
        elif cand is False:
            return None
        return cand, _make_presampled_group_sampler(cfg, int(w), wsw)

    def _frozen_test_iter(self):
        plan = self._frozen_plan()
        d = self._dev
        m = self.cfg.max_objs_per_image
        pre = self._ensure_candidates()

        if self.defer_selection and pre is not None:
            # deferred mode: no sampler dispatch here — the batch carries the
            # shared candidate stacks + this group's keys/rows, and the
            # consumer runs selection + refine as one fused jit. Outputs are
            # bit-identical (same ops, same key stream; pinned by
            # tests/test_frozen_eval.py).
            cand, _sampler = pre
            h, w = d["depth"].shape[1:3]
            sel_meta = {
                "pts": cand["pts"], "inside": cand["inside"],
                "n_inside": cand["n_inside"], "origin": cand["origin"],
                "num_pcl": self.cfg.num_pcl, "img_w": int(w),
                "wsw": min(self.cfg.sample_window, int(w)),
                "selection": os.environ.get("CATRE_WINDOW_SELECTION", "topk"),
            }
            for grp in plan:
                batch = dict(grp["host"])
                batch["_presampled"] = dict(
                    sel_meta, keys=self._frozen_keys(grp), rows=grp["rows"])
                batch["_host_memo"] = grp["memo"]
                yield batch
            self._pos = len(self.dicts)
            return

        def emit(handle):
            grp, (pcls, _idx, _n) = handle
            batch = dict(grp["host"])
            batch["pcl"] = pcls.reshape(self.ims_per_batch * m, pcls.shape[2], 3)
            batch["_host_memo"] = grp["memo"]  # run_inference packed28 cache
            return batch

        # DIAGNOSTIC ONLY (never a production default: the pipeline metric
        # includes the per-pass ball-crop selection): stash each group's
        # sampled clouds on device and replay them on later passes — the
        # resulting wall is the refine-only in-situ ceiling, isolating the
        # sampler's true in-context cost (docs/PERF.md round-5).
        replay = bool(os.environ.get("CATRE_FROZEN_REPLAY_PCL"))
        handle = None
        for grp in plan:
            stash = grp.setdefault("pcl_replay", {}) if replay else None
            if stash is not None and self.seed in stash:
                outs = stash[self.seed]
            elif pre is not None:
                cand, sampler = pre
                outs = sampler(cand["pts"], cand["inside"],
                               cand["n_inside"], cand["origin"],
                               self._frozen_keys(grp), grp["rows"])
            else:
                outs = self._cached_sampler(
                    d["depth"], d["packed"], d["K"], d["pose"], d["scale"],
                    d["mask_bbox"], self._frozen_keys(grp), grp["rows"])
            if stash is not None:
                stash[self.seed] = outs
            new = (grp, outs)
            if handle is not None:
                yield emit(handle)
            handle = new
        if handle is not None:
            yield emit(handle)
        self._pos = len(self.dicts)

    def __iter__(self):
        # double-buffered device stage: group k's sampler runs on-device while
        # group k+1 decodes on host; exactly one group of latency
        if self.phase == "train":
            if self._dev is not None:
                for group in self._cached_groups(self._train_records()):
                    yield self._flatten(group)
                return
            for kind, val in self._pipelined_groups(self._train_records()):
                yield self._flatten(val)  # only "group" occurs (no empties)
        else:
            if self._dev is not None:
                if self._frozen_eligible():
                    yield from self._frozen_test_iter()
                    return
                for group in self._cached_groups(self._test_records()):
                    while len(group) < self.ims_per_batch:
                        pad_im = dict(group[0])
                        pad_im["valid"] = np.zeros_like(group[0]["valid"])
                        pad_im["scene_im_id"] = None
                        group.append(pad_im)
                    yield self._flatten(group)
                return
            # test: fixed-size groups of images flattened into one padded
            # object batch (ims_per_batch=1 reproduces the reference's
            # one-image-per-step evaluation; larger values batch the jit)
            for kind, val in self._pipelined_groups(
                    self._test_records(), yield_empty=True, flush_partial=True):
                if kind == "empty":
                    yield val
                    continue
                if kind == "group":
                    yield self._flatten(val)
                    continue
                group = self._device_group(val)  # trailing partial group
                # pad the final partial group to the fixed batch shape so the
                # jitted refine compiles exactly once (padding images carry
                # valid=False rows and a None scene_im_id the consumer skips)
                while len(group) < self.ims_per_batch:
                    pad_im = dict(group[0])
                    pad_im["valid"] = np.zeros_like(group[0]["valid"])
                    pad_im["scene_im_id"] = None
                    group.append(pad_im)
                yield self._flatten(group)

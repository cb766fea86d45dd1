"""Data pipeline: dataset dicts -> padded, static-shape instance batches.

Behavioral reference: `core/catre/datasets/data_loader.py`
(read_data_train:403, read_data_test:660, builders:877/926) and
`core/catre/engine/batching.py` (instance flattening).

TPU-native split of responsibilities:
  host   — image/depth/mask decode, depth augmentation (numpy), gt assembly
  device — backprojection + per-instance ball-crop sampling (one jit per
           image, `ops.sampling.batch_ball_crop`), everything downstream
The reference does all of this per-instance on CPU dataloader workers
(`data_loader.py:576-611`); here the gathers run vectorized on the chip and
the host only ships (depth, masks) once per image.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from . import assets, meta
from .nocs import rle_to_binary_mask

logger = logging.getLogger(__name__)


@dataclass
class LoaderConfig:
    """INPUT.* data-pipeline knobs of the shipped config."""

    num_pcl: int = 1024
    depth_sample_ball_ratio: float = 0.6
    sample_depth_from_ball: bool = True
    fps_sample: bool = False
    aug_depth: bool = True
    drop_depth_prob: float = 0.5
    drop_depth_ratio: float = 0.2
    add_noise_depth_prob: float = 0.9
    add_noise_depth_level: float = 0.005
    occlude_mask_test: bool = False
    with_nocs: bool = False  # sample aligned NOCS coords (nocs-head variants)
    pcl_with_color: bool = False  # sample aligned RGB (INPUT.PCL_WITH_COLOR)
    color_aug_prob: float = 0.0   # INPUT.COLOR_AUG_PROB (train, RGB path)
    change_bg_prob: float = 0.0   # INPUT.CHANGE_BG_PROB (train, RGB path)
    bg_image_dir: str = ""        # background still-image pool
    max_objs_per_image: int = 8
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


def aug_depth_np(rng: np.random.Generator, depth: np.ndarray, cfg: LoaderConfig) -> np.ndarray:
    """Depth augmentation (train): fill zeros with median-noise, random 20%
    drop, gaussian noise (`data_loader.py:530-543`)."""
    depth = depth.copy()
    zero_idx = depth == 0
    if zero_idx.any():
        med = np.median(depth[zero_idx]) if np.isfinite(np.median(depth[zero_idx])) else 0.0
        depth[zero_idx] = rng.normal(med, 0.1, size=int(zero_idx.sum()))
    if rng.random() < cfg.drop_depth_prob:
        keep = rng.uniform(0, 1, size=depth.shape) > cfg.drop_depth_ratio
        depth = depth * keep
    if rng.random() < cfg.add_noise_depth_prob:
        level = rng.uniform(0, cfg.add_noise_depth_level)
        noise = rng.normal(0, level, size=depth.shape)
        depth = np.where(depth > 0, depth + noise, depth)
    return depth.astype(np.float32)


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


def _gather_image_record(record: dict, cfg: LoaderConfig, phase: str,
                         rng: np.random.Generator, mean_points: np.ndarray,
                         mean_scales: np.ndarray) -> dict | None:
    """Host part of one image: decode + per-instance gt assembly, padded to
    cfg.max_objs_per_image."""
    annos = record.get("annotations", [])
    if not annos:
        return None
    annos = annos[: cfg.max_objs_per_image]
    n = len(annos)
    h, w = record["height"], record["width"]
    m = cfg.max_objs_per_image

    depth = load_depth(record["depth_file"])
    if phase == "train" and cfg.aug_depth:
        depth = aug_depth_np(rng, depth, cfg)

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

    return {
        "depth": depth,
        "K": np.asarray(record["cam"], dtype=np.float32),
        "masks": masks,
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
        "obj_mean_points": mean_points[classes],
        "obj_mean_scales": mean_scales[classes],
        "scene_im_id": record["scene_im_id"],
        "file_name": record.get("file_name", ""),
        "n_insts": n,
    }


# jitted samplers shared across loader instances, keyed by the config fields
# they close over: a fresh jax.jit per CATRELoader would re-trace (and pay a
# compile-cache round trip) for every loader built — one per periodic eval
_SAMPLER_CACHE: dict = {}


def _sampler_cache_key(cfg: LoaderConfig, kind: str):
    return (kind, cfg.depth_sample_ball_ratio, cfg.num_pcl, cfg.fps_sample,
            cfg.max_objs_per_image)


def _make_image_sampler(cfg: LoaderConfig):
    """Jitted per-image device pipeline: backproject + masked ball-crop.
    Returns pcls (M, num_pcl, 3)."""
    from ..geom.transforms import backproject
    from ..ops.sampling import batch_ball_crop

    ck = _sampler_cache_key(cfg, "image")
    if ck in _SAMPLER_CACHE:
        return _SAMPLER_CACHE[ck]

    @jax.jit
    def sample(key, depth, K, masks, poses, scales):
        cloud = backproject(depth, K)
        pcls, idx, n_inside = batch_ball_crop(
            key, cloud, masks, poses, scales,
            ratio=cfg.depth_sample_ball_ratio, num_points=cfg.num_pcl,
            fps_sample=cfg.fps_sample,
        )
        return pcls, idx, n_inside

    _SAMPLER_CACHE[ck] = sample
    return sample


def _mask_pack_dtype(m: int):
    """Narrowest uint dtype with >= m bits (bit-per-instance mask packing)."""
    for dt, bits in ((np.uint8, 8), (np.uint16, 16), (np.uint32, 32)):
        if m <= bits:
            return dt
    raise ValueError(f"max_objs_per_image={m} > 32 not supported by mask packing")


def _make_group_sampler(cfg: LoaderConfig):
    """Group-level device pipeline: backproject + ball-crop vmapped over a
    whole flush group of images in ONE jitted dispatch. Per-image dispatches
    dominate the input pipeline on remote/high-latency device links (measured
    4.7 img/s per-image vs one call per ims_per_batch group); batching them
    amortizes the launch latency and gives XLA G x M instances of parallel
    work instead of M.

    Instance masks travel BIT-PACKED — one (H, W) uint with bit i set where
    instance i is masked (M x smaller host->device transfer than (M, H, W)
    bool; unpacking is a shift+and on device)."""
    from ..geom.transforms import backproject
    from ..ops.sampling import batch_ball_crop

    ck = _sampler_cache_key(cfg, "group")
    if ck in _SAMPLER_CACHE:
        return _SAMPLER_CACHE[ck]

    M = cfg.max_objs_per_image

    def one(key, depth, K, packed, poses, scales):
        if depth.dtype == jnp.uint16:
            # test-phase depth ships as raw millimeters (half the bytes of
            # f32); f32(u16)/1000 is exactly rounded, bit-identical to the
            # host's load_depth value
            depth = depth.astype(jnp.float32) / 1000.0
        cloud = backproject(depth, K)
        bits = jnp.arange(M, dtype=packed.dtype)[:, None, None]
        masks = (jnp.right_shift(packed[None, :, :], bits) & 1).astype(bool)
        return batch_ball_crop(
            key, cloud, masks, poses, scales,
            ratio=cfg.depth_sample_ball_ratio, num_points=cfg.num_pcl,
            fps_sample=cfg.fps_sample,
        )

    @jax.jit
    def sample(keys, depths, Ks, packed, poses, scales):
        return jax.vmap(one)(keys, depths, Ks, packed, poses, scales)

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
                 num_workers: int = 0, rank: int = 0, world_size: int = 1):
        assert phase in ("train", "test")
        self.dicts = dataset_dicts
        self.cfg = cfg
        self.phase = phase
        self.ims_per_batch = ims_per_batch
        self.max_objs_train = max_objs_train
        self.num_workers = num_workers
        self.rank = rank
        self.world_size = world_size
        # aug rng is per-rank (reference: per-worker seeds); the epoch
        # permutation rng is SHARED (same seed on every rank) so the
        # rank-strided split partitions one global shuffle
        # (`my_distributed_sampler.py:12-55`)
        self.rng = np.random.default_rng(seed + 7919 * rank)
        self._perm_rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed + 7919 * rank)
        # host-side stream for the raw uint32 sampler keys (relay-cheap)
        self._key_rng = np.random.default_rng(seed + 7919 * rank + 17)
        self._sampler = _make_image_sampler(cfg)
        self._group_sampler = _make_group_sampler(cfg)
        self._mean_points = assets.mean_shape_array()
        self._mean_scales = meta.mean_scales_array()
        self._last_frame = None
        if cfg.init_pose_train_path:
            import pickle

            with open(cfg.init_pose_train_path, "rb") as f:
                self._last_frame = pickle.load(f)

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def _host_part(self, record: dict, seed: int) -> dict | None:
        """Thread-safe host stage: decode + gt assembly (own RNG per call)."""
        return _gather_image_record(
            record, self.cfg, self.phase, np.random.default_rng(seed),
            self._mean_points, self._mean_scales,
        )

    def _host_stream(self, records):
        """Host-stage stream, threaded when num_workers > 0 (cv2/pickle
        release the GIL — the reference uses torch DataLoader worker
        processes, `DATALOADER.NUM_WORKERS`)."""
        if self.num_workers <= 0:
            for rec in records:
                yield rec, self._host_part(rec, int(self.rng.integers(2 ** 31)))
            return
        import collections
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            queue = collections.deque()
            records = iter(records)
            try:
                for _ in range(2 * self.num_workers):
                    rec = next(records)
                    queue.append((rec, pool.submit(
                        self._host_part, rec, int(self.rng.integers(2 ** 31)))))
            except StopIteration:
                records = iter(())
            while queue:
                rec, fut = queue.popleft()
                try:
                    nxt = next(records)
                    queue.append((nxt, pool.submit(
                        self._host_part, nxt, int(self.rng.integers(2 ** 31)))))
                except StopIteration:
                    pass
                yield rec, fut.result()

    def _crop_args(self, data: dict):
        # ball center/radius: gt pose at train, estimate at test
        if self.phase == "train":
            return data["obj_pose"], data["obj_scale"]
        return data["obj_pose_est"], data["obj_scale_est"]

    def _device_part(self, record: dict, data: dict) -> dict:
        poses_for_crop, scales_for_crop = self._crop_args(data)
        pcls, idx, n_inside = self._sampler(
            self._next_key(), jnp.asarray(data["depth"]), jnp.asarray(data["K"]),
            jnp.asarray(data["masks"]), jnp.asarray(poses_for_crop),
            jnp.asarray(scales_for_crop),
        )
        data["pcl"] = np.asarray(pcls)
        data["pcl_idx"] = np.asarray(idx)  # flat pixel index per sampled point
        data["n_inside"] = np.asarray(n_inside)
        return self._post_device(record, data)

    def _dispatch_group(self, items: list):
        """Launch the device stage for a whole flush group in ONE jitted
        dispatch (stacked + vmapped ball-crop; see _make_group_sampler) and
        return a handle WITHOUT fetching — the caller finalizes one group
        behind, overlapping device work with the next group's host decode.
        The stack is padded to ims_per_batch so the sampler compiles exactly
        once; padding rows are discarded."""
        G = len(items)
        pad = max(self.ims_per_batch, G)
        datas = [d for _, d in items]

        def stack(arrs):
            a = np.stack(arrs)
            if G < pad:
                a = np.concatenate([a, np.repeat(a[:1], pad - G, axis=0)])
            return a

        crop = [self._crop_args(d) for d in datas]
        # host-built raw uint32 PRNG keys: jax.random.split here would cost
        # two extra device round-trips per group on the relay
        keys = self._key_rng.integers(0, 2 ** 32, size=(pad, 2), dtype=np.uint32)
        dt = _mask_pack_dtype(self.cfg.max_objs_per_image)
        packed = []
        for d in datas:
            m = d["masks"]  # (M, H, W) bool
            p = np.zeros(m.shape[1:], dtype=dt)
            for i in range(m.shape[0]):
                p |= m[i].astype(dt) << dt(i)
            packed.append(p)
        depth_s = stack([d["depth"] for d in datas])
        if self.phase == "test" and float(depth_s.max()) * 1000.0 < 65535.5:
            # un-augmented depth is mm-quantized (load_depth: u16/1000) —
            # re-quantize for the transfer; round() undoes the two float
            # roundings exactly for all u16 values. Train depth carries float
            # augmentation noise and stays f32.
            depth_s = np.round(depth_s * 1000.0).astype(np.uint16)
        outs = self._group_sampler(
            keys, depth_s, stack([d["K"] for d in datas]),
            stack(packed),
            stack([p for p, _ in crop]), stack([s for _, s in crop]),
        )
        return items, outs

    def _finalize_group(self, handle) -> list:
        """Fetch a dispatched group's results (single round trip) and run the
        per-image host post stage."""
        items, (pcls, idx, n_inside) = handle
        # the per-point pixel indices are only needed by the aligned-nocs /
        # aligned-rgb paths
        if self.cfg.with_nocs or self.cfg.pcl_with_color:
            pcls, idx, n_inside = jax.device_get((pcls, idx, n_inside))
        else:
            pcls, n_inside = jax.device_get((pcls, n_inside))
            idx = None
        out = []
        for i, (record, data) in enumerate(items):
            data["pcl"] = pcls[i]
            data["pcl_idx"] = None if idx is None else idx[i]
            data["n_inside"] = n_inside[i]
            out.append(self._post_device(record, data))
        return out

    def _device_group(self, items: list) -> list:
        """Synchronous device stage (dispatch + finalize) for one group."""
        return self._finalize_group(self._dispatch_group(items))

    def _pipelined_groups(self, records, yield_empty: bool = False,
                          flush_partial: bool = False):
        """Shared double-buffered pipeline over a record stream (one state
        machine for the train and test branches of __iter__). Yields tagged
        items, in record order:
          ("group", [finalized image dicts])   full groups
          ("empty", marker dict)               undecodable records (test)
          ("partial", [(record, data), ...])   trailing un-dispatched group
        """
        pending, handle = [], None
        for record, data in self._host_stream(records):
            if data is None:
                if yield_empty:
                    yield "empty", {"scene_im_ids": [record["scene_im_id"]],
                                    "empty": True, "record": record}
                continue
            pending.append((record, data))
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

    def _post_device(self, record: dict, data: dict) -> dict:
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

                    rng = self.rng
                    if (self.cfg.change_bg_prob > 0 and self.cfg.bg_image_dir
                            and rng.random() < self.cfg.change_bg_prob):
                        fg = np.asarray(data["masks"]).any(axis=0)
                        rgb = replace_background(rng, rgb, fg, self.cfg.bg_image_dir)
                    if (self.cfg.color_aug_prob > 0
                            and rng.random() < self.cfg.color_aug_prob):
                        rgb = color_augment(rng, np.ascontiguousarray(rgb))
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

    def _flatten(self, images: list) -> dict:
        """Concatenate per-image padded instance arrays into one object batch."""
        keys = ["pcl", "obj_cls", "obj_pose", "obj_scale", "sym_flag", "mug_handle",
                "obj_bbox", "score", "obj_pose_est", "obj_scale_est", "valid",
                "obj_mean_points", "obj_mean_scales"]
        if self._last_frame is not None:
            keys = keys + ["last_frame_poses"]
        if all("nocs" in im for im in images):
            keys = keys + ["nocs"]
        if all("pcl_rgb" in im for im in images):
            keys = keys + ["pcl_rgb"]
        batch = {k: np.concatenate([im[k] for im in images], axis=0) for k in keys}
        m = self.cfg.max_objs_per_image
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

    def _process_image(self, record: dict) -> dict | None:
        """Single-threaded convenience: host + device stages."""
        data = self._host_part(record, int(self.rng.integers(2 ** 31)))
        if data is None:
            return None
        return self._device_part(record, data)

    def _infinite_indices(self):
        while True:
            yield from self._perm_rng.permutation(len(self.dicts))

    def _train_records(self):
        """Rank-strided slice of the infinite shuffled index stream (the
        reference's `TrainingSampler`, `my_distributed_sampler.py:12-55`)."""
        import itertools

        for idx in itertools.islice(
            self._infinite_indices(), self.rank, None, self.world_size
        ):
            yield self.dicts[idx]

    def __iter__(self):
        # double-buffered device stage: group k's sampler runs on-device while
        # group k+1 decodes on host; exactly one group of latency, same order
        if self.phase == "train":
            for kind, val in self._pipelined_groups(self._train_records()):
                yield self._flatten(val)  # only "group" occurs (no empties)
        else:
            # test: fixed-size groups of images flattened into one padded
            # object batch (ims_per_batch=1 reproduces the reference's
            # one-image-per-step evaluation; larger values batch the jit)
            for kind, val in self._pipelined_groups(
                    iter(self.dicts), yield_empty=True, flush_partial=True):
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

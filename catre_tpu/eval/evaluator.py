"""Dataset evaluator: collects per-image predictions for refine iters 0..N
and scores them with the fixed-IoU NOCS protocol.

Behavioral reference: `core/catre/engine/catre_custom_evaluator.py:33-330`
(CATRE_EvaluatorCustom — reset/process/evaluate protocol, gt assembly from
dataset dicts, per-iteration mAP tables) and
`core/catre/engine/catre_evaluator.py:225-369` (timed inference loop).
"""

from __future__ import annotations

import collections
import logging
import os
import os.path as osp
import pickle
import time
import weakref

import numpy as np

from ..data import meta
from ..geom.transforms import pose_3x4_to_4x4_np
from .nocs_eval import SYNSET_NAMES, compute_independent_mAP

logger = logging.getLogger(__name__)

# refine_fn -> {variant key -> jitted wrapper}: "packed" is the packed-input
# refine (kps gather + refine in one program); ("sel", num_pcl, img_w, wsw,
# selection) is the fused ball-crop-selection + refine program for deferred
# frozen-eval batches.  Module-level so repeated run_inference calls over the
# same refine_fn (warm pass / timed pass, periodic eval during training)
# reuse the compiled executable instead of re-tracing + re-deserializing
# from the compile cache each call (~15 s per pass through the axon relay).
_PACKED_REFINE_CACHE = weakref.WeakKeyDictionary()


class CATREEvaluator:
    """Accumulates predictions (per refine iteration) and computes the NOCS
    REAL275 metric tables."""

    def __init__(self, dataset_dicts: list, n_iters: int = 4, output_dir: str | None = None,
                 use_matches_for_pose: bool = True):
        self.n_iters = n_iters
        self.output_dir = output_dir
        self.use_matches_for_pose = use_matches_for_pose
        self._gts = self._build_gts(dataset_dicts)
        self.reset()

    # -------------------------------------------------- gt
    @staticmethod
    def _build_gts(dataset_dicts: list) -> dict:
        """scene_im_id -> gt dict (`catre_custom_evaluator.py:81-102`)."""
        gts = {}
        for rec in dataset_dicts:
            annos = rec.get("gt_annotations", rec.get("annotations", []))
            cls_ids, RTs, scales, handles = [], [], [], []
            for a in annos:
                if "pose" not in a:
                    continue
                cls_ids.append(a["category_id"] + 1)  # 1-based for the protocol
                RTs.append(pose_3x4_to_4x4_np(np.asarray(a["pose"], np.float32)))
                scales.append(a["scale"])
                handles.append(a.get("mug_handle", 1))
            gts[rec["scene_im_id"]] = {
                "gt_class_ids": np.asarray(cls_ids, dtype=np.int32),
                "gt_RTs": np.asarray(RTs).reshape(-1, 4, 4),
                "gt_scales": np.asarray(scales, dtype=np.float32).reshape(-1, 3),
                "gt_handle_visibility": np.asarray(handles, dtype=np.int32),
            }
        return gts

    # -------------------------------------------------- protocol
    def reset(self) -> None:
        # refine_i -> scene_im_id -> prediction dict
        self._preds = [dict() for _ in range(self.n_iters + 1)]
        self._gathered = False

    def process(self, scene_im_id: str, refine_i: int, poses_4x4: np.ndarray,
                scales: np.ndarray, class_ids_1based: np.ndarray,
                scores: np.ndarray, bboxes_yxyx: np.ndarray) -> None:
        """Store one image's predictions for one refine iteration
        (`catre_custom_evaluator.py:121-176`)."""
        # new local predictions invalidate a previous gather: without this, a
        # process() after gather_predictions() would let a later evaluate()
        # skip the all_gather and silently drop other ranks' newer predictions
        self._gathered = False
        self._preds[refine_i][scene_im_id] = {
            "pred_RTs": np.asarray(poses_4x4),
            "pred_scales": np.asarray(scales),
            "pred_class_ids": np.asarray(class_ids_1based, dtype=np.int32),
            "pred_scores": np.asarray(scores),
            "pred_bboxes": np.asarray(bboxes_yxyx),
        }

    def gather_predictions(self) -> None:
        """Merge per-process prediction shards into every process's _preds
        (`catre_custom_evaluator.py:200-213`). Idempotent — a second call
        (e.g. TEST.VIS gather followed by evaluate()) skips the all_gather so
        the full merged set isn't re-exchanged. No-op at world 1. Must run on
        ALL processes (collective)."""
        from ..parallel import comm

        if comm.get_world_size() <= 1 or self._gathered:
            return
        self._gathered = True
        gathered = comm.all_gather(self._preds)
        merged = [dict() for _ in range(self.n_iters + 1)]
        for proc_preds in gathered:
            for refine_i, d in enumerate(proc_preds):
                merged[refine_i].update(d)
        self._preds = merged

    # -------------------------------------------------- scoring
    def evaluate(self, dump: bool = True) -> dict:
        """Per-iteration mAP tables. Returns
        {iter_i: {"iou_aps": ..., "pose_aps": ..., "summary": {...}}};
        empty on non-main processes (predictions are gathered to every
        process but only the main one scores, mirroring
        `catre_custom_evaluator.py:200-213`)."""
        from ..parallel import comm

        if comm.get_world_size() > 1:
            self.gather_predictions()
            if not comm.is_main_process():
                return {}

        # threshold lists of the reference evaluator
        # (`catre_custom_evaluator.py:248-251`)
        iou_thres_list = [0.1, 0.25, 0.50, 0.75]
        degree_thres_list = [5, 10]
        shift_thres_list = [2, 5, 10]

        if dump and self.output_dir:
            os.makedirs(self.output_dir, exist_ok=True)
            with open(osp.join(self.output_dir, "predictions.pkl"), "wb") as f:
                pickle.dump(self._preds, f)

        empty_pred = {
            "pred_RTs": np.zeros((0, 4, 4)),
            "pred_scales": np.zeros((0, 3)),
            "pred_class_ids": np.zeros(0, dtype=np.int32),
            "pred_scores": np.zeros(0),
            "pred_bboxes": np.zeros((0, 4)),
        }

        out = {}
        for refine_i in range(self.n_iters + 1):
            if not self._preds[refine_i]:
                continue
            # merge over ALL gt images; un-predicted images get empty preds
            # (`catre_custom_evaluator.py:239-246`)
            final_results = []
            for scene_im_id, gt in self._gts.items():
                result = dict(gt)
                result.update(self._preds[refine_i].get(scene_im_id, empty_pred))
                final_results.append(result)
            iou_aps, pose_aps = compute_independent_mAP(
                final_results, SYNSET_NAMES,
                degree_thresholds=degree_thres_list,
                shift_thresholds=shift_thres_list,
                iou_3d_thresholds=iou_thres_list,
                use_matches_for_pose=self.use_matches_for_pose,
            )
            # (deg, shift) indices; -1 = the appended 360/100 sentinel column
            summary = {
                "IoU25": iou_aps[-1, 1] * 100,
                "IoU50": iou_aps[-1, 2] * 100,
                "IoU75": iou_aps[-1, 3] * 100,
                "re5te2": pose_aps[-1, 0, 0] * 100,
                "re5te5": pose_aps[-1, 0, 1] * 100,
                "re10te2": pose_aps[-1, 1, 0] * 100,
                "re10te5": pose_aps[-1, 1, 1] * 100,
                "re10te10": pose_aps[-1, 1, 2] * 100,
                "re5": pose_aps[-1, 0, -1] * 100,
                "re10": pose_aps[-1, 1, -1] * 100,
                "te2": pose_aps[-1, -1, 0] * 100,
                "te5": pose_aps[-1, -1, 1] * 100,
            }
            out[refine_i] = {"iou_aps": iou_aps, "pose_aps": pose_aps, "summary": summary}
            logger.info("refine iter %d: %s", refine_i,
                        {k: round(v, 2) for k, v in summary.items()})
            if dump and self.output_dir:
                self._dump_table(refine_i, iou_aps, pose_aps, summary)
        return out

    def _dump_table(self, refine_i: int, iou_aps, pose_aps, summary: dict) -> None:
        """Per-class table like the reference's tabulate dump
        (`catre_custom_evaluator.py:263-325`)."""
        rows = [["objects"] + meta.OBJECTS + ["Avg(6)"]]
        specs = [("IoU25", iou_aps[:, 1]), ("IoU50", iou_aps[:, 2]), ("IoU75", iou_aps[:, 3]),
                 ("re5te2", pose_aps[:, 0, 0]), ("re5te5", pose_aps[:, 0, 1]),
                 ("re10te2", pose_aps[:, 1, 0]), ("re10te5", pose_aps[:, 1, 1]),
                 ("re10te10", pose_aps[:, 1, 2]),
                 ("re5", pose_aps[:, 0, -1]), ("re10", pose_aps[:, 1, -1]),
                 ("te2", pose_aps[:, -1, 0]), ("te5", pose_aps[:, -1, 1])]
        for name, col in specs:
            rows.append([name] + [f"{100*col[i]:.2f}" for i in range(1, 7)] + [f"{100*col[-1]:.2f}"])
        widths = [max(len(r[c]) for r in rows) for c in range(len(rows[0]))]
        lines = ["  ".join(v.ljust(widths[c]) for c, v in enumerate(r)) for r in rows]
        path = osp.join(self.output_dir, f"metrics_tab_iter{refine_i}.txt")
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
        logger.info("refine iter %d table:\n%s", refine_i, "\n".join(lines))


def run_inference(refine_fn, params, loader, evaluator: CATREEvaluator,
                  n_iters: int, warmup: int = 1, kps_type: str = "mean_shape",
                  num_kps: int = 1024, mesh=None,
                  compute_probe_every: int = 8, prefetch: int = 2,
                  packed_inputs: bool = True,
                  use_mean_table: bool = True, slab_groups: int = 1) -> dict:
    """Timed inference over a test loader (mirrors
    `catre_inference_on_dataset`, `catre_evaluator.py:225-369`): per-image
    total / pure-compute / post-process accounting; iter-0 predictions are
    the initial estimates.

    Timing semantics: refine dispatches are async and overlapped with the
    loader, so the per-batch dispatch->fetch interval measures pipeline
    attribution, NOT device time. Every `compute_probe_every`-th post-warmup
    batch is therefore PROBED synchronously — the pipeline is drained first,
    then upload+dispatch->scalar-fetch is timed — giving `compute_s_per_img`
    the reference's cuda-synchronized meaning (its span also includes the
    .to(cuda) batch transfer: `catre_evaluator.py:267-313` starts the timer
    before batch_data) while the remaining batches keep the
    overlap (`overlap_fetch_s_per_img` reports the overlapped attribution).
    Set compute_probe_every=0 to disable probing (max throughput).
    With a device_batches loader the batch's pcl is itself an un-synced
    device computation (the loader's ball-crop), so the probe span covers
    any still-queued sampler work for that batch plus the refine — the
    honest "device busy per image" figure for the fully device-resident
    path (there is no host->device batch transfer to include).

    With a mesh, instance rows are sharded across the devices (eval-time data
    parallelism the reference declares incorrect for its DDP evaluator,
    `catre_custom_evaluator.py:327-328` — correct here because scoring sees
    the full gathered predictions).

    slab_groups > 1 refines that many loader groups in ONE dispatch
    (device-side pcl concat + one packed upload): the refine program carries
    a measured ~3.4 ms fixed device cost per dispatch (164 µs/obj at B=256
    vs 150.8 at B=2048 — docs/PERF.md round-5), so slabbing recovers the
    large-batch rate while the sampler keeps its best per-group shape.
    Per-object results are bit-identical (the refine is per-object
    independent; pinned by tests/test_evaluator.py). Packed path only."""
    import jax
    import jax.numpy as jnp

    from ..data.kps import select_kps

    if mesh is not None:
        from ..parallel import batch_sharding, replicate_tree

        params = replicate_tree(mesh, params)
        row_sharding = batch_sharding(mesh)

        def put(arr):
            # host numpy straight to the sharded placement in ONE transfer —
            # jnp.asarray first would stage on device 0 and reshard (an extra
            # hop per array per batch on the relay-latency-sensitive path).
            # Device-resident inputs (loader device_batches) reshard
            # device-side without a host round trip.
            if isinstance(arr, jax.Array):
                return jax.device_put(arr, row_sharding)
            return jax.device_put(np.asarray(arr), row_sharding)
    else:
        def put(arr):
            return jnp.asarray(arr)  # no-op for device-resident inputs

    # mean_shape kps are a pure per-category table lookup: upload the
    # (C, K, 3) table ONCE and gather by class on device — the per-batch
    # transfer drops from (B, K, 3) f32 (6.3 MB at B=512, ~80 ms through
    # the 78 MB/s relay) to the (B,) int32 class vector. Other kps types
    # keep the host select_kps path (they depend on per-batch scale_est).
    # use_mean_table=False: per-batch kps differ from the category table
    # (e.g. USE_CMRA_MODEL per-instance priors on cmra splits) — the caller
    # forces the host path, which reads the batch's shipped obj_mean_points
    mean_table = None
    if kps_type.lower() == "mean_shape" and use_mean_table:
        try:
            from ..data.assets import mean_shape_array

            table = mean_shape_array()
            if table.shape[1] == num_kps:
                if mesh is not None:
                    from ..parallel import replicate_tree

                    mean_table = replicate_tree(mesh, jnp.asarray(table))
                else:
                    mean_table = jnp.asarray(table)
        except FileNotFoundError:
            pass  # no asset pickles: fall back to the per-batch host path

    if mean_table is not None:
        # One fused program: kps gather + refine, fed by ONE packed (B, 28)
        # f32 upload (pose 12 + scale 3 + K 9 + mean_scales 3 + cls 1 —
        # category ids are small ints, exact in f32). Replaces four small
        # per-batch device_puts and an eager gather dispatch with a single
        # transfer + a single dispatch — each op costs a relay round trip
        # (~30 ms dispatch floor) regardless of size, so op count dominates
        # bandwidth for these tiny arrays (docs/PERF.md "Round-3 pipeline
        # rework").
        _variants = _PACKED_REFINE_CACHE.get(refine_fn)
        if _variants is None:
            _variants = {}
            _PACKED_REFINE_CACHE[refine_fn] = _variants

        def _unpack_refine(pcl, table, packed, params):
            b = packed.shape[0]
            pose_est = packed[:, :12].reshape(b, 3, 4)
            scale_est = packed[:, 12:15]
            cam_k = packed[:, 15:24].reshape(b, 3, 3)
            mean_scales = packed[:, 24:27]
            obj_kps = table[packed[:, 27].astype(jnp.int32)]
            return refine_fn(params, pcl, obj_kps, pose_est, scale_est,
                             cam_k, mean_scales)

        _packed_refine = _variants.get("packed")
        if _packed_refine is None:

            @jax.jit
            def _packed_refine(params, pcl, table, packed):
                return _unpack_refine(pcl, table, packed, params)

            _variants["packed"] = _packed_refine

        def _get_select_refine(num_pcl, img_w, wsw, selection):
            """Fused program for deferred frozen-eval batches: ball-crop
            selection (priorities + top_k + gather over the presampled
            candidate stacks) feeds the refine inside ONE jit — one dispatch
            per group instead of a sampler dispatch + a refine dispatch
            (docs/PERF.md round-5: the program boundary costs ~ms on the
            relay-attached chip). Bit-identical outputs to the split path
            (same ops, same key stream)."""
            key = ("sel", num_pcl, img_w, wsw, selection)
            fn = _variants.get(key)
            if fn is None:
                from ..ops.sampling import batch_select_from_candidates

                @jax.jit
                def fn(params, pts, inside, nin, org, keys, rows, table,
                       packed):
                    def one_i(k, i):
                        pcls, _idx, _n = batch_select_from_candidates(
                            k, pts[i], inside[i], nin[i], org[i],
                            num_points=num_pcl, img_w=img_w, wsw=wsw,
                            selection=selection)
                        return pcls
                    pcls = jax.vmap(one_i)(keys, rows)  # (G, M, P, 3)
                    pcl = pcls.reshape(-1, pcls.shape[2], 3)
                    # materialize the selected cloud between selection and
                    # refine: without the barrier XLA may fuse the candidate
                    # gather into the refine's 4-iteration scan consumers,
                    # re-executing selection work per iteration (measured:
                    # the un-barriered fused program was ~6.5 ms/group
                    # SLOWER than split dispatches — docs/PERF.md round-5)
                    pcl = jax.lax.optimization_barrier(pcl)
                    return _unpack_refine(pcl, table, packed, params)

                _variants[key] = fn
            return fn

        def _pack_host(batch):
            # frozen-eval loaders attach a per-group memo dict: the packed
            # row is a pure function of the frozen host fields, so repeat
            # passes (periodic eval, warm bench passes) skip the concat
            memo = batch.get("_host_memo")
            if memo is not None and "packed28" in memo:
                return memo["packed28"]
            b = len(batch["obj_cls"])
            packed = np.concatenate([
                np.asarray(batch["obj_pose_est"], np.float32).reshape(b, 12),
                np.asarray(batch["obj_scale_est"], np.float32),
                np.asarray(batch["K"], np.float32).reshape(b, 9),
                np.asarray(batch["obj_mean_scales"], np.float32),
                np.asarray(batch["obj_cls"], np.float32)[:, None],
            ], axis=1)
            if memo is not None:
                memo["packed28"] = packed
            return packed

    total_compute = 0.0
    total_process = 0.0
    n_images = 0
    probe_s = 0.0
    probe_images = 0
    start = time.perf_counter()

    def finish(entry):
        """Fetch one in-flight refine result (one batch, or one slab of
        slab_groups batches) and run the host bookkeeping. Deferred by up to
        `prefetch` dispatches: jax dispatch is async, so batch k's refinement
        computes on device while the loader prepares batches k+1..k+prefetch
        (each itself double-buffering its sampler) — the fetch here lands
        after the overlap, and the extra depth keeps the device queue fed
        across the fetch's relay round trip."""
        nonlocal total_compute, total_process, n_images
        i, batches, poses, scales, t0 = entry
        # ONE device->host round trip for both outputs (two np.asarray calls
        # would pay the relay latency twice); the fetch is also the sync
        # (block_until_ready unreliable on axon)
        poses, scales = jax.device_get((poses, scales))
        if i >= warmup:
            total_compute += time.perf_counter() - t0
            # count real images, not batches (TEST.IMS_PER_BATCH may be > 1;
            # final-group padding images carry scene_im_id None)
            n_images += sum(1 for b in batches
                            for s in b["scene_im_ids"] if s is not None)

        t1 = time.perf_counter()
        off = 0
        for batch in batches:
            nb = len(batch["obj_cls"])
            b_poses, b_scales = poses[:, off:off + nb], scales[:, off:off + nb]
            off += nb
            # per-image bookkeeping fields are pure functions of the batch's
            # frozen host side — memoized per group when the loader provides
            # a _host_memo (frozen-eval path), recomputed otherwise
            memo = batch.get("_host_memo")
            fields = None if memo is None else memo.get("finish_fields")
            if fields is None:
                valid = np.asarray(batch["valid"])
                im_ids = np.asarray(batch["im_id"])
                cls_all = np.asarray(batch["obj_cls"]) + 1
                scores_all = np.asarray(batch["score"])
                bb_all = np.asarray(batch["obj_bbox"])[:, [1, 0, 3, 2]]  # xyxy -> yxyx
                fields = []
                for local_i, scene_im_id in enumerate(batch["scene_im_ids"]):
                    if scene_im_id is None:  # final-group padding image
                        continue
                    sel = np.flatnonzero(valid & (im_ids == local_i))
                    fields.append((scene_im_id, sel, cls_all[sel],
                                   scores_all[sel], bb_all[sel]))
                if memo is not None:
                    memo["finish_fields"] = fields
            for scene_im_id, sel, cls_s, scores_s, bb_s in fields:
                # host-side 3x4 -> 4x4 (a jnp call here costs a device
                # dispatch per image per refine iter — measured 1.5 s/img
                # through the remote-TPU relay vs ~0 in numpy)
                for refine_i in range(n_iters + 1):
                    p44 = pose_3x4_to_4x4_np(b_poses[refine_i][sel])
                    evaluator.process(scene_im_id, refine_i, p44,
                                      b_scales[refine_i][sel],
                                      cls_s, scores_s, bb_s)
        if i >= warmup:
            total_process += time.perf_counter() - t1

    slab_groups = max(1, int(slab_groups))
    if slab_groups > 1 and (mean_table is None or not packed_inputs):
        raise ValueError("slab_groups > 1 requires the packed mean-table "
                         "refine path (kps_type='mean_shape' + asset table "
                         "+ packed_inputs)")
    slab: list = []

    def dispatch_slab():
        """One refine dispatch over the accumulated slab; returns the
        pending-entry. Device-resident pcls concat on device (one extra
        overlapped dispatch); host rows concat in numpy (µs)."""
        t0 = time.perf_counter()
        batches = [b for _, b in slab]
        i0 = slab[0][0]
        if len(batches) == 1:
            pcl, packed = batches[0]["pcl"], _pack_host(batches[0])
        else:
            pcls = [b["pcl"] for b in batches]
            pcl = (jnp.concatenate(pcls) if isinstance(pcls[0], jax.Array)
                   else np.concatenate(pcls))
            packed = np.concatenate([_pack_host(b) for b in batches])
        poses, scales = _packed_refine(params, put(pcl), mean_table,
                                       put(packed))
        slab.clear()
        return (i0, batches, poses, scales, t0)

    pending = collections.deque()
    i = -1
    for raw_batch in loader:
        if raw_batch.get("empty"):
            continue
        i += 1
        probe = (compute_probe_every > 0 and i >= warmup
                 and (i - warmup) % compute_probe_every == 0)
        if probe:
            while pending:  # drain the pipeline so the probe times ONLY
                finish(pending.popleft())  # this dispatch's device work
        if slab_groups > 1:
            if raw_batch.get("_presampled") is not None:
                raise ValueError("slab_groups > 1 and deferred-selection "
                                 "batches are mutually exclusive (build the "
                                 "loader with defer_selection=False)")
            slab.append((i, raw_batch))
            if len(slab) < slab_groups:
                continue
            entry = dispatch_slab()
            if probe:
                float(np.asarray(entry[2])[-1, 0, 0, 0])
                probe_s += time.perf_counter() - entry[4]
                probe_images += sum(1 for b in entry[1]
                                    for s in b["scene_im_ids"] if s is not None)
            pending.append(entry)
            if len(pending) > prefetch:
                finish(pending.popleft())
            continue
        batch = raw_batch
        t0 = time.perf_counter()
        pre = batch.get("_presampled")
        if pre is not None:
            # deferred frozen-eval batch (loader defer_selection=True):
            # selection + refine in one fused dispatch; candidate stacks are
            # the same device arrays every call (no per-group upload)
            if mean_table is None or not packed_inputs:
                raise ValueError(
                    "deferred-selection batches require the packed "
                    "mean-table refine path (kps_type='mean_shape' + asset "
                    "table + packed_inputs)")
            if mesh is not None:
                raise ValueError("deferred-selection batches are "
                                 "single-process only (device-resident "
                                 "candidate stacks cannot be row-sharded)")
            fn = _get_select_refine(pre["num_pcl"], pre["img_w"],
                                    pre["wsw"], pre["selection"])
            poses, scales = fn(params, pre["pts"], pre["inside"],
                               pre["n_inside"], pre["origin"],
                               jnp.asarray(pre["keys"]),
                               jnp.asarray(pre["rows"]),
                               mean_table, put(_pack_host(batch)))
        elif mean_table is not None and packed_inputs:
            poses, scales = _packed_refine(
                params, put(batch["pcl"]), mean_table, put(_pack_host(batch)))
        elif mean_table is not None:
            # eager device-side gather from the resident table: ships a
            # (B,) int32 vector instead of (B, K, 3) f32 points
            obj_kps = mean_table[put(np.asarray(batch["obj_cls"], np.int32))]
            poses, scales = refine_fn(
                params, put(batch["pcl"]), put(obj_kps),
                put(batch["obj_pose_est"]), put(batch["obj_scale_est"]),
                put(batch["K"]), put(batch["obj_mean_scales"]),
            )
        else:
            # host numpy in, host numpy out (for mean_shape): put() then
            # ships every input in a single host->placement transfer
            if kps_type.lower() == "mean_shape" and "obj_mean_points" not in batch:
                raise ValueError(
                    "batch lacks obj_mean_points but the device kps-table "
                    "path is inactive — build the loader with "
                    "ship_mean_points=True for this kps_type/num_kps")
            if kps_type.lower() == "fps" and "obj_fps_points" not in batch:
                raise ValueError(
                    "INPUT.KPS_TYPE='fps' but the batch carries no "
                    "obj_fps_points — build the loader from a config with "
                    "KPS_TYPE='fps' (ref data_loader.py:737-752)")
            obj_kps = select_kps(
                kps_type, mean_points=batch.get("obj_mean_points"),
                scale_est=batch["obj_scale_est"],
                fps_points=batch.get("obj_fps_points"), num_kps=num_kps,
            )
            poses, scales = refine_fn(
                params, put(batch["pcl"]), put(obj_kps),
                put(batch["obj_pose_est"]), put(batch["obj_scale_est"]),
                put(batch["K"]), put(batch["obj_mean_scales"]),
            )
        if probe:
            # force completion (block_until_ready is unreliable through the
            # axon relay — fetch a scalar)
            float(np.asarray(poses)[-1, 0, 0, 0])
            probe_s += time.perf_counter() - t0
            probe_images += sum(1 for s in batch["scene_im_ids"] if s is not None)
        pending.append((i, [batch], poses, scales, t0))
        if len(pending) > prefetch:
            finish(pending.popleft())
    if slab:  # partial tail slab
        pending.append(dispatch_slab())
    while pending:
        finish(pending.popleft())

    wall = time.perf_counter() - start
    stats = {
        "images": n_images,
        "total_s": wall,
        # synchronized pure device compute (probe batches; reference
        # semantics, catre_evaluator.py:312-319)
        "compute_s_per_img": probe_s / probe_images if probe_images else
        total_compute / max(n_images, 1),
        # overlapped dispatch->fetch attribution (pipeline view)
        "overlap_fetch_s_per_img": total_compute / max(n_images, 1),
        "process_s_per_img": total_process / max(n_images, 1),
    }
    logger.info("inference stats: %s", stats)
    return stats

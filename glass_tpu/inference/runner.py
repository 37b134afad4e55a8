"""Single-image inference API — the ``GlassRunner`` equivalent.

Mirrors reference ``glass/inference/glass_runner.py:20-153``: build model
from YAML config + checkpoint, resize the input by the demo scale-ratio rule
(max-side cap / min-side upscale bounded by ``MAX_UPSCALE_RATIO``), run the
jitted detector+recognizer, rescale predictions back, post-process.

TPU-native additions: images are padded into a small set of static
resolution buckets so each bucket compiles exactly once; all model work is
one ``jax.jit`` call per image.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Tuple

import numpy as np
import cv2
import jax
import jax.numpy as jnp

from ..config import CfgNode, get_cfg
from ..models import (
    GlassArch,
    emit_mask,
    emit_text,
    init_glass_params,
    glass_inference_single,
)
from ..postprocess import build_post_processor, detector_postprocess
from ..postprocess.post_processor import scale_rotated_np
from ..structures import Instances
from ..text import TextCodec
from ..utils.common import rgb2grey

logger = logging.getLogger(__name__)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _set_text_fields(inst: Instances, out: dict, sel) -> None:
    """Copy whichever recognizer representation the model emitted
    (TPU.TEXT_EMIT): full distributions or on-device argmax ids+scores."""
    if "text_probs" in out:
        inst.pred_text_prob = out["text_probs"][sel]
    if "text_ids" in out:
        inst.pred_text_ids = out["text_ids"][sel]
        inst.pred_text_step_scores = out["text_step_scores"][sel]


def _unpack_masks(m: np.ndarray) -> np.ndarray:
    """Dequantize a TPU.MASK_FETCH_DTYPE=uint8 mask fetch back to probs."""
    if m.dtype == np.uint8:
        return m.astype(np.float32) / 255.0
    return m


class GlassRunner:
    def __init__(
        self,
        model_path: Optional[str],
        config_path: Optional[str] = None,
        opts: Optional[List[str]] = None,
        post_process: bool = True,
        cfg: Optional[CfgNode] = None,
        params: Optional[dict] = None,
    ):
        self.cfg = cfg if cfg is not None else get_cfg(config_path, opts)
        self.post_process_flag = post_process
        self.arch = GlassArch.from_config(self.cfg)

        if params is not None:
            self.params = params
        elif model_path:
            from ..train.checkpoint import load_any_checkpoint, overlay_params

            logger.info("Loading checkpoint %s", model_path)
            init = init_glass_params(jax.random.PRNGKey(0), self.arch)
            self.params = overlay_params(init, load_any_checkpoint(model_path))
        else:
            logger.warning("No checkpoint given; random-initializing weights")
            self.params = init_glass_params(jax.random.PRNGKey(0), self.arch)

        self.min_target_size = self.cfg.INPUT.MIN_SIZE_TEST
        self.max_target_size = self.cfg.INPUT.MAX_SIZE_TEST
        self.max_upscale_ratio = self.cfg.INPUT.MAX_UPSCALE_RATIO
        self.input_format = self.cfg.INPUT.FORMAT
        assert self.input_format in ("RGB", "BGR", "GREY")

        self.codec = TextCodec.from_config(self.cfg)
        self.post_processor = build_post_processor(self.cfg)
        self.pad_multiple = self.cfg.TPU.PAD_IMAGE_TO_MULTIPLE
        self.buckets = [tuple(b) for b in self.cfg.TPU.IMAGE_BUCKETS]

        self._jit_fn = jax.jit(
            lambda p, img, hw: glass_inference_single(self.arch, p, img, hw)
        )
        self._jit_given_boxes = None
        self._jit_batch_fns = {}
        # Single-process SPMD serving: shard the eval batch over all local
        # devices (TPU.SERVE_DATA_PARALLEL). The reference serves one
        # process per GPU via d2 launch(); here one program drives a
        # local-device mesh, params replicated, batch dim sharded.
        self._serve_mesh = None
        if (
            getattr(self.cfg.TPU, "SERVE_DATA_PARALLEL", False)
            and len(jax.local_devices()) > 1
        ):
            from jax.sharding import Mesh

            self._serve_mesh = Mesh(
                np.array(jax.local_devices()), ("data",)
            )
            logger.info(
                "data-parallel serving over %d local devices",
                len(jax.local_devices()),
            )
        # GlassRCNN._postprocess knobs (reference glass_rcnn.py:35-55).
        pp = self.cfg.POST_PROCESSING
        self.filter_small_boxes = pp.MIN_BOX_DIMENSION
        self.inflate_ratio = pp.INFLATE_RATIO
        self.drop_overlapping = pp.DROP_OVERLAPPING
        self.ioa_threshold = pp.IOA_THRESHOLD
        self.valid_score = self.cfg.INFERENCE_TH_TEST

    # -- geometry ---------------------------------------------------------
    def get_inference_scale_ratio(self, image_shape) -> float:
        """Reference glass_runner.py:111-121."""
        height, width = image_shape[:2]
        max_dim = max(height, width)
        if max_dim > self.max_target_size:
            return self.max_target_size / max_dim
        if max_dim < self.min_target_size:
            return min(self.max_upscale_ratio, self.min_target_size / max_dim)
        return 1.0

    def _pick_bucket(self, h: int, w: int) -> Tuple[int, int]:
        ph = round_up(h, self.pad_multiple)
        pw = round_up(w, self.pad_multiple)
        candidates = [b for b in self.buckets if b[0] >= ph and b[1] >= pw]
        if not candidates:
            return ph, pw
        return min(candidates, key=lambda b: b[0] * b[1])

    # -- model invocation -------------------------------------------------
    def run_on_resized(self, image: np.ndarray) -> Instances:
        """Run detection+recognition on an already-resized HWC BGR image,
        returning raw (un-postprocessed) instances at the image's scale."""
        h, w = image.shape[:2]
        bh, bw = self._pick_bucket(h, w)
        # keep a uint8 input uint8 — the model folds normalization into the
        # raw-image crop gather on the f32-compute path (glass_rcnn.py
        # use_raw) and uint8 quarters the upload bytes either way.
        pad_dtype = np.uint8 if image.dtype == np.uint8 else np.float32
        padded = np.zeros((bh, bw, 3), pad_dtype)
        padded[:h, :w] = image
        if self.cfg.TPU.TWO_STAGE_INFERENCE:
            out = self._run_two_stage(padded, (h, w))
        else:
            out = self._jit_fn(
                self.params, jnp.asarray(padded), jnp.asarray([h, w], jnp.int32)
            )
            out = jax.device_get(out)
        valid = out["valid"]
        inst = Instances(
            (h, w),
            pred_boxes=out["boxes"][valid],
            scores=out["scores"][valid],
            pred_classes=out["classes"][valid],
            orientations=out["orientations"][valid],
        )
        _set_text_fields(inst, out, valid)
        if "mask_probs" in out:
            inst.pred_masks = _unpack_masks(out["mask_probs"][valid])
            inst.pred_rboxes = out["boxes"][valid]
        return inst

    def _run_two_stage(self, padded: np.ndarray, hw) -> dict:
        """Two-stage inference: detect, then recognize at the smallest word
        bucket covering the actual detection count (TPU.WORD_BUCKETS)."""
        from ..models.glass_rcnn import glass_detect_stage, glass_heads_stage

        if not hasattr(self, "_jit_detect"):
            arch = self.arch
            self._jit_detect = jax.jit(
                lambda p, img, hw_: glass_detect_stage(arch, p, img, hw_)
            )
            self._jit_heads = {}
        det, feats, norm = self._jit_detect(
            self.params, jnp.asarray(padded), jnp.asarray(hw, jnp.int32)
        )
        det_np = jax.device_get(det)
        n = int(det_np["valid"].sum())
        buckets = sorted(self.cfg.TPU.WORD_BUCKETS) + [self.arch.detections_per_image]
        cap = next(b for b in buckets if b >= n)

        boxes = np.zeros((cap, 5), np.float32)
        boxes[:, 2:4] = 1.0
        order = np.argsort(~det_np["valid"])  # valid rows first (stable)
        sel = order[:cap]
        k = min(n, cap)
        boxes[:k] = det_np["boxes"][order[:k]]

        # uint8 upload + f32 compute: stage 2 pools raw crops straight from
        # the uint8 image (u8-packed gather, normalization folded, exact).
        # Under bf16 compute the normalized-image bf16-pair gather is
        # faster and equally precise post-quantization (glass_rcnn.py).
        raw = (
            jnp.asarray(padded)
            if padded.dtype == np.uint8
            and jnp.dtype(self.arch.compute_dtype) == jnp.float32
            else None
        )
        hkey = (cap, raw is not None)  # arity differs with raw-ness
        if hkey not in self._jit_heads:
            arch = self.arch
            if raw is None:
                self._jit_heads[hkey] = jax.jit(
                    lambda p, f, nm, bx: glass_heads_stage(arch, p, f, nm, bx)
                )
            else:
                self._jit_heads[hkey] = jax.jit(
                    lambda p, f, nm, bx, rw: glass_heads_stage(
                        arch, p, f, nm, bx, raw_image=rw
                    )
                )
        args = (self.params, feats, norm, jnp.asarray(boxes))
        heads = self._jit_heads[hkey](*args) if raw is None else self._jit_heads[hkey](*args, raw)
        heads = jax.device_get(heads)

        d = self.arch.detections_per_image
        out = dict(det_np)
        for key in ("text_probs", "text_ids", "text_step_scores", "mask_probs"):
            if key in heads:
                t = heads[key]
                full = np.zeros((d,) + t.shape[1:], t.dtype)
                full[order[:k]] = t[:k]
                out[key] = full
        return out

    def dispatch_batch(self, images: List[np.ndarray]):
        """Async half of ``run_batch_on_resized``: upload + enqueue the
        vmapped model call, returning (device_out, hws) without fetching.
        Lets callers overlap host post-processing of the previous batch with
        this batch's device compute (``eval_batch_call`` does)."""
        bh = max(self._pick_bucket(*im.shape[:2])[0] for im in images)
        bw = max(self._pick_bucket(*im.shape[:2])[1] for im in images)
        b = len(images)
        # sharded serving: round the batch up to a multiple of the mesh
        # size (padded rows are zero images -> zero valid detections)
        ndev = self._serve_mesh.devices.size if self._serve_mesh else 1
        bp = b + (-b) % ndev
        dtype = (
            np.uint8 if all(im.dtype == np.uint8 for im in images) else np.float32
        )
        padded = np.zeros((bp, bh, bw, 3), dtype)
        hws = np.zeros((bp, 2), np.int32)
        for i, im in enumerate(images):
            h, w = im.shape[:2]
            padded[i, :h, :w] = im
            hws[i] = (h, w)
        hws[b:] = 1  # degenerate 1x1 content for padded rows

        key = (bp, bh, bw, padded.dtype.str)
        fn = self.batch_model_fn(key)
        out = fn(self.params, jnp.asarray(padded), jnp.asarray(hws))
        return out, hws[:b]

    def batch_model_fn(self, key):
        """The compiled batched model program for a (b, h, w, dtype) shape
        key — built per TPU.SERVE_BATCH_MODE / SERVE_DATA_PARALLEL and
        cached. Public so the bench can time exactly the product program."""
        if key not in self._jit_batch_fns:
            arch = self.arch
            mode = str(getattr(self.cfg.TPU, "SERVE_BATCH_MODE", "map"))
            if mode == "map":
                # sequential lax.map of the single-image program: keeps its
                # real lax.cond branches + single-row gather layouts, which
                # vmap flattens/re-tiles (TPU.SERVE_BATCH_MODE; measured
                # 2.6x faster at b=4 on v5e, PERF_NOTES round 5). Outputs
                # are bit-identical to b=1 serving by construction.
                def batched(p, imgs, hws_):
                    return jax.lax.map(
                        lambda t: glass_inference_single(arch, p, t[0], t[1]),
                        (imgs, hws_),
                    )
            else:
                batched = jax.vmap(
                    lambda p, img, hw: glass_inference_single(arch, p, img, hw),
                    in_axes=(None, 0, 0),
                )
            if self._serve_mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                mesh = self._serve_mesh
                batch_sh = NamedSharding(mesh, PartitionSpec("data"))
                repl = NamedSharding(mesh, PartitionSpec())
                if mode == "map":
                    # shard_map: each device lax.maps over its LOCAL batch
                    # rows (a sharded-axis lax.map would gather the batch)
                    from jax import shard_map
                    from jax.sharding import PartitionSpec as P

                    # check_vma=False: the model's scans (BiLSTM/decoder)
                    # init their carries as unvarying zeros, which the VMA
                    # type check rejects inside shard_map; replication
                    # tracking isn't needed here (pure per-row map, no
                    # collectives).
                    fn = shard_map(
                        batched,
                        mesh=mesh,
                        in_specs=(P(), P("data"), P("data")),
                        out_specs=P("data"),
                        check_vma=False,
                    )
                else:
                    fn = batched
                self._jit_batch_fns[key] = jax.jit(
                    fn,
                    in_shardings=(repl, batch_sh, batch_sh),
                    out_shardings=batch_sh,
                )
            else:
                self._jit_batch_fns[key] = jax.jit(batched)
        return self._jit_batch_fns[key]

    def run_batch_on_resized(self, images: List[np.ndarray]) -> List[Instances]:
        """Batched inference over same-bucket resized images (one vmapped
        jit call) — the eval-throughput path; amortizes per-dispatch cost."""
        if not images:
            return []
        return self.collect_batch(self.dispatch_batch(images))

    def collect_batch(self, dispatched) -> List[Instances]:
        """Fetch + unpack a ``dispatch_batch`` result."""
        out, hws = dispatched
        # device_get starts every leaf's device->host copy before awaiting
        # any of them; a per-leaf np.asarray loop would serialize one
        # round-trip latency per output tensor.
        out = jax.device_get(out)
        results = []
        for i in range(len(hws)):
            valid = out["valid"][i]
            inst = Instances(
                tuple(hws[i]),
                pred_boxes=out["boxes"][i][valid],
                scores=out["scores"][i][valid],
                pred_classes=out["classes"][i][valid],
                orientations=out["orientations"][i][valid],
            )
            _set_text_fields(inst, {k: v[i] for k, v in out.items()}, valid)
            if "mask_probs" in out:
                inst.pred_masks = _unpack_masks(out["mask_probs"][i][valid])
                inst.pred_rboxes = out["boxes"][i][valid]
            results.append(inst)
        return results

    def _model_postprocess(self, preds: Instances, height: int, width: int) -> Instances:
        """GlassRCNN._postprocess (reference glass_rcnn.py:103-128)."""
        if self.filter_small_boxes:
            preds = self.post_processor.filter_small_boxes(preds)
        if self.inflate_ratio:
            preds = self.post_processor.resize_boxes(preds, self.inflate_ratio)
        if self.drop_overlapping:
            preds = self.post_processor.drop_overlapping_boxes(
                preds, self.ioa_threshold, self.valid_score
            )
        return detector_postprocess(preds, height, width)

    def __call__(self, original_image: np.ndarray) -> Instances:
        if self.input_format == "RGB":
            original_image = original_image[:, :, ::-1]
        if self.input_format == "GREY":
            original_image = rgb2grey(original_image, three_channels=True)
        image_height, image_width = original_image.shape[:2]

        scale_ratio = self.get_inference_scale_ratio(original_image.shape)
        if scale_ratio != 1:
            new_h = int(np.round(scale_ratio * image_height))
            new_w = int(np.round(scale_ratio * image_width))
            image = cv2.resize(
                original_image.astype(np.float32), (new_w, new_h),
                interpolation=cv2.INTER_LINEAR,
            )
        else:
            image = original_image.astype(np.float32)

        preds = self.run_on_resized(image)
        preds = self._model_postprocess(preds, image.shape[0], image.shape[1])

        if scale_ratio != 1 and len(preds):
            preds.pred_boxes = scale_rotated_np(
                np.asarray(preds.pred_boxes), 1.0 / scale_ratio, 1.0 / scale_ratio
            )
        preds._image_size = (image_height, image_width)
        logger.info("Detected %d raw word instances", len(preds))

        if self.post_process_flag:
            preds = self.post_processor(preds)
            logger.info("Post-processing output is %d word instances", len(preds))
        return preds

    def eval_call(self, original_image: np.ndarray) -> Instances:
        """Dataset-evaluation inference path.

        Reference eval uses the d2 test loader's ``ResizeShortestEdge``
        (MIN/MAX_SIZE_TEST) and ``detector_postprocess`` back to the
        original resolution — different from the demo scale-ratio rule of
        ``__call__`` (``glass_runner.py:111-121``).
        """
        from ..data.mapper import shortest_edge_size

        if self.input_format == "RGB":
            original_image = original_image[:, :, ::-1]
        if self.input_format == "GREY":
            original_image = rgb2grey(original_image, three_channels=True)
        oh, ow = original_image.shape[:2]
        nh, nw = shortest_edge_size(oh, ow, self.min_target_size, self.max_target_size)
        resized = cv2.resize(original_image.astype(np.float32), (nw, nh))
        preds = self.run_on_resized(resized)
        preds = self._model_postprocess(preds, oh, ow)
        if self.post_process_flag:
            preds = self.post_processor(preds)
        return preds

    def eval_batch_call(self, original_images: List[np.ndarray], batch_size: int = 8) -> List[Instances]:
        """Batched ``eval_call``: shortest-edge resize, vmapped model,
        detector_postprocess back to original sizes."""
        from ..data.mapper import shortest_edge_size

        # uint8 transfer: resize the raw uint8 image and upload uint8,
        # normalizing on device — 4x less host->device traffic, and the
        # reference-faithful dtype path (d2's eval mapper resizes uint8;
        # the reference runner uploads uint8, glass_runner.py:133-134).
        u8 = bool(self.cfg.TPU.EVAL_UINT8_TRANSFER)
        prepped = []
        for img in original_images:
            if self.input_format == "RGB":
                img = img[:, :, ::-1]
            if self.input_format == "GREY":
                img = rgb2grey(img, three_channels=True)
            oh, ow = img.shape[:2]
            nh, nw = shortest_edge_size(oh, ow, self.min_target_size, self.max_target_size)
            if not u8 or img.dtype != np.uint8:
                img = img.astype(np.float32)
            prepped.append((cv2.resize(img, (nw, nh)), (oh, ow)))

        results: List[Optional[Instances]] = [None] * len(prepped)
        order = sorted(
            range(len(prepped)), key=lambda i: self._pick_bucket(*prepped[i][0].shape[:2])
        )
        # Software pipeline: the next batch's upload + model call is
        # enqueued (async JAX dispatch) before this batch's host
        # post-processing runs, overlapping device and host work.
        chunks = [order[s : s + batch_size] for s in range(0, len(order), batch_size)]
        if bool(getattr(self.cfg.TPU, "ASYNC_FETCH", True)) and len(chunks) > 1:
            # Three-stage pipeline: device compute (async dispatch) ||
            # device->host fetch (worker thread — the transfer releases the
            # GIL, so it rides under host post-processing) || host
            # post-processing (main thread).  Bounded to 2 chunks in
            # flight.  Round-5 e2e split: fetch ~12 ms/img + host ~30
            # ms/img serialized on one thread was the b=4 binding path;
            # overlapping them makes the pipeline device-bound.
            from collections import deque
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(1) as fpool:
                pending = deque()
                for idxs in chunks:
                    dispatched = self.dispatch_batch([prepped[i][0] for i in idxs])
                    pending.append(
                        (idxs, fpool.submit(self.collect_batch, dispatched))
                    )
                    if len(pending) > 2:
                        idxs0, fut = pending.popleft()
                        self._postprocess_chunk(idxs0, fut.result(), prepped, results)
                while pending:
                    idxs0, fut = pending.popleft()
                    self._postprocess_chunk(idxs0, fut.result(), prepped, results)
            return results
        inflight = None
        for ci, idxs in enumerate(chunks):
            dispatched = self.dispatch_batch([prepped[i][0] for i in idxs])
            if inflight is not None:
                self._finish_eval_chunk(inflight, prepped, results)
            inflight = (idxs, dispatched)
        if inflight is not None:
            self._finish_eval_chunk(inflight, prepped, results)
        return results

    def _finish_eval_chunk(self, inflight, prepped, results) -> None:
        idxs, dispatched = inflight
        self._postprocess_chunk(idxs, self.collect_batch(dispatched), prepped, results)

    def _postprocess_chunk(self, idxs, preds, prepped, results) -> None:
        def one(i, pr):
            oh, ow = prepped[i][1]
            pr = self._model_postprocess(pr, oh, ow)
            if self.post_process_flag:
                pr = self.post_processor(pr)
            results[i] = pr

        # Host post-processing (~18 ms/img at the 100-word worst case) is
        # vectorized numpy, which releases the GIL — a thread pool scales
        # it across the batch on multi-core serving hosts
        # (TPU.POSTPROCESS_WORKERS; 0 = sequential).
        workers = int(getattr(self.cfg.TPU, "POSTPROCESS_WORKERS", 0) or 0)
        if workers > 1 and len(idxs) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(min(workers, len(idxs))) as ex:
                list(ex.map(lambda t: one(*t), zip(idxs, preds)))
        else:
            for i, pr in zip(idxs, preds):
                one(i, pr)

    def batch_call(self, original_images: List[np.ndarray], batch_size: int = 8) -> List[Instances]:
        """Full-pipeline batched inference: per-image resize rules, grouped
        vmapped model calls, per-image post-processing."""
        prepped = []
        for img in original_images:
            if self.input_format == "RGB":
                img = img[:, :, ::-1]
            if self.input_format == "GREY":
                img = rgb2grey(img, three_channels=True)
            scale = self.get_inference_scale_ratio(img.shape)
            if scale != 1:
                nh = int(np.round(scale * img.shape[0]))
                nw = int(np.round(scale * img.shape[1]))
                resized = cv2.resize(img.astype(np.float32), (nw, nh))
            else:
                resized = img.astype(np.float32)
            prepped.append((resized, scale, img.shape[:2]))

        results: List[Optional[Instances]] = [None] * len(prepped)
        # Group by bucket so each jit signature is shared.
        order = sorted(
            range(len(prepped)), key=lambda i: self._pick_bucket(*prepped[i][0].shape[:2])
        )
        for start in range(0, len(order), batch_size):
            idxs = order[start : start + batch_size]
            preds = self.run_batch_on_resized([prepped[i][0] for i in idxs])
            for i, pr in zip(idxs, preds):
                resized, scale, (oh, ow) = prepped[i]
                pr = self._model_postprocess(pr, resized.shape[0], resized.shape[1])
                if scale != 1 and len(pr):
                    pr.pred_boxes = scale_rotated_np(
                        np.asarray(pr.pred_boxes), 1.0 / scale, 1.0 / scale
                    )
                pr._image_size = (oh, ow)
                if self.post_process_flag:
                    pr = self.post_processor(pr)
                results[i] = pr
        return results

    def forward_with_given_boxes(self, image: np.ndarray, instances: Instances) -> Instances:
        """Run the recognizer (+mask) branches on externally provided boxes
        (reference ``forward_with_given_boxes``; used by TTA)."""
        from ..models.context import Ctx
        from ..models.glass_rcnn import (
            preprocess,
            backbone_features,
            recognize_single_image,
            mask_single_image,
        )
        import jax.numpy as jnp

        scale_ratio = self.get_inference_scale_ratio(image.shape)
        if scale_ratio != 1:
            nh = int(np.round(scale_ratio * image.shape[0]))
            nw = int(np.round(scale_ratio * image.shape[1]))
            resized = cv2.resize(image.astype(np.float32), (nw, nh))
        else:
            resized = image.astype(np.float32)
        h, w = resized.shape[:2]
        bh, bw = self._pick_bucket(h, w)
        padded = np.zeros((bh, bw, 3), np.float32)
        padded[:h, :w] = resized

        d = self.cfg.TEST.DETECTIONS_PER_IMAGE
        n = min(len(instances), d)
        boxes = np.zeros((d, 5), np.float32)
        boxes[:, 2:4] = 1.0
        if n:
            boxes[:n] = scale_rotated_np(
                np.asarray(instances.pred_boxes)[:n], scale_ratio, scale_ratio
            )

        if self._jit_given_boxes is None:
            arch = self.arch

            def fn(params, img, bx):
                ctx = Ctx(train=False)
                norm = preprocess(arch, img)
                feats = backbone_features(ctx, arch, params, norm[None])
                out = emit_text(
                    arch,
                    recognize_single_image(ctx, arch, params, feats, norm, bx),
                )
                if arch.mask_on and arch.mask_inference:
                    out["mask_probs"] = emit_mask(
                        arch,
                        mask_single_image(
                            ctx, arch, params, feats, bx,
                            jnp.zeros((bx.shape[0],), jnp.int32),
                        ),
                    )
                return out

            self._jit_given_boxes = jax.jit(fn)

        out = self._jit_given_boxes(self.params, jnp.asarray(padded), jnp.asarray(boxes))
        out = jax.device_get(out)
        instances = instances[np.arange(n)]
        _set_text_fields(instances, out, np.arange(n))
        if "mask_probs" in out:
            instances.pred_masks = _unpack_masks(out["mask_probs"][:n])
            instances.pred_rboxes = np.asarray(instances.pred_boxes)
        return instances

    def decode_texts(self, preds: Instances):
        from ..text import decode_instance_texts

        return decode_instance_texts(preds, self.codec)

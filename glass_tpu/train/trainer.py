"""Training orchestration: the reference ``Trainer``/``DefaultTrainer`` loop.

One program drives the whole device mesh (see parallel/mesh.py).  Replicates
the reference loop structure (SGD + WarmupMultiStepLR, periodic
checkpointing via Orbax, scalar metric logging, resume) with TPU-native
additions the reference lacks: checkpoint-on-signal (preemption safety) and
a deterministic data-iterator state (seed + step).
"""

from __future__ import annotations

import logging
import os
import signal
import time
from typing import Optional

import jax
import numpy as np

from ..config import CfgNode
from ..models import GlassArch, init_glass_params
from ..parallel import make_mesh, shard_batch, make_parallel_train_step
from ..data import DatasetManager, DatasetMapper, build_train_loader
from .train_step import TrainConfig, glass_train_forward
from .optimizer import build_optimizer
from .checkpoint import save_checkpoint, load_checkpoint
from ..utils.events import EventStorage

logger = logging.getLogger(__name__)


class Trainer:
    def __init__(self, cfg: CfgNode, mesh=None):
        self.cfg = cfg
        self.arch = GlassArch.from_config(cfg)
        self.tcfg = TrainConfig.from_config(cfg)
        self.mesh = mesh if mesh is not None else make_mesh()
        self.out_dir = cfg.OUTPUT_DIR
        os.makedirs(self.out_dir, exist_ok=True)
        # d2 JSONWriter semantics: rank 0 streams scalars to metrics.json.
        self.storage = EventStorage(
            os.path.join(self.out_dir, "metrics.json")
            if jax.process_index() == 0 else None
        )

        seed = cfg.SEED if cfg.SEED >= 0 else 0
        key = jax.random.PRNGKey(seed)
        self.params = init_glass_params(key, self.arch)
        if cfg.MODEL.WEIGHTS:
            from .checkpoint import load_any_checkpoint, overlay_params

            loaded = load_any_checkpoint(cfg.MODEL.WEIGHTS)
            # Partial overlays (e.g. ImageNet trunk) keep the fresh init for
            # everything the checkpoint doesn't cover.
            self.params = overlay_params(self.params, loaded)
        self.tx, self.schedule = build_optimizer(cfg, self.params)
        self.opt_state = self.tx.init(self.params)
        self.start_iter = 0
        self._rng = jax.random.PRNGKey(seed + 1)

        arch, tcfg = self.arch, self.tcfg

        def loss_fn(params, batch, step_key):
            step_key = jax.random.fold_in(step_key, jax.lax.axis_index("data"))
            total, losses, bn = glass_train_forward(
                arch, tcfg, params, batch, step_key, axis_name="data"
            )
            return total, (losses, bn)

        self.step_fn = make_parallel_train_step(self.mesh, loss_fn, self.tx)
        self._interrupted = False

    # -- data -------------------------------------------------------------
    def build_train_loader(self):
        DatasetManager(self.cfg).register()
        records = []
        for name in self.cfg.DATASETS.TRAIN:
            records.extend(DatasetManager.load(name))
        # d2 default_setup: SEED >= 0 seeds the augmentation RNG with
        # seed + rank (reproducible training, decorrelated across hosts);
        # SEED < 0 keeps nondeterministic augmentations.
        aug_rng = (
            np.random.RandomState(self.cfg.SEED + jax.process_index())
            if self.cfg.SEED >= 0
            else None
        )
        mapper = DatasetMapper(self.cfg, is_train=True, rng=aug_rng)
        # SOLVER.IMS_PER_BATCH is the GLOBAL batch (reference
        # build.py:113-127 divides by world size); each process builds only
        # its local shard, which shard_batch assembles into the global array.
        global_batch = self.cfg.SOLVER.IMS_PER_BATCH
        world = jax.process_count()
        assert global_batch % world == 0, (
            f"SOLVER.IMS_PER_BATCH={global_batch} must divide evenly over "
            f"{world} processes"
        )
        if world > 1 and not self.cfg.TPU.TRAIN_PAD_SIZE:
            raise ValueError(
                "multi-host training requires a fixed TPU.TRAIN_PAD_SIZE "
                "[H, W] so all processes emit identical batch shapes"
            )
        return build_train_loader(
            self.cfg,
            records,
            mapper,
            batch_size=global_batch // world,
            seed=max(self.cfg.SEED, 0),
            rank=jax.process_index(),
            world=world,
        )

    # -- checkpoint / resume ----------------------------------------------
    def resume_or_load(self, resume: bool = True):
        marker = os.path.join(self.out_dir, "last_checkpoint")
        if resume and os.path.exists(marker):
            state = load_checkpoint(self.out_dir)
            self.params = state["params"]
            self.opt_state = state.get("opt_state", self.opt_state)
            self.start_iter = int(state.get("extra", {}).get("iteration", 0)) + 1
            logger.info("Resumed from iteration %d", self.start_iter)

    def save(self, iteration: int):
        self._last_saved_iter = iteration
        save_checkpoint(
            self.out_dir,
            iteration,
            jax.tree_util.tree_map(np.asarray, self.params),
            opt_state=jax.tree_util.tree_map(np.asarray, self.opt_state),
            extra={"iteration": iteration},
        )
        logger.info("Saved checkpoint at iteration %d", iteration)

    # -- precise BN ---------------------------------------------------------
    def precise_bn(self, num_iter: Optional[int] = None):
        """Recompute BN running stats as the TRUE average of batch statistics
        over ``num_iter`` train batches (d2 ``PreciseBN`` hook / fvcore
        ``update_bn_stats``, enabled by ``TEST.PRECISE_BN.ENABLED``; the
        reference's DefaultTrainer registers it before each eval).

        ``layers.batch_norm`` returns EMA-updated stats
        (``new = (1-m)*old + m*batch``); with params held constant across
        the passes the batch statistics are recovered by inverting the EMA
        on the averaged updates.  Frozen stages emit no updates and keep
        their stats, as with d2's FrozenBatchNorm.  Stats are folded back
        into ``self.params`` (d2 mutates the model buffers the same way).
        """
        from .train_step import glass_train_forward
        from .optimizer import apply_bn_updates

        num_iter = int(num_iter or self.cfg.TEST.PRECISE_BN.NUM_ITER)
        loader = iter(self.build_train_loader())
        arch, tcfg = self.arch, self.tcfg

        @jax.jit
        def bn_stats(params, batch, key):
            _, _, bn = glass_train_forward(arch, tcfg, params, batch, key)
            return bn

        sums = None
        key = self._rng
        for it in range(num_iter):
            batch = next(loader)
            key, k = jax.random.split(key)
            bn = jax.tree_util.tree_map(
                np.asarray, bn_stats(self.params, batch, k)
            )
            sums = bn if sums is None else jax.tree_util.tree_map(
                np.add, sums, bn
            )
        if sums is None:
            return
        momentum = 0.1  # layers.batch_norm EMA constant
        precise = {}
        for path, stats in sums.items():
            node = self.params
            for part in path.split("."):
                node = node[part]
            avg_mean = stats["running_mean"] / num_iter
            avg_var = stats["running_var"] / num_iter
            precise[path] = {
                "running_mean": (
                    avg_mean - (1 - momentum) * np.asarray(node["running_mean"])
                ) / momentum,
                "running_var": (
                    avg_var - (1 - momentum) * np.asarray(node["running_var"])
                ) / momentum,
            }
        self.params = apply_bn_updates(self.params, precise)
        logger.info(
            "PreciseBN: replaced %d BN layers' running stats with the "
            "average over %d train batches", len(precise), num_iter
        )

    # -- periodic evaluation ----------------------------------------------
    def test(self, max_images: Optional[int] = None):
        """Evaluate the current params on cfg.DATASETS.TEST.

        The reference runs TextEvaluator every TEST.EVAL_PERIOD iterations
        (glass_pretrain.yaml:139); this is the same in-training oracle, and
        also prints a pred-vs-gt transcription sample table (the reference's
        print_text_pred_examples affordance).

        Multi-host: EVERY process must enter this function — each evaluates
        its strided shard of the test set and the evaluator's
        ``gather_across_processes`` is a collective allgather (reference
        gathers to rank 0 over gloo, ``text_evaluator.py:246-252``).  All
        ranks return identical metrics; only rank 0's EventStorage writes.
        """
        if not self.cfg.DATASETS.TEST:
            return {}
        if self.cfg.TEST.PRECISE_BN.ENABLED and self.cfg.DATASETS.TRAIN:
            self.precise_bn()
        import cv2

        from ..data import DatasetManager
        from ..evaluation import TextEvaluator
        from ..inference import GlassRunner
        from ..text import decode_instance_texts

        runner = GlassRunner(model_path=None, cfg=self.cfg, params=self.params)
        results = {}
        for name in self.cfg.DATASETS.TEST:
            records = DatasetManager.load(name)
            if max_images:
                records = records[:max_images]
            # multi-host: each process evaluates a strided shard; results
            # are allgathered inside TextEvaluator.evaluate()
            if jax.process_count() > 1:
                records = records[jax.process_index() :: jax.process_count()]
            evaluator = TextEvaluator(name, self.cfg)
            shown = 0
            for i, record in enumerate(records):
                image = cv2.imread(record["file_name"], cv2.IMREAD_COLOR)
                if image is None:
                    continue
                preds = runner(image)
                evaluator.process(str(record.get("image_id", i)), preds, record)
                if shown < 1 and len(preds):
                    texts, scores, _ = decode_instance_texts(preds, runner.codec)
                    gt = [a.get("text", "") for a in record.get("annotations", [])][:7]
                    logger.info(
                        "sample preds: %s | gt: %s",
                        [f"{t}({s:.2f})" for t, s in zip(texts[:7], scores[:7])],
                        gt,
                    )
                    shown += 1
            results[name] = evaluator.evaluate()
            for metric_group, vals in results[name].items():
                for k, v in vals.items():
                    self.storage.put_scalar(f"{name}/{metric_group}/{k}", v)
        return results

    def _maybe_visualize(self, it: int, batch: dict):
        """VIS_PERIOD minibatch dump (reference glass_pretrain.yaml:144-146):
        write the first image of the batch with its gt boxes drawn."""
        period = self.cfg.VIS_PERIOD
        if not period or it % period != 0:
            return
        try:
            import cv2

            img = np.asarray(batch["images"][0]).astype(np.uint8).copy()
            boxes = np.asarray(batch["gt_boxes"][0])
            valid = np.asarray(batch["gt_valid"][0])
            from ..postprocess.np_geometry import boxes_to_polygons_np

            polys = boxes_to_polygons_np(boxes[valid]).astype(np.int32)
            cv2.polylines(img, list(polys), True, (0, 255, 0), 1)
            out = os.path.join(self.out_dir, f"vis_{it:07d}.png")
            cv2.imwrite(out, img)
        except Exception as e:  # never break training for a debug image
            logger.debug("vis dump failed: %s", e)

    # -- loop --------------------------------------------------------------
    def _install_signal_handler(self):
        def handler(signum, frame):
            logger.warning("Signal %d received: checkpointing before exit", signum)
            self._interrupted = True

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                signal.signal(sig, handler)
            except ValueError:
                pass  # not the main thread

    def train(self, max_iter: Optional[int] = None):
        max_iter = max_iter or self.cfg.SOLVER.MAX_ITER
        loader = self.build_train_loader()
        self._install_signal_handler()
        ckpt_period = self.cfg.SOLVER.CHECKPOINT_PERIOD
        eval_period = self.cfg.TEST.EVAL_PERIOD
        t0 = time.time()
        data_wait = 0.0
        for it in range(self.start_iter, max_iter):
            td = time.time()
            host_batch = next(loader)
            data_wait += time.time() - td
            self._maybe_visualize(it, host_batch)
            batch = shard_batch(self.mesh, host_batch)
            key = jax.random.fold_in(self._rng, it)
            self.params, self.opt_state, metrics = self.step_fn(
                self.params, self.opt_state, batch, key
            )
            self.storage.step(it)
            if it % 20 == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                for k, v in metrics.items():
                    self.storage.put_scalar(k, v)
                if metrics.get("matcher_pool_dropped", 0.0) > 0:
                    # Anchor matching silently degrades to background for
                    # the dropped candidates — make it loud.
                    logger.warning(
                        "anchor-match pool overflow: %.0f bound-passing "
                        "candidates dropped this step; raise TPU.MATCH_POOL "
                        "or set it to 0 (auto-size from MAX_GT_INSTANCES)",
                        metrics["matcher_pool_dropped"],
                    )
                if metrics.get("matcher_tile_dropped", 0.0) > 0:
                    logger.warning(
                        "tiled matcher live-tile overflow: %.0f flagged "
                        "tiles dropped this step (each may hide a full "
                        "tile of candidates); raise TPU.MATCH_TILE_CAP",
                        metrics["matcher_tile_dropped"],
                    )
                lr = float(self.schedule(it))
                dt = time.time() - t0
                # data_time: wall time blocked on the input pipeline — if
                # this approaches dt, raise DATALOADER.NUM_WORKERS.
                self.storage.put_scalar("data_time", data_wait)
                logger.info(
                    "iter %d  %s  lr %.5f  %.2f s/20it (data wait %.2f s)",
                    it,
                    # d2 console convention: losses only; the full metric set
                    # (rpn/fast_rcnn/mask_rcnn diagnostics) goes to
                    # metrics.json via EventStorage above.
                    "  ".join(
                        f"{k}={v:.4f}"
                        for k, v in sorted(metrics.items())
                        if "/" not in k
                    ),
                    lr,
                    dt,
                    data_wait,
                )
                t0 = time.time()
                data_wait = 0.0
            if ckpt_period and it > 0 and it % ckpt_period == 0:
                self.save(it)
            if eval_period and it > 0 and it % eval_period == 0:
                try:
                    self.test()
                except Exception as e:
                    logger.warning("periodic eval failed: %s", e)
            if self._interrupted:
                self.save(it)
                self.storage.flush()
                logger.warning("Exiting on signal at iteration %d", it)
                return
        if getattr(self, "_last_saved_iter", None) != max_iter - 1:
            self.save(max_iter - 1)
        self.storage.flush()

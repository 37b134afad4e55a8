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
import jax.numpy as jnp
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
        if mesh is None:
            # TPU.TRAIN_DEVICES > 0 restricts the data mesh to the first N
            # local devices (0 = all).  Lets small-batch runs (and the CPU
            # test tier's forced 8-device host platform) train with
            # IMS_PER_BATCH below the machine's device count.
            n = int(getattr(cfg.TPU, "TRAIN_DEVICES", 0) or 0)
            mesh = make_mesh(jax.devices()[:n] if n > 0 else None)
        self.mesh = mesh
        ndev = int(self.mesh.devices.size)
        if cfg.SOLVER.IMS_PER_BATCH % ndev != 0:
            raise ValueError(
                f"SOLVER.IMS_PER_BATCH={cfg.SOLVER.IMS_PER_BATCH} must be "
                f"divisible by the data-mesh size ({ndev} devices); set "
                "TPU.TRAIN_DEVICES to train on a subset of devices"
            )
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
        # a latched interrupt from a PREVIOUS train()/test() call must not
        # no-op this one (each call gets its own interrupt window)
        self._interrupted = False
        ckpt_period = self.cfg.SOLVER.CHECKPOINT_PERIOD
        eval_period = self.cfg.TEST.EVAL_PERIOD
        loop_k = max(1, int(getattr(self.cfg.TPU, "TRAIN_LOOP_STEPS", 1)))
        if loop_k > 1:
            return self._train_chunked(max_iter, loader, loop_k)
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

    @staticmethod
    def chunk_len(
        it: int,
        max_iter: int,
        loop_k: int,
        ckpt_period: int,
        eval_period: int,
        vis_period: int,
    ) -> int:
        """Iterations to run in the next in-graph chunk starting at ``it``.

        Chunk ends land exactly on the K=1 loop's side-effect boundaries:
        checkpoint/eval fire AFTER executing iteration m*p (chunk must
        include it), visualization at the START of iteration m*v (chunk
        must end just before it).  Pure so it is unit-testable
        (tests/test_train_loop.py)."""
        nxt = max_iter
        for p in (ckpt_period, eval_period):
            if p:
                nxt = min(nxt, (max(it - 1, 0) // p + 1) * p + 1)
        if vis_period:
            nxt = min(nxt, (it // vis_period + 1) * vis_period)
        return max(1, min(loop_k, nxt - it))

    def _train_chunked(self, max_iter: int, loader, loop_k: int):
        """The in-graph multi-step train loop (``TPU.TRAIN_LOOP_STEPS`` = K):
        K minibatches are staged, stacked, and dispatched as ONE jit
        program that ``lax.scan``s K optimizer steps with the params/
        opt_state feedback as the scan carry.

        One dispatch per K steps amortizes per-dispatch latency and keeps
        the feedback loop device-resident (PERF_NOTES round 4: tunneled
        runtimes round-trip host-fed-back outputs — 12-52 s/step).  The
        PRNG stream folds the GLOBAL iteration index, so training is
        step-for-step identical to the K=1 loop (tests/test_train_loop.py).
        Checkpoint/eval/vis fire at their exact iterations: chunks shrink
        to land on every period boundary (a shrunken chunk size compiles
        once and is reused at every boundary with the same remainder).
        """
        from ..parallel.mesh import make_parallel_train_scan, shard_batch_stack

        scan_fn = make_parallel_train_scan(self.step_fn)
        ckpt_period = self.cfg.SOLVER.CHECKPOINT_PERIOD
        eval_period = self.cfg.TEST.EVAL_PERIOD
        vis_period = self.cfg.VIS_PERIOD
        t0 = time.time()
        data_wait = 0.0
        it = self.start_iter
        while it < max_iter:
            chunk = self.chunk_len(
                it, max_iter, loop_k, ckpt_period, eval_period, vis_period
            )
            td = time.time()
            host_batches = [next(loader) for _ in range(chunk)]
            data_wait += time.time() - td
            self._maybe_visualize(it, host_batches[0])
            # Batches land in different padded resize buckets (multi-scale
            # train sizes); a scan program needs one static shape, so stack
            # only CONSECUTIVE same-shape batches.  Each (length, shape)
            # pair compiles once and is reused; per-iteration PRNG keys make
            # the split step-for-step identical to the K=1 loop.  Groups of
            # one reuse the already-compiled single-step program.
            def _sig(tree):
                return tuple(
                    (np.asarray(x).shape, np.asarray(x).dtype.str)
                    for x in jax.tree_util.tree_leaves(tree)
                )

            metrics_parts = []
            g0 = 0
            while g0 < chunk:
                g1 = g0 + 1
                s0 = _sig(host_batches[g0])
                while g1 < chunk and _sig(host_batches[g1]) == s0:
                    g1 += 1
                if g1 - g0 == 1:
                    batch = shard_batch(self.mesh, host_batches[g0])
                    key = jax.random.fold_in(self._rng, it + g0)
                    self.params, self.opt_state, m = self.step_fn(
                        self.params, self.opt_state, batch, key
                    )
                    metrics_parts.append(
                        {k: np.asarray(v)[None] for k, v in m.items()}
                    )
                else:
                    batches = shard_batch_stack(
                        self.mesh, host_batches[g0:g1]
                    )
                    keys = jnp.stack([
                        jax.random.fold_in(self._rng, i)
                        for i in range(it + g0, it + g1)
                    ])
                    self.params, self.opt_state, m = scan_fn(
                        self.params, self.opt_state, batches, keys
                    )
                    metrics_parts.append(
                        {k: np.asarray(v) for k, v in m.items()}
                    )
                g0 = g1
            metrics = {
                k: np.concatenate([p[k] for p in metrics_parts])
                for k in metrics_parts[0]
            }
            for j in range(chunk):
                step_it = it + j
                self.storage.step(step_it)
                if step_it % 20 == 0:
                    for k, v in metrics.items():
                        self.storage.put_scalar(k, float(v[j]))
            last = {k: float(v[-1]) for k, v in metrics.items()}
            # same loud degradation warnings as the K=1 loop (worst step of
            # the chunk)
            for mk, msg in (
                ("matcher_pool_dropped",
                 "anchor-match pool overflow: %.0f bound-passing candidates "
                 "dropped in this chunk's worst step; raise TPU.MATCH_POOL "
                 "or set it to 0 (auto-size from MAX_GT_INSTANCES)"),
                ("matcher_tile_dropped",
                 "tiled matcher live-tile overflow: %.0f flagged tiles "
                 "dropped in this chunk's worst step; raise "
                 "TPU.MATCH_TILE_CAP"),
            ):
                worst = float(np.max(metrics[mk])) if mk in metrics else 0.0
                if worst > 0:
                    logger.warning(msg, worst)
            it += chunk
            lr = float(self.schedule(it - 1))
            dt = time.time() - t0
            logger.info(
                "iter %d  %s  lr %.5f  %.2f s/%dit (data wait %.2f s)",
                it - 1,
                "  ".join(
                    f"{k}={v:.4f}" for k, v in sorted(last.items()) if "/" not in k
                ),
                lr,
                dt,
                chunk,
                data_wait,
            )
            t0 = time.time()
            data_wait = 0.0
            last_it = it - 1  # last executed iteration of this chunk
            if ckpt_period and last_it > 0 and last_it % ckpt_period == 0:
                self.save(last_it)
            if eval_period and last_it > 0 and last_it % eval_period == 0:
                try:
                    self.test()
                except Exception as e:
                    logger.warning("periodic eval failed: %s", e)
            if self._interrupted:
                self.save(it - 1)
                self.storage.flush()
                logger.warning("Exiting on signal at iteration %d", it - 1)
                return
        if getattr(self, "_last_saved_iter", None) != max_iter - 1:
            self.save(max_iter - 1)
        self.storage.flush()

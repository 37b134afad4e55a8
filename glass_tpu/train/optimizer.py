"""Optimizer and LR schedule.

Replicates detectron2's ``build_optimizer`` + ``WarmupMultiStepLR``
(reference SOLVER config, ``configs/glass_pretrain.yaml:114-119``): SGD with
momentum 0.9, weight decay 1e-4 (0 on norm parameters —
``SOLVER.WEIGHT_DECAY_NORM``), linear warmup, x GAMMA at each milestone.
Built on optax with a parameter-label mask for the decay groups.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import optax


def warmup_multistep_schedule(
    base_lr: float,
    steps: Sequence[int],
    gamma: float,
    warmup_iters: int,
    warmup_factor: float,
    warmup_method: str = "linear",
):
    milestones = jnp.asarray(sorted(steps), jnp.int32)

    def schedule(count):
        decay = gamma ** jnp.sum(count >= milestones)
        if warmup_iters > 0:
            alpha = jnp.clip(count / warmup_iters, 0.0, 1.0)
            if warmup_method == "linear":
                warm = warmup_factor * (1 - alpha) + alpha
            else:  # constant
                warm = jnp.where(count < warmup_iters, warmup_factor, 1.0)
        else:
            warm = 1.0
        return base_lr * decay * warm

    return schedule


def _is_norm_param(path) -> bool:
    keys = [getattr(p, "key", str(p)) for p in path]
    joined = ".".join(keys)
    if "running_mean" in joined or "running_var" in joined:
        return True  # not trained at all (masked out elsewhere)
    # BN/LN scale+bias: parent named 'norm', 'bn*', or LayerNorm slots.
    for i, k in enumerate(keys):
        if k in ("norm",) or k.startswith("bn") or (k.isdigit() and i > 0 and keys[i - 1] == "channel_add_conv" and k == "1"):
            return True
    return False


def _trainable(path) -> bool:
    leaf = getattr(path[-1], "key", str(path[-1]))
    return leaf not in ("running_mean", "running_var")


def build_optimizer(cfg, params):
    schedule = warmup_multistep_schedule(
        cfg.SOLVER.BASE_LR,
        list(cfg.SOLVER.STEPS),
        cfg.SOLVER.GAMMA,
        cfg.SOLVER.WARMUP_ITERS,
        cfg.SOLVER.WARMUP_FACTOR,
        cfg.SOLVER.WARMUP_METHOD,
    )

    wd = cfg.SOLVER.WEIGHT_DECAY
    wd_norm = cfg.SOLVER.WEIGHT_DECAY_NORM

    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: (
            "frozen" if not _trainable(path) else ("norm" if _is_norm_param(path) else "default")
        ),
        params,
    )

    def sgd(weight_decay):
        chain = []
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        chain.append(optax.sgd(schedule, momentum=cfg.SOLVER.MOMENTUM,
                               nesterov=cfg.SOLVER.NESTEROV))
        return optax.chain(*chain)

    tx = optax.multi_transform(
        {
            "default": sgd(wd),
            "norm": sgd(wd_norm),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    if cfg.SOLVER.CLIP_GRADIENTS.ENABLED:
        if cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE == "value":
            clip = optax.clip(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE)
        else:
            clip = optax.clip_by_global_norm(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE)
        tx = optax.chain(clip, tx)
    return tx, schedule


def apply_bn_updates(params: dict, updates: dict) -> dict:
    """Fold collected batch-norm running-stat updates back into the tree."""
    if not updates:
        return params
    # tree_map rebuilds every container, so in-place edits below only touch
    # the fresh copy.
    out = jax.tree_util.tree_map(lambda x: x, params)
    for path_str, stats in updates.items():
        parts = path_str.split(".")
        node = out
        for p in parts:
            node = node[p]
        node["running_mean"] = stats["running_mean"]
        node["running_var"] = stats["running_var"]
    return out

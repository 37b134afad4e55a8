"""Execution context threaded through model apply functions.

Carries the train/eval flag, the mesh axis name for cross-replica batch-norm
(the TPU-native SyncBN: ``jax.lax.pmean`` over the data axis instead of the
reference's NCCL SyncBN), and a collector for updated batch-norm running
statistics so the training step can fold them back into the param tree.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from . import layers as L


class Ctx:
    def __init__(self, train: bool = False, axis_name: Optional[str] = None):
        self.train = train
        self.axis_name = axis_name
        self.bn_updates: Dict[str, dict] = {}


def conv_norm(
    ctx: Ctx,
    x: jnp.ndarray,
    params: dict,
    path: str,
    stride=1,
    padding=0,
    relu: bool = False,
    dilation=1,
):
    """conv2d followed by optional BN (params may hold 'norm') and ReLU."""
    out = L.conv2d(
        x,
        params["weight"],
        params.get("bias"),
        stride=stride,
        padding=padding,
        dilation=dilation,
    )
    if "norm" in params:
        out = apply_bn(ctx, out, params["norm"], path + ".norm")
    if relu:
        out = jnp.maximum(out, 0)
    return out


def apply_bn(ctx: Ctx, x: jnp.ndarray, bn_params: dict, path: str):
    if ctx.train:
        out, new_stats = L.batch_norm(x, bn_params, train=True, axis_name=ctx.axis_name)
        ctx.bn_updates[path] = {
            "running_mean": new_stats["running_mean"],
            "running_var": new_stats["running_var"],
        }
        return out
    return L.batch_norm(x, bn_params, train=False)

"""Device-mesh data parallelism.

TPU-native replacement for the reference's process-per-GPU launcher
(``tools/train_glass.py:89-96``: d2 ``launch`` + DDP + NCCL SyncBN).  One
program drives all chips through a ``jax.sharding.Mesh``:

* batch sharded over the ``data`` axis, parameters/optimizer state
  replicated,
* gradient allreduce = ``jax.lax.pmean`` inside ``shard_map`` (rides ICI),
* SyncBN = the same ``pmean`` on batch statistics (models/layers.batch_norm),
* multi-host: the same program under ``jax.distributed.initialize`` — the
  mesh spans all processes, nothing else changes.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None, axis_name: str = DATA_AXIS) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a host batch with its leading dim sharded over the data axis.

    Single-process: a plain ``device_put`` scatter.  Multi-process (pod
    slices): each process holds only its LOCAL slice of the global batch
    (``global = local * process_count``, see ``Trainer.build_train_loader``),
    assembled into one global array with
    ``jax.make_array_from_process_local_data`` — a host-global
    ``device_put`` would be wrong there (every process would try to
    materialize the full batch).
    """
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), sharding), batch
        )
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        batch,
    )


def make_parallel_train_step(
    mesh: Mesh,
    loss_fn: Callable,
    tx,
) -> Callable:
    """Build the pjit-ted data-parallel train step.

    loss_fn(params, batch, key) -> (total, (loss_dict, bn_updates)), written
    for a per-shard batch with BN using axis_name = "data".

    Returns step(params, opt_state, batch, key) -> (params, opt_state,
    metrics) with gradients pmean-ed over the data axis.
    """
    from jax import shard_map

    from ..train.optimizer import apply_bn_updates

    def sharded_grads(params, batch, key):
        # Per-shard: local loss/grads, then cross-replica mean.
        (total, (loss_dict, bn_updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch, key)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        total = jax.lax.pmean(total, DATA_AXIS)
        loss_dict = jax.lax.pmean(loss_dict, DATA_AXIS)
        bn_updates = jax.lax.pmean(bn_updates, DATA_AXIS)
        return total, loss_dict, grads, bn_updates

    grads_sharded = shard_map(
        sharded_grads,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )

    import os
    from functools import partial

    # Donating params/opt_state aliases the output buffers onto the inputs:
    # in-place update semantics, halving peak HBM for params+momentum.
    # Callers must treat the passed-in params/opt_state as consumed (the
    # trainer and benches already do); CPU ignores donation.
    # GLASS_TPU_DONATE=0 opts out (e.g. when probing tunnel-runtime
    # feedback behavior, PERF_NOTES round 4).
    donate = (0, 1) if os.environ.get("GLASS_TPU_DONATE", "1") != "0" else ()

    def step_body(params, opt_state, batch, key):
        total, loss_dict, grads, bn_updates = grads_sharded(params, batch, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        params = apply_bn_updates(params, bn_updates)
        metrics = dict(loss_dict)
        metrics["total_loss"] = total
        return params, opt_state, metrics

    step = partial(jax.jit, donate_argnums=donate)(step_body)
    step.body = step_body  # for make_parallel_train_loop
    return step


def make_parallel_train_loop(step, n_steps: int) -> Callable:
    """Wrap a ``make_parallel_train_step`` result in ONE jit program that
    runs ``n_steps`` consecutive steps on the same batch, the params/
    opt_state feedback carried INSIDE the program (XLA aliases loop
    carries in place).

    This is the benchmarking methodology that stays device-time-faithful
    on remote/tunneled runtimes: a host-dispatched step loop feeds step
    N's outputs back as step N+1's inputs, which the axon tunnel runtime
    round-trips through the host (~600 MB of params+momentum per step —
    measured 0.14 s/step dispatched-without-feedback vs 12-52 s/step with,
    PERF_NOTES round 4).  Per-step cost = total / n_steps; dispatch and
    fetch amortize exactly like the 10-step pipelined-dispatch window this
    replaces, so the numbers are comparable.
    """
    body = step.body

    @jax.jit
    def loop(params, opt_state, batch, key):
        def one(i, carry):
            p, o, _ = carry
            return body(p, o, batch, jax.random.fold_in(key, i))

        zero_metrics = jax.eval_shape(body, params, opt_state, batch, key)[2]
        init_metrics = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), zero_metrics
        )
        return jax.lax.fori_loop(0, n_steps, one, (params, opt_state, init_metrics))

    return loop


def make_parallel_train_scan(step) -> Callable:
    """K train steps on K DISTINCT batches in ONE jit program.

    ``scan_fn(params, opt_state, batches, keys)`` where every leaf of
    ``batches`` carries a leading step axis K (stacked minibatches,
    sharded ``P(None, DATA_AXIS)``) and ``keys`` is the (K,) stack of
    per-step PRNG keys (the caller folds the global iteration index in,
    so the stream is identical to the one-dispatch-per-step loop): a
    ``lax.scan`` over the step axis runs one optimizer step per minibatch
    with the params/opt_state feedback as the scan carry
    (device-resident, aliased in place).
    Returns (params, opt_state, metrics) with every metric leaf stacked
    (K,) so the caller logs each step individually.

    This is the production TPU train-loop shape — one dispatch per K
    steps amortizes per-dispatch latency and keeps the feedback loop off
    the host entirely (on the dev tunnel, host-fed-back outputs cost
    12-52 s/step; see PERF_NOTES round 4).  Enabled in the Trainer via
    ``TPU.TRAIN_LOOP_STEPS``.
    """
    import os
    from functools import partial

    body = step.body
    donate = (0, 1) if os.environ.get("GLASS_TPU_DONATE", "1") != "0" else ()

    @partial(jax.jit, donate_argnums=donate)
    def scan_fn(params, opt_state, batches, keys):
        def one(carry, xs):
            p, o = carry
            key, batch = xs
            p, o, metrics = body(p, o, batch, key)
            return (p, o), metrics

        (params, opt_state), metrics = jax.lax.scan(
            one, (params, opt_state), (keys, batches)
        )
        return params, opt_state, metrics

    return scan_fn


def shard_batch_stack(mesh: Mesh, batches: list) -> dict:
    """Stack K host minibatches into one device tree with leading step
    axis K and the per-step batch axis sharded over the data mesh axis
    (``P(None, DATA_AXIS)``).  Multi-process: each process contributes its
    local slice of every step's global batch, exactly like
    ``shard_batch``."""
    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)
    sharding = NamedSharding(mesh, P(None, DATA_AXIS))
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), sharding), stacked
        )
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        stacked,
    )

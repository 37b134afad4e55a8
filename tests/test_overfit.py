"""Sanity: the training step actually learns (loss drops on one batch)."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np
import jax
import optax
import pytest

from glass_tpu.models import init_glass_params
from glass_tpu.train.train_step import glass_train_forward
from test_train_step import TINY_ARCH, TINY_TCFG, make_batch


@pytest.mark.slow
def test_loss_decreases_overfitting_one_batch():
    import jax.numpy as jnp

    params = init_glass_params(jax.random.PRNGKey(0), TINY_ARCH)
    batch = {k: jnp.asarray(v) for k, v in make_batch(b=1, h=96, w=96).items()}
    tx = optax.sgd(0.002, momentum=0.9)
    opt_state = tx.init(params)

    def loss_fn(p, key):
        total, losses, _ = glass_train_forward(TINY_ARCH, TINY_TCFG, p, batch, key)
        return total, losses

    @jax.jit
    def step(p, o, key):
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, key)
        upd, o = tx.update(grads, o, p)
        p = jax.tree_util.tree_map(lambda a, u: a + u, p, upd)
        return p, o, total, losses

    key = jax.random.PRNGKey(42)  # fixed sampling each step: pure overfit
    totals = []
    for i in range(30):
        params, opt_state, total, losses = step(params, opt_state, key)
        totals.append(float(total))
    assert np.isfinite(totals).all()
    first = np.mean(totals[:5])
    last = np.mean(totals[-5:])
    assert last < first * 0.8, (first, last, totals)

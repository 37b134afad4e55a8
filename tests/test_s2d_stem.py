"""The space-to-depth stem reparametrization must match the direct
7x7/2 conv exactly (same math, different compute layout).

Reference stem being reproduced: detectron2 ``BasicStem`` (conv 7x7/2
pad 3 + BN + relu), selected by the GLASS configs' ResNet-50 backbone.
"""

import jax
import jax.numpy as jnp
import numpy as np

from glass_tpu.models.context import Ctx
from glass_tpu.models.resnet import _stem_conv_s2d, init_resnet50, resnet50_apply


def _direct(params, x):
    from glass_tpu.models.context import conv_norm

    return conv_norm(
        Ctx(train=True), x, params, "stem.conv1", stride=2, padding=3,
        relu=True,
    )


def test_s2d_stem_matches_direct_even_and_odd():
    rng = np.random.RandomState(0)
    params = init_resnet50(jax.random.PRNGKey(0))["stem"]["conv1"]
    for h, w in [(64, 96), (63, 97), (64, 95)]:
        x = jnp.asarray(rng.randn(2, h, w, 3).astype(np.float32))
        direct = _direct(params, x)
        s2d = _stem_conv_s2d(Ctx(train=True), x, params, "stem.conv1")
        assert s2d.shape == direct.shape
        np.testing.assert_allclose(
            np.asarray(s2d), np.asarray(direct), atol=1e-5, rtol=1e-5
        )


def test_s2d_stem_weight_grad_matches_direct():
    rng = np.random.RandomState(1)
    params = init_resnet50(jax.random.PRNGKey(1))["stem"]["conv1"]
    x = jnp.asarray(rng.randn(1, 48, 64, 3).astype(np.float32))

    def loss_direct(w):
        p = dict(params, weight=w)
        return jnp.sum(_direct(p, x) ** 2)

    def loss_s2d(w):
        p = dict(params, weight=w)
        return jnp.sum(_stem_conv_s2d(Ctx(train=True), x, p, "s") ** 2)

    g_d = jax.grad(loss_direct)(params["weight"])
    g_s = jax.grad(loss_s2d)(params["weight"])
    np.testing.assert_allclose(
        np.asarray(g_s), np.asarray(g_d), atol=2e-3, rtol=1e-4
    )


def test_train_vs_eval_backbone_stem_consistency():
    """resnet50_apply picks s2d in train ctx and direct in eval ctx; with
    BN folded to identity the two must agree (batch stats vs running stats
    aside, compare convs by zero-centered unit-var running stats and batch
    stats of the same distribution is noisy — so run freeze_at=1 where the
    train path also uses FrozenBN + the direct conv)."""
    rng = np.random.RandomState(2)
    params = init_resnet50(jax.random.PRNGKey(2))
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    f_train = resnet50_apply(Ctx(train=True), params, x, freeze_at=1)
    f_eval = resnet50_apply(Ctx(train=False), params, x, freeze_at=1)
    # res stages use batch stats in train; compare only shapes there, but
    # the stem path (frozen both ways) feeds both identically.
    assert f_train["res2"].shape == f_eval["res2"].shape


def test_s2d4_stem_matches_direct():
    from glass_tpu.models.resnet import _stem_conv_s2d4

    rng = np.random.RandomState(3)
    params = init_resnet50(jax.random.PRNGKey(3))["stem"]["conv1"]
    for h, w in [(64, 96), (64, 64), (128, 96)]:
        x = jnp.asarray(rng.randn(2, h, w, 3).astype(np.float32))
        direct = _direct(params, x)
        s2d4 = _stem_conv_s2d4(Ctx(train=True), x, params, "stem.conv1")
        assert s2d4.shape == direct.shape
        np.testing.assert_allclose(
            np.asarray(s2d4), np.asarray(direct), atol=1e-5, rtol=1e-5
        )


def test_s2d4_stem_weight_grad_matches_direct():
    from glass_tpu.models.resnet import _stem_conv_s2d4

    rng = np.random.RandomState(4)
    params = init_resnet50(jax.random.PRNGKey(4))["stem"]["conv1"]
    x = jnp.asarray(rng.randn(1, 48, 64, 3).astype(np.float32))

    def loss_direct(w):
        p = dict(params, weight=w)
        return jnp.sum(_direct(p, x) ** 2)

    def loss_s2d4(w):
        p = dict(params, weight=w)
        return jnp.sum(_stem_conv_s2d4(Ctx(train=True), x, p, "s") ** 2)

    g_d = jax.grad(loss_direct)(params["weight"])
    g_s = jax.grad(loss_s2d4)(params["weight"])
    np.testing.assert_allclose(
        np.asarray(g_s), np.asarray(g_d), atol=2e-3, rtol=1e-4
    )


def test_stem_backend_fallback_odd_size():
    """stem_backend=s2d4 with H or W not divisible by 4 must fall back to
    the 2x2 variant and still match plain-conv math end to end."""
    rng = np.random.RandomState(5)
    params = init_resnet50(jax.random.PRNGKey(5))
    x = jnp.asarray(rng.randn(1, 62, 96, 3).astype(np.float32))
    f4 = resnet50_apply(Ctx(train=True), params, x, stem_backend="s2d4")
    f2 = resnet50_apply(Ctx(train=True), params, x, stem_backend="s2d")
    for k in f4:
        np.testing.assert_allclose(
            np.asarray(f4[k]), np.asarray(f2[k]), atol=1e-4, rtol=1e-4
        )

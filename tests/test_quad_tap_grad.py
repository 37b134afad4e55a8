"""Backward parity for the pair-windowed scatter VJP of the 4-tap gather.

``_quad_tap_gather`` replaces autodiff's four row scatter-adds with one
windowed (2, C) scatter, relying on the d2 clamp invariant (w01 = w11 = 0
whenever x_high is clamped onto x_low, so the pair row ``i + 1`` may point
at a physically wrong row).  The oracle here is the one-hot Jacobian
transpose built purely from the FORWARD pass — independent of the custom
backward rule under test.

Reference backward being replaced: ``ROIAlignRotated_backward`` feature
gradients (detectron2 ``ROIAlignRotated_cuda.cu``); rois carry no gradient
there either, which the custom rule preserves (zero weight cotangents).
"""

import jax
import jax.numpy as jnp
import numpy as np

from glass_tpu.ops.roi_align_rotated import (
    multilevel_roi_align_rotated_packed,
    roi_align_rotated,
)


def _jacobian_transpose_grad(fwd_flat, f0, cotangent):
    """grad via sum_j cotangent_j * d out_j / d f  using forward one-hots."""
    n = f0.size
    basis = jnp.eye(n, dtype=f0.dtype)
    out0 = fwd_flat(jnp.zeros_like(f0.reshape(-1)))
    # forward is linear in features: J @ e_i = fwd(e_i) - fwd(0)
    cols = jax.lax.map(
        lambda e: jnp.vdot(cotangent, fwd_flat(e) - out0), basis, batch_size=64
    )
    return cols.reshape(f0.shape)


def _boundary_rois(h, w, n, rng):
    return np.stack(
        [
            rng.uniform(-6, w + 6, n),  # includes clamp-exercising rois
            rng.uniform(-6, h + 6, n),
            rng.uniform(4, w * 1.4, n),
            rng.uniform(3, h * 0.8, n),
            rng.uniform(-180, 180, n),
        ],
        axis=1,
    ).astype(np.float32)


def test_single_level_grad_matches_jacobian_transpose(rng):
    h, w, c = 14, 18, 2
    feat = jnp.asarray(rng.randn(h, w, c).astype(np.float32))
    rois = jnp.asarray(_boundary_rois(h, w, 6, rng))

    def pool(f):
        return roi_align_rotated(
            f, rois, (3, 4), sampling_ratio=0, max_sampling_ratio=2,
            packed_taps=False,
        )

    ct = jnp.asarray(rng.randn(6, 3, 4, c).astype(np.float32))
    got = jax.grad(lambda f: jnp.vdot(ct, pool(f)))(feat)

    want = _jacobian_transpose_grad(
        lambda fv: pool(fv.reshape(h, w, c)).reshape(-1), feat, ct.reshape(-1)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_packed_pyramid_grad_matches_jacobian_transpose(rng):
    shapes = [(12, 16, 2), (6, 8, 2)]
    strides = [4, 8]
    feats = [jnp.asarray(rng.randn(*s).astype(np.float32)) for s in shapes]
    sizes = [int(np.prod(s)) for s in shapes]
    rois = jnp.asarray(_boundary_rois(12 * 4, 16 * 4, 5, rng))

    def pool_list(fs):
        return multilevel_roi_align_rotated_packed(
            fs, rois, (3, 3), strides, sampling_ratio=2
        )

    ct = jnp.asarray(rng.randn(5, 3, 3, 2).astype(np.float32))
    got = jax.grad(
        lambda fs: jnp.vdot(ct, pool_list(fs))
    )(feats)

    def fwd_flat(v):
        fs, off = [], 0
        for s, n in zip(shapes, sizes):
            fs.append(v[off : off + n].reshape(s))
            off += n
        return pool_list(fs).reshape(-1)

    f0 = jnp.concatenate([f.reshape(-1) for f in feats])
    want_flat = _jacobian_transpose_grad(fwd_flat, f0, ct.reshape(-1))
    want, off = [], 0
    for s, n in zip(shapes, sizes):
        want.append(np.asarray(want_flat[off : off + n]).reshape(s))
        off += n
    for g, wref in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), wref, atol=1e-4)


def test_quad_tap_grad_under_vmap(rng):
    """The train step vmaps the pooler over the image batch; the custom VJP
    must batch correctly (same values as per-image calls)."""
    h, w, c, b = 12, 14, 2, 3
    feats = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    rois = jnp.asarray(
        np.stack([_boundary_rois(h, w, 4, rng) for _ in range(b)])
    )

    def pool_one(f, r):
        return roi_align_rotated(
            f, r, (2, 3), sampling_ratio=1, packed_taps=False
        )

    def loss_batched(fs):
        return jnp.sum(jax.vmap(pool_one)(fs, rois) ** 2)

    def loss_loop(fs):
        return sum(jnp.sum(pool_one(fs[i], rois[i]) ** 2) for i in range(b))

    g_b = jax.grad(loss_batched)(feats)
    g_l = jax.grad(loss_loop)(feats)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_l), atol=1e-4)

"""Parity of the Pallas crop kernel against the XLA ``roi_align_rotated``.

The Pallas kernel (ops/pallas_crop.py) must reproduce detectron2
``ROIAlignRotated`` semantics exactly (reference dep ``layers/csrc/
ROIAlignRotated``, used by ``recognizers_hybrid_head.py:490-500``); the
XLA path is the established oracle (itself tested against the d2 golden
vectors in test_d2_golden_vectors.py).  Runs in interpret mode on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from glass_tpu.ops.roi_align_rotated import roi_align_rotated
from glass_tpu.ops.pallas_crop import crop_rois_pallas


def _image(h=180, w=220, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.rand(h, w, 3).astype(np.float32))


def _compare(image, rois, tol=1e-4):
    # tol: the kernel evaluates the sample positions through a different
    # (affine/line) factorization than the XLA path, so bilinear WEIGHTS
    # differ by O(1e-5) ulp noise (same class as the split-capacity pooler
    # note in roi_align_rotated_adaptive); tap SELECTION is exact.
    rois = jnp.asarray(np.asarray(rois, np.float32))
    ref = roi_align_rotated(
        image, rois, (128, 128), spatial_scale=1.0, sampling_ratio=1
    )
    got = crop_rois_pallas(image, rois, (128, 128), interpret=True)
    err = np.abs(np.asarray(got) - np.asarray(ref)).max()
    assert err < tol, f"max|diff|={err}"


def test_axis_aligned_and_cardinal_angles():
    rois = [
        [60.0, 50.0, 40.0, 20.0, 0.0],
        [60.0, 50.0, 40.0, 20.0, 90.0],
        [110.0, 90.0, 30.0, 60.0, 180.0],
        [110.0, 90.0, 30.0, 60.0, -90.0],
    ]
    _compare(_image(), rois)


def test_diagonal_angles_both_roles():
    # 45 degrees sits exactly on the role-swap boundary; nearby angles
    # exercise both |tan| < 1 and > 1 plus the window-membership slack.
    rois = [
        [80.0, 70.0, 50.0, 18.0, 45.0],
        [80.0, 70.0, 50.0, 18.0, -45.0],
        [80.0, 70.0, 50.0, 18.0, 44.0],
        [80.0, 70.0, 50.0, 18.0, 46.0],
        [100.0, 90.0, 24.0, 64.0, 135.0],
        [100.0, 90.0, 24.0, 64.0, -135.0],
    ]
    _compare(_image(), rois)


def test_random_geometry_sweep():
    rng = np.random.RandomState(7)
    n = 48
    rois = np.stack(
        [
            rng.uniform(10, 210, n),       # cx
            rng.uniform(10, 170, n),       # cy
            rng.uniform(2, 90, n),         # w
            rng.uniform(2, 90, n),         # h
            rng.uniform(-180, 180, n),     # angle
        ],
        axis=1,
    )
    _compare(_image(seed=3), rois)


def test_edge_overhang_and_clamping():
    # boxes hanging off every image edge: exercises the d2 clamp rules and
    # the tile-origin clamping.
    rois = [
        [4.0, 60.0, 40.0, 16.0, 30.0],     # left overhang
        [216.0, 60.0, 40.0, 16.0, -30.0],  # right overhang
        [100.0, 3.0, 50.0, 20.0, 10.0],    # top overhang
        [100.0, 177.0, 50.0, 20.0, 100.0], # bottom overhang
        [1.0, 1.0, 30.0, 30.0, 45.0],      # corner
    ]
    _compare(_image(), rois)


def test_degenerate_and_tiny_rois():
    rois = [
        [50.0, 50.0, 0.0, 0.0, 0.0],    # padded slot
        [50.0, 50.0, 0.0, 10.0, 20.0],  # zero width
        [70.0, 60.0, 1.0, 1.0, 77.0],   # sub-pixel box
    ]
    image = _image()
    rois = jnp.asarray(np.asarray(rois, np.float32))
    got = np.asarray(crop_rois_pallas(image, rois, (128, 128), interpret=True))
    ref = np.asarray(
        roi_align_rotated(image, rois, (128, 128), spatial_scale=1.0, sampling_ratio=1)
    )
    # degenerate rois are zeroed by the kernel; the XLA path samples the
    # (empty) box center everywhere — only the tiny real roi must match.
    assert np.abs(got[2] - ref[2]).max() < 1e-4
    assert np.all(np.isfinite(got))


def test_crop_backend_config_plumbs_to_arch():
    """TPU.CROP_BACKEND selects the crop pooler through the normal config
    path (VERDICT r2 #10: no unreachable shipping backends)."""
    from glass_tpu.config import get_cfg
    from glass_tpu.models import GlassArch

    cfg = get_cfg()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 1
    assert cfg.TPU.CROP_BACKEND == "auto"
    cfg.TPU.CROP_BACKEND = "pallas"
    arch = GlassArch.from_config(cfg)
    assert arch.crop_backend == "pallas"


@pytest.mark.slow
def test_crop_backend_pallas_through_model():
    """crop_backend="pallas" routes the serving crops through the kernel
    (interpreted off-TPU) and matches the XLA backend's outputs."""
    import dataclasses
    import jax
    from glass_tpu.models import GlassArch, init_glass_params, glass_inference_single

    base = GlassArch(
        rpn_pre_nms_topk=64,
        rpn_post_nms_topk=16,
        detections_per_image=8,
        max_word_len=5,
        compute_dtype="float32",
        img_crop_sampling_ratio=1,
    )
    params = init_glass_params(jax.random.PRNGKey(0), base)
    img = jnp.asarray(
        np.random.RandomState(2).rand(160, 288, 3) * 255, jnp.float32
    )
    hw = jnp.array([152, 280], jnp.int32)
    outs = {}
    for backend in ("xla", "pallas"):
        arch = dataclasses.replace(base, crop_backend=backend)
        outs[backend] = glass_inference_single(arch, params, img, hw)
    np.testing.assert_allclose(
        np.asarray(outs["pallas"]["boxes"]), np.asarray(outs["xla"]["boxes"]),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(outs["pallas"]["text_step_scores"], np.float32),
        np.asarray(outs["xla"]["text_step_scores"], np.float32),
        atol=1e-3,
    )


def test_large_roi_fallback():
    # bbox larger than the 128 tile routes through the budgeted XLA pass.
    rois = [
        [110.0, 90.0, 200.0, 60.0, 25.0],
        [110.0, 90.0, 150.0, 150.0, -60.0],
        [60.0, 50.0, 40.0, 20.0, 15.0],  # small one alongside
    ]
    _compare(_image(), rois)


def test_large_rois_beyond_budget_still_exact():
    # more large rois than one rescue chunk: the while_loop must keep
    # rescuing until every one is exact (regression: a single budgeted
    # pass silently left overflow rois with edge-smeared kernel output).
    rng = np.random.RandomState(11)
    n = 7
    rois = np.stack(
        [
            rng.uniform(60, 160, n),
            rng.uniform(60, 120, n),
            rng.uniform(150, 210, n),   # width > tile for every roi
            rng.uniform(20, 60, n),
            rng.uniform(-30, 30, n),
        ],
        axis=1,
    )
    image = _image()
    ref = roi_align_rotated(
        image, jnp.asarray(rois, jnp.float32), (128, 128),
        spatial_scale=1.0, sampling_ratio=1,
    )
    got = crop_rois_pallas(
        image, jnp.asarray(rois, jnp.float32), (128, 128),
        large_roi_budget=2, interpret=True,
    )
    assert np.abs(np.asarray(got) - np.asarray(ref)).max() < 1e-4


def test_vmap_batched_images():
    # batched serving vmaps the whole model over images; the kernel (and
    # its while_loop rescue) must survive vmap.
    rng = np.random.RandomState(5)
    images = jnp.asarray(rng.rand(2, 180, 220, 3).astype(np.float32))
    rois = jnp.asarray(
        np.stack(
            [
                [[60.0, 50.0, 40.0, 20.0, 10.0], [110.0, 90.0, 170.0, 30.0, -20.0]],
                [[80.0, 70.0, 50.0, 18.0, 45.0], [100.0, 90.0, 24.0, 64.0, 135.0]],
            ]
        ).astype(np.float32)
    )
    got = jax.vmap(
        lambda im, bx: crop_rois_pallas(im, bx, (128, 128), interpret=True)
    )(images, rois)
    for b in range(2):
        ref = roi_align_rotated(
            images[b], rois[b], (128, 128), spatial_scale=1.0, sampling_ratio=1
        )
        assert np.abs(np.asarray(got[b]) - np.asarray(ref)).max() < 1e-4

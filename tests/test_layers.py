"""Parity tests of the functional layer library against torch CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from glass_tpu.models import layers as L


def test_conv2d_matches_torch(rng):
    x = rng.randn(2, 9, 11, 5).astype(np.float32)
    w = rng.randn(4, 5, 3, 3).astype(np.float32)  # torch OIHW
    b = rng.randn(4).astype(np.float32)
    ref = torch.nn.functional.conv2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(w),
        torch.from_numpy(b), stride=2, padding=1,
    ).permute(0, 2, 3, 1).numpy()
    got = np.asarray(
        L.conv2d(jnp.asarray(x), jnp.asarray(w.transpose(2, 3, 1, 0)),
                 jnp.asarray(b), stride=2, padding=1)
    )
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_conv2d_asymmetric_kernel(rng):
    x = rng.randn(1, 8, 32, 6).astype(np.float32)
    w = rng.randn(6, 6, 2, 1).astype(np.float32)
    ref = torch.nn.functional.conv2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(w),
        stride=(2, 1),
    ).permute(0, 2, 3, 1).numpy()
    got = np.asarray(
        L.conv2d(jnp.asarray(x), jnp.asarray(w.transpose(2, 3, 1, 0)),
                 stride=(2, 1), padding=0)
    )
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_conv_transpose_matches_torch(rng):
    x = rng.randn(2, 7, 7, 8).astype(np.float32)
    w = rng.randn(8, 4, 2, 2).astype(np.float32)  # torch deconv: (in, out, kh, kw)
    ref = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(w), stride=2
    ).permute(0, 2, 3, 1).numpy()
    got = np.asarray(
        L.conv_transpose2d(jnp.asarray(x), jnp.asarray(w.transpose(2, 3, 1, 0)), stride=2)
    )
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_batch_norm_eval_matches_torch(rng):
    x = rng.randn(3, 5, 5, 7).astype(np.float32)
    bn = torch.nn.BatchNorm2d(7).eval()
    with torch.no_grad():
        bn.running_mean.copy_(torch.from_numpy(rng.randn(7).astype(np.float32)))
        bn.running_var.copy_(torch.from_numpy(rng.rand(7).astype(np.float32) + 0.5))
        bn.weight.copy_(torch.from_numpy(rng.randn(7).astype(np.float32)))
        bn.bias.copy_(torch.from_numpy(rng.randn(7).astype(np.float32)))
        ref = bn(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    params = {
        "weight": jnp.asarray(bn.weight.detach().numpy()),
        "bias": jnp.asarray(bn.bias.detach().numpy()),
        "running_mean": jnp.asarray(bn.running_mean.numpy()),
        "running_var": jnp.asarray(bn.running_var.numpy()),
    }
    got = np.asarray(L.batch_norm(jnp.asarray(x), params, train=False))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_batch_norm_train_stats(rng):
    x = rng.randn(4, 3, 3, 2).astype(np.float32)
    params = L.init_bn(2)
    out, new_params = L.batch_norm(jnp.asarray(x), params, train=True)
    flat = x.reshape(-1, 2)
    np.testing.assert_allclose(
        np.asarray(out).reshape(-1, 2).mean(0), [0, 0], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(new_params["running_mean"]), 0.1 * flat.mean(0), atol=1e-5
    )


def test_bilstm_matches_torch(rng):
    B, T, I, H = 3, 6, 5, 4
    x = rng.randn(B, T, I).astype(np.float32)
    ref_rnn = torch.nn.LSTM(I, H, bidirectional=True, batch_first=True)
    with torch.no_grad():
        ref_out, _ = ref_rnn(torch.from_numpy(x))
    params = {
        "fwd": {
            "weight_ih": jnp.asarray(ref_rnn.weight_ih_l0.detach().numpy()),
            "weight_hh": jnp.asarray(ref_rnn.weight_hh_l0.detach().numpy()),
            "bias_ih": jnp.asarray(ref_rnn.bias_ih_l0.detach().numpy()),
            "bias_hh": jnp.asarray(ref_rnn.bias_hh_l0.detach().numpy()),
        },
        "bwd": {
            "weight_ih": jnp.asarray(ref_rnn.weight_ih_l0_reverse.detach().numpy()),
            "weight_hh": jnp.asarray(ref_rnn.weight_hh_l0_reverse.detach().numpy()),
            "bias_ih": jnp.asarray(ref_rnn.bias_ih_l0_reverse.detach().numpy()),
            "bias_hh": jnp.asarray(ref_rnn.bias_hh_l0_reverse.detach().numpy()),
        },
    }
    got = np.asarray(L.bilstm(jnp.asarray(x), params))
    np.testing.assert_allclose(got, ref_out.numpy(), atol=1e-5)


def test_gru_cell_matches_torch(rng):
    B, I, H = 4, 6, 5
    x = rng.randn(B, I).astype(np.float32)
    h = rng.randn(B, H).astype(np.float32)
    ref = torch.nn.GRUCell(I, H)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(h)).numpy()
    params = {
        "weight_ih": jnp.asarray(ref.weight_ih.detach().numpy()),
        "weight_hh": jnp.asarray(ref.weight_hh.detach().numpy()),
        "bias_ih": jnp.asarray(ref.bias_ih.detach().numpy()),
        "bias_hh": jnp.asarray(ref.bias_hh.detach().numpy()),
    }
    got = np.asarray(L.gru_cell(jnp.asarray(x), jnp.asarray(h), params))
    np.testing.assert_allclose(got, ref_out, atol=1e-5)


def test_max_pool_matches_torch(rng):
    x = rng.randn(2, 9, 9, 3).astype(np.float32)
    ref = torch.nn.functional.max_pool2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), kernel_size=2, stride=(2, 1),
        padding=(0, 1),
    ).permute(0, 2, 3, 1).numpy()
    got = np.asarray(L.max_pool2d(jnp.asarray(x), 2, (2, 1), (0, 1)))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_upsample_nearest(rng):
    x = rng.randn(1, 3, 4, 2).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2
    ).permute(0, 2, 3, 1).numpy()
    got = np.asarray(L.upsample_nearest_2x(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=1e-6)


@pytest.mark.parametrize(
    "kernel,stride,pad,shape",
    [
        ((3, 3), (2, 2), (1, 1), (2, 17, 19, 5)),   # resnet stem shape family
        ((2, 2), (2, 2), (0, 0), (1, 16, 16, 3)),   # local-extractor pools
        ((2, 2), (2, 1), (0, 1), (1, 12, 10, 4)),   # rect pool (V1_RECT)
        ((2, 3), (3, 1), (0, 1), (1, 13, 9, 2)),    # stride>kernel, asymmetric
        ((3, 2), (1, 2), (1, 0), (2, 9, 14, 3)),    # overlap + rect stride
    ],
)
def test_max_pool_dense_grad_matches_select_and_scatter(
    kernel, stride, pad, shape, monkeypatch
):
    # the custom dense backward (opt-in since the round-4 A/B flipped the
    # default to the native SelectAndScatter) must reproduce XLA's
    # SelectAndScatter VJP exactly, including the first-in-scan-order tie
    # rule — quantized inputs force plenty of intra-window ties
    from glass_tpu.models.layers import _max_pool_fwd_raw, max_pool2d

    monkeypatch.setenv("GLASS_TPU_MAXPOOL_VJP", "dense")
    rng = np.random.RandomState(0)
    x = jnp.asarray(np.round(rng.rand(*shape) * 4) / 4, jnp.float32)
    dy_seed = jnp.asarray(rng.rand(*np.asarray(
        _max_pool_fwd_raw(x, kernel, stride, pad)).shape), jnp.float32)

    def loss_ref(x):
        return jnp.sum(_max_pool_fwd_raw(x, kernel, stride, pad) * dy_seed)

    def loss_new(x):
        return jnp.sum(max_pool2d(x, kernel, stride, pad) * dy_seed)

    y_ref = _max_pool_fwd_raw(x, kernel, stride, pad)
    y_new = max_pool2d(x, kernel, stride, pad)
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_new))
    g_ref = np.asarray(jax.grad(loss_ref)(x))
    g_new = np.asarray(jax.grad(loss_new)(x))
    # identical routing (same winner in every window — the tie rule), with
    # ulp-level slack where a pixel accumulates several windows' cotangents
    # in a different summation order
    np.testing.assert_array_equal(g_ref != 0, g_new != 0)
    np.testing.assert_allclose(g_ref, g_new, rtol=1e-6, atol=1e-7)


def test_max_pool_dense_grad_bf16_and_vmap(monkeypatch):
    """bf16 inputs and vmap over a leading batch must keep the custom VJP
    routing identical to the native SelectAndScatter backward."""
    from glass_tpu.models.layers import _max_pool_fwd_raw, max_pool2d

    monkeypatch.setenv("GLASS_TPU_MAXPOOL_VJP", "dense")
    rng = np.random.RandomState(5)
    x = jnp.asarray(np.round(rng.rand(3, 2, 12, 10, 4) * 8) / 8, jnp.bfloat16)

    def loss_new(xi):
        return jnp.sum(max_pool2d(xi, (3, 3), (2, 2), (1, 1)).astype(jnp.float32))

    def loss_ref(xi):
        return jnp.sum(
            _max_pool_fwd_raw(xi, (3, 3), (2, 2), (1, 1)).astype(jnp.float32)
        )

    g_new = np.asarray(jax.vmap(jax.grad(loss_new))(x), np.float32)
    g_ref = np.asarray(jax.vmap(jax.grad(loss_ref))(x), np.float32)
    np.testing.assert_array_equal(g_new, g_ref)

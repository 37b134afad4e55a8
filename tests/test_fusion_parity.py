"""GC attention parity vs a torch composition of the reference semantics.

Validates the channel-interleave order, per-header softmax spatial pooling,
channel_add bottleneck and output conv against an independently-composed
torch module — the orderings here are what released-checkpoint parity
depends on.
"""

import numpy as np
import torch
import jax.numpy as jnp

from glass_tpu.models.context import Ctx
from glass_tpu.models.fusion import gc_attention_apply


class TorchGCAttention(torch.nn.Module):
    def __init__(self, inplanes=16, ratio=0.5, headers=4, outplane=8):
        super().__init__()
        self.headers = headers
        self.single = inplanes // headers
        planes = int(inplanes * ratio)
        self.conv_mask = torch.nn.Conv2d(self.single, 1, 1)
        self.channel_add_conv = torch.nn.Sequential(
            torch.nn.Conv2d(inplanes, planes, 1),
            torch.nn.LayerNorm([planes, 1, 1]),
            torch.nn.ReLU(),
            torch.nn.Conv2d(planes, inplanes, 1),
        )
        self.out = torch.nn.Conv2d(inplanes, outplane, 3, padding=1)
        order = torch.zeros(inplanes, dtype=torch.long)
        order[0::2] = torch.arange(inplanes)[: inplanes // 2]
        order[1::2] = torch.arange(inplanes)[inplanes // 2 :]
        self.order = order

    def forward(self, x):
        x = x[:, self.order]
        n, c, h, w = x.shape
        xh = x.reshape(n * self.headers, self.single, h * w)
        mask = self.conv_mask(x.reshape(n * self.headers, self.single, h, w))
        mask = torch.softmax(mask.reshape(n * self.headers, 1, h * w), dim=2)
        context = torch.matmul(xh.unsqueeze(1), mask.unsqueeze(-1))
        context = context.reshape(n, c, 1, 1)
        out = x + self.channel_add_conv(context)
        return self.out(out)


def test_gc_attention_matches_torch_composition(rng):
    inplanes, headers, outplane = 16, 4, 8
    ref = TorchGCAttention(inplanes, 0.5, headers, outplane)
    x = rng.randn(3, inplanes, 5, 6).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x)).numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {
        "conv_mask": {
            "weight": jnp.asarray(sd["conv_mask.weight"].transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(sd["conv_mask.bias"]),
        },
        "channel_add_conv": {
            "0": {
                "weight": jnp.asarray(sd["channel_add_conv.0.weight"][:, :, 0, 0]),
                "bias": jnp.asarray(sd["channel_add_conv.0.bias"]),
            },
            "1": {
                "weight": jnp.asarray(sd["channel_add_conv.1.weight"]),
                "bias": jnp.asarray(sd["channel_add_conv.1.bias"]),
            },
            "3": {
                "weight": jnp.asarray(sd["channel_add_conv.3.weight"][:, :, 0, 0]),
                "bias": jnp.asarray(sd["channel_add_conv.3.bias"]),
            },
        },
        "out": {
            "weight": jnp.asarray(sd["out.weight"].transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(sd["out.bias"]),
        },
    }
    got = np.asarray(
        gc_attention_apply(
            Ctx(train=False), params, jnp.asarray(x.transpose(0, 2, 3, 1)), headers
        )
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, expected, atol=1e-4)


class TorchGCAttentionAnyFusion(torch.nn.Module):
    """Reference fusion_modules.py:22-157 semantics for any fusion_type."""

    def __init__(self, fusion_type, inplanes=16, ratio=0.5, headers=4, outplane=8):
        super().__init__()
        self.fusion_type = fusion_type
        self.inplanes = inplanes
        self.headers = headers
        self.single = inplanes // headers
        planes = int(inplanes * ratio)
        self.conv_mask = torch.nn.Conv2d(self.single, 1, 1)
        bottleneck = torch.nn.Sequential(
            torch.nn.Conv2d(inplanes, planes, 1),
            torch.nn.LayerNorm([planes, 1, 1]),
            torch.nn.ReLU(),
            torch.nn.Conv2d(planes, inplanes, 1),
        )
        setattr(self, f"{fusion_type}_conv", bottleneck)
        if fusion_type == "channel_concat":
            self.cat_conv = torch.nn.Conv2d(2 * inplanes, inplanes, 1)
        self.out = torch.nn.Conv2d(inplanes, outplane, 3, padding=1)
        order = torch.zeros(inplanes, dtype=torch.long)
        order[0::2] = torch.arange(inplanes)[: inplanes // 2]
        order[1::2] = torch.arange(inplanes)[inplanes // 2 :]
        self.order = order

    def forward(self, x):
        x = x[:, self.order]
        n, c, h, w = x.shape
        xh = x.reshape(n * self.headers, self.single, h * w)
        mask = self.conv_mask(x.reshape(n * self.headers, self.single, h, w))
        mask = torch.softmax(mask.reshape(n * self.headers, 1, h * w), dim=2)
        context = torch.matmul(xh.unsqueeze(1), mask.unsqueeze(-1)).reshape(n, c, 1, 1)
        bottleneck = getattr(self, f"{self.fusion_type}_conv")
        if self.fusion_type == "channel_mul":
            out = x * torch.sigmoid(bottleneck(context))
        elif self.fusion_type == "channel_add":
            out = x + bottleneck(context)
        else:
            term = bottleneck(context)
            out = torch.cat([x, term.expand(-1, -1, h, w)], dim=1)
            out = self.cat_conv(out)
            out = torch.nn.functional.layer_norm(out, [self.inplanes, h, w])
            out = torch.nn.functional.relu(out)
        return self.out(out)


def _variant_parity(fusion_type, rng):
    """Round-trips the torch state dict through convert_torch_state_dict —
    guards the bottleneck 1x1-conv-to-linear converter rule for every
    fusion_type (ADVICE round 1, medium)."""
    from glass_tpu.models.fusion import apply_fusion
    from glass_tpu.train.checkpoint import convert_torch_state_dict

    inplanes, headers, outplane = 16, 4, 8
    ref = TorchGCAttentionAnyFusion(fusion_type, inplanes, 0.5, headers, outplane)
    x = rng.randn(3, inplanes, 5, 6).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x)).numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_torch_state_dict(sd)
    got = np.asarray(
        apply_fusion(
            Ctx(train=False), params, jnp.asarray(x.transpose(0, 2, 3, 1)),
            "MultiAspectGCAttention", fusion_type, headers,
        )
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_gc_channel_mul_parity_via_converter(rng):
    _variant_parity("channel_mul", rng)


def test_gc_channel_concat_parity_via_converter(rng):
    _variant_parity("channel_concat", rng)


def test_gc_channel_add_parity_via_converter(rng):
    _variant_parity("channel_add", rng)


def test_init_fusion_forward_all_variants(rng):
    """Random-init params must match what each apply function reads
    (ADVICE round 1: channel_mul/concat had no init path)."""
    import jax
    from glass_tpu.models.fusion import apply_fusion, init_fusion

    x = jnp.asarray(rng.randn(2, 5, 6, 16).astype(np.float32))
    cases = [
        ("MultiAspectGCAttention", "channel_add", 8),
        ("MultiAspectGCAttention", "channel_mul", 8),
        ("MultiAspectGCAttention", "channel_concat", 8),
        ("SimpleAttention", None, 8),
        ("LocalOnly", None, 8),
        ("Conv1x1", None, 8),
    ]
    for name, ftype, out_ch in cases:
        params = init_fusion(
            jax.random.PRNGKey(0), name=name, fusion_type=ftype or "channel_add",
            inplanes=16, headers=4, outplane=out_ch,
        )
        y = apply_fusion(Ctx(train=False), params, x, name, ftype or "channel_add", 4)
        assert y.shape == (2, 5, 6, out_ch), (name, ftype, y.shape)
        assert np.isfinite(np.asarray(y)).all(), (name, ftype)

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

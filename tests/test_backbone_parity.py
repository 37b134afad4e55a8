"""ResNet-50 + FPN parity vs a torch composition with detectron2 naming.

Composes the backbone in torch with the exact module names detectron2
checkpoints use (conv with an attached ``norm`` submodule, ``shortcut``,
``fpn_lateralN`` / ``fpn_outputN``), runs eval-mode forward, and checks the
converter + jax apply reproduce it — the load-bearing test for released
checkpoint fidelity of the feature extractor.
"""

import numpy as np
import torch
import torch.nn as nn
import jax.numpy as jnp

from glass_tpu.models.context import Ctx
from glass_tpu.models.resnet import resnet50_apply, RESNET50_STAGES
from glass_tpu.models.fpn import fpn_apply
from glass_tpu.train.checkpoint import convert_torch_state_dict


def conv_norm(cin, cout, k, stride=1, pad=0):
    c = nn.Conv2d(cin, cout, k, stride, pad, bias=False)
    c.norm = nn.BatchNorm2d(cout)
    return c


class Bottleneck(nn.Module):
    def __init__(self, cin, mid, cout, stride):
        super().__init__()
        self.conv1 = conv_norm(cin, mid, 1, stride)   # stride_in_1x1
        self.conv2 = conv_norm(mid, mid, 3, 1, 1)
        self.conv3 = conv_norm(mid, cout, 1)
        if stride != 1 or cin != cout:
            self.shortcut = conv_norm(cin, cout, 1, stride)

    def forward(self, x):
        out = torch.relu(self.conv1.norm(self.conv1(x)))
        out = torch.relu(self.conv2.norm(self.conv2(out)))
        out = self.conv3.norm(self.conv3(out))
        sc = self.shortcut.norm(self.shortcut(x)) if hasattr(self, "shortcut") else x
        return torch.relu(out + sc)


class TorchBackbone(nn.Module):
    def __init__(self, width=8):
        super().__init__()
        # Scaled-down R50 (width/8) keeps the test fast; structure identical.
        self.scale = width / 64.0
        stem = nn.Module()
        stem.conv1 = conv_norm(3, width, 7, 2, 3)
        self.stem = stem
        cin = width
        for name, n_blocks, mid, cout, stride in RESNET50_STAGES:
            mid_s, cout_s = int(mid * self.scale), int(cout * self.scale)
            blocks = nn.Sequential(
                *[
                    Bottleneck(cin if i == 0 else cout_s, mid_s, cout_s,
                               stride if i == 0 else 1)
                    for i in range(n_blocks)
                ]
            )
            setattr(self, name, blocks)
            cin = cout_s
        fpn_ch = 2 * width
        for i, (name, _, _, cout, _) in enumerate(RESNET50_STAGES, start=2):
            setattr(self, f"fpn_lateral{i}", conv_norm(int(cout * self.scale), fpn_ch, 1))
            setattr(self, f"fpn_output{i}", conv_norm(fpn_ch, fpn_ch, 3, 1, 1))

    def forward(self, x):
        x = torch.relu(self.stem.conv1.norm(self.stem.conv1(x)))
        x = torch.max_pool2d(x, 3, 2, 1)
        feats = {}
        for name, *_ in RESNET50_STAGES:
            x = getattr(self, name)(x)
            feats[name] = x
        lat = {
            name: getattr(self, f"fpn_lateral{i}").norm(
                getattr(self, f"fpn_lateral{i}")(feats[name])
            )
            for i, (name, *_a) in enumerate(RESNET50_STAGES, start=2)
        }
        merged = {"res5": lat["res5"]}
        for prev, cur in (("res5", "res4"), ("res4", "res3"), ("res3", "res2")):
            up = torch.nn.functional.interpolate(merged[prev], scale_factor=2)
            merged[cur] = lat[cur] + up
        out = {}
        for i, (name, *_a) in enumerate(RESNET50_STAGES, start=2):
            conv = getattr(self, f"fpn_output{i}")
            out[f"p{i}"] = conv.norm(conv(merged[name]))
        out["p6"] = torch.max_pool2d(out["p5"], 1, 2)
        return out


def test_backbone_fpn_matches_torch(rng):
    torch.manual_seed(1)
    ref = TorchBackbone(width=8).eval()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)

    x = rng.randn(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        expected = {k: v.numpy() for k, v in ref(torch.from_numpy(x)).items()}

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    tree = convert_torch_state_dict(sd)
    # split backbone tree: stem/resN at bottom_up level, fpn_* at top level
    params = {
        "bottom_up": {k: tree[k] for k in ("stem", "res2", "res3", "res4", "res5")},
        **{k: v for k, v in tree.items() if k.startswith("fpn_")},
    }
    ctx = Ctx(train=False)
    bu = resnet50_apply(ctx, params["bottom_up"], jnp.asarray(x.transpose(0, 2, 3, 1)))
    feats = fpn_apply(ctx, params, bu)
    for k in ("p2", "p3", "p4", "p5", "p6"):
        got = np.asarray(feats[k]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, expected[k], atol=2e-3, err_msg=k)


def test_freeze_at_stops_gradients_and_bn_updates():
    """d2 MODEL.BACKBONE.FREEZE_AT semantics (resnet.py freeze()): frozen
    stages get zero parameter gradients and FrozenBN behaviour (running
    stats used, no stat updates recorded)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from glass_tpu.models.context import Ctx
    from glass_tpu.models.resnet import init_resnet50, resnet50_apply

    params = init_resnet50(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)

    def loss(p, freeze_at):
        ctx = Ctx(train=True)
        feats = resnet50_apply(ctx, p, x, freeze_at=freeze_at)
        return sum(jnp.sum(v**2) for v in feats.values()), ctx.bn_updates

    (l0, bn0), g0 = jax.value_and_grad(loss, has_aux=True)(params, 0)
    (l2, bn2), g2 = jax.value_and_grad(loss, has_aux=True)(params, 2)

    def leaf_absmax(tree):
        return max(float(jnp.abs(v).max()) for v in jax.tree_util.tree_leaves(tree))

    # freeze_at=0: everything has gradient signal
    assert leaf_absmax(g0["stem"]) > 0 and leaf_absmax(g0["res2"]) > 0
    # freeze_at=2: stem+res2 grads identically zero, res3+ still flow
    assert leaf_absmax(g2["stem"]) == 0
    assert leaf_absmax(g2["res2"]) == 0
    assert leaf_absmax(g2["res3"]) > 0
    # FrozenBN: no stat updates recorded for frozen paths
    assert not any(".stem." in k or ".res2." in k for k in bn2)
    assert any(".res3." in k for k in bn2)
    assert any(".stem." in k for k in bn0) and any(".res2." in k for k in bn0)

"""Local crop CNN parity vs a torch composition of the reference structure.

The [1,2,5,3] ResNet's pooling/stride layout (last maxpool stride (2,1)
with width padding, final 2x2 stride-(2,1) conv) defines the 128x128 ->
8x32 shape contract; this mirrors it in torch and checks numerics and the
parameter-tree naming against the converter.
"""

import numpy as np
import torch
import torch.nn as nn
import jax
import jax.numpy as jnp

from glass_tpu.models.context import Ctx
from glass_tpu.models.local_extractor import (
    local_extractor_apply,
    init_local_extractor,
    LAYERS,
    BLOCK_CH,
    OUT,
)
from glass_tpu.train.checkpoint import convert_torch_state_dict


class TorchBasicBlock(nn.Module):
    def __init__(self, cin, cout, downsample=False):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU()
        self.downsample = (
            nn.Sequential(nn.Conv2d(cin, cout, 1, bias=False), nn.BatchNorm2d(cout))
            if downsample
            else None
        )

    def forward(self, x):
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        res = self.downsample(x) if self.downsample is not None else x
        return self.relu(out + res)


class TorchLocalCNN(nn.Module):
    def __init__(self):
        super().__init__()
        inpl = OUT // 8

        def stage(cin, cout, n):
            mods = [TorchBasicBlock(cin, cout, cin != cout)]
            mods += [TorchBasicBlock(cout, cout) for _ in range(n - 1)]
            return nn.Sequential(*mods)

        self.conv0_1 = nn.Conv2d(3, OUT // 16, 3, padding=1, bias=False)
        self.bn0_1 = nn.BatchNorm2d(OUT // 16)
        self.conv0_2 = nn.Conv2d(OUT // 16, inpl, 3, padding=1, bias=False)
        self.bn0_2 = nn.BatchNorm2d(inpl)
        self.relu = nn.ReLU()
        self.maxpool1 = nn.MaxPool2d(2, 2)
        self.layer1 = stage(inpl, BLOCK_CH[0], LAYERS[0])
        self.conv1 = nn.Conv2d(BLOCK_CH[0], BLOCK_CH[0], 3, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(BLOCK_CH[0])
        self.maxpool2 = nn.MaxPool2d(2, 2)
        self.layer2 = stage(BLOCK_CH[0], BLOCK_CH[1], LAYERS[1])
        self.conv2 = nn.Conv2d(BLOCK_CH[1], BLOCK_CH[1], 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(BLOCK_CH[1])
        self.maxpool3 = nn.MaxPool2d(2, (2, 1), (0, 1))
        self.layer3 = stage(BLOCK_CH[1], BLOCK_CH[2], LAYERS[2])
        self.conv3 = nn.Conv2d(BLOCK_CH[2], BLOCK_CH[2], 3, padding=1, bias=False)
        self.bn3 = nn.BatchNorm2d(BLOCK_CH[2])
        self.layer4 = stage(BLOCK_CH[2], BLOCK_CH[3], LAYERS[3])
        self.conv4_1 = nn.Conv2d(BLOCK_CH[3], BLOCK_CH[3], 2, (2, 1), bias=False)
        self.bn4_1 = nn.BatchNorm2d(BLOCK_CH[3])

    def forward(self, x):
        x = self.relu(self.bn0_1(self.conv0_1(x)))
        x = self.relu(self.bn0_2(self.conv0_2(x)))
        x = self.maxpool1(x)
        x = self.layer1(x)
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.maxpool2(x)
        x = self.layer2(x)
        x = self.relu(self.bn2(self.conv2(x)))
        x = self.maxpool3(x)
        x = self.layer3(x)
        x = self.relu(self.bn3(self.conv3(x)))
        x = self.layer4(x)
        return self.relu(self.bn4_1(self.conv4_1(x)))


def test_local_extractor_matches_torch(rng):
    torch.manual_seed(0)
    ref = TorchLocalCNN().eval()
    # Randomize BN stats so eval-mode normalization is nontrivial.
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)

    x = rng.randn(2, 3, 128, 128).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x)).numpy()
    assert expected.shape == (2, OUT, 8, 32)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_torch_state_dict(sd)
    got = np.asarray(
        local_extractor_apply(
            Ctx(train=False), params, jnp.asarray(x.transpose(0, 2, 3, 1))
        )
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, expected, atol=2e-3)

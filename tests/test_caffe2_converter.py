"""Caffe2 ImageNet R-50 pickle conversion (synthetic state dict)."""

import numpy as np
import pytest
import jax

from glass_tpu.models import GlassArch, init_glass_params
from glass_tpu.train.checkpoint import convert_caffe2_resnet50
from glass_tpu.utils.common import flatten_dict


def _synthetic_c2_state():
    rng = np.random.RandomState(0)
    state = {
        "conv1_w": rng.randn(64, 3, 7, 7).astype(np.float32),
        "res_conv1_bn_s": rng.randn(64).astype(np.float32),
        "res_conv1_bn_b": rng.randn(64).astype(np.float32),
    }
    stages = {"res2": (3, 64, 256), "res3": (4, 128, 512),
              "res4": (6, 256, 1024), "res5": (3, 512, 2048)}
    cin = 64
    for stage, (n, mid, cout) in stages.items():
        for i in range(n):
            bin_ = cin if i == 0 else cout
            shapes = {
                "branch2a": (mid, bin_, 1, 1),
                "branch2b": (mid, mid, 3, 3),
                "branch2c": (cout, mid, 1, 1),
            }
            if i == 0:
                shapes["branch1"] = (cout, bin_, 1, 1)
            for br, shp in shapes.items():
                key = f"{stage}_{i}_{br}"
                state[f"{key}_w"] = rng.randn(*shp).astype(np.float32)
                state[f"{key}_bn_s"] = rng.randn(shp[0]).astype(np.float32)
                state[f"{key}_bn_b"] = rng.randn(shp[0]).astype(np.float32)
        cin = cout
    return state


@pytest.mark.slow
def test_caffe2_trunk_converts_to_backbone_shapes():
    tree = convert_caffe2_resnet50(_synthetic_c2_state())
    arch = GlassArch()
    expect = flatten_dict(
        init_glass_params(jax.random.PRNGKey(0), arch)["backbone"]["bottom_up"]
    )
    got = flatten_dict(tree)
    missing = sorted(set(expect) - set(got))
    # Only the BN running stats differ in provenance; every leaf must exist.
    assert not missing, missing[:6]
    for k in expect:
        assert np.shape(got[k]) == np.shape(expect[k]), k

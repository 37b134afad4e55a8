import pytest

pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp

from glass_tpu.models.context import Ctx
from glass_tpu.models.local_extractor_variants import (
    grcl_apply,
    init_grcl,
    resnet_aster_apply,
    init_resnet_aster,
    feature_attention_apply,
)
from glass_tpu.models import layers as L


def test_grcl_shapes_and_finite():
    key = jax.random.PRNGKey(0)
    params = init_grcl(key, cin=4, cout=8, num_iteration=3, kernel=3)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 10, 4))
    out = grcl_apply(Ctx(train=False), params, x, num_iteration=3)
    assert out.shape == (2, 6, 10, 8)
    assert np.isfinite(np.asarray(out)).all()
    assert (np.asarray(out) >= 0).all()  # ReLU output


def test_resnet_aster_collapses_height():
    params = init_resnet_aster(jax.random.PRNGKey(0), in_channels=3)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 100, 3))
    out = resnet_aster_apply(Ctx(train=False), params, x)
    # H: 32 -> /2^5 = 1; W: 100 -> /2/2 = 25 (later stages keep width).
    assert out.shape == (1, 25, 512)
    assert np.isfinite(np.asarray(out)).all()


def test_feature_attention_gate_range():
    params = {"conv": {
        "weight": L.c2_msra_fill(jax.random.PRNGKey(0), (3, 3, 4, 4)),
        "bias": jnp.zeros((4,)),
    }}
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 5, 4))
    out = np.asarray(feature_attention_apply(Ctx(train=False), params, x))
    assert ((out > 0) & (out < 1)).all()


def test_local_extractor_registry_dispatch():
    """LOCAL_FEATURE_EXTRACTOR.NAME selects the extractor (reference
    local_feature_extraction.py:9-19 registry); unknown names fail loudly."""
    from glass_tpu.models.local_extractor import (
        init_local_extractor_by_name,
        local_extractor_forward,
    )
    import pytest

    ctx = Ctx(train=False)
    crops = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))

    p1 = init_local_extractor_by_name(jax.random.PRNGKey(0), "ResNetFeatureExtractor")
    out1 = local_extractor_forward(ctx, p1, crops, "ResNetFeatureExtractor")
    assert out1.shape == (2, 2, 8, 256)  # /4 pools, /2 then (2,1)+pad stride

    # V2: only the two 2x2 maxpools, 3x3 final conv -> H/4, W/4.
    p2 = init_local_extractor_by_name(jax.random.PRNGKey(0), "ResNetFeatureExtractorV2")
    out2 = local_extractor_forward(ctx, p2, crops, "ResNetFeatureExtractorV2")
    assert out2.shape == (2, 8, 8, 256)
    assert p2["conv4_1"]["weight"].shape == (3, 3, 256, 256)
    assert np.isfinite(np.asarray(out2)).all()

    with pytest.raises(ValueError, match="GRCL"):
        local_extractor_forward(ctx, p1, crops, "GRCL")
    with pytest.raises(ValueError, match="Unknown"):
        init_local_extractor_by_name(jax.random.PRNGKey(0), "nope")

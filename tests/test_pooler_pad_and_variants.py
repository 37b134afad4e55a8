import numpy as np
import jax
import jax.numpy as jnp

from glass_tpu.models.context import Ctx
from glass_tpu.models.pooler_pad import feat_pad_v2_boxes, feat_pad_v2_mask
from glass_tpu.models.fusion import apply_fusion, local_only_apply
from glass_tpu.models.recognizer import RECOGNIZER_BACKBONES, init_recognizer


def test_feat_pad_v2_widens_narrow_boxes():
    boxes = jnp.array(
        [
            [50.0, 50.0, 8.0, 8.0, 10.0],    # aspect 1 < target 4 -> widened
            [50.0, 50.0, 64.0, 8.0, 0.0],    # aspect 8 > 4 -> untouched
        ]
    )
    out, ratio = feat_pad_v2_boxes(boxes, (8, 32))
    np.testing.assert_allclose(np.asarray(out)[0, 2], 32.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out)[1], np.asarray(boxes)[1], atol=1e-5)
    r = np.asarray(ratio)
    assert r[0] > 1 and r[1] <= 1

    pooled = jnp.ones((2, 8, 32, 4))
    masked = np.asarray(feat_pad_v2_mask(pooled, ratio))
    # Widened box: (ratio-1)/ratio * 32 / 2 = 12 columns zeroed each side.
    assert (masked[0, :, :12] == 0).all() and (masked[0, :, 12:20] == 1).all()
    assert (masked[1] == 1).all()


def test_local_only_fusion_takes_local_half():
    x = jnp.concatenate(
        [jnp.ones((1, 2, 2, 4)), jnp.zeros((1, 2, 2, 4))], axis=-1
    )
    out = np.asarray(apply_fusion(Ctx(False), {}, x, "LocalOnly", "channel_add"))
    assert out.shape == (1, 2, 2, 4)
    assert (out == 1).all()


def test_backbone_variants_shapes():
    ctx = Ctx(train=False)
    params = init_recognizer(jax.random.PRNGKey(0), channels=32, vocab=12)
    x = jnp.ones((2, 8, 32, 32))
    out = RECOGNIZER_BACKBONES["CNN_V1_1"](ctx, params["backbone"], x)
    assert out.shape == (2, 4, 32, 32)
    out = RECOGNIZER_BACKBONES["Identity"](ctx, params["backbone"], x)
    assert out.shape == x.shape

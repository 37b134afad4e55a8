import numpy as np
import jax.numpy as jnp

from glass_tpu.postprocess.device_merge import merge_intersecting_boxes_device


def test_device_merge_matches_host_semantics():
    # Two overlapping same-height boxes + one isolated; padded to 8 slots.
    boxes = np.zeros((8, 5), np.float32)
    boxes[:, 2:4] = 1.0
    boxes[0] = [50, 50, 30, 10, 0]
    boxes[1] = [60, 50, 30, 10, 0]
    boxes[2] = [200, 200, 30, 10, 0]
    scores = np.zeros(8, np.float32)
    scores[:3] = [0.9, 0.8, 0.9]
    valid = np.zeros(8, bool)
    valid[:3] = True

    out_boxes, out_valid = merge_intersecting_boxes_device(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid)
    )
    out_boxes, out_valid = np.asarray(out_boxes), np.asarray(out_valid)
    # The overlapping pair merges into one surviving box; isolated box kept.
    assert out_valid.sum() == 2
    kept = out_boxes[out_valid]
    widths = sorted(kept[:, 2])
    assert abs(widths[-1] - 40.0) < 1.5  # union spans [35, 75]
    assert any(abs(b[0] - 200) < 1e-3 for b in kept)


def test_device_merge_respects_gates():
    # Overlapping boxes with very different heights must NOT merge.
    boxes = np.zeros((4, 5), np.float32)
    boxes[:, 2:4] = 1.0
    boxes[0] = [50, 50, 30, 10, 0]
    boxes[1] = [52, 50, 30, 40, 0]
    scores = np.array([0.9, 0.8, 0, 0], np.float32)
    valid = np.array([True, True, False, False])
    out_boxes, out_valid = merge_intersecting_boxes_device(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid)
    )
    assert np.asarray(out_valid).sum() == 2
    np.testing.assert_allclose(np.asarray(out_boxes)[0], boxes[0], atol=1e-4)

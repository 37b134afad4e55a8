"""Parameter census (reference tools/eval_glass.py:147-181)."""

import numpy as np

from glass_tpu.utils.common import format_parameter_census, parameter_census


def test_parameter_census_buckets_and_total():
    params = {
        "backbone": {"bottom_up": {"w": np.zeros((2, 3))}},
        "roi_heads": {
            "box_head": {"fc1": {"w": np.zeros(5), "b": np.zeros(5)}},
            "hybrid_net": {"conv": {"w": np.zeros((4,))}},
            # elif-order rule: a name containing both "recognizer_head" and
            # "box_head" buckets under the FIRST match in the reference's
            # chain order (mask_head < box_head < recognizer_head).
            "recognizer_head": {"box_head_proj": {"w": np.zeros(7)}},
            "other": {"w": np.zeros(11)},  # no bucket — total only
        },
        "proposal_generator": {"rpn_head": {"w": np.zeros(3)}},
    }
    c = parameter_census(params)
    assert c["total"] == 6 + 10 + 4 + 7 + 11 + 3
    assert c["buckets"]["backbone"] == 6
    assert c["buckets"]["hybrid_net"] == 4
    # "recognizer_head.box_head_proj" contains "box_head" which precedes
    # "recognizer_head" in the reference's elif chain.
    assert c["buckets"]["box_head"] == 10 + 7
    assert c["buckets"]["recognizer_head"] == 0
    assert c["buckets"]["rpn_head"] == 3
    assert c["buckets"]["mask_head"] == 0

    text = format_parameter_census(c, per_param=True)
    assert f"Total Trainable Params: {c['total']}" in text
    assert "backbone 0.000" in text  # millions formatting
    # per-param lines present and name-prefixed
    assert "backbone.bottom_up.w Total Trainable Params: 6" in text

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

from glass_tpu.models.recognizer import init_recognizer, aster_decode_greedy
from glass_tpu.models.beam_search import aster_decode_beam


@pytest.mark.slow
def test_beam_width_1_matches_greedy():
    params = init_recognizer(jax.random.PRNGKey(0), channels=32, vocab=12)["decoder"]
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 8, 32))
    greedy = aster_decode_greedy(params, x, 6, eos_index=1)
    greedy_ids = np.asarray(jnp.argmax(greedy, axis=-1))
    beam_ids, _ = aster_decode_beam(params, x, 6, beam_width=1, eos_index=1)
    beam_ids = np.asarray(beam_ids)
    # Greedy path equals width-1 beam up to the first eos.
    for b in range(3):
        for t in range(6):
            assert beam_ids[b, t] == greedy_ids[b, t]
            if beam_ids[b, t] == 1:
                break


def test_beam_scores_monotone_in_width():
    params = init_recognizer(jax.random.PRNGKey(2), channels=32, vocab=12)["decoder"]
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 32))
    _, s1 = aster_decode_beam(params, x, 6, beam_width=1)
    _, s5 = aster_decode_beam(params, x, 6, beam_width=5)
    assert (np.asarray(s5) >= np.asarray(s1) - 1e-4).all()

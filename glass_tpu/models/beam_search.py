"""Beam-search decoding for the ASTER attention decoder.

The reference ships a (dead-code) beam search in
``prediction_aster.py:101-222``; this is its TPU-native counterpart: a
fixed-width beam expressed as one ``lax.scan`` over decode steps with
batched gather/top-k — no Python loops, no backtracking pass (sequences are
carried forward directly).

Finished beams (emitted ``eos``) are frozen: they only extend with ``eos``
at zero additional cost, which reproduces the usual length-neutral beam
semantics.  Returns the best beam's token ids and per-step probabilities.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from . import layers as L
from .recognizer import _decoder_step


def aster_decode_beam(
    params: dict,
    x: jnp.ndarray,
    num_steps: int,
    beam_width: int = 5,
    eos_index: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Beam-search decode.

    Args:
        params: the ASTER decoder param tree.
        x: (N, T, C) encoder states.
        num_steps: decode length.
        beam_width: beams per sequence.
        eos_index: stop symbol ([s] = 1 in the released charset).

    Returns:
        tokens: (N, num_steps) best-beam token ids.
        scores: (N,) best-beam total log-probability.
    """
    n, t_enc, c = x.shape
    k = beam_width
    sdim = params["gru"]["weight_hh"].shape[1]
    vocab = params["fc"]["weight"].shape[0]

    x_rep = jnp.repeat(x, k, axis=0)  # (N*K, T, C)
    x_proj = L.linear(
        x_rep,
        params["attention_unit"]["xEmbed"]["weight"],
        params["attention_unit"]["xEmbed"]["bias"],
    )

    neg_inf = -1e30
    init_scores = jnp.tile(
        jnp.concatenate([jnp.zeros((1,)), jnp.full((k - 1,), neg_inf)]), (n,)
    ).reshape(n, k)

    def step(carry, _):
        state, y_prev, scores, tokens, done, t = carry
        logits, new_state, _ = _decoder_step(
            params, x_rep, x_proj, state, y_prev.reshape(-1)
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1).reshape(n, k, vocab)
        # Finished beams may only emit eos, at no cost.
        frozen = jnp.full((vocab,), neg_inf).at[eos_index].set(0.0)
        logp = jnp.where(done[:, :, None], frozen[None, None, :], logp)

        total = scores[:, :, None] + logp  # (N, K, V)
        flat = total.reshape(n, k * vocab)
        new_scores, idx = jax.lax.top_k(flat, k)  # (N, K)
        parent = idx // vocab  # (N, K)
        token = idx % vocab

        gather = lambda arr: jnp.take_along_axis(arr, parent, axis=1)
        new_done = gather(done) | (token == eos_index)
        new_tokens = jnp.take_along_axis(
            tokens, parent[:, :, None], axis=1
        ).at[:, :, t].set(token)

        state_nk = new_state.reshape(n, k, sdim)
        state_sel = jnp.take_along_axis(state_nk, parent[:, :, None], axis=1)
        return (
            state_sel.reshape(n * k, sdim),
            token,
            new_scores,
            new_tokens,
            new_done,
            t + 1,
        ), None

    init = (
        jnp.zeros((n * k, sdim), x.dtype),
        jnp.zeros((n, k), jnp.int32),
        init_scores,
        jnp.zeros((n, k, num_steps), jnp.int32),
        jnp.zeros((n, k), bool),
        jnp.int32(0),
    )
    (state, y, scores, tokens, done, _), _ = jax.lax.scan(
        step, init, None, length=num_steps
    )
    best = jnp.argmax(scores, axis=1)
    best_tokens = jnp.take_along_axis(tokens, best[:, None, None], axis=1)[:, 0]
    best_scores = jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]
    return best_tokens, best_scores

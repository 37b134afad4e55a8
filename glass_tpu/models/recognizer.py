"""Attentional text recognizer: CNN_V1_1 -> BiLSTM x2 -> ASTER GRU decoder.

Re-implements the reference recognizer stack selected by the released
configs (``RecognizerRCNNHeadV3`` with ``CNN_V1_1``/``BiLSTMBlockV2``/
``ASTER_V2`` — ``configs/glass_pretrain.yaml:7-30``):

* ``CNN_V1_1`` (reference ``recognizer_backbone.py:34-81``): [2,1]-strided
  conv halving height (8 -> 4) + residual 3x3 conv, both conv+BN+ReLU.
* ``BiLSTMBlockV2`` (``recognizer_encoder.py:101-144``): mean over height,
  two (BiLSTM -> linear) layers, T = 32 sequence steps.
* ``AttentionRecognitionHead`` (``prediction_aster.py:14-99``): additive
  Bahdanau attention + GRU(sDim=256), teacher-forced training and greedy
  sampling.  The reference's Python decode loop becomes one
  ``jax.lax.scan`` over ``max_word_len + 1`` steps with done-masking — its
  early-exit ``eos == 0`` quirk (``recognizer_decoder.py:57-60``: index 0 is
  [GO], the true stop [s] is 1) is replicated bit-for-bit: steps after a
  predicted 0 produce zero probability rows, as the reference's
  ``outputs_`` zero-padding does.

TPU notes: the encoder keys (xProj) are computed once outside the scan;
each decode step is a batched MXU matmul over all words at once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import layers as L
from .context import Ctx, apply_bn


# ---------------------------------------------------------------------------
# CNN_V1_1
# ---------------------------------------------------------------------------


def cnn_v1_1_apply(ctx: Ctx, params: dict, x: jnp.ndarray,
                   path: str = "roi_heads.recognizer_head.backbone") -> jnp.ndarray:
    """(N, 8, 32, C) fused features -> (N, 4, 32, C)."""
    x1 = L.conv2d(x, params["conv1"]["weight"], params["conv1"].get("bias"),
                  stride=(2, 1), padding=0)
    if "norm" in params["conv1"]:
        x1 = apply_bn(ctx, x1, params["conv1"]["norm"], f"{path}.conv1.norm")
    x1 = jnp.maximum(x1, 0)
    x2 = L.conv2d(x1, params["conv2"]["weight"], params["conv2"].get("bias"), padding=1)
    if "norm" in params["conv2"]:
        x2 = apply_bn(ctx, x2, params["conv2"]["norm"], f"{path}.conv2.norm")
    x2 = jnp.maximum(x2, 0)
    return x2 + x1


def cnn_v1_rect_apply(ctx: Ctx, params: dict, x: jnp.ndarray,
                      path: str = "roi_heads.recognizer_head.backbone") -> jnp.ndarray:
    """CNN_V1_RECT (reference recognizer_backbone.py:216-266): 1x1 conv +
    residual 3x3 conv, height preserved."""
    x1 = L.conv2d(x, params["conv1"]["weight"], params["conv1"].get("bias"))
    if "norm" in params["conv1"]:
        x1 = apply_bn(ctx, x1, params["conv1"]["norm"], f"{path}.conv1.norm")
    x1 = jnp.maximum(x1, 0)
    x2 = L.conv2d(x1, params["conv2"]["weight"], params["conv2"].get("bias"), padding=1)
    if "norm" in params["conv2"]:
        x2 = apply_bn(ctx, x2, params["conv2"]["norm"], f"{path}.conv2.norm")
    x2 = jnp.maximum(x2, 0)
    return x2 + x1


def cnn_v2_apply(ctx: Ctx, params: dict, x: jnp.ndarray,
                 path: str = "roi_heads.recognizer_head.backbone") -> jnp.ndarray:
    """CNN_V2 / CNN_V2_1 (reference recognizer_backbone.py:85-164,267-328):
    [2,1]-strided conv + two residual 3x3 stages."""
    def conv(p, inp, name, **kw):
        out = L.conv2d(inp, p["weight"], p.get("bias"), **kw)
        if "norm" in p:
            out = apply_bn(ctx, out, p["norm"], f"{path}.{name}.norm")
        return jnp.maximum(out, 0)

    x1 = conv(params["conv1"], x, "conv1", stride=(2, 1), padding=0)
    x2 = conv(params["conv2"], x1, "conv2", padding=1)
    x12 = x2 + x1
    x3 = conv(params["conv3"], x12, "conv3", padding=1)
    return x12 + x3


RECOGNIZER_BACKBONES = {
    "CNN_V1_1": cnn_v1_1_apply,
    "CNN_V1": cnn_v1_1_apply,        # same body, legacy registry name
    "CNN_V1_RECT": cnn_v1_rect_apply,
    "CNN_V2": cnn_v2_apply,
    "CNN_V2_1": cnn_v2_apply,
    "Identity": lambda ctx, params, x, path="": x,
}


# ---------------------------------------------------------------------------
# BiLSTM encoder block
# ---------------------------------------------------------------------------


def bilstm_encoder_apply(ctx: Ctx, params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, W, C): mean over height then 2x (BiLSTM+linear)."""
    seq = jnp.mean(x, axis=1)  # (N, W, C)
    for i in range(len(params)):
        p = params[str(i)]
        rec = L.bilstm(seq, p["rnn"])
        seq = L.linear(rec, p["linear"]["weight"], p["linear"]["bias"])
    return seq


# ---------------------------------------------------------------------------
# ASTER attention decoder
# ---------------------------------------------------------------------------


def _attention_step(params, x, x_proj, s_prev):
    """AttentionUnit forward (prediction_aster.py:247-266).

    x: (N, T, C) encoder outputs; x_proj: precomputed xEmbed(x) (N, T, A);
    s_prev: (N, S) hidden state.  Returns attention weights (N, T).
    """
    s_proj = L.linear(s_prev, params["sEmbed"]["weight"], params["sEmbed"]["bias"])
    sum_tanh = jnp.tanh(s_proj[:, None, :] + x_proj)
    v = L.linear(sum_tanh, params["wEmbed"]["weight"], params["wEmbed"]["bias"])[..., 0]
    return jax.nn.softmax(v, axis=1)


def _decoder_step(params, x, x_proj, state, y_prev):
    """DecoderUnit forward (prediction_aster.py:291-302).

    Returns (logits (N, V), new_state (N, S), alpha (N, T)).
    """
    alpha = _attention_step(params["attention_unit"], x, x_proj, state)
    context = jnp.einsum("nt,ntc->nc", alpha, x)
    y_emb = params["tgt_embedding"]["weight"].astype(x.dtype)[y_prev.astype(jnp.int32)]
    gru_in = jnp.concatenate([y_emb, context], axis=-1)
    new_state = L.gru_cell(gru_in, state, params["gru"])
    logits = L.linear(new_state, params["fc"]["weight"], params["fc"]["bias"])
    return logits, new_state, alpha


def aster_decode_train(
    params: dict, x: jnp.ndarray, targets: jnp.ndarray, num_steps: int
) -> jnp.ndarray:
    """Teacher-forced decode: returns (N, num_steps, V) logits.

    Step 0 feeds token 0 ([GO]); step i>0 feeds targets[:, i] — the
    reference's off-by-design indexing (prediction_aster.py:43-56) where the
    encoded text already carries the leading GO slot.
    """
    n = x.shape[0]
    sdim = params["gru"]["weight_hh"].shape[1]
    x_proj = L.linear(
        x,
        params["attention_unit"]["xEmbed"]["weight"],
        params["attention_unit"]["xEmbed"]["bias"],
    )
    state0 = jnp.zeros((n, sdim), x.dtype)

    y_inputs = jnp.concatenate(
        [jnp.zeros((n, 1), targets.dtype), targets[:, 1:num_steps]], axis=1
    )  # (N, num_steps)

    def step(state, y_prev):
        logits, new_state, _ = _decoder_step(params, x, x_proj, state, y_prev)
        return new_state, logits

    _, logits = jax.lax.scan(step, state0, jnp.swapaxes(y_inputs, 0, 1))
    return jnp.swapaxes(logits, 0, 1)


def aster_decode_greedy(
    params: dict, x: jnp.ndarray, num_steps: int, eos_index: int = 0
) -> jnp.ndarray:
    """Greedy sampling: returns per-step softmax probabilities (N, T, V).

    Replicates ``AttentionRecognitionHead.sample`` (prediction_aster.py:63-99)
    exactly, including its batch-global early exit: the loop breaks only once
    *every* sequence has emitted ``eos`` at some step, and only steps after
    the break are zero-filled (``outputs_`` zero padding).  Realised as a
    full-length scan where steps past the would-be break produce zero rows.
    """
    n = x.shape[0]
    sdim = params["gru"]["weight_hh"].shape[1]
    x_proj = L.linear(
        x,
        params["attention_unit"]["xEmbed"]["weight"],
        params["attention_unit"]["xEmbed"]["bias"],
    )

    def step(carry, _):
        state, y_prev, done, broke = carry
        logits, new_state, _ = _decoder_step(params, x, x_proj, state, y_prev)
        probs = jax.nn.softmax(logits, axis=-1)
        predicted = jnp.argmax(probs, axis=-1).astype(jnp.int32)
        # Zero rows only for steps after the batch-global break.
        probs = jnp.where(broke, 0.0, probs)
        new_done = done | (predicted == eos_index)
        new_broke = broke | jnp.all(new_done)
        return (new_state, predicted, new_done, new_broke), probs

    init = (
        jnp.zeros((n, sdim), x.dtype),
        jnp.zeros((n,), jnp.int32),
        jnp.zeros((n,), bool),
        jnp.array(False),
    )
    _, probs = jax.lax.scan(step, init, None, length=num_steps)
    return jnp.swapaxes(probs, 0, 1)


# ---------------------------------------------------------------------------
# full recognizer head
# ---------------------------------------------------------------------------


def recognizer_layers_apply(
    ctx: Ctx, params: dict, fused: jnp.ndarray, backbone: str = "CNN_V1_1"
) -> jnp.ndarray:
    """backbone + encoder: fused (N, 8, 32, C) -> encoder states (N, 32, C)."""
    feats = RECOGNIZER_BACKBONES[backbone](ctx, params["backbone"], fused)
    return bilstm_encoder_apply(ctx, params["encoder"], feats)


def recognizer_inference(
    ctx: Ctx, params: dict, fused: jnp.ndarray, max_word_len: int
) -> jnp.ndarray:
    """-> (N, max_word_len + 1, V) per-step probabilities."""
    enc = recognizer_layers_apply(ctx, params, fused)
    return aster_decode_greedy(params["decoder"], enc, max_word_len + 1)


def ctc_logits(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """CTC head: encoder states (N, T, C) -> per-timestep logits (N, T, V).

    An extension beyond the reference (which ships only ctc *decode*,
    ``text_encoder.py:153-178``, with no training head): a single linear
    projection of every encoder step; blank is codec index 0.
    """
    return L.linear(x, params["fc"]["weight"], params["fc"]["bias"])


def init_recognizer(
    key,
    channels: int = 256,
    vocab: int = 97,
    norm: str = "BN",
    num_encoder_layers: int = 2,
    decoder: str = "ASTER_V2",
) -> dict:
    ks = jax.random.split(key, 16)
    att_dim = channels

    def conv_norm_p(k, kh, kw, cin, cout):
        p = {"weight": L.c2_msra_fill(k, (kh, kw, cin, cout))}
        if norm:
            p["norm"] = L.init_bn(cout)
        else:
            p["bias"] = jnp.zeros((cout,), jnp.float32)
        return p

    def lin(k, cin, cout, std=None):
        if std is None:
            bound = 1.0 / cin**0.5
            w = jax.random.uniform(k, (cout, cin), jnp.float32, -bound, bound)
        else:
            w = L.normal_init(k, (cout, cin), std)
        return {"weight": w, "bias": jnp.zeros((cout,), jnp.float32)}

    encoder = {}
    for i in range(num_encoder_layers):
        encoder[str(i)] = {
            "rnn": L.init_lstm(ks[2 + i], channels, channels),
            "linear": lin(ks[4 + i], 2 * channels, channels, std=0.01),
        }

    if decoder == "CTC":
        decoder_p = {"fc": lin(ks[11], channels, vocab)}
    else:
        decoder_p = {
            "attention_unit": {
                "sEmbed": lin(ks[6], channels, att_dim),
                "xEmbed": lin(ks[7], channels, att_dim),
                "wEmbed": lin(ks[8], att_dim, 1),
            },
            "tgt_embedding": {
                "weight": jax.random.normal(ks[9], (vocab, att_dim), jnp.float32)
            },
            "gru": L.init_gru(ks[10], channels + att_dim, channels),
            "fc": lin(ks[11], channels, vocab),
        }
    return {
        "backbone": {
            "conv1": conv_norm_p(ks[0], 2, 1, channels, channels),
            "conv2": conv_norm_p(ks[1], 3, 3, channels, channels),
        },
        "encoder": encoder,
        "decoder": decoder_p,
    }

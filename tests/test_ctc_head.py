"""CTC training head (extension; the reference ships ctc decode only,
``glass/modeling/recognition/text_encoder.py:153-178``, with no training
path). Covers: loss parity vs torch's reference CTC implementation, the
config-selected decoder layout, inference output shape, and gradients."""

import numpy as np
import jax
import jax.numpy as jnp

from glass_tpu.config import get_cfg
from glass_tpu.train import losses as LS


def _rand_ctc_case(rng, n=4, t=12, v=8, lmax=5):
    logits = rng.randn(n, t, v).astype(np.float32)
    lens = rng.randint(1, lmax + 1, size=n)
    labels = np.zeros((n, lmax), np.int32)
    for i, l in enumerate(lens):
        labels[i, :l] = rng.randint(1, v, size=l)
    return logits, labels, lens


def test_ctc_loss_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    logits, labels, lens = _rand_ctc_case(rng)
    n, t, v = logits.shape

    ours = float(
        LS.ctc_loss_masked(
            jnp.asarray(logits), jnp.asarray(labels), jnp.ones((n,), bool)
        )
    )

    log_probs = F.log_softmax(torch.from_numpy(logits), dim=-1).permute(1, 0, 2)
    flat = torch.from_numpy(
        np.concatenate([labels[i, : lens[i]] for i in range(n)])
    ).long()
    ref = F.ctc_loss(
        log_probs,
        flat,
        input_lengths=torch.full((n,), t, dtype=torch.long),
        target_lengths=torch.from_numpy(lens).long(),
        blank=0,
        reduction="none",  # per-word NLL (mean would divide by target len)
        zero_infinity=False,
    )
    np.testing.assert_allclose(ours, float(ref.mean()), rtol=1e-4)


def test_ctc_loss_word_mask(rng):
    logits, labels, _ = _rand_ctc_case(rng)
    n = logits.shape[0]
    full = LS.ctc_loss_masked(
        jnp.asarray(logits), jnp.asarray(labels), jnp.ones((n,), bool)
    )
    # masking out all but word 0 == loss of word 0 alone
    one = LS.ctc_loss_masked(
        jnp.asarray(logits), jnp.asarray(labels),
        jnp.asarray(np.arange(n) == 0),
    )
    solo = LS.ctc_loss_masked(
        jnp.asarray(logits[:1]), jnp.asarray(labels[:1]), jnp.ones((1,), bool)
    )
    np.testing.assert_allclose(float(one), float(solo), rtol=1e-5)
    assert np.isfinite(float(full))


def _ctc_cfg():
    import os

    cfg = get_cfg(
        os.path.join(os.path.dirname(__file__), "..", "configs",
                     "glass_pretrain.yaml")
    )
    rec = cfg.MODEL.ROI_RECOGNIZER_HEAD
    rec.LABELS_TYPE = "ctc"
    rec.RECOGNIZER_HEAD.DECODER.NAME = "CTC"
    return cfg


def test_ctc_arch_and_params():
    from glass_tpu.models import GlassArch, init_glass_params
    from glass_tpu.text.codec import TextCodec

    cfg = _ctc_cfg()
    arch = GlassArch.from_config(cfg)
    assert arch.recognizer_decoder == "CTC"
    codec = TextCodec.from_config(cfg)
    # [blank] + charset, no GO/STOP
    assert arch.vocab_size == codec.vocab_size
    assert codec.encode_length == arch.max_word_len

    params = init_glass_params(jax.random.PRNGKey(0), arch)
    dec = params["roi_heads"]["recognizer_head"]["decoder"]
    assert set(dec.keys()) == {"fc"}
    assert dec["fc"]["weight"].shape == (arch.vocab_size, 256)


def test_ctc_inference_and_grads(rng):
    from glass_tpu.models import GlassArch, init_glass_params
    from glass_tpu.models.context import Ctx
    from glass_tpu.models.recognizer import ctc_logits, recognizer_layers_apply

    cfg = _ctc_cfg()
    arch = GlassArch.from_config(cfg)
    params = init_glass_params(jax.random.PRNGKey(0), arch)
    rh = params["roi_heads"]["recognizer_head"]

    fused = jnp.asarray(rng.randn(3, 8, 32, 256).astype(np.float32))
    labels = jnp.asarray(
        np.pad(rng.randint(1, arch.vocab_size, size=(3, 4)),
               ((0, 0), (0, arch.max_word_len - 4))).astype(np.int32)
    )

    def loss_fn(p):
        enc = recognizer_layers_apply(Ctx(train=False), p, fused)
        logits = ctc_logits(p["decoder"], enc.astype(jnp.float32))
        assert logits.shape == (3, 32, arch.vocab_size)
        return LS.ctc_loss_masked(logits, labels, jnp.ones((3,), bool))

    val, grads = jax.value_and_grad(loss_fn)(rh)
    assert np.isfinite(float(val))
    gnorm = float(
        sum(jnp.sum(g.astype(jnp.float32) ** 2)
            for g in jax.tree_util.tree_leaves(grads))
    )
    assert gnorm > 0.0

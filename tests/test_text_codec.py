import numpy as np

from glass_tpu.text import TextCodec, decode_topk_probs, STOP_TOKEN


def make_codec(**kw):
    defaults = dict(
        character_set="0123456789abcdefghijklmnopqrstuvwxyz",
        max_word_length=8,
    )
    defaults.update(kw)
    return TextCodec(**defaults)


def test_encode_layout():
    c = make_codec()
    enc = c.encode(["ab1"])
    assert enc.shape == (1, 10)  # max_word_length + 2
    # [GO]=slot 0 stays 0; chars; then [s]=1.
    assert enc[0, 0] == 0
    a = c.dict["a"]
    assert enc[0, 1] == a
    assert enc[0, 4] == 1  # stop after 3 chars
    assert (enc[0, 5:] == 0).all()


def test_encode_drops_long_and_ignored():
    c = make_codec(ignore_text=["###"])
    enc = c.encode(["abcdefgh", "###", None])
    # len 8 >= max_word_length 8 -> dropped to '' => only [s] at slot 1
    assert enc[0, 1] == 1 and (enc[0, 2:] == 0).all()
    assert enc[1, 1] == 1
    assert enc[2, 1] == 1


def test_decode_score_is_char_product():
    c = make_codec()
    v = c.vocab_size
    T = 4
    probs = np.full((1, T, v), 0.001)
    ids = [c.dict["a"], c.dict["b"], 1]  # 'ab' + stop
    p = [0.9, 0.8, 0.7]
    for t, (i, pr) in enumerate(zip(ids, p)):
        probs[0, t, i] = pr
    texts, scores, chars = decode_topk_probs(probs, c)
    assert texts[0] == "ab"
    np.testing.assert_allclose(scores[0], 0.9 * 0.8 * 0.7, atol=1e-6)
    assert len(chars[0]) == 3  # includes the stop symbol confidence


def test_decode_no_stop_runs_full_length():
    c = make_codec()
    v = c.vocab_size
    probs = np.zeros((1, 3, v))
    probs[:, :, c.dict["z"]] = 0.5
    texts, scores, _ = decode_topk_probs(probs, c)
    assert texts[0] == "zzz"


def test_ctc_mode_collapses_repeats():
    c = make_codec(mode="ctc")
    blank = 0
    a = c.dict["a"]
    b = c.dict["b"]
    ids = np.array([[a, a, blank, b, b, blank, a, 0]])
    out = c.decode(ids)
    assert out[0]["text"] == "aba"

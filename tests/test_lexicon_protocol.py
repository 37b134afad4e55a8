"""Benchmark lexicon protocol tests (generic/weak/per-image strong).

Mirrors reference ``lexicon_utils.py`` + ``text_evaluator.py:183-204``
semantics: pairs-file resolution, EDIT_DISTANCE_THR accept/drop, type-1
always-accept, per-image strong lexicons, and the MTSv3 weighted-ED
shortlist.  Also validates the length-bucket pruning against a brute-force
scan.
"""

import numpy as np
import Levenshtein
import pytest

from glass_tpu.evaluation.lexicon import (
    LexiconSet,
    find_match_word,
    load_pairs_file,
    match_transcript,
)


def brute_force_match(q, lexicon, pairs):
    best_d, best_w = 10**9, q
    for w in lexicon:
        d = Levenshtein.distance(q.upper(), w.upper())
        if d < best_d:
            best_d, best_w = d, pairs.get(w.upper(), w)
    return best_w, best_d


def test_find_match_word_matches_brute_force(rng):
    alphabet = list("abcdefghij")
    words = [
        "".join(rng.choice(alphabet, size=rng.randint(1, 12)))
        for _ in range(300)
    ]
    pairs = {w.upper(): w for w in words}
    for _ in range(40):
        q = "".join(rng.choice(alphabet, size=rng.randint(1, 12)))
        got_w, got_d = find_match_word(q, words, pairs)
        _, exp_d = brute_force_match(q, words, pairs)
        assert got_d == exp_d  # word choice may tie; distance must be optimal
        assert Levenshtein.distance(q.upper(), got_w.upper()) == exp_d


def test_pairs_file_resolves_cased_form(tmp_path):
    lex = tmp_path / "lex.txt"
    lex.write_text("CAFE\nSTREET\n")
    pairs = tmp_path / "pairs.txt"
    pairs.write_text("CAFE Café\nSTREET Street\n")
    ls = LexiconSet(lexicon_type=2, words=["CAFE", "STREET"],
                    pairs=load_pairs_file(str(pairs)))
    assert ls.correct("CAFF") == "Café"
    assert ls.correct("STREFT") == "Street"


def test_weak_lexicon_drop_semantics():
    ls = LexiconSet(lexicon_type=2, words=["STREET", "AVENUE"],
                    edit_distance_thr=1.5)
    assert ls.correct("STREFT") == "STREET"   # dist 1 < 1.5 -> replaced
    assert ls.correct("zzzzzz") is None       # no match within thr -> dropped


def test_generic_lexicon_always_accepts():
    ls = LexiconSet(lexicon_type=1, words=["STREET", "AVENUE"])
    assert ls.correct("zzzzzz") in ("STREET", "AVENUE")


def test_strong_lexicon_per_image(tmp_path):
    d = tmp_path / "strong"
    d.mkdir()
    (d / "new_voc_img_1.txt").write_text("HELLO\nWORLD\n")
    (d / "pair_voc_img_1.txt").write_text("HELLO Hello\nWORLD World\n")
    (d / "new_voc_img_2.txt").write_text("OTHER\n")
    (d / "pair_voc_img_2.txt").write_text("OTHER Other\n")
    ls = LexiconSet(lexicon_type=3, strong_dir=str(d))
    assert ls.correct("HELLO", image_id="1") == "Hello"
    assert ls.correct("HELLO", image_id="2") is None  # not in img 2's lexicon
    assert ls.correct("OTHER", image_id="2") == "Other"
    # Missing per-image file -> empty lexicon -> drop.
    assert ls.correct("HELLO", image_id="99") is None


def test_weighted_shortlist_prefers_confident_match():
    # prediction "cat" with char probs; lexicon has CAT-like words at plain
    # ED 1: "CAR" and "CAP".  Weighted ED must choose via the prob matrix.
    alphabet = {c: i for i, c in enumerate("acprt")}
    enc = lambda ch: alphabet.get(ch.lower(), 0)
    # positions: c a t; make 't'->'r' substitution nearly free (p(r) high)
    scores = np.zeros((3, 5))
    scores[0, alphabet["c"]] = 0.9
    scores[1, alphabet["a"]] = 0.9
    scores[2, alphabet["t"]] = 0.1
    scores[2, alphabet["r"]] = 0.6   # replace cost max(1 - .6/.1*5, 0) = 0
    scores[2, alphabet["p"]] = 0.001  # replace cost ~ max(1-.05,0) ~ .95
    words = ["CAR", "CAP"]
    pairs = {w: w for w in words}
    match, dist = find_match_word("cat", words, pairs, scores=scores,
                                  weighted_ed=True, char_encode=enc)
    assert match == "CAR" and dist == 0.0


def test_match_transcript_modes():
    assert match_transcript("'hello!", word_spotting=False) == "hello"
    assert match_transcript("it's", word_spotting=True) == "it"
    assert match_transcript("-word-", word_spotting=True) == "word"
    assert match_transcript("a#b", word_spotting=True) == "a b"


def test_from_config_and_evaluator_integration(tmp_path):
    """TEST.LEXICON_TYPE flows from the config through TextEvaluator."""
    from glass_tpu.config import get_cfg
    import os

    cfg = get_cfg(os.path.join(os.path.dirname(__file__), "..", "configs",
                               "glass_finetune_icdar15.yaml"))
    lex = tmp_path / "lex.txt"
    lex.write_text("HELLO\nWORLD\n")
    cfg.TEST.LEXICON_TYPE = 2
    cfg.TEST.LEXICON_PATH = str(lex)
    ls = LexiconSet.from_config(cfg)
    assert ls is not None and ls.lexicon_type == 2
    assert ls.correct("HELLO") == "HELLO"

    from glass_tpu.evaluation import TextEvaluator

    ev = TextEvaluator("toy", cfg)
    assert ev.lexicon_set is not None and ev.lexicon_set.lexicon_type == 2

    # Missing path must fail loudly.
    cfg2 = cfg.clone()
    cfg2.TEST.LEXICON_PATH = ""
    with pytest.raises(ValueError):
        LexiconSet.from_config(cfg2)

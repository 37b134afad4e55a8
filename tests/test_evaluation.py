"""Evaluation protocol tests."""

import numpy as np

from glass_tpu.evaluation import (
    EvalInstance,
    evaluate_dataset,
    evaluate_image,
    transcription_match,
    include_in_dictionary,
    Lexicon,
    weighted_edit_distance,
)
from glass_tpu.evaluation.polygon import polygon_iou, polygon_area


def quad(x, y, w, h):
    return np.array([[x, y], [x + w, y], [x + w, y + h], [x, y + h]], np.float64)


def test_polygon_iou_basic():
    a = quad(0, 0, 10, 10)
    b = quad(5, 0, 10, 10)
    assert abs(polygon_iou(a, b) - 50.0 / 150.0) < 1e-9
    assert abs(polygon_area(a) - 100.0) < 1e-9


def test_polygon_iou_concave_raster():
    # L-shaped concave polygon vs a square covering half of it.
    concave = np.array(
        [[0, 0], [10, 0], [10, 5], [5, 5], [5, 10], [0, 10]], np.float64
    )
    square = quad(0, 0, 5, 10)
    iou = polygon_iou(concave, square)
    # concave area 75, intersection 50, union 100+... union = 75 + 50 - 50 = 75
    assert abs(iou - 50.0 / 75.0) < 0.02


def test_transcription_match_special_chars():
    assert transcription_match("HELLO", "HELLO")
    assert transcription_match("'HELLO", "HELLO")
    assert transcription_match("HELLO!", "HELLO")
    assert transcription_match("(HELLO)", "HELLO")
    assert not transcription_match("HELLO", "WORLD")


def test_include_in_dictionary():
    assert include_in_dictionary("street")
    assert not include_in_dictionary("st")       # too short
    assert not include_in_dictionary("a b")      # inner space after cleanup


def test_include_in_dictionary_character_validity():
    """Latin-range / not-allowed rules (text_eval_script.py:203-221): gts
    with digits or non-Latin characters become don't-care for word
    spotting; the reference computes the same expectations."""
    # digits are NOT in the allowed ranges
    assert not include_in_dictionary("route66")
    assert not include_in_dictionary("12345")
    # multiplication/division signs sit inside the Latin-1 range but are
    # explicitly disallowed
    assert not include_in_dictionary("ab×cd")
    assert not include_in_dictionary("ab÷cd")
    # accented Latin (range3 À-ƿ) and Greek (range5 Ά-Ͽ) are allowed
    assert include_in_dictionary("café")
    assert include_in_dictionary("naïve")
    assert include_in_dictionary("αβγδ")
    # hyphen inside the word is allowed (range6)
    assert include_in_dictionary("drive-in")
    # CJK / Cyrillic are outside every range
    assert not include_in_dictionary("日本語テキスト")
    assert not include_in_dictionary("москва")
    # the cleanup still runs first: "ab1" -> stripped "'s" etc.
    assert not include_in_dictionary("big1's")   # digit survives cleanup
    assert include_in_dictionary("cafe's")       # 's removed, rest valid


def test_word_spotting_digit_gt_becomes_dontcare():
    gts = [EvalInstance(quad(0, 0, 20, 10), "route66")]
    dets = [EvalInstance(quad(0, 0, 20, 10), "route66")]
    t = evaluate_image(gts, dets, word_spotting=True)
    assert t.gt_care == 0          # don't-care under the official protocol
    assert t.det_care == 0         # det covered by the don't-care gt
    assert t.det_only_gt_care == 1  # detection-only still counts it


def test_evaluate_image_e2e_and_det_only():
    gts = [
        EvalInstance(quad(0, 0, 20, 10), "HELLO"),
        EvalInstance(quad(40, 0, 20, 10), "###"),       # don't care
        EvalInstance(quad(80, 0, 20, 10), "WORLD"),
    ]
    dets = [
        EvalInstance(quad(1, 0, 20, 10), "hello"),      # correct (case-insens.)
        EvalInstance(quad(41, 0, 20, 10), "junk"),      # covered by dontcare
        EvalInstance(quad(80, 0, 20, 10), "word"),      # matched, wrong text
    ]
    t = evaluate_image(gts, dets)
    assert t.gt_care == 2 and t.det_care == 2
    assert t.matched == 1            # only HELLO read correctly
    assert t.det_only_matched == 2   # both care dets matched geometrically

    res = evaluate_dataset({"1": gts}, {"1": dets})
    assert abs(res["E2E_RESULTS"]["hmean"] - 0.5) < 1e-9
    assert abs(res["DETECTION_ONLY_RESULTS"]["hmean"] - 1.0) < 1e-9


def test_evaluate_image_word_spotting():
    gts = [EvalInstance(quad(0, 0, 20, 10), "ab")]  # too short -> dontcare
    dets = []
    t = evaluate_image(gts, dets, word_spotting=True)
    assert t.gt_care == 0
    # But the detection-only path still counts it.
    assert t.det_only_gt_care == 1


def test_lexicon_correction():
    lex = Lexicon(["STREET", "AVENUE"])
    assert lex.correct("STREFT") == "STREET"
    assert lex.correct("zzzzzz") == "zzzzzz"  # too far -> unchanged


def test_weighted_edit_distance_mts_costs():
    # Alphabet a,b,c,d -> 0..3; per-position class probs for the prediction.
    alphabet = {c: i for i, c in enumerate("abcd")}
    enc = lambda ch: alphabet[ch.lower()]
    scores = np.array([
        [0.9, 0.03, 0.03, 0.04],   # 'a' confident
        [0.05, 0.9, 0.03, 0.02],   # 'b' confident
        [0.02, 0.03, 0.10, 0.50],  # 'c' low-confidence, 'd' likely
    ])
    # Substituting the low-confidence 'c' by 'd' costs
    # max(1 - p(d)/p(c)*5, 0) = max(1 - 0.5/0.1*5, 0) = 0.
    d = weighted_edit_distance("abc", "ABD", scores, enc)
    assert d == 0.0
    # Identical words cost 0; a confident-char substitution costs ~1.
    assert weighted_edit_distance("abc", "ABC", scores, enc) == 0.0
    d2 = weighted_edit_distance("abc", "DBC", scores, enc)
    assert 0.5 < d2 <= 1.0


def test_eval_instance_gather_payload_roundtrip():
    """The multi-host gather (TextEvaluator.gather_across_processes)
    serializes the (dets, gts) dicts with pickle over uint8 buffers; the
    EvalInstance payload must survive that roundtrip and dict-merge."""
    import pickle

    from glass_tpu.evaluation.evaluator import EvalInstance

    dets_a = {
        "1": [EvalInstance(points=np.array([[0.0, 0], [1, 0], [1, 1], [0, 1]]),
                           transcription="word", confidence=0.9)],
    }
    dets_b = {
        "2": [EvalInstance(points=np.array([[2.0, 2], [3, 2], [3, 3], [2, 3]]),
                           transcription="other", confidence=0.5)],
    }
    payload = np.frombuffer(pickle.dumps((dets_b, {})), np.uint8)
    padded = np.zeros(payload.size + 13, np.uint8)
    padded[: payload.size] = payload
    back, _ = pickle.loads(padded[: payload.size].tobytes())
    dets_a.update(back)
    assert set(dets_a) == {"1", "2"}
    assert dets_a["2"][0].transcription == "other"
    np.testing.assert_allclose(dets_a["2"][0].points[2], [3, 3])


def test_per_sample_zero_care_convention_and_detail():
    # Reference per-sample convention (text_eval_script.py:415-421): an
    # image with no care gts reports recall 1; precision 1 only when no
    # care detections remain.  Dataset totals are unaffected (global sums).
    from glass_tpu.evaluation.text_eval import per_sample_detail

    gts = [EvalInstance(quad(0, 0, 20, 10), "###")]
    dets_none = {}
    per = {}
    res = evaluate_dataset({"1": gts}, dets_none, per_sample=per)
    assert per["1"]["e2e"] == {"precision": 1.0, "recall": 1.0, "hmean": 1.0}
    assert res["E2E_RESULTS"]["recall"] == 0.0  # global stays sum-based

    # one uncovered care det against zero care gts: precision 0, recall 1
    dets = {"1": [EvalInstance(quad(100, 100, 20, 10), "stray")]}
    per = {}
    evaluate_dataset({"1": gts}, dets, per_sample=per)
    assert per["1"]["e2e"]["recall"] == 1.0
    assert per["1"]["e2e"]["precision"] == 0.0

    # detail fields carry the reference's debugging artifacts
    gts2 = [EvalInstance(quad(0, 0, 20, 10), "HELLO")]
    dets2 = {"1": [EvalInstance(quad(0, 0, 20, 10), "hello")]}
    per = {}
    evaluate_dataset({"1": gts2}, dets2, per_sample=per)
    rec = per["1"]
    assert rec["gt_trans"] == ["HELLO"] and rec["det_trans"] == ["hello"]
    assert rec["pairs"] == [{"gt": 0, "det": 0, "correct": True}]
    assert rec["gt_dont_care"] == [] and rec["det_dont_care"] == []


def test_compute_ap_reference_semantics():
    # text_eval_script.py:124-142: running precision at each correct hit,
    # ranked by descending confidence, normalized by care-gt count.
    from glass_tpu.evaluation.text_eval import compute_ap

    assert compute_ap([], [], 5) == 0.0
    # hits at ranks 1 and 3 (after sorting by confidence desc)
    ap = compute_ap([0.9, 0.5, 0.7], [True, True, False], 2)
    # sorted: (0.9 T) (0.7 F) (0.5 T) -> 1/1 + 2/3, / 2
    assert abs(ap - (1.0 + 2.0 / 3.0) / 2.0) < 1e-12


def test_evaluate_dataset_confidences_ap_wiring():
    # CONFIDENCES on: per-det (confidence, e2e-correct) accumulate globally
    # and AP appears in E2E_RESULTS and per-sample records (original RRC
    # semantics; reference declares the arrays at text_eval_script.py:259-260).
    gts1 = [
        EvalInstance(quad(0, 0, 20, 10), "HELLO"),
        EvalInstance(quad(40, 0, 20, 10), "###"),  # don't care
        EvalInstance(quad(80, 0, 20, 10), "WORLD"),
    ]
    dets1 = [
        EvalInstance(quad(1, 0, 20, 10), "hello", confidence=0.9),   # correct
        EvalInstance(quad(41, 0, 20, 10), "junk", confidence=0.8),   # dontcare-covered: excluded
        EvalInstance(quad(80, 0, 20, 10), "word", confidence=0.7),   # matched, wrong text
    ]
    gts2 = [EvalInstance(quad(0, 0, 20, 10), "FOO")]
    dets2 = [EvalInstance(quad(0, 0, 20, 10), "foo", confidence=0.5)]

    per_sample = {}
    res = evaluate_dataset(
        {"1": gts1, "2": gts2},
        {"1": dets1, "2": dets2},
        per_sample=per_sample,
        confidences=True,
    )
    # Global care dets ranked by conf: (0.9 T) (0.7 F) (0.5 T); gt_care = 3.
    expected_ap = (1.0 / 1.0 + 2.0 / 3.0) / 3.0
    assert abs(res["E2E_RESULTS"]["AP"] - expected_ap) < 1e-12
    # Per-sample: image 1 -> [(0.9 T), (0.7 F)], gt_care 2 -> AP = 0.5;
    # image 2 -> [(0.5 T)], gt_care 1 -> AP = 1.0.
    assert abs(per_sample["1"]["AP"] - 0.5) < 1e-12
    assert abs(per_sample["2"]["AP"] - 1.0) < 1e-12
    # Flag off: no AP key anywhere, P/R/H unchanged.
    res_off = evaluate_dataset({"1": gts1}, {"1": dets1})
    assert "AP" not in res_off["E2E_RESULTS"]

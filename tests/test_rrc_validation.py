"""Strict RRC submission-line validation (reference
``rrc_evaluation_funcs.py:96-140`` + ``text_eval_script.py:40-62``):
malformed external det/gt zips are rejected with the official harness's
per-line errors instead of silently mis-parsing."""

import zipfile

import numpy as np
import pytest

from glass_tpu.evaluation import load_gt_zip, validate_submission
from glass_tpu.evaluation.rrc_validation import (
    get_tl_line_values_det,
    get_tl_line_values_gt,
    line_format_for,
    load_zip_file,
    validate_lines_in_file,
    validate_lines_in_file_gt,
)


def _zip(path, files):
    with zipfile.ZipFile(path, "w") as zf:
        for name, content in files.items():
            zf.writestr(name, content)
    return str(path)


# ---------------------------------------------------------------------------
# line parsers
# ---------------------------------------------------------------------------


def test_icdar_gt_line_ok():
    pts, conf, trans = get_tl_line_values_gt(
        "10,10,100,10,100,40,10,40,hello", "icdar"
    )
    assert pts == [10.0, 10.0, 100.0, 10.0, 100.0, 40.0, 10.0, 40.0]
    assert trans == "hello"


def test_icdar_gt_transcription_may_contain_commas():
    # the trailing group is (.*) — reference regex :210
    _, _, trans = get_tl_line_values_gt("0,0,9,0,9,9,0,9,a,b", "icdar")
    assert trans == "a,b"


def test_icdar_gt_line_rejects_floats_and_short():
    with pytest.raises(ValueError, match="Format incorrect"):
        get_tl_line_values_gt("10.5,10,100,10,100,40,10,40,hello", "icdar")
    with pytest.raises(ValueError, match="Format incorrect"):
        get_tl_line_values_gt("10,10,100,10,hello", "icdar")


def test_totaltext_gt_line_ok_and_quoted():
    pts, _, trans = get_tl_line_values_gt(
        "1,1,50,1,50,20,1,20,####word", "totaltext"
    )
    assert len(pts) == 8 and trans == "word"
    _, _, trans = get_tl_line_values_gt(
        '0,0,9,0,9,9,0,9,####"say \\"hi\\""', "totaltext"
    )
    assert trans == 'say "hi"'


def test_totaltext_gt_line_rejects():
    with pytest.raises(ValueError, match="Format incorrect"):
        get_tl_line_values_gt("1,1,50,1,50,20,1,20,word", "totaltext")  # no ####
    with pytest.raises(ValueError, match="even"):
        get_tl_line_values_gt("1,1,50,1,50,20,1,####word", "totaltext")
    with pytest.raises(ValueError):
        get_tl_line_values_gt("1,x,50,1,50,20,1,20,####word", "totaltext")
    with pytest.raises(ValueError, match="3 points"):
        get_tl_line_values_gt("1,1,50,1,####word", "totaltext")


def test_det_line_parses_and_rejects():
    pts, _, trans = get_tl_line_values_det("1,1,9,1,9,9,1,9,####pred")
    assert len(pts) == 8 and trans == "pred"
    with pytest.raises(ValueError, match="Format incorrect"):
        get_tl_line_values_det("1,1,9,1,9,9,1,9,pred")
    with pytest.raises(ValueError, match="even"):
        get_tl_line_values_det("1,1,9,1,9,9,1,####pred")


def test_line_format_rule():
    # reference text_eval_script.py:46
    assert line_format_for("/data/gt_totaltext.zip") == "totaltext"
    assert line_format_for("textocr_val") == "totaltext"
    assert line_format_for("/data/gt_icdar2015.zip") == "icdar"
    assert line_format_for("anything_else") == "icdar"


# ---------------------------------------------------------------------------
# per-file + per-zip validation
# ---------------------------------------------------------------------------


def test_validate_file_reports_sample_and_line():
    bad = b"10,10,100,10,100,40,10,40,ok\nBADLINE\n"
    with pytest.raises(ValueError) as ei:
        validate_lines_in_file_gt("gt_img_3.txt", bad, "icdar")
    msg = str(ei.value)
    assert "Line in sample not valid" in msg
    assert "gt_img_3.txt" in msg and "BADLINE" in msg


def test_validate_file_rejects_non_utf8():
    with pytest.raises(ValueError, match="not UTF-8"):
        validate_lines_in_file_gt("gt_img_1.txt", b"\xff\xfe\x00bad", "icdar")
    with pytest.raises(ValueError, match="not UTF-8"):
        validate_lines_in_file("res_img_1.txt", b"\xff\xfe\x00bad")


def test_validate_file_accepts_bom_crlf_and_blank_lines():
    ok = b"\xef\xbb\xbf10,10,100,10,100,40,10,40,ok\r\n\r\n0,0,9,0,9,9,0,9,###\r\n"
    validate_lines_in_file_gt("gt_img_1.txt", ok, "icdar")


def test_load_zip_file_all_entries_rejects_strays(tmp_path):
    p = _zip(
        tmp_path / "det.zip",
        {"res_img_1.txt": "1,1,9,1,9,9,1,9,####a\n", "notes.md": "stray"},
    )
    with pytest.raises(ValueError, match="ZIP entry not valid"):
        load_zip_file(p, r"(?:.*[/\\])?res_img_([0-9]+)\.txt$", all_entries=True)
    # without all_entries the stray is skipped (gt semantics)
    loaded = load_zip_file(p, r"(?:.*[/\\])?res_img_([0-9]+)\.txt$")
    assert list(loaded) == ["1"]


def test_validate_submission_end_to_end(tmp_path):
    gt = _zip(
        tmp_path / "gt_icdar.zip",
        {
            "gt_img_1.txt": "10,10,100,10,100,40,10,40,word\n",
            "gt_img_2.txt": "0,0,9,0,9,9,0,9,###\n",
        },
    )
    det_ok = _zip(
        tmp_path / "det_ok.zip", {"res_img_1.txt": "11,11,99,11,99,39,11,39,####word\n"}
    )
    gt_c, det_c = validate_submission(gt, det_ok)
    assert set(gt_c) == {"1", "2"} and set(det_c) == {"1"}

    det_extra = _zip(
        tmp_path / "det_extra.zip", {"res_img_9.txt": "1,1,9,1,9,9,1,9,####a\n"}
    )
    with pytest.raises(ValueError, match="not present in GT"):
        validate_submission(gt, det_extra)

    det_bad = _zip(tmp_path / "det_bad.zip", {"res_img_1.txt": "oops\n"})
    with pytest.raises(ValueError, match="Line in sample not valid"):
        validate_submission(gt, det_bad)

    gt_bad = _zip(tmp_path / "gt_bad_icdar.zip", {"gt_img_1.txt": "1,2,3\n"})
    with pytest.raises(ValueError, match="Line in sample not valid"):
        validate_submission(gt_bad, det_ok)


# ---------------------------------------------------------------------------
# load_gt_zip strict mode
# ---------------------------------------------------------------------------


def test_load_gt_zip_strict_rejects_malformed(tmp_path):
    p = _zip(
        tmp_path / "gt_icdar15.zip",
        {"gt_img_1.txt": "10,10,100,10,100,40,10,40,word\n1,2,3,oops\n"},
    )
    with pytest.raises(ValueError, match="Line in sample not valid"):
        load_gt_zip(p, r"gt_img_([0-9]+)")
    # lenient mode still parses best-effort
    out = load_gt_zip(p, r"gt_img_([0-9]+)", strict=False)
    assert len(out["1"]) == 1


def test_load_gt_zip_strict_parses_valid(tmp_path):
    p = _zip(
        tmp_path / "gt_icdar15.zip",
        {
            "gt_img_1.txt": "10,10,100,10,100,40,10,40,word\n0,0,9,0,9,9,0,9,###\n",
        },
    )
    out = load_gt_zip(p, r"gt_img_([0-9]+)")
    assert len(out["1"]) == 2
    np.testing.assert_allclose(
        out["1"][0].points, [[10, 10], [100, 10], [100, 40], [10, 40]]
    )
    assert out["1"][0].transcription == "word"
    assert out["1"][1].transcription == "###"


def test_load_gt_zip_totaltext_dialect(tmp_path):
    p = _zip(
        tmp_path / "gt_totaltext.zip",
        {"poly_gt_img11.txt": "1,1,50,1,60,15,50,20,1,20,####curve\n"},
    )
    out = load_gt_zip(p, r"img([0-9]+)")
    assert len(out["11"]) == 1
    assert out["11"][0].points.shape == (5, 2)
    assert out["11"][0].transcription == "curve"

"""Normalizer / alphabet codec / CTC-collapse unit tests (M1, M10/M11, A5,
F12 analogs — SURVEY.md §2)."""

from ocr_ray.config import DECODER_BLANKS
from ocr_ray.textnorm import ctc_collapse, encode_token, normalize_text, tokenize


def test_normalize_strips_bom_and_zero_width():
    # reference DataPreprocess/DataGen.py:59-62
    assert normalize_text("﻿hello‍ wor​ld") == "hello world"


def test_normalize_newlines_and_nfc():
    assert normalize_text("a\r\nb\rc") == "a\nb\nc"
    assert normalize_text("é") == "é"  # NFC compose


def test_encode_token_silently_skips_unknown():
    # reference DataGen.py:28-45: unknown chars skipped without error
    assert encode_token("héllo") == "hllo"
    assert encode_token("字字") == ""  # all-unknown -> blank
    assert encode_token("a-b.c") == "a-b.c"


def test_ctc_collapse_merges_repeats_then_drops_blanks():
    # reference Module/RecognitionLoss.py:33-38 (merge_repeated=True)
    assert ctc_collapse(["a", "a", "b", "", "", "b", "b"]) == ["a", "b", "b"]
    assert ctc_collapse([]) == []
    # blanks separate repeats exactly like CTC: a _ a -> a a
    assert ctc_collapse(["a", "", "a"]) == ["a", "a"]


def test_ctc_collapse_decoder_blanks():
    toks = ["x", "*", "###", "|", "--", "y"]
    assert ctc_collapse(toks, DECODER_BLANKS) == ["x", "y"]


def test_tokenize():
    assert tokenize("  a  b\nc ") == ["a", "b", "c"]

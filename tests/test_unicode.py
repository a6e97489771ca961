"""Unicode normalization functions (functions/unicode.py).

All non-ASCII fixture characters are built with chr() so no editor,
diff tool, or transport layer can silently mangle them.
"""

from __future__ import annotations

import unicodedata

from pyspark.sql import functions as F

from parlerproject_spark.functions.unicode import (clean_chars, nfc,
                                                   normalize_text)

NBSP = chr(0xA0)
ACUTE = chr(0x301)            # combining acute accent
ZWSP, ZWNJ, ZWJ, BOM, WJ = (chr(c) for c in
                            (0x200B, 0x200C, 0x200D, 0xFEFF, 0x2060))
LQ, RQ, LDQ, RDQ = (chr(c) for c in (0x2018, 0x2019, 0x201C, 0x201D))
ENDASH, EMDASH, ELLIPSIS = chr(0x2013), chr(0x2014), chr(0x2026)
E_ACUTE = chr(0xE9)           # precomposed


def _run(spark, col_fn, values):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)],
                               ["i", "t"])
    rows = df.select("i", col_fn(F.col("t")).alias("o")).collect()
    return [r["o"] for r in sorted(rows, key=lambda r: r["i"])]


def test_clean_chars_rewrites(spark):
    got = _run(spark, clean_chars, [
        "a" + NBSP + "b",
        LQ + "x" + RQ + " " + LDQ + "y" + RDQ,
        "a" + ENDASH + "b" + EMDASH + "c",
        "z" + ZWSP + ZWNJ + ZWJ + BOM + WJ + "w",
        "wait" + ELLIPSIS,
        "keep\tthis\nline\x07\x1fdrop",
    ])
    assert got == ["a b", "'x' \"y\"", "a-b-c", "zw", "wait...",
                   "keep\tthis\nlinedrop"]


def test_nfc_composes_and_keeps_null(spark):
    decomposed = "Cafe" + ACUTE
    got = _run(spark, nfc, [decomposed, None, "plain"])
    assert got[0] == unicodedata.normalize("NFC", decomposed)
    assert got[0] == "Caf" + E_ACUTE
    assert got[1] is None
    assert got[2] == "plain"


def test_normalize_text_composed_pipeline(spark):
    raw = ("Cafe" + ACUTE + ZWSP + " " + LDQ + "ok" + RDQ
           + ELLIPSIS + NBSP + "end")
    [got] = _run(spark, normalize_text, [raw])
    assert got == "Caf" + E_ACUTE + " \"ok\"... end"
    # idempotent: normalizing the output changes nothing
    [again] = _run(spark, normalize_text, [got])
    assert again == got


def test_normalize_preserves_ascii(spark):
    vals = ["hello world", "line1\nline2\ttab", ""]
    assert _run(spark, normalize_text, vals) == vals

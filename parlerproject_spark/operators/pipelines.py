"""Composite training-data pipelines — the end-to-end shapes a
100 TB corpus actually runs, composed from the primitive operators so
Catalyst optimizes across stage boundaries (filters collapse into the
scan, the dedup groupBy is the only shuffle).

The reference's analogue is the manual chain html→text→filter→embed
(code/htmlConverter.py + code/embeddings.py:19-27 non-empty filter);
a modern LLM-data pipeline inserts quality/language gates and dedup
between those steps, so that is the composite shipped here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parlerproject_spark.functions.text import fingerprint_md5, quality_score


def clean_corpus(docs: DataFrame, *, min_quality: float = 0.5,
                 lang: str | None = "en", id_col: str = "doc_id",
                 text_col: str = "text", lang_col: str = "lang") -> DataFrame:
    """Quality gate → language gate → exact-dedup survivor pick.

    Plan shape: both filters are narrow and evaluated in the scan
    stage (quality_score is pure Column arithmetic, so Catalyst can
    pipeline it with the language pushdown predicate); the ONLY
    shuffle is the fingerprint groupBy, keyed on a 32-char md5 —
    uniform by construction, so no skew at any scale. Survivor =
    lowest id per fingerprint (deterministic); n_dups records the
    collapsed group size for yield accounting.
    Columns: doc_id, n_dups.
    """
    gated = docs
    if lang is not None:
        gated = gated.filter(F.col(lang_col) == lang)
    gated = gated.filter(quality_score(text_col) >= min_quality)
    return (gated
            .select(fingerprint_md5(text_col).alias("fp"), F.col(id_col))
            .groupBy("fp")
            .agg(F.min(id_col).alias("doc_id"),
                 F.count("*").alias("n_dups"))
            .select("doc_id", "n_dups"))

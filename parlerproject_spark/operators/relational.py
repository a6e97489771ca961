"""Relational operators re-expressing the reference's membership,
resume, and enrichment patterns (SURVEY §2.4-2.8).

Scale notes (these hold at 100 TB, not just the test SFs):
- semi/anti joins against small key sets broadcast — no shuffle of
  the big side. That is exactly the reference's shape: a ~68k-row
  GPS-detected list driving extraction from a ~1M-member archive
  (analysis/preview_data.ipynb:127-129).
- top-k goes through TakeOrderedAndProject (per-partition heap, then
  k-merge on the driver) — never a global sort.
- share-of-total uses a single-pass window over the grouped result
  (tiny), not a second scan of the fact table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def semi_join(big: DataFrame, keys: DataFrame, on: str | Sequence[str],
              *, broadcast_keys: bool = True) -> DataFrame:
    """Membership filter: rows of `big` whose key appears in `keys`.

    Reference semantics: extract only tar members named in the
    GPS-detected list (analysis/preview_data.ipynb:127-129,312-316;
    planned in code/data_processing_scripts/create_metadata_df.py:9-12).
    Broadcast by default — the key list is the small side by
    construction.
    """
    keys = F.broadcast(keys) if broadcast_keys else keys
    return big.join(keys, on=on, how="left_semi")


def anti_join(work: DataFrame, done: DataFrame, on: str | Sequence[str],
              *, broadcast_done: bool = True) -> DataFrame:
    """Remaining-work filter: rows of `work` with no match in `done`.

    The idiomatic replacement for all three of the reference's resume
    mechanisms: skip-if-output-exists (code/htmlConverter.py:52-54),
    resume-at-listing-offset (download_image_files.py:20-23), and
    resume-by-log-row-count (ID_matching_metadata.py:25-30,78-83).
    Running it twice yields zero rows the second time — idempotent by
    construction instead of by checkpoint file.
    """
    done = F.broadcast(done) if broadcast_done else done
    return work.join(done, on=on, how="left_anti")


def lookup_join(facts: DataFrame, dim: DataFrame, on: str | Sequence[str],
                *, how: str = "inner") -> DataFrame:
    """Dimension enrichment (reference: per-topic Count lookup,
    code/bertopicTest.py:93-97). Small dim → broadcast hash join,
    no shuffle of the fact side."""
    return facts.join(F.broadcast(dim), on=on, how=how)


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """Deterministic top-k. Callers must include a unique tie-break
    column in `order` (SURVEY §7.3 determinism note). Spark plans
    this as TakeOrderedAndProject — O(k) memory per partition."""
    return df.orderBy(*order).limit(k)


def share_of_total(df: DataFrame, group_col: str, *,
                   count_alias: str = "cnt", pct_alias: str = "pct") -> DataFrame:
    """Group count + percent-of-total (reference: per-topic share,
    code/bertopicTest.py:107-112). One aggregation, then an
    unpartitioned window over the already-tiny grouped result."""
    counts = df.groupBy(group_col).agg(F.count("*").alias(count_alias))
    total = Window.partitionBy()
    return counts.withColumn(
        pct_alias,
        F.round(F.col(count_alias) / F.sum(count_alias).over(total) * 100.0, 6),
    )


def union_by_name(parts: Sequence[DataFrame]) -> DataFrame:
    """Schema-merging union (reference: NaN-padded pd.concat loop over
    68,588 ragged frames, preview_data.ipynb:312-316). Built as one
    balanced unionByName(allowMissingColumns=True) — never an
    iterative left-deep chain, which explodes the logical plan
    (SURVEY §4 U1)."""
    if not parts:
        raise ValueError("union_by_name needs at least one DataFrame")
    frames = list(parts)
    # Balanced pairwise fold keeps the plan tree O(log n) deep.
    while len(frames) > 1:
        nxt = []
        for i in range(0, len(frames) - 1, 2):
            nxt.append(frames[i].unionByName(frames[i + 1], allowMissingColumns=True))
        if len(frames) % 2:
            nxt.append(frames[-1])
        frames = nxt
    return frames[0]

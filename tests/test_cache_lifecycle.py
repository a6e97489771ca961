"""Cache-lifecycle contract (SCALE.md §7, VERDICT r12 item 6).

Operators persist model-sized reduction tables with the lazy API;
the SESSION owns the release boundary via caching.release_all. This
suite pins both halves of that contract: persist-heavy queries do
pin relations when materialized, and release_all drops every one of
them, so a long driver/oracle session that releases at its query
boundaries (tools/check_oracle.py does) cannot accumulate caches.
"""

from __future__ import annotations

import parlerproject_spark.queries as Q
from parlerproject_spark.caching import cached_rdd_count, release_all

SF_DIR = "/root/testdata/sf0.001"

# A cross-section of the persist-using families flagged in ADVICE
# r12: AUC histograms, NB model table, fused n-gram LM counts,
# quantile-band offsets, embedding-drift per-dim stats.
PERSIST_QUERIES = [
    "roc_auc_docs",
    "nb_quality_scores_docs",
    "stupid_backoff_docs",
    "quantile_band_docs",
    "embedding_drift_snapshots",
]


def test_release_all_drops_every_pinned_relation(spark):
    release_all(spark)
    assert cached_rdd_count(spark) == 0
    pinned_during = 0
    for name in PERSIST_QUERIES:
        Q.queries()[name](spark, SF_DIR).collect()
        pinned_during = max(pinned_during, cached_rdd_count(spark))
    assert pinned_during > 0, (
        "expected the persist-heavy sample to pin at least one "
        "relation — did the operators stop persisting?")
    released = release_all(spark)
    assert released >= 1
    assert cached_rdd_count(spark) == 0, (
        "release_all left cached relations behind")


def test_release_between_queries_keeps_results_identical(spark):
    """Releasing at the query boundary must be semantically free:
    the same query re-run after a release returns the same rows."""
    name = "roc_auc_docs"
    first = Q.queries()[name](spark, SF_DIR).collect()
    release_all(spark)
    second = Q.queries()[name](spark, SF_DIR).collect()
    assert first == second

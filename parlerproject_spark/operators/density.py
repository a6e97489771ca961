"""Density-based clustering over embedding columns (SURVEY M3).

The reference's topic core is UMAP + HDBSCAN (code/bertopicTest.py:
53-61): a DENSITY clusterer whose defining outputs are (a) clusters
of any shape grown from dense neighborhoods and (b) an explicit
noise label -1 for points in no dense region. `topics.kmeans_topics`
covers the centroid-partition analogue; this module supplies the
density analogue so the M3 surface has both halves: classic DBSCAN
re-expressed as relational algebra.

Decomposition (every step ids-only after pair generation):

1. ε-neighbor pairs — `dedup.embedding_near_dups`: cosine
   sim ≥ sim_threshold (⇔ cosine distance ≤ 1 - sim_threshold).
   mode='exact' is the all-pairs oracle path; mode='lsh' buckets by
   random hyperplanes first so cost follows neighborhood density,
   not n² — the 100 TB path.
2. core points — degree count over the symmetrized edge list:
   |N_ε(p)| ≥ min_pts (the point itself counts, as in the original
   DBSCAN paper's definition).
3. clusters — connected components over core–core edges
   (`dedup.duplicate_clusters`: min-label propagation + pointer
   jumping, O(log diameter) iterations). Cluster id = min member id
   — deterministic, engine-independent.
4. border points — non-core points with ≥1 core ε-neighbor join the
   MINIMUM such core's cluster (classic DBSCAN leaves the choice
   order-dependent; taking the min makes it deterministic).
5. noise — everything else gets cluster -1.

What is NOT reproduced: HDBSCAN's hierarchy/stability selection
(variable-density clusters). DBSCAN with a fixed ε is the honest
distributed analogue — single-linkage over an ε-threshold graph —
and is itself a standard corpus-curation clusterer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parlerproject_spark.operators.dedup import (duplicate_clusters,
                                                 embedding_near_dups)


def dbscan(vectors: DataFrame, *, sim_threshold: float, min_pts: int,
           id_col: str = "vec_id", vec_col: str = "embedding",
           mode: str = "exact", dim: int | None = None,
           num_planes: int = 6, num_tables: int = 8,
           max_iter: int = 8) -> DataFrame:
    """DBSCAN over a vector column; cosine distance ε = 1 - sim_threshold.

    Returns one row per input vector: (id_col, cluster, is_core)
    with cluster = -1 for noise. min_pts must be ≥ 2 (min_pts=1
    would make every isolated point its own cluster, which the
    edge-list formulation cannot see — and is never what a dedup or
    topic pipeline wants).

    Scale shape: pair generation is the only stage that touches
    vectors (exact = bounded inputs only; lsh = bucketed). The edge
    list is localCheckpoint()ed once — three consumers (degree
    count, core-core join, border join) would otherwise each re-run
    the pair cascade, the same re-computation trap the r4 verdict
    flagged on the posting-list self-joins. Everything downstream
    shuffles (id, id) pairs only.
    """
    if min_pts < 2:
        raise ValueError(f"min_pts must be >= 2, got {min_pts}")
    pairs = embedding_near_dups(vectors, threshold=sim_threshold,
                                id_col=id_col, vec_col=vec_col, mode=mode,
                                num_planes=num_planes, num_tables=num_tables,
                                dim=dim)
    edges = (pairs.select(F.col("id_a").alias("s"), F.col("id_b").alias("d"))
             .union(pairs.select(F.col("id_b").alias("s"),
                                 F.col("id_a").alias("d")))
             .localCheckpoint(eager=True))
    deg = edges.groupBy("s").agg(F.count(F.lit(1)).alias("nn"))
    core = (deg.filter(F.col("nn") + 1 >= min_pts)
            .select(F.col("s").alias("v")))
    core_edges = (edges
                  .join(core.select(F.col("v").alias("s")), "s", "left_semi")
                  .join(core.select(F.col("v").alias("d")), "d", "left_semi"))
    cc = duplicate_clusters(core_edges, id_a="s", id_b="d",
                            max_iter=max_iter)
    # duplicate_clusters only sees vertices that appear in an edge;
    # a core whose ε-neighbors are all non-core is a legitimate
    # singleton cluster (its own id), so pad with a left join.
    core_cl = (core.join(cc.withColumnRenamed("doc_id", "v"), "v", "left")
               .select("v", F.coalesce("cluster_id", F.col("v"))
                       .alias("cluster")))
    border = (edges
              .join(core, edges["s"] == core["v"], "left_anti")
              .join(core_cl.select(F.col("v").alias("d"),
                                   F.col("cluster").alias("core_cluster")),
                    "d")
              .groupBy("s")
              .agg(F.min("core_cluster").alias("cluster")))
    labelled = (core_cl.select("v", "cluster",
                               F.lit(True).alias("is_core"))
                .unionByName(border.select(F.col("s").alias("v"), "cluster",
                                           F.lit(False).alias("is_core"))))
    return (vectors.select(F.col(id_col))
            .join(labelled, F.col(id_col) == F.col("v"), "left")
            .select(id_col,
                    F.coalesce("cluster", F.lit(-1)).cast("long")
                    .alias("cluster"),
                    F.coalesce("is_core", F.lit(False)).alias("is_core")))

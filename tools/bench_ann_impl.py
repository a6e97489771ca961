"""Adjudicate impl="arrow" vs impl="expr" for the ANN signature /
assignment paths (round-3 verdict item 3).

Times knn_lsh, the IVF assignment, and the near-dup LSH signature
step under both implementations at the real sf0.1 size and at
synthetic 10× / 100× replications, so the default can be set by a
measured crossover instead of a guess.

Usage: python tools/bench_ann_impl.py [sf_dir]
Prints one JSON line: {"rows": {n: {"op": {"arrow": s, "expr": s}}}}
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from parlerproject_spark.catalog import load_table  # noqa: E402
from parlerproject_spark.operators import similarity  # noqa: E402
from parlerproject_spark.operators.topics import _assign, lloyd_centroids  # noqa: E402
from parlerproject_spark.session import get_spark  # noqa: E402


def replicate(vectors, times: int):
    """times× copies with distinct vec_ids, materialized so the
    timed run measures compute, not the replication plan."""
    if times == 1:
        out = vectors
    else:
        n = F.lit(2_000_000)
        out = (vectors.crossJoin(
            F.broadcast(
                vectors.sparkSession.range(times).select(
                    F.col("id").alias("__rep"))))
            .select((F.col("vec_id") + F.col("__rep") * n).alias("vec_id"),
                    "embedding"))
    return out.localCheckpoint()


def timed(fn, runs: int = 3) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bench-ann-impl")
    base = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    qvec = spark.createDataFrame(
        [([0.1] * 64,)], "q array<float>")

    results: dict[str, dict] = {}
    for times in (1, 10, 100):
        vecs = replicate(base, times)
        n = vecs.count()
        row: dict[str, dict] = {}

        row["knn_lsh"] = {
            impl: timed(lambda impl=impl: similarity.knn_lsh(
                vecs, qvec, dim=64, k=10, impl=impl).collect())
            for impl in ("arrow", "expr")
        }

        cents = lloyd_centroids(vecs, k=16, max_iter=3,
                                id_col="vec_id", vec_col="embedding",
                                train_mod=8)
        # force FULL evaluation with a noop write: count()/count(*)
        # let Catalyst skip the projected signature/assignment
        # expressions entirely on the JVM path (while the Python
        # stage always runs), which silently un-benchmarks expr
        row["ivf_assign"] = {
            impl: timed(lambda impl=impl: _assign(
                vecs, cents, id_col="vec_id", vec_col="embedding",
                impl=impl).write.format("noop").mode("overwrite").save())
            for impl in ("arrow", "expr")
        }

        row["neardup_sig"] = {}
        for impl in ("arrow", "expr"):
            def run(impl=impl):
                if impl == "arrow":
                    sig = similarity._signatures_arrow(
                        vecs, vec_col="embedding", key_cols=["vec_id"],
                        dim=64, num_planes=6, num_tables=8)
                else:
                    planes = similarity.plane_table(
                        spark, dim=64, num_planes=6, num_tables=8)
                    sig = similarity._signatures(
                        vecs, planes, vec_col="embedding",
                        key_cols=["vec_id"])
                sig.write.format("noop").mode("overwrite").save()
            row["neardup_sig"][impl] = timed(run)

        results[str(n)] = row
        vecs.unpersist()

    print(json.dumps({"sf_dir": sf_dir, "rows": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Scalar (int8-range) quantization — codec contract and recall."""
class TestScalarQuantization:
    def test_codes_in_range_and_reconstruction_bound(self, spark, sf_dir):
        from parlerproject_spark.catalog import load_table
        from parlerproject_spark.operators.similarity import (
            encode_scalar, train_scalar_quantizer)
        emb = load_table(spark, "embeddings", sf_dir)
        params = train_scalar_quantizer(emb, dim=64)
        enc = encode_scalar(emb, params).collect()
        raw = {r["vec_id"]: r["embedding"]
               for r in emb.select("vec_id", "embedding").collect()}
        mins, maxs = params["mins"], params["maxs"]
        for r in enc:
            codes = r["codes"]
            assert all(0 <= c <= 255 for c in codes)
            for d, c in enumerate(codes):
                s = (maxs[d] - mins[d]) / 255.0
                recon = mins[d] + c * s
                # uniform codec contract: in-range error <= half a step
                assert abs(recon - raw[r["vec_id"]][d]) <= s / 2 + 1e-9

    def test_knn_recall_vs_exact(self, spark, sf_dir):
        from parlerproject_spark.catalog import load_table
        from parlerproject_spark.operators.similarity import (
            knn_bruteforce, knn_scalar, train_scalar_quantizer)
        from pyspark.sql import functions as F
        emb = load_table(spark, "embeddings", sf_dir)
        params = train_scalar_quantizer(emb, dim=64)
        qvec = [float(x) for x in emb.filter(F.col("vec_id") == 7)
                .select("embedding").collect()[0][0]]
        sq = {r["vec_id"] for r in knn_scalar(emb, qvec, params,
                                              k=10).collect()}
        # exact EUCLIDEAN top-10 (the metric SQ approximates)
        d2 = F.aggregate(
            F.zip_with("embedding",
                       F.array(*[F.lit(x) for x in qvec]),
                       lambda a, b: (a.cast("double") - b)
                       * (a.cast("double") - b)),
            F.lit(0.0), lambda acc, x: acc + x)
        exact = {r["vec_id"] for r in
                 emb.select("vec_id", d2.alias("d2"))
                 .orderBy(F.col("d2").asc(), F.col("vec_id").asc())
                 .limit(10).collect()}
        assert 7 in sq  # the query itself quantizes to distance 0
        overlap = len(sq & exact) / 10.0
        assert overlap >= 0.8, (overlap, sq, exact)

    def test_degenerate_dimension_codes_zero(self, spark):
        from parlerproject_spark.operators.similarity import (
            encode_scalar, knn_scalar, train_scalar_quantizer)
        df = spark.createDataFrame(
            [(i, [float(i), 5.0]) for i in range(4)],
            "vec_id bigint, embedding array<double>")
        params = train_scalar_quantizer(df, dim=2)
        assert params["mins"][1] == params["maxs"][1] == 5.0
        enc = {r["vec_id"]: r["codes"] for r in
               encode_scalar(df, params).collect()}
        assert all(c[1] == 0 for c in enc.values())
        top = knn_scalar(df, [0.0, 5.0], params, k=2).collect()
        assert top[0]["vec_id"] == 0 and top[0]["dist"] == 0.0

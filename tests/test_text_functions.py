"""Mojibake repair — round-trip and pair-table contract tests."""
class TestRepairMojibake:
    def test_roundtrip_and_fixed_point(self, spark):
        from parlerproject_spark.functions.text import repair_mojibake
        originals = ["Café résumé naïve", "’quote‘ — dash… 25°",
                     "plain ascii", "€uro straße École"]
        corrupted = [s.encode("utf-8").decode("cp1252") for s in originals]
        df = spark.createDataFrame(
            [(i, c) for i, c in enumerate(corrupted)], "i int, t string")
        got = [r["r"] for r in
               df.select("i", repair_mojibake("t").alias("r"))
               .orderBy("i").collect()]
        assert got == originals
        # repaired text is a fixed point of the chain
        df2 = spark.createDataFrame(
            [(i, s) for i, s in enumerate(originals)], "i int, t string")
        again = [r["r"] for r in
                 df2.select("i", repair_mojibake("t").alias("r"))
                 .orderBy("i").collect()]
        assert again == originals

    def test_pairs_longest_first_and_valid(self):
        from parlerproject_spark.functions.text import mojibake_pairs
        ps = mojibake_pairs()
        assert len(ps) >= 20
        lens = [len(m) for m, _ in ps]
        assert lens == sorted(lens, reverse=True)
        for moji, ch in ps:
            assert ch.encode("utf-8").decode("cp1252") == moji

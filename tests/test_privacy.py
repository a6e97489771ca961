"""Luhn checksum card detection — truth table and gate tests."""
class TestLuhnCardFlags:
    def test_luhn_check_truth_table(self, spark):
        from parlerproject_spark.operators.privacy import luhn_check
        rows = [("4111111111111111", True),   # visa test number
                ("4111111111111112", False),  # checksum off by one
                ("79927398713", True),        # canonical Luhn example
                ("79927398710", False),
                ("", False),                  # empty
                ("12a4", False)]              # non-digit
        df = spark.createDataFrame([(n,) for n, _ in rows], "n string")
        got = {r["n"]: r["v"] for r in
               df.select("n", luhn_check("n").alias("v")).collect()}
        for n, want in rows:
            assert got[n] == want, n

    def test_card_flags_checksum_gates_candidates(self, spark):
        from parlerproject_spark.operators.privacy import card_flags
        df = spark.createDataFrame([
            (1, "pay 4111111111111111"),
            (2, "fake 4111111111111112"),
            (3, "fmt 4111-1111-1111-1111 and 5500 0000 0000 0004"),
            (4, "order 9999 no candidates"),
            (5, "amex 378282246310005"),
        ], "doc_id bigint, text string")
        out = {r["doc_id"]: r for r in card_flags(df).collect()}
        assert out[1]["n_valid"] == 1 and out[1]["masked"] == "****1111"
        # candidate found but checksum rejects -> NOT flagged as PII
        assert out[2]["n_candidates"] == 1 and out[2]["n_valid"] == 0
        assert out[2]["masked"] is None
        assert out[3]["n_valid"] == 2 and out[3]["masked"] == "****1111"
        assert out[4]["n_candidates"] == 0
        assert out[5]["n_valid"] == 1 and out[5]["masked"] == "****0005"

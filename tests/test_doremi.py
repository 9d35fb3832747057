"""DoReMi-style domain reweighting (operators/doremi.py):
differential-tested against the sequential twin to float precision,
plus the method's qualitative invariants (hard domains gain weight,
weights stay a smoothed distribution)."""

import pytest

from xdlake_spark.operators.doremi import (doremi_domain_weights,
                                           reference_doremi)

SF = "/root/testdata/sf0.001"


def _df(spark, docs):
    return spark.createDataFrame(docs, "lang string, text string")


class TestDoremi:
    def test_matches_sequential_twin(self, spark):
        docs = [
            ("en", "the cat sat on the mat and the dog sat too"),
            ("en", "the dog ran after the cat over the mat"),
            ("de", "der hund lief und der hund sprang hoch"),
            ("de", "die katze schlief auf der matte heute"),
            ("fr", "le chat dort sur le tapis chaque jour"),
        ]
        got = {r["domain"]: r["weight"]
               for r in doremi_domain_weights(
                   _df(spark, docs), rounds=6).collect()}
        want = reference_doremi(docs, rounds=6)
        assert set(got) == set(want)
        for d in want:
            assert got[d] == pytest.approx(want[d], rel=1e-9), d

    def test_matches_twin_on_real_documents(self, spark):
        d = (spark.read.parquet(f"{SF}/documents.parquet").limit(150)
             .select("lang", "text"))
        got = {r["domain"]: r["weight"]
               for r in doremi_domain_weights(d, rounds=4).collect()}
        docs = [(r["lang"], r["text"] or "") for r in d.collect()]
        want = reference_doremi(docs, rounds=4)
        for dom in want:
            assert got[dom] == pytest.approx(want[dom], rel=1e-9), dom

    def test_weights_form_smoothed_distribution(self, spark):
        docs = [("a", "x y z w v u t s r q"),
                ("b", "x y x y x y x y x y")]
        rows = doremi_domain_weights(_df(spark, docs), rounds=5,
                                     smoothing=0.01).collect()
        ws = [r["weight"] for r in rows]
        assert sum(ws) == pytest.approx(1.0, abs=1e-9)
        assert all(w >= 0.01 / len(ws) for w in ws)  # smoothing floor

    def test_reducible_loss_domain_gains_weight(self, spark):
        """DoReMi chases EXCESS (reducible) loss, not absolute loss: a
        high-entropy domain's loss is mostly irreducible (its own
        reference LM scores it no better), while a perfectly-learnable
        domain DILUTED by the mixture has a large proxy-minus-
        reference gap — DRO upweights the latter."""
        noisy = [("noisy", " ".join(f"w{i} w{i+1}" for i in range(30)))]
        learnable = [("learnable", "aa bb " * 40)] * 4
        rows = {r["domain"]: r for r in doremi_domain_weights(
            _df(spark, noisy + learnable), rounds=8).collect()}
        assert rows["learnable"]["excess_loss"] > \
            rows["noisy"]["excess_loss"]
        assert rows["learnable"]["weight"] > rows["noisy"]["weight"]

    def test_single_domain_stays_uniform(self, spark):
        docs = [("only", "some text goes here and there")]
        rows = doremi_domain_weights(_df(spark, docs),
                                     rounds=3).collect()
        assert len(rows) == 1
        assert rows[0]["weight"] == pytest.approx(1.0)

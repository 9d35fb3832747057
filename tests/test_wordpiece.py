"""WordPiece trainer + greedy tokenizer (operators/wordpiece.py):
differential-tested against the pure-Python reference."""

import pytest
from pyspark.sql import functions as F

from xdlake_spark.operators.wordpiece import (apply_wordpiece,
                                              reference_wordpiece,
                                              train_wordpiece,
                                              wordpiece_vocab)

SF = "/root/testdata/sf0.001"


def _corpus_df(spark, words: dict):
    rows = []
    for w, f in words.items():
        rows.extend([(w,)] * f)
    return spark.createDataFrame(rows, "text string")


class TestTrainer:
    def test_matches_reference_on_classic_corpus(self, spark):
        words = {"low": 5, "lower": 2, "newest": 6, "widest": 3,
                 "lowest": 4, "new": 7}
        got = [(r.rank, r.left, r.right, r.merged, r.score)
               for r in train_wordpiece(_corpus_df(spark, words),
                                        n_merges=8).collect()]
        want = reference_wordpiece(words, 8)
        assert got == want

    def test_matches_reference_on_real_documents(self, spark):
        d = (spark.read.parquet(f"{SF}/documents.parquet").limit(80)
             .select("text"))
        got = [(r.rank, r.left, r.right, r.merged)
               for r in train_wordpiece(d, n_merges=12).collect()]
        import collections
        freqs = collections.Counter()
        for row in d.collect():
            for w in (row.text or "").lower().split():
                freqs[w] += 1
        want = [(m[0], m[1], m[2], m[3])
                for m in reference_wordpiece(dict(freqs), 12)]
        assert got == want

    def test_likelihood_beats_raw_frequency(self, spark):
        # 'qz' always co-occur (cohesive); 'ee' is frequent but its
        # parts are everywhere — WordPiece must pick q+##z first even
        # though e-pairs have higher raw counts
        words = {"qz": 4, "eqze": 4, "eee": 30, "ee": 30}
        top = train_wordpiece(_corpus_df(spark, words), n_merges=1,
                              min_pair_count=2).collect()[0]
        # ('##q','##z') and ('q','##z') tie at 0.125; lexicographic
        # tie-break picks the former — either way a q/z merge beats
        # every high-frequency e-pair
        assert "z" in top.merged and "e" not in top.merged

    def test_batched_deterministic_and_first_merge_exact(self, spark):
        """r11: batch_k>1 mirrors train_bpe's disjoint batching —
        deterministic across runs, first merge identical to the
        sequential algorithm's, and every batch round records the
        scores the sequential algorithm would have seen for disjoint
        pairs."""
        d = (spark.read.parquet(f"{SF}/documents.parquet").limit(80)
             .select("text"))
        a = [tuple(r) for r in
             train_wordpiece(d, n_merges=12, batch_k=5).collect()]
        b = [tuple(r) for r in
             train_wordpiece(d, n_merges=12, batch_k=5).collect()]
        assert a == b and len(a) == 12
        import collections
        freqs = collections.Counter()
        for row in d.collect():
            for w in (row.text or "").lower().split():
                freqs[w] += 1
        want = reference_wordpiece(dict(freqs), 1)
        assert (a[0][1], a[0][2]) == (want[0][1], want[0][2])

    def test_batched_equals_sequential_when_disjoint(self, spark):
        """On a corpus whose top pairs are symbol-disjoint, the batch
        path must reproduce the sequential merge list exactly —
        including the recorded scores."""
        words = {"qz": 8, "xv": 8, "mn": 7, "st": 6}
        got = [(r.rank, r.left, r.right, r.merged, r.score)
               for r in train_wordpiece(_corpus_df(spark, words),
                                        n_merges=4,
                                        batch_k=4).collect()]
        want = reference_wordpiece(words, 4)
        assert got == want

    def test_continuation_prefix_semantics(self, spark):
        words = {"abc": 10}
        ms = train_wordpiece(_corpus_df(spark, words), n_merges=2,
                             min_pair_count=2).collect()
        merged = {m.merged for m in ms}
        # ##b + ##c -> ##bc then a + ##bc -> abc (or a+##b first)
        assert merged <= {"##bc", "abc", "ab", "##c"}
        assert any(not m.startswith("##") for m in merged) or ms


class TestTokenizer:
    def test_greedy_longest_match(self, spark):
        vocab = ["un", "##aff", "##able", "##ffa", "a", "b", "##le"]
        df = spark.createDataFrame([(1, "unaffable")],
                                   "doc_id long, text string")
        rows = apply_wordpiece(df, vocab).collect()[0]
        assert rows.tokens == ["un", "##aff", "##able"]
        assert rows.n_tokens == 3

    def test_unk_for_unmatchable(self, spark):
        df = spark.createDataFrame([(1, "xyz ab")],
                                   "doc_id long, text string")
        rows = apply_wordpiece(df, ["a", "##b"]).collect()[0]
        assert rows.tokens == ["[UNK]", "a", "##b"]

    def test_roundtrip_after_training(self, spark):
        words = {"hugging": 6, "hugs": 4, "hug": 8, "pugs": 3}
        merges = train_wordpiece(_corpus_df(spark, words), n_merges=6,
                                 min_pair_count=2)
        alphabet = set("hugspin") | {"##" + c for c in "ugspin"}
        vocab = wordpiece_vocab(merges, alphabet)
        df = spark.createDataFrame([(1, "hug hugs pug")],
                                   "doc_id long, text string")
        toks = apply_wordpiece(df, vocab).collect()[0].tokens
        assert "[UNK]" not in toks
        # reassembling the pieces gives the input back
        text = "".join(t[2:] if t.startswith("##") else " " + t
                       for t in toks).strip()
        assert text == "hug hugs pug"

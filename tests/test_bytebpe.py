"""Byte-level BPE (operators/bytebpe.py, the GPT-2 tokenizer family):
differential-tested against the sequential reference; lossless
round-trip through the reversible byte table (no [UNK] ever); JVM
pre-tokenization parity with the regex-module twin."""

import collections

import pytest
from pyspark.sql import functions as F

from xdlake_spark.operators.bytebpe import (GPT2_SPLIT, apply_byte_bpe,
                                            bytes_to_unicode,
                                            gpt2_pretokenize,
                                            reference_byte_bpe,
                                            train_byte_bpe,
                                            units_to_text,
                                            _pretoken_freq)

SF = "/root/testdata/sf0.001"


def _pretoken_freqs(documents, n):
    freqs = collections.Counter()
    for r in documents.limit(n).select("text").collect():
        for w in gpt2_pretokenize(r[0] or ""):
            if w:
                freqs[w] += 1
    return dict(freqs)


class TestByteTable:
    def test_gpt2_byte_table_shape(self):
        b2u = bytes_to_unicode()
        assert len(b2u) == 256 and len(set(b2u.values())) == 256
        assert b2u[ord("!")] == "!" and b2u[ord("~")] == "~"
        assert b2u[0x20] == "Ġ"      # space -> the famous G-dot
        assert b2u[0x0A] == "Ċ"      # newline
        assert max(ord(u) for u in b2u.values()) < 0x200

    def test_units_round_trip_any_text(self):
        from xdlake_spark.operators.bytebpe import _to_units
        for t in ("Hello, world!", "中文文档 🎉", "tab\tnl\n spaces  ",
                  "naïve café ñ", ""):
            assert units_to_text("".join(_to_units(t))) == t


class TestPretokenize:
    def test_jvm_matches_regex_module(self, spark, documents):
        d = documents.limit(60).select("text")
        jvm = {r["word"]: r["freq"]
               for r in _pretoken_freq(d, "text").collect()}
        ref = collections.Counter()
        for row in d.collect():
            for w in gpt2_pretokenize(row[0] or ""):
                if w:
                    ref[w] += 1
        assert jvm == dict(ref)

    def test_gpt2_split_semantics(self):
        toks = gpt2_pretokenize("It's 2026, don't stop!  ")
        assert toks == ["It", "'s", " 2026", ",", " don", "'t",
                        " stop", "!", "  "]


class TestTrainer:
    def test_exact_match_sequential_reference(self, spark, documents):
        d = documents.limit(100).select("text")
        got = [(r["rank"], r["left"], r["right"], r["merged"],
                r["pair_count"])
               for r in train_byte_bpe(d, n_merges=15,
                                       batch_k=1).collect()]
        want = reference_byte_bpe(_pretoken_freqs(documents, 100), 15)
        assert got == want and len(got) == 15

    def test_batched_deterministic_first_merge_exact(self, spark,
                                                     documents):
        d = documents.limit(100).select("text")
        a = [tuple(r) for r in
             train_byte_bpe(d, n_merges=12, batch_k=6).collect()]
        b = [tuple(r) for r in
             train_byte_bpe(d, n_merges=12, batch_k=6).collect()]
        assert a == b and len(a) == 12
        want = reference_byte_bpe(_pretoken_freqs(documents, 100), 1)
        assert (a[0][1], a[0][2]) == (want[0][1], want[0][2])

    def test_space_travels_with_word(self, spark):
        rows = [("the cat the cat the cat the cat",)] * 4
        df = spark.createDataFrame(rows, "text string")
        merges = train_byte_bpe(df, n_merges=8).collect()
        # ' the' and ' cat' pre-tokens start with the space unit
        assert any(m["merged"].startswith("Ġ") for m in merges)


class TestTokenizer:
    def test_lossless_reconstruction(self, spark, documents):
        d = documents.limit(40).select("doc_id", "text")
        merges = train_byte_bpe(d, n_merges=20, batch_k=5)
        toks = apply_byte_bpe(d, merges).collect()
        texts = {r["doc_id"]: r["text"] for r in d.collect()}
        assert len(toks) == 40
        for r in toks:
            assert units_to_text("".join(r["tokens"])) == \
                texts[r["id"]]
            assert r["n_tokens"] == len(r["tokens"])

    def test_unicode_and_emoji_lossless(self, spark):
        rows = [(1, "中文 🎉 café — naïve ñ\ttab"),
                (2, "plain ascii text here")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        merges = train_byte_bpe(df, n_merges=5, min_pair_count=1)
        for r in apply_byte_bpe(df, merges).collect():
            orig = dict(rows)[r["id"]]
            assert units_to_text("".join(r["tokens"])) == orig

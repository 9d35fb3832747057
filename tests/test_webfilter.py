"""Web-corpus filter rule sets (operators/webfilter.py).

Targeted synthetic documents exercising each Gopher/C4 rule in
isolation, the HTML strip chain's exact-recovery invariant, and the
URL parser — plus plan checks that the whole family stays JVM-side.
"""

import pytest
from pyspark.sql import functions as F

from xdlake_spark.operators import webfilter


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


#: 72 words; required-stopword hits: 'the' and 'and'.
GOOD = ("the quick brown fox jumps over and back " * 9).strip()


class TestGopher:
    def test_passes_clean_doc(self, spark):
        df = webfilter.gopher_rules(_docs(spark, [(1, GOOD)]))
        row = df.collect()[0]
        assert row.n_words == 72
        assert row.passes_gopher
        assert row.stopword_hits == 2
        assert row.alpha_word_frac == 1.0

    def test_each_rule_fails_independently(self, spark):
        rows = [
            # too few words
            (1, "the little doc that could stop here"),
            # mean word length too low (single letters)
            (2, " ".join(["a b c d e f g h the of"] * 8)),
            # symbol ratio: a '#' per word
            (3, " ".join(["#word the of"] * 30)),
            # bullet lines dominate
            (4, "\n".join(["- the bullet point here"] * 20)),
            # ellipsis endings dominate
            (5, "\n".join(["the line trails off..."] * 20)),
            # non-alphabetic words dominate
            (6, " ".join(["1234 5678 the 9012"] * 20)),
            # no required stopwords at all
            (7, " ".join(["quick brown foxes jump high"] * 15)),
        ]
        out = {r.doc_id: r for r in
               webfilter.gopher_rules(_docs(spark, rows)).collect()}
        assert not out[1].passes_gopher and out[1].n_words == 7
        assert not out[2].passes_gopher and out[2].mean_word_len < 3.0
        assert not out[3].passes_gopher and out[3].symbol_ratio > 0.1
        assert not out[4].passes_gopher and out[4].bullet_line_frac == 1.0
        assert not out[5].passes_gopher and out[5].ellipsis_line_frac == 1.0
        assert not out[6].passes_gopher and out[6].alpha_word_frac < 0.8
        assert not out[7].passes_gopher and out[7].stopword_hits == 0

    def test_stopword_hits_counts_distinct_required_words(self, spark):
        df = webfilter.gopher_rules(
            _docs(spark, [(1, "the and of the and to be that have with")]))
        assert df.collect()[0].stopword_hits == 8

    def test_empty_text_is_safe(self, spark):
        row = webfilter.gopher_rules(_docs(spark, [(1, "")])).collect()[0]
        assert row.n_words == 0 and not row.passes_gopher

    def test_threshold_overrides(self, spark):
        doc = "the quick brown fox jumps over the lazy dog again and again"
        strict = webfilter.gopher_rules(_docs(spark, [(1, doc)]))
        loose = webfilter.gopher_rules(_docs(spark, [(1, doc)]),
                                       min_words=5, min_stopword_hits=1)
        assert not strict.collect()[0].passes_gopher  # 12 words < 50
        assert loose.collect()[0].passes_gopher


class TestC4:
    def test_line_rules(self, spark):
        text = "\n".join([
            "This line has exactly six words.",      # kept
            "Too short.",                             # < 5 words
            "no terminal punctuation on this line",   # no [.!?"]
            "Please enable JavaScript to view comments.",  # javascript
            "Another perfectly fine sentence lives right here!",  # kept
            'A quoted ending also counts as terminal."',          # kept
        ])
        row = webfilter.c4_line_filter(
            _docs(spark, [(1, text)])).collect()[0]
        assert row.n_lines == 6
        assert row.n_kept_lines == 3
        assert row.keep_doc
        assert row.clean_text.count("\n") == 2

    def test_doc_level_drops(self, spark):
        keepable = "\n".join(["The sentence here is long enough."] * 4)
        rows = [
            (1, keepable + "\nSome lorem ipsum filler text appears."),
            (2, keepable + "\nvar f = function() { return; }"),
            (3, "\n".join(["The sentence here is long enough."] * 2)),
            (4, keepable),
        ]
        out = {r.doc_id: r for r in
               webfilter.c4_line_filter(_docs(spark, rows)).collect()}
        assert not out[1].keep_doc and out[1].clean_text == ""
        assert not out[2].keep_doc  # brace
        assert not out[3].keep_doc  # only 2 kept lines
        assert out[4].keep_doc and out[4].n_kept_lines == 4


class TestHtml:
    def test_strip_recovers_body_and_drops_boilerplate(self, spark):
        html = ("<html><head><title>My Page</title>"
                "<style>p { color: red; }</style>"
                "<script>if (1 < 2) { alert('x'); }</script></head>"
                "<body><nav><a href=\"/\">Home</a></nav>"
                "<!-- hidden comment -->"
                "<p>Tom &amp; Jerry say 1 &lt; 2 &amp;&nbsp;3 &gt; 2.</p>"
                "<p>Second&#39;s &quot;quoted&quot; paragraph.</p>"
                "<footer>(c) corp</footer></body></html>")
        row = webfilter.html_main_text(
            _docs(spark, [(1, html)]).withColumnRenamed("text", "html")
        ).collect()[0]
        assert row.main_text == ('My Page Tom & Jerry say 1 < 2 & 3 > 2. '
                                 'Second\'s "quoted" paragraph.')

    def test_escape_decode_roundtrip_on_hostile_text(self, spark):
        hostile = "a &lt; b &amp; <tag> literal &amp;amp; 5>3"
        df = _docs(spark, [(1, hostile)]).select(
            "doc_id",
            webfilter.html_escape(F.col("text")).alias("html"))
        row = webfilter.html_main_text(df).collect()[0]
        # escape makes markup inert; decode restores every literal char
        # except the <tag>, which the strip (correctly) cannot see as
        # text once unescaped -- so roundtrip compares against escape's
        # own inverse, not tag survival.
        assert row.main_text == "a &lt; b &amp; <tag> literal &amp;amp; 5>3"

    def test_multiline_script_block_dropped(self, spark):
        html = "<p>Keep.</p><script>\nvar a;\nvar b;\n</script><p>Also.</p>"
        row = webfilter.html_main_text(
            spark.createDataFrame([(1, html)], ["doc_id", "html"])
        ).collect()[0]
        assert row.main_text == "Keep. Also."


class TestUrl:
    def test_host_stats(self, spark):
        rows = [(1, "https://a.example.com/en/doc-1", "en"),
                (2, "https://a.example.com/de/doc-2", "de"),
                (3, "http://b.example.org/en/x/deep/doc-3", "en")]
        df = spark.createDataFrame(rows, ["doc_id", "url", "lang"])
        out = {r.host: r for r in webfilter.url_host_stats(df).collect()}
        assert out["a.example.com"].n_docs == 2
        assert out["a.example.com"].n_langs == 2
        assert out["a.example.com"].avg_path_depth == 2.0
        assert out["b.example.org"].avg_path_depth == 4.0


class TestPlans:
    def test_no_python_in_row_path(self, spark):
        df = spark.createDataFrame([(1, "the text here.")],
                                   ["doc_id", "text"])
        for out in (webfilter.gopher_rules(df),
                    webfilter.c4_line_filter(df),
                    webfilter.html_main_text(df.withColumnRenamed(
                        "text", "html"))):
            plan = out._jdf.queryExecution().executedPlan().toString()
            assert "BatchEvalPython" not in plan
            assert "ArrowEvalPython" not in plan

    def test_url_stats_single_shuffle(self, spark):
        df = spark.createDataFrame(
            [(1, "https://h/x/doc", "en")], ["doc_id", "url", "lang"])
        plan = (webfilter.url_host_stats(df)
                ._jdf.queryExecution().executedPlan().toString())
        assert "BatchEvalPython" not in plan
        # partial agg before the exchange (map-side combine)
        assert plan.count("HashAggregate") >= 2


class TestFixMojibake:
    """fix_mojibake (r10, operators/text.py): UTF-8-as-cp1252 repair —
    exact recovery through one and two corruption rounds, conservative
    on clean text, JVM prefilter keeps clean rows out of Python."""

    ORIG = 'café déjà vu – “quoted” naïve'

    def _corrupt(self, s):
        return s.encode("utf-8").decode("latin-1")

    def test_recovers_exactly(self, spark):
        from xdlake_spark.operators import text as textops
        once = self._corrupt(self.ORIG)
        twice = self._corrupt(once)
        rows = [(1, self.ORIG), (2, once), (3, twice),
                (4, "plain ascii text"), (5, None), (6, "")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: (r["text"], r["mojibake_rounds"])
               for r in textops.fix_mojibake(df).collect()}
        assert out[1] == (self.ORIG, 0)      # genuine accents kept
        assert out[2] == (self.ORIG, 1)
        assert out[3] == (self.ORIG, 2)
        assert out[4] == ("plain ascii text", 0)
        assert out[5][0] is None
        assert out[6] == ("", 0)

    def test_cp1252_punctuation_variants(self, spark):
        from xdlake_spark.operators import text as textops
        for orig in ("em—dash", "ellipsis…", "’apostrophe’",
                     "€uro", "†dagger"):
            once = self._corrupt(orig)
            df = spark.createDataFrame([(1, once)],
                                       "doc_id long, text string")
            r = textops.fix_mojibake(df).collect()[0]
            assert (r["text"], r["mojibake_rounds"]) == (orig, 1), orig

    def test_extra_columns_preserved(self, spark):
        from xdlake_spark.operators import text as textops
        df = spark.createDataFrame(
            [(1, self._corrupt("où?"), "en")],
            "doc_id long, text string, lang string")
        r = textops.fix_mojibake(df).collect()[0]
        assert r["lang"] == "en" and r["text"] == "où?"

    def _corrupt_cp1252(self, s):
        """Sloppy-cp1252 corruption — what a real cp1252 decoder emits:
        cp1252 images where mapped, latin-1 C1 controls for the five
        unmapped bytes (0x81/8D/8F/90/9D)."""
        out = []
        for b in s.encode("utf-8"):
            try:
                out.append(bytes([b]).decode("cp1252"))
            except UnicodeDecodeError:
                out.append(chr(b))
        return "".join(out)

    def test_cjk_emoji_latin_ext_repair(self, spark):
        """r11 (ADVICE): the prefilter must cover ALL cp1252 images of
        UTF-8 lead bytes 0xC2-0xF4, not a hand-picked dozen — CJK
        ('ä¸­'), emoji ('ðŸ...'), and Latin-Extended mojibake repair."""
        from xdlake_spark.operators import text as textops
        for orig in ("中文文档", "🎉 party", "Ōkami ānd Żółć",
                     "русский текст", "Ça va — très bien"):
            for corrupt in (self._corrupt, self._corrupt_cp1252):
                once = corrupt(orig)
                df = spark.createDataFrame([(1, once)],
                                           "doc_id long, text string")
                r = textops.fix_mojibake(df).collect()[0]
                assert (r["text"], r["mojibake_rounds"]) == (orig, 1), \
                    (orig, corrupt.__name__)

    def test_sloppy_cp1252_mixed_gap_bytes(self, spark):
        """r11 (ADVICE): texts mixing a printable cp1252 image with one
        of the five unmapped control bytes (e.g. 'が' -> 'ã' + U+0081 +
        'Œ') must repair via the per-character sloppy-cp1252 encode —
        the old whole-string latin-1 fallback failed both encodes."""
        from xdlake_spark.operators import text as textops
        orig = "これが試験です €100"  # hiragana + euro forces the mix
        once = self._corrupt_cp1252(orig)
        assert chr(0x81) in once and "€" not in once  # premise holds
        df = spark.createDataFrame([(1, once)],
                                   "doc_id long, text string")
        r = textops.fix_mojibake(df).collect()[0]
        assert (r["text"], r["mojibake_rounds"]) == (orig, 1)

    def test_marker_class_is_complete(self):
        """The rlike prefilter class contains every cp1252 image of
        UTF-8 lead bytes 0xC2-0xF4 (51 characters)."""
        from xdlake_spark.operators.text import _MOJIBAKE_MARKER
        chars = set(_MOJIBAKE_MARKER[1:-1])
        want = {bytes([b]).decode("cp1252") for b in range(0xC2, 0xF5)}
        assert want <= chars and len(want) == 51


class TestBlocklistFilter:
    """Banned-wordlist screening (webfilter.blocklist_filter, r12):
    literal-array and broadcast-join strategies must agree exactly,
    counts must match a pure-Python tokenizer, and the literal path
    must stay JVM-only with no shuffle."""

    DOCS = [
        (1, "Clean text with nothing banned at all."),
        (2, "spam Spam SPAM and a crash."),
        (3, "hyphen-spam counts; spammy does not, nor does antispam."),
        (4, ""),
        (5, "crash crash crash"),
    ]
    TERMS = ["spam", "crash", "legacy"]

    def _df(self, spark):
        return spark.createDataFrame(self.DOCS, ["doc_id", "text"])

    def test_counts_match_python(self, spark):
        import re as _re
        out = {r["doc_id"]: (r["banned_hits"], r["banned_terms"],
                             r["flagged"])
               for r in webfilter.blocklist_filter(
                   self._df(spark), self.TERMS).collect()}
        for doc_id, text in self.DOCS:
            toks = [w for w in _re.split("[^a-z]+", text.lower()) if w]
            hits = sum(1 for w in toks if w in self.TERMS)
            terms = len({w for w in toks if w in self.TERMS})
            assert out[doc_id] == (hits, terms, hits > 0), doc_id

    def test_strategies_agree(self, spark, documents):
        terms = ["slow", "vector", "batch", "spam", "crash", "legacy"]
        cols = ["doc_id", "banned_hits", "banned_terms", "flagged"]
        lit = {tuple(r) for r in webfilter.blocklist_filter(
            documents, terms, strategy="literal").select(*cols).collect()}
        join = {tuple(r) for r in webfilter.blocklist_filter(
            documents, terms, strategy="join").select(*cols).collect()}
        assert lit == join
        assert any(r[3] for r in lit)          # something flagged
        assert any(not r[3] for r in lit)      # something clean

    def test_auto_picks_join_past_threshold(self, spark):
        big = [f"w{i}".replace("0", "o").replace("1", "l")
               .replace("2", "t").replace("3", "e").replace("4", "f")
               .replace("5", "s").replace("6", "x").replace("7", "v")
               .replace("8", "g").replace("9", "n") for i in range(300)]
        out = webfilter.blocklist_filter(self._df(spark), big,
                                         max_literal_terms=256)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_literal_path_jvm_no_shuffle(self, spark):
        out = webfilter.blocklist_filter(self._df(spark), self.TERMS)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "Exchange" not in plan

    def test_validation(self, spark):
        import pytest as _pytest
        with _pytest.raises(ValueError):
            webfilter.blocklist_filter(self._df(spark), [])
        with _pytest.raises(ValueError):
            webfilter.blocklist_filter(self._df(spark), ["two words"])
        with _pytest.raises(ValueError):
            webfilter.blocklist_filter(self._df(spark), ["ok"],
                                       strategy="bogus")


class TestCreditCardLuhn:
    """Luhn-validated card detection (text.credit_card_stats, r12):
    validity verdicts must equal a pure-Python Luhn reference on
    every candidate, and the operator must stay JVM-only."""

    @staticmethod
    def _luhn(s):
        t = 0
        for i, ch in enumerate(reversed(s)):
            d = int(ch)
            t += d if i % 2 == 0 else (d * 2 - 9 if d * 2 > 9 else d * 2)
        return t % 10 == 0

    def test_matches_python_reference(self, spark):
        import random as _random
        from xdlake_spark.operators.text import credit_card_stats
        rng = _random.Random(3)
        rows = []
        for i in range(40):
            n_digits = rng.choice([12, 13, 16, 19, 20])
            num = "".join(str(rng.randint(0, 9))
                          for _ in range(n_digits))
            rows.append((i, f"ref {num} end"))
        rows.append((100, "4111-1111-1111-1111 formatted"))
        rows.append((101, "no digits at all"))
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {r["doc_id"]: (r["n_cc_candidates"], r["n_cc_valid"])
               for r in credit_card_stats(df).collect()}
        import re as _re
        for doc_id, text in rows:
            cands = _re.findall("[0-9]{13,19}", text)
            cands += [m.replace("-", "") for m in
                      _re.findall("[0-9]{4}(?:-[0-9]{4}){3}", text)]
            want = (len(cands), sum(1 for c in cands if self._luhn(c)))
            assert got[doc_id] == want, (doc_id, text)

    def test_jvm_only(self, spark):
        from xdlake_spark.operators.text import credit_card_stats
        df = spark.createDataFrame([(1, "4111111111111111")],
                                   ["doc_id", "text"])
        plan = credit_card_stats(df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "EvalPython" not in plan
        assert "Exchange" not in plan


class TestCanonicalUrl:
    """URL canonicalization (webfilter.canonical_url, r12): the
    crawl-dedup identity — tracking params, casing, default ports,
    fragments and trailing slashes must not distinguish pages;
    meaningful differences must."""

    CASES = [
        ("HTTP://Example.COM:80/a/?utm_source=x&b=2&a=1#f",
         "http://example.com/a?a=1&b=2"),
        ("https://example.com:443/a", "https://example.com/a"),
        ("https://example.com:8443/a", "https://example.com:8443/a"),
        ("http://example.com:443/a", "http://example.com:443/a"),
        ("http://example.com", "http://example.com/"),
        ("http://example.com/?gclid=1&fbclid=2&ref=rss",
         "http://example.com/"),
        ("http://example.com/a?z=1&a=2", "http://example.com/a?a=2&z=1"),
        ("http://example.com/a///", "http://example.com/a"),
        ("http://example.com/a?refresh=1",
         "http://example.com/a?refresh=1"),   # not the 'ref' param
    ]

    def test_cases(self, spark):
        df = spark.createDataFrame(
            [(i, u) for i, (u, _) in enumerate(self.CASES)],
            ["i", "url"])
        got = {r["i"]: r["c"] for r in df.select(
            "i", webfilter.canonical_url(F.col("url")).alias("c"))
            .collect()}
        for i, (_, want) in enumerate(self.CASES):
            assert got[i] == want, (self.CASES[i][0], got[i])

    def test_dedup_keepers(self, spark):
        rows = [(0, "HTTP://A.COM:80/x?utm_source=1"),
                (1, "http://a.com/x"),
                (2, "http://a.com/y")]
        df = spark.createDataFrame(rows, ["doc_id", "url"])
        out = {r["canonical_url"]: (r["n_variants"], r["keeper"])
               for r in webfilter.url_dedup_keepers(df).collect()}
        assert out == {"http://a.com/x": (2, 0),
                       "http://a.com/y": (1, 2)}

    def test_jvm_only(self, spark):
        df = spark.createDataFrame([(1, "http://a.com/x")],
                                   ["doc_id", "url"])
        plan = df.select(webfilter.canonical_url(F.col("url")))._jdf \
            .queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan


class TestPhraseBlocklist:
    """Multi-word blocklist (webfilter.phrase_blocklist_filter, r12):
    literal and n-gram-join strategies must agree exactly (overlapping
    occurrences included), counts must match a Python reference, and
    the literal path must stay JVM-only with no shuffle."""

    DOCS = [
        (1, "Lorem-Ipsum! dolor sit amet"),
        (2, "all rights reserved. ALL RIGHTS RESERVED"),
        (3, "rights all reserved, wrong order"),
        (4, "a a a"),                      # overlapping "a a" twice
        (5, ""),
        (6, "terms of use and terms of service"),
    ]
    PHRASES = ["lorem ipsum", "all rights reserved", "a a",
               "terms of use"]

    def _df(self, spark):
        return spark.createDataFrame(self.DOCS, ["doc_id", "text"])

    @staticmethod
    def _py_counts(text, phrases):
        import re as _re
        toks = [w for w in _re.split("[^a-z]+", text.lower()) if w]
        hits = matches = 0
        for p in phrases:
            ps = p.split()
            n = sum(1 for i in range(len(toks) - len(ps) + 1)
                    if toks[i:i + len(ps)] == ps)
            hits += n
            matches += 1 if n else 0
        return hits, matches

    def test_counts_match_python(self, spark):
        out = {r["doc_id"]: (r["phrase_hits"], r["phrase_matches"])
               for r in webfilter.phrase_blocklist_filter(
                   self._df(spark), self.PHRASES).collect()}
        for doc_id, text in self.DOCS:
            assert out[doc_id] == self._py_counts(text, self.PHRASES), \
                (doc_id, text)

    def test_strategies_agree(self, spark, documents):
        phrases = ["table table", "lorem ipsum", "value fast",
                   "the line sort"]
        cols = ["doc_id", "phrase_hits", "phrase_matches", "flagged"]
        lit = {tuple(r) for r in webfilter.phrase_blocklist_filter(
            documents, phrases, strategy="literal")
            .select(*cols).collect()}
        join = {tuple(r) for r in webfilter.phrase_blocklist_filter(
            documents, phrases, strategy="join")
            .select(*cols).collect()}
        assert lit == join
        assert any(r[3] for r in lit)

    def test_literal_path_jvm_no_shuffle(self, spark):
        out = webfilter.phrase_blocklist_filter(
            self._df(spark), self.PHRASES)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan
        assert "Exchange" not in plan

    def test_validation(self, spark):
        import pytest as _pytest
        with _pytest.raises(ValueError):
            webfilter.phrase_blocklist_filter(self._df(spark), [])
        with _pytest.raises(ValueError):
            webfilter.phrase_blocklist_filter(self._df(spark),
                                              ["has-hyphen phrase"])

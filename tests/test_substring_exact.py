"""Exact duplicated-substring spans (operators/dedup.py
substring_dedup_exact, r11): differential-tested against an
INDEPENDENT sequential implementation — a suffix automaton over the
concatenated corpus with per-doc separators, whose endpos counts give
every substring's exact corpus-wide occurrence count. The two
algorithms share nothing (gram-hash grouping + string verify vs
automaton traversal), so agreement pins the semantics, not the code.
"""

import random

import pytest

from xdlake_spark.operators.dedup import substring_dedup_exact


# -- sequential reference: suffix automaton ------------------------------

class _SuffixAutomaton:
    """Standard suffix automaton (Blumer et al. construction) with
    occurrence counts: cnt[v] = number of end positions of every
    substring whose state is v."""

    def __init__(self):
        self.next: list = [{}]
        self.link = [-1]
        self.len = [0]
        self.cnt = [0]
        self.last = 0

    def extend(self, ch):
        cur = len(self.len)
        self.next.append({})
        self.len.append(self.len[self.last] + 1)
        self.link.append(-1)
        self.cnt.append(1)
        p = self.last
        while p >= 0 and ch not in self.next[p]:
            self.next[p][ch] = cur
            p = self.link[p]
        if p == -1:
            self.link[cur] = 0
        else:
            q = self.next[p][ch]
            if self.len[p] + 1 == self.len[q]:
                self.link[cur] = q
            else:
                clone = len(self.len)
                self.next.append(dict(self.next[q]))
                self.len.append(self.len[p] + 1)
                self.link.append(self.link[q])
                self.cnt.append(0)
                while p >= 0 and self.next[p].get(ch) == q:
                    self.next[p][ch] = clone
                    p = self.link[p]
                self.link[q] = clone
                self.link[cur] = clone
        self.last = cur

    def finalize(self):
        # propagate occurrence counts up the suffix-link tree
        order = sorted(range(len(self.len)), key=self.len.__getitem__,
                       reverse=True)
        for v in order:
            if self.link[v] > 0:
                self.cnt[self.link[v]] += self.cnt[v]


def reference_duplicated_spans(docs: dict, min_length: int,
                               min_count: int = 2) -> set:
    """(doc_id, span_start_1based, span_len) via suffix automaton:
    position p of a doc is covered iff the L-gram at p occurs >=
    min_count times corpus-wide; maximal covered runs become spans."""
    sa = _SuffixAutomaton()
    for i, (_, text) in enumerate(sorted(docs.items())):
        for ch in text:
            sa.extend(ch)
        sa.extend(("SEP", i))  # unique separator token per doc
    sa.finalize()

    spans = set()
    for doc_id, text in docs.items():
        covered = []
        # walk the text through the automaton keeping (state, matched
        # length); after each char, the L-suffix state (if matched
        # length >= L) carries the L-gram's occurrence count
        v, length = 0, 0
        for i, ch in enumerate(text):
            while v > 0 and ch not in sa.next[v]:
                v = sa.link[v]
                length = sa.len[v]
            if ch in sa.next[v]:
                v = sa.next[v][ch]
                length += 1
            else:
                v, length = 0, 0
            if length >= min_length:
                # shrink to the state holding exactly length L
                u = v
                while sa.len[sa.link[u]] >= min_length:
                    u = sa.link[u]
                if sa.cnt[u] >= min_count:
                    covered.append(i - min_length + 2)  # 1-based start
        # merge consecutive starts into maximal spans
        run_start = prev = None
        for p in covered:
            if prev is None or p != prev + 1:
                if run_start is not None:
                    spans.add((doc_id, run_start,
                               prev - run_start + min_length))
                run_start = p
            prev = p
        if run_start is not None:
            spans.add((doc_id, run_start,
                       prev - run_start + min_length))
    return spans


def _spark_spans(spark, docs, min_length, min_count=2):
    df = spark.createDataFrame(sorted(docs.items()),
                               "doc_id long, text string")
    out = substring_dedup_exact(df, min_length=min_length,
                                min_count=min_count)
    return {(r["doc_id"], r["span_start"], r["span_len"])
            for r in out.collect()}


def _random_text(rng, n):
    return "".join(rng.choice("abcdefghij klmnopqrst") for _ in range(n))


class TestExactSubstringSpans:
    def test_planted_repeats_match_suffix_automaton(self, spark):
        rng = random.Random(7)
        repeat = _random_text(rng, 65)
        docs = {i: _random_text(rng, 300) for i in range(12)}
        # plant the repeat across three docs at different offsets
        docs[2] = docs[2][:50] + repeat + docs[2][50:]
        docs[5] = repeat + docs[5]
        docs[9] = docs[9] + repeat
        got = _spark_spans(spark, docs, min_length=30)
        want = reference_duplicated_spans(docs, 30)
        assert got == want and len(want) >= 3

    def test_within_doc_repetition(self, spark):
        rng = random.Random(11)
        docs = {i: _random_text(rng, 200) for i in range(6)}
        chunk = _random_text(rng, 45)
        docs[3] = docs[3][:80] + chunk + docs[3][80:120] + chunk
        got = _spark_spans(spark, docs, min_length=25)
        want = reference_duplicated_spans(docs, 25)
        assert got == want
        assert any(d == 3 for d, _, _ in got)

    def test_overlapping_plants_merge_to_maximal_span(self, spark):
        rng = random.Random(13)
        core = _random_text(rng, 120)
        docs = {0: "X" + core + "Y" + _random_text(rng, 100),
                1: _random_text(rng, 100) + "Z" + core}
        got = _spark_spans(spark, docs, min_length=40)
        want = reference_duplicated_spans(docs, 40)
        assert got == want
        # the whole 120-char core is ONE maximal span in each doc
        assert {s for _, _, s in got} == {120}
        assert len(got) == 2

    def test_unique_corpus_yields_nothing(self, spark):
        rng = random.Random(17)
        docs = {i: _random_text(rng, 250) for i in range(8)}
        assert _spark_spans(spark, docs, min_length=25) == \
            reference_duplicated_spans(docs, 25)

    def test_randomized_differential(self, spark):
        """Randomized corpora with random plants — the two independent
        implementations must agree exactly, run for run."""
        for seed in (23, 29, 31):
            rng = random.Random(seed)
            docs = {i: _random_text(rng, rng.randint(40, 400))
                    for i in range(10)}
            for _ in range(rng.randint(1, 4)):
                frag = _random_text(rng, rng.randint(20, 80))
                a, b = rng.sample(range(10), 2)
                ka = rng.randint(0, len(docs[a]))
                kb = rng.randint(0, len(docs[b]))
                docs[a] = docs[a][:ka] + frag + docs[a][ka:]
                docs[b] = docs[b][:kb] + frag + docs[b][kb:]
            L = rng.choice((15, 20, 25))
            assert _spark_spans(spark, docs, L) == \
                reference_duplicated_spans(docs, L), seed

    def test_removal_matches_reference_cut(self, spark):
        """remove_exact_duplicated_spans must cut exactly the spans
        the suffix-automaton reference derives — verified by applying
        the reference spans to the raw text in plain Python."""
        from xdlake_spark.operators.dedup import \
            remove_exact_duplicated_spans
        rng = random.Random(41)
        frag = _random_text(rng, 55)
        docs = {i: _random_text(rng, 200) for i in range(8)}
        docs[1] = docs[1][:60] + frag + docs[1][60:]
        docs[4] = frag + docs[4]
        df = spark.createDataFrame(sorted(docs.items()),
                                   "doc_id long, text string")
        got = {r["doc_id"]: (r["clean_text"], r["n_spans_removed"],
                             r["chars_removed"])
               for r in remove_exact_duplicated_spans(
                   df, min_length=30).collect()}
        want_spans: dict = {}
        for d, s, ln in reference_duplicated_spans(docs, 30):
            want_spans.setdefault(d, []).append((s, ln))
        assert len(got) == len(docs)   # zero-span docs pass through
        for d, text in docs.items():
            spans = sorted(want_spans.get(d, []))
            clean = ""
            cur = 0
            for s, ln in spans:
                clean += text[cur:s - 1]
                cur = s - 1 + ln
            clean += text[cur:]
            assert got[d] == (clean, len(spans),
                              len(text) - len(clean)), d

    def test_min_count_three(self, spark):
        rng = random.Random(37)
        frag = _random_text(rng, 50)
        docs = {i: _random_text(rng, 150) for i in range(6)}
        docs[0] += frag
        docs[1] += frag          # 2 occurrences: below min_count=3
        got2 = _spark_spans(spark, docs, min_length=30, min_count=3)
        assert got2 == reference_duplicated_spans(docs, 30, 3) == set()
        docs[2] += frag          # 3rd occurrence crosses the bar
        got3 = _spark_spans(spark, docs, min_length=30, min_count=3)
        assert got3 == reference_duplicated_spans(docs, 30, 3)
        assert len(got3) == 3

"""Property-based soundness of manifest pruning (plans/skipping.py).

The invariant that makes data skipping safe at any scale: for EVERY
predicate and EVERY table, the pruned manifest is a superset of the
files that actually contain matching rows — pruning may keep too much,
never too little. Ground truth is computed in pure Python with SQL
three-valued NULL semantics (a row matches iff the predicate is TRUE,
not NULL). No Spark session needed, so hypothesis runs hundreds of
cases in seconds against the driver-side component in isolation.
"""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from xdlake_spark.log.actions import Add
from xdlake_spark.plans.skipping import prune_manifest

COLS = ["a", "b"]

# --- predicates as (sql_text, three-valued row evaluator) pairs ----------

_OPS = {
    "=": lambda x, v: x == v, "!=": lambda x, v: x != v,
    "<": lambda x, v: x < v, "<=": lambda x, v: x <= v,
    ">": lambda x, v: x > v, ">=": lambda x, v: x >= v,
}


def _cmp(c, op, v):
    def ev(row):
        x = row[c]
        return None if x is None else _OPS[op](x, v)
    return (f"{c} {op} {v}", ev)


def _isnull(c, neg):
    def ev(row):
        isnull = row[c] is None
        return (not isnull) if neg else isnull
    return (f"{c} IS {'NOT ' if neg else ''}NULL", ev)


def _in(c, neg, vs):
    def ev(row):
        x = row[c]
        if x is None:
            return None
        hit = x in vs
        return (not hit) if neg else hit
    return (f"{c} {'NOT ' if neg else ''}IN ({', '.join(map(str, vs))})",
            ev)


def _between(c, lo, hi):
    def ev(row):
        x = row[c]
        return None if x is None else (lo <= x <= hi)
    return (f"{c} BETWEEN {lo} AND {hi}", ev)


def _and(l, r):
    def ev(row):
        a, b = l[1](row), r[1](row)
        if a is False or b is False:
            return False
        if a is None or b is None:
            return None
        return True
    return (f"({l[0]}) AND ({r[0]})", ev)


def _or(l, r):
    def ev(row):
        a, b = l[1](row), r[1](row)
        if a is True or b is True:
            return True
        if a is None or b is None:
            return None
        return False
    return (f"({l[0]}) OR ({r[0]})", ev)


def _not(x):
    def ev(row):
        a = x[1](row)
        return None if a is None else (not a)
    return (f"NOT ({x[0]})", ev)


_leaf = st.one_of(
    st.builds(_cmp, st.sampled_from(COLS),
              st.sampled_from(list(_OPS)), st.integers(-12, 12)),
    st.builds(_isnull, st.sampled_from(COLS), st.booleans()),
    st.builds(_in, st.sampled_from(COLS), st.booleans(),
              st.lists(st.integers(-12, 12), min_size=1, max_size=3)),
    st.builds(_between, st.sampled_from(COLS),
              st.integers(-12, 0), st.integers(0, 12)),
)

predicates = st.recursive(
    _leaf,
    lambda kids: st.builds(_and, kids, kids)
    | st.builds(_or, kids, kids) | st.builds(_not, kids),
    max_leaves=4)


@st.composite
def chunks(draw):
    """2-5 'files', each a list of {a, b} rows with possible nulls."""
    n_files = draw(st.integers(2, 5))
    val = st.one_of(st.none(), st.integers(-10, 10))
    return [draw(st.lists(st.fixed_dictionaries({"a": val, "b": val}),
                          min_size=1, max_size=6))
            for _ in range(n_files)]


def _stats(rows) -> str:
    s = {"numRecords": len(rows), "minValues": {}, "maxValues": {},
         "nullCount": {}}
    for c in COLS:
        vals = [r[c] for r in rows if r[c] is not None]
        s["nullCount"][c] = len(rows) - len(vals)
        if vals:
            s["minValues"][c] = min(vals)
            s["maxValues"][c] = max(vals)
    return json.dumps(s)


@settings(max_examples=300, deadline=None)
@given(files=chunks(), pred=predicates)
def test_pruning_never_drops_a_matching_file(files, pred):
    sql, ev = pred
    adds = {f"f{i}.parquet": Add(path=f"f{i}.parquet", stats=_stats(rows))
            for i, rows in enumerate(files)}
    kept = set(prune_manifest(adds, sql, []))
    for i, rows in enumerate(files):
        if any(ev(r) is True for r in rows):
            assert f"f{i}.parquet" in kept, (
                f"file f{i} has matching rows for {sql!r} but was "
                f"pruned; stats={adds[f'f{i}.parquet'].stats}")


@settings(max_examples=150, deadline=None)
@given(files=chunks(), pred=predicates)
def test_partition_pruning_sound(files, pred):
    """Same soundness with column 'a' as a (string-valued) partition
    column carrying a constant per file."""
    sql, ev = pred
    adds, parts = {}, []
    for i, rows in enumerate(files):
        const_a = rows[0]["a"]
        rows = [{"a": const_a, "b": r["b"]} for r in rows]
        parts.append(rows)
        adds[f"f{i}.parquet"] = Add(
            path=f"f{i}.parquet",
            stats=_stats([{"a": None, "b": r["b"]} for r in rows]),
            partitionValues={
                "a": None if const_a is None else str(const_a)})
    kept = set(prune_manifest(adds, sql, ["a"]))
    for i, rows in enumerate(parts):
        if any(ev(r) is True for r in rows):
            assert f"f{i}.parquet" in kept, (
                f"partitioned file f{i} matches {sql!r} but was pruned")


def test_unparseable_predicates_keep_everything():
    adds = {"f0.parquet": Add(path="f0.parquet",
                              stats=json.dumps({"numRecords": 1}))}
    for sql in ["a + b > 3", "lower(a) = 'x'", "a = b", "???", ""]:
        assert set(prune_manifest(adds, sql or None, [])) == {"f0.parquet"}


# --- timestamp domain: DATE/TIMESTAMP literals vs ISO-string stats -------

import datetime

_TS0 = datetime.datetime(2024, 1, 1)
_MINUTES = 5 * 24 * 60  # five days


@st.composite
def ts_chunks(draw):
    """2-4 'files' of timestamp rows (None = SQL NULL)."""
    n_files = draw(st.integers(2, 4))
    val = st.one_of(st.none(), st.integers(0, _MINUTES))
    out = []
    for _ in range(n_files):
        rows = draw(st.lists(val, min_size=1, max_size=5))
        out.append([None if m is None
                    else _TS0 + datetime.timedelta(minutes=m)
                    for m in rows])
    return out


def _ts_stats(rows) -> str:
    vals = [r for r in rows if r is not None]
    s = {"numRecords": len(rows),
         "nullCount": {"ts": len(rows) - len(vals)},
         "minValues": {}, "maxValues": {}}
    if vals:
        # the ISO string shape Statistics emits for parquet ts footers
        s["minValues"]["ts"] = min(vals).isoformat()
        s["maxValues"]["ts"] = max(vals).isoformat()
    return json.dumps(s)


@st.composite
def ts_predicates(draw):
    """ts <op> TIMESTAMP '...' or ts <op> DATE '...' with Spark's
    date-to-midnight promotion as ground truth."""
    op = draw(st.sampled_from(list(_OPS)))
    m = draw(st.integers(0, _MINUTES))
    t = _TS0 + datetime.timedelta(minutes=m)
    if draw(st.booleans()):
        d = t.date()
        lit = datetime.datetime(d.year, d.month, d.day)
        sql = f"ts {op} DATE '{d.isoformat()}'"
    else:
        lit = t
        sql = f"ts {op} TIMESTAMP '{t.strftime('%Y-%m-%d %H:%M:%S')}'"

    def ev(x):
        return None if x is None else _OPS[op](x, lit)
    return (sql, ev)


@settings(max_examples=300, deadline=None)
@given(files=ts_chunks(), pred=ts_predicates())
def test_timestamp_pruning_sound(files, pred):
    sql, ev = pred
    adds = {f"f{i}.parquet": Add(path=f"f{i}.parquet",
                                 stats=_ts_stats(rows))
            for i, rows in enumerate(files)}
    kept = set(prune_manifest(adds, sql, []))
    for i, rows in enumerate(files):
        if any(ev(r) is True for r in rows):
            assert f"f{i}.parquet" in kept, (
                f"ts file f{i} matches {sql!r} but was pruned; "
                f"stats={adds[f'f{i}.parquet'].stats}")


# --- int domain near 2^53: float folding must not lose exactness ---------

_BIG = 9007199254740992  # 2^53


@settings(max_examples=200, deadline=None)
@given(
    files=st.lists(
        st.lists(st.one_of(st.none(),
                           st.integers(_BIG - 3, _BIG + 3),
                           st.integers(-5, 5)),
                 min_size=1, max_size=4),
        min_size=2, max_size=4),
    op=st.sampled_from(list(_OPS)),
    lit=st.integers(_BIG - 3, _BIG + 3),
)
def test_big_int_pruning_exact(files, op, lit):
    def stats(rows):
        vals = [r for r in rows if r is not None]
        s = {"numRecords": len(rows),
             "nullCount": {"a": len(rows) - len(vals)},
             "minValues": {}, "maxValues": {}}
        if vals:
            s["minValues"]["a"] = min(vals)
            s["maxValues"]["a"] = max(vals)
        return json.dumps(s)

    adds = {f"f{i}.parquet": Add(path=f"f{i}.parquet", stats=stats(rows))
            for i, rows in enumerate(files)}
    kept = set(prune_manifest(adds, f"a {op} {lit}", []))
    for i, rows in enumerate(files):
        if any(r is not None and _OPS[op](r, lit) for r in rows):
            assert f"f{i}.parquet" in kept, (
                f"big-int file f{i} matches a {op} {lit} but was pruned")


# --- metadata-only DELETE: certain-match soundness ------------------------

from xdlake_spark.plans.skipping import split_certain_matches


@settings(max_examples=300, deadline=None)
@given(files=chunks(), pred=predicates)
def test_certain_match_means_every_row_matches(files, pred):
    """The metadata-only DELETE invariant, strict direction: a file in
    `certain` may be tombstoned WITHOUT reading it, so every one of its
    rows must evaluate to SQL TRUE (never NULL, never FALSE) under the
    predicate. Column 'a' is the partition column (constant per file);
    'b' is data the proof must never rely on."""
    sql, ev = pred
    adds, parts = {}, []
    for i, rows in enumerate(files):
        const_a = rows[0]["a"]
        rows = [{"a": const_a, "b": r["b"]} for r in rows]
        parts.append(rows)
        adds[f"f{i}.parquet"] = Add(
            path=f"f{i}.parquet",
            stats=_stats([{"a": None, "b": r["b"]} for r in rows]),
            partitionValues={
                "a": None if const_a is None else str(const_a)})
    certain, rest = split_certain_matches(adds, sql, ["a"],
                                          {"a": "bigint"})
    assert set(certain) | set(rest) == set(adds)
    assert not (set(certain) & set(rest))
    for i, rows in enumerate(parts):
        if f"f{i}.parquet" in certain:
            for r in rows:
                assert ev(r) is True, (
                    f"file f{i} claimed certain for {sql!r} but row "
                    f"{r} evaluates {ev(r)!r}")


@settings(max_examples=150, deadline=None)
@given(files=chunks(), pred=predicates)
def test_certain_plus_prune_partition_exactness(files, pred):
    """Combined invariant used by DELETE: certain ∪ (scanned rest)
    covers exactly the matching rows — i.e. no matching row lives in a
    file that is neither certain nor in rest after pruning rest."""
    sql, ev = pred
    adds, parts = {}, []
    for i, rows in enumerate(files):
        const_a = rows[0]["a"]
        rows = [{"a": const_a, "b": r["b"]} for r in rows]
        parts.append(rows)
        adds[f"f{i}.parquet"] = Add(
            path=f"f{i}.parquet",
            stats=_stats([{"a": None, "b": r["b"]} for r in rows]),
            partitionValues={
                "a": None if const_a is None else str(const_a)})
    certain, rest = split_certain_matches(adds, sql, ["a"],
                                          {"a": "bigint"})
    for i, rows in enumerate(parts):
        name = f"f{i}.parquet"
        if any(ev(r) is True for r in rows) and name not in certain:
            assert name in rest


# --- generated-column pruning: derived nodes never drop a match ----------

from xdlake_spark.plans.skipping import (derive_partition_nodes,
                                         prune_with_nodes)

_GEN_EXPRS = [
    ("CAST(ts AS DATE)", lambda t: t.date().isoformat()),
    ("YEAR(ts)", lambda t: str(t.year)),
    ("DATE_FORMAT(ts, 'yyyy-MM-dd')", lambda t: t.strftime("%Y-%m-%d")),
    ("DATE_TRUNC('HOUR', ts)",
     lambda t: t.replace(minute=0, second=0).isoformat(sep=" ")),
]


@settings(max_examples=300, deadline=None)
@given(files=ts_chunks(), pred=ts_predicates(),
       gen=st.sampled_from(_GEN_EXPRS))
def test_generated_partition_derivation_sound(files, pred, gen):
    """OptimizeGeneratedColumn soundness: each file is one partition of
    d = f(ts) (all its rows share the transform value — enforced by
    regrouping rows by transform), the predicate filters raw ts, and
    pruning on the DERIVED partition nodes must keep every file holding
    a ts row that satisfies the predicate."""
    sql, ev = pred
    expr, pv = gen
    # regroup rows so each synthetic file is a single partition of f(ts)
    groups: dict = {}
    for rows in files:
        for r in rows:
            key = None if r is None else pv(r)
            groups.setdefault(key, []).append(r)
    adds, parts = {}, []
    for i, (key, rows) in enumerate(sorted(
            groups.items(), key=lambda kv: (kv[0] is None, kv[0]))):
        parts.append(rows)
        adds[f"f{i}.parquet"] = Add(
            path=f"f{i}.parquet", stats=_ts_stats(rows),
            partitionValues={"d": key})
    nodes = derive_partition_nodes(sql, {"d": expr})
    kept = set(prune_with_nodes(adds, nodes, ["d"]))
    for i, rows in enumerate(parts):
        if any(ev(r) is True for r in rows):
            assert f"f{i}.parquet" in kept, (
                f"partition {adds[f'f{i}.parquet'].partitionValues} "
                f"holds a match for {sql!r} via {expr} but the derived "
                f"nodes {nodes} pruned it")


# --- NaN domain: Spark total order vs Python float comparisons -----------

import math

_DBLS = [float("nan"), -3.5, -1.0, 0.0, 1.25, 2.0, 7.5]


def _spark_key(x: float):
    """Spark's binary-comparison total order over doubles: NaN equals
    itself and sorts greater than every other value."""
    return (1, 0.0) if math.isnan(x) else (0, x)


def _spark_cmp_eval(op: str, x: float, v: float) -> bool:
    kx, kv = _spark_key(x), _spark_key(v)
    return {"=": kx == kv, "!=": kx != kv, "<": kx < kv,
            "<=": kx <= kv, ">": kx > kv, ">=": kx >= kv}[op]


@settings(max_examples=300, deadline=None)
@given(consts=st.lists(st.sampled_from(_DBLS), min_size=2, max_size=5),
       op=st.sampled_from(list(_OPS)),
       lit=st.sampled_from(_DBLS))
def test_nan_partition_pruning_sound_under_spark_order(consts, op, lit):
    """r9 ADVICE closure, generalized: with a double partition column
    whose values may be NaN, pruning must keep every file Spark's
    comparison semantics would match — Python's every-comparison-
    with-NaN-is-False must never leak into a skip decision."""
    lit_sql = "'NaN'" if math.isnan(lit) else repr(lit)
    sql = f"a {op} {lit_sql}"
    adds = {
        f"f{i}.parquet": Add(
            path=f"f{i}.parquet",
            stats=json.dumps({"numRecords": 1}),
            partitionValues={"a": "NaN" if math.isnan(c) else str(c)})
        for i, c in enumerate(consts)}
    kept = set(prune_manifest(adds, sql, ["a"],
                              partition_types={"a": "double"}))
    for i, c in enumerate(consts):
        if _spark_cmp_eval(op, c, lit):
            assert f"f{i}.parquet" in kept, (sql, c, kept)

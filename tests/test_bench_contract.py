"""The bench harness's HEADLINE list must stay a subset of the query
registry — a rename or removal that breaks it would silently destroy
the driver's per-round BENCH record."""

import os
import re


def test_headline_queries_all_registered():
    from xdlake_spark.queries import queries

    src = open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py")).read()
    names = re.findall(r'"([a-z0-9_]+)",',
                       src.split("HEADLINE = [")[1].split("]")[0])
    assert len(names) >= 40
    assert len(set(names)) == len(names), "duplicate headline entries"
    q = queries()
    missing = [n for n in names if n not in q]
    assert missing == [], missing


def test_duckdb_baseline_subset_of_headline_oracles():
    from xdlake_spark.queries import oracle_sql

    src = open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py")).read()
    base = re.findall(r'"([a-z0-9_]+)",',
                      src.split("DUCKDB_BASELINE = [")[1].split("]")[0])
    head = re.findall(r'"([a-z0-9_]+)",',
                      src.split("HEADLINE = [")[1].split("]")[0])
    oracles = oracle_sql()
    missing = [n for n in base if n not in oracles]
    assert missing == [], missing
    # every duckdb_s entry must have a Spark headline median to compare
    # against, or the baseline column is silently incomparable
    not_in_headline = [n for n in base if n not in head]
    assert not_in_headline == [], not_in_headline


def test_driver_window_covers_families_with_oracles():
    """The driver oracle-checks exactly queries() keys[:50]; that window
    must contain only oracle-bearing entries and span every operator
    family, or a refactor could silently shrink the driver's coverage
    back to relational-only (round-5 verdict item #2)."""
    from xdlake_spark.queries import DRIVER_WINDOW, REGISTRY, oracle_sql, queries

    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50
    ks = list(queries())
    assert ks[:50] == DRIVER_WINDOW
    oracles = oracle_sql()
    assert [n for n in ks[:50] if n not in oracles] == []
    # queries()/oracle_sql() are reorderings, never drops
    assert set(ks) == set(REGISTRY)
    families = {
        "delta": ["delta_roundtrip_scan", "delta_merge_upsert"],
        "temporal": ["asof_join_nearest", "events_gapfill_locf"],
        "text": ["text_stats", "lang_detect"],
        "dedup": ["dedup_ngram_jaccard_pairs", "dedup_connected_components",
                  "leakage_safe_split", "incremental_dedup_keepers"],
        "similarity": ["similarity_topk_cosine", "knn_join_labels"],
        "packing": ["chunk_and_pack"],
    }
    for fam, members in families.items():
        assert all(m in DRIVER_WINDOW for m in members), fam


def test_driver_sample_stays_oracle_backed():
    """The FIXED core of the driver window stays within the round-6
    recorded green set (historically driver-verified), and the r12
    rotation only ever adds oracle-backed entries — so the window can
    rotate coverage deliberately without ever shrinking to
    unverifiable queries."""
    import json
    path = os.path.join(os.path.dirname(__file__), "..",
                        "CORRECTNESS_r06.json")
    if not os.path.exists(path):
        import pytest
        pytest.skip("driver artifact not present")
    recorded = set(json.load(open(path)))
    from xdlake_spark.queries import (DRIVER_WINDOW,
                                      DRIVER_WINDOW_CORE, oracle_sql)
    assert set(DRIVER_WINDOW_CORE) <= recorded, (
        "a fixed core slot was never driver-verified; update "
        "COVERAGE.md 'Driver correctness window' deliberately "
        "if this is intentional")
    oracles = oracle_sql()
    assert all(n in oracles for n in DRIVER_WINDOW)


def test_driver_window_rotation_schedule_covers_pool():
    """r12 (verdict task 7): the 10 rotating slots cycle through EVERY
    oracle-bearing registry entry outside the fixed core within
    ceil(pool/10) rounds — driver-side verification is no longer
    confined to one fixed 50 forever. Rotation is deterministic in the
    round index, the window stays 50, and queries() leads with it."""
    from xdlake_spark.queries import (DRIVER_WINDOW, DRIVER_WINDOW_CORE,
                                      DRIVER_WINDOW_ROTATION, REGISTRY,
                                      driver_window, queries)
    core = set(DRIVER_WINDOW_CORE)
    pool = sorted(n for n in REGISTRY
                  if REGISTRY[n][1] is not None and n not in core)
    rounds = -(-len(pool) // DRIVER_WINDOW_ROTATION)
    seen: set = set()
    for r in range(rounds):
        w = driver_window(r)
        assert len(w) == 50 and len(set(w)) == 50
        assert w[:len(DRIVER_WINDOW_CORE)] == DRIVER_WINDOW_CORE
        seen.update(w[len(DRIVER_WINDOW_CORE):])
    assert seen == set(pool), (sorted(set(pool) - seen)[:5],
                               sorted(seen - set(pool))[:5])
    # deterministic: same index -> same window
    assert driver_window(3) == driver_window(3)
    # the module-level window is a valid instance and heads queries()
    assert list(queries())[:50] == DRIVER_WINDOW


def test_final_bench_line_is_compact():
    """Rounds 4 and 5 both lost their headline value to the driver's
    2000-byte stdout-tail truncation. r13: the line carries a
    BYTE-BUDGETED per-query dict (verdict item 2b) — pin that the
    budget guard and the final length assertion are both in place so
    the dict cannot regrow past the driver's capture window."""
    import os

    src = open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py")).read()
    tail = src.split("# Final line:")[1]
    assert "budget = 1800" in tail
    assert 'del payload["queries"][n]' in tail
    assert "assert len(line) < 1900" in tail


def test_bench_has_no_untimed_prestage_or_session_memos():
    """r13 (verdict gaming item 1): the r12 untimed prestage and the
    session-scoped staging/memo caches moved declared query work out
    of the timed region. Pin their absence — every query execution
    must compute its artifacts from the parquet inputs itself."""
    import inspect

    import xdlake_spark.queries as q
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bench_src = open(os.path.join(root, "bench.py")).read()
    assert "prestage_session_artifacts(" not in bench_src.replace(
        '"prestage_session_artifacts"', "")
    for banned in ("prestage_session_artifacts", "_session_memo",
                   "_STAGED_DELTA", "_STAGED_OBJS"):
        assert not hasattr(q, banned), banned
    # the canonical builders exist but carry no cache: the selected
    # builder is invoked directly and the table is written fresh
    src = inspect.getsource(q._ann_artifacts)
    assert "return builders[key]()" in src and "_STAGED" not in src
    src = inspect.getsource(q._maintained_lineitem_table)
    assert "_STAGED" not in src and ".clone(" not in src
    assert "tempfile.mkdtemp" in src

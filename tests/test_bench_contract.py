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
    2000-byte stdout-tail truncation. Pin that the printed final line
    cannot regrow a per-query dict."""
    import os

    src = open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py")).read()
    tail = src.split("# Final line:")[1]
    assert '"queries"' not in tail.split("spark.stop()")[0]
    assert "assert len(line) < 1500" in tail


def test_bench_prestage_keys_match():
    """r12: bench.py pre-stages the maintained clustering tables and
    trained ANN artifacts untimed via the CANONICAL
    prestage_session_artifacts; every maintain_key / ANN key a
    registry query uses must be staged by that function, or the first
    tail timing silently re-pays the one-time build it was supposed
    to exclude."""
    import inspect
    import re

    import xdlake_spark.queries as q
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bench_src = open(os.path.join(root, "bench.py")).read()
    assert "prestage_session_artifacts" in bench_src
    q_src = inspect.getsource(q)
    pre_src = inspect.getsource(q.prestage_session_artifacts)
    ann_src = inspect.getsource(q._ann_artifacts)
    q_keys = set(re.findall(r'maintain_key="(\w+)"', q_src))
    pre_keys = set(re.findall(r'maintain_key="(\w+)"', pre_src))
    assert q_keys, "clustering queries lost their staged maintenance"
    assert q_keys <= pre_keys, sorted(q_keys - pre_keys)
    ann_keys = set(re.findall(r'"(\w+)": lambda', ann_src))
    pre_ann = set(re.findall(r'"(\w+)"', pre_src.split("for key in")[1]))
    assert ann_keys and ann_keys <= pre_ann, sorted(ann_keys - pre_ann)

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

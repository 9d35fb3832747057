import os
import shutil
import tempfile

import pytest
from pyspark.sql import SparkSession

SF_SMOKE = "/root/testdata/sf0.001"


def pytest_addoption(parser):
    parser.addoption(
        "--nightly", action="store_true", default=False,
        help="run the FULL suite including the nightly tier "
             "(slow differential twins / fuzz depth listed in "
             "tests/nightly_ids.txt)")


def pytest_collection_modifyitems(config, items):
    """Two-tier suite (r13, VERDICT item 2a): the full 1500-test run
    takes ~30 min, which blows the driver's verify window — the r12
    verify timed out on a tail of passing dots and reported
    tests_ok=false. The default `pytest tests/` now runs an ~8-minute
    fast gate: every test class keeps at least its cheapest member
    (feature coverage), and the slow differential twins / fuzz sweeps
    (tests/nightly_ids.txt, generated from measured durations) are
    skipped unless --nightly is passed. An id in the list that no
    longer collects fails LOUDLY so the list cannot rot into silently
    re-running the full suite (or skipping nothing)."""
    if config.getoption("--nightly"):
        return
    path = os.path.join(os.path.dirname(__file__), "nightly_ids.txt")
    if not os.path.exists(path):
        return
    night = {ln.strip() for ln in open(path)
             if ln.strip() and not ln.startswith("#")}
    marker = pytest.mark.skip(
        reason="nightly tier — run with --nightly for the full suite")
    seen = set()
    for it in items:
        nid = it.nodeid
        if nid.startswith("tests/"):
            nid = nid[len("tests/"):]
        if nid in night:
            it.add_marker(marker)
            seen.add(nid)
    # rot guard, scoped to the modules actually collected so running a
    # single file (pytest tests/test_graph.py) doesn't false-positive
    mods = set()
    for it in items:
        m = it.nodeid.split("::")[0]
        mods.add(m[len("tests/"):] if m.startswith("tests/") else m)
    unknown = {n for n in night - seen if n.split("::")[0] in mods}
    if unknown:
        raise pytest.UsageError(
            f"tests/nightly_ids.txt lists {len(unknown)} test id(s) "
            f"that no longer exist (first: {sorted(unknown)[0]!r}) — "
            "regenerate the list or remove the stale entries")


@pytest.fixture(scope="session")
def spark():
    s = (SparkSession.builder.master("local[8]")
         .appName("xdlake-spark-tests")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "4g")
         .getOrCreate())
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture()
def tmp_table_dir():
    d = tempfile.mkdtemp(prefix="xdlake_spark_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def lineitem(spark):
    return spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")


@pytest.fixture(scope="session")
def documents(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


@pytest.fixture(scope="session")
def embeddings(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


@pytest.fixture(scope="session")
def events(spark):
    return spark.read.parquet(f"{SF_SMOKE}/events.parquet")

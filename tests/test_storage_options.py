"""Per-table credentials (storage_options) + split log/data stores.

Models the reference's cloud tests (/root/reference/tests/
test_xdlake_cloud.py:15-29: s3 log + local data and vice versa) using
locally-backed registered filesystems as stand-ins — no network needed.
"""

import os
import sys

import pytest

from xdlake_spark import DeltaTable
from xdlake_spark.sources import storage
from xdlake_spark.sources.storage import Location, register_filesystem

from .utils import assert_frames_equivalent, gen_pdf


@pytest.fixture
def clean_registry():
    saved = dict(storage._REGISTRY)
    saved_cache = dict(storage._OPTIONS_FS_CACHE)
    yield
    storage._REGISTRY.clear()
    storage._REGISTRY.update(saved)
    storage._OPTIONS_FS_CACHE.clear()
    storage._OPTIONS_FS_CACHE.update(saved_cache)


class TestSplitLogAndDataStores:
    def test_log_in_separate_store(self, spark, tmp_table_dir,
                                   clean_registry):
        """Data in one store, _delta_log in another (reference
        test_xdlake_cloud.py:15-29 shape)."""
        import pyarrow.fs as pafs
        log_root = os.path.join(tmp_table_dir, "logstore")
        os.makedirs(log_root)
        register_filesystem(
            "mocklog://",
            pafs.SubTreeFileSystem(log_root, pafs.LocalFileSystem()))

        data_loc = os.path.join(tmp_table_dir, "data")
        pdf = gen_pdf()
        t = DeltaTable(spark, data_loc, log_location="mocklog://tbl")
        t = t.write(spark.createDataFrame(pdf))
        t = t.write(spark.createDataFrame(gen_pdf()))

        # the log lives in the log store, not next to the data
        assert os.path.isfile(os.path.join(
            log_root, "tbl", "00000000000000000000.json"))
        assert not os.path.exists(os.path.join(data_loc, "_delta_log"))

        # a fresh handle replays from the separate log store
        t2 = DeltaTable(spark, data_loc, log_location="mocklog://tbl")
        assert t2.version == 1
        assert t2.to_df().count() == 2 * len(pdf)

        # mutation via the split handle (delete tombstones through the
        # registered log store)
        t3 = t2.delete("flag = true")
        assert t3.to_df().filter("flag = true").count() == 0

    def test_data_in_registered_store_log_local(self, spark, tmp_table_dir,
                                                clean_registry):
        """Inverse split: the log is plain-local, the *log-side file ops*
        for data (existence checks during vacuum) go through a registered
        store. Spark itself still addresses the data by its real path."""
        import pyarrow.fs as pafs
        register_filesystem(
            "mockdata://" + tmp_table_dir.lstrip("/"),
            pafs.SubTreeFileSystem("/", pafs.LocalFileSystem()))
        pdf = gen_pdf()
        data = os.path.join(tmp_table_dir, "d")
        log_loc = os.path.join(tmp_table_dir, "log", "_delta_log")
        t = DeltaTable(spark, data, log_location=log_loc)
        t = t.write(spark.createDataFrame(pdf))
        assert os.path.isdir(log_loc)
        t2 = DeltaTable(spark, data, log_location=log_loc)
        assert_frames_equivalent(t2.to_pandas(), pdf)


class _RecordingFS:
    """fsspec-shaped local filesystem that records its constructor opts."""

    instances: list = []

    def __init__(self, root, **options):
        self.root = root
        self.options = options
        type(self).instances.append(self)

    def _p(self, path):
        rel = path.split("://", 1)[1] if "://" in path else path
        return os.path.join(self.root, rel)

    def exists(self, path):
        return os.path.exists(self._p(path))

    def makedirs(self, path, exist_ok=False):
        os.makedirs(self._p(path), exist_ok=exist_ok)

    def open(self, path, mode="rb"):
        p = self._p(path)
        if "w" in mode:
            os.makedirs(os.path.dirname(p), exist_ok=True)
        return open(p, mode)

    def ls(self, path):
        p = self._p(path)
        return [os.path.join(path, n) for n in sorted(os.listdir(p))]

    def find(self, path):
        p = self._p(path)
        out = []
        for root, _d, files in os.walk(p):
            for n in files:
                full = os.path.join(root, n)
                out.append(path.rstrip("/") + "/"
                           + os.path.relpath(full, p))
        return sorted(out)

    def rm(self, path, recursive=False):
        import shutil
        p = self._p(path)
        shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)

    def size(self, path):
        return os.path.getsize(self._p(path))

    def mv(self, a, b):
        import shutil
        shutil.move(self._p(a), self._p(b))


class TestStorageOptions:
    def test_options_reach_filesystem_factory(self, tmp_path,
                                              clean_registry, monkeypatch):
        """storage_options flow into the filesystem constructor exactly as
        the reference passes them to fsspec.filesystem (storage.py:30-59),
        and distinct credentials get distinct clients."""
        import types
        _RecordingFS.instances = []
        fake = types.ModuleType("fsspec")
        fake.filesystem = lambda proto, **opts: _RecordingFS(
            str(tmp_path), **opts)
        monkeypatch.setitem(sys.modules, "fsspec", fake)

        loc_a = Location.resolve("mock://t1/_delta_log",
                                 storage_options={"token": "A"})
        loc_b = Location.resolve("mock://t2/_delta_log",
                                 storage_options={"token": "B"})
        loc_a.join("00.json").put_if_absent(b"{}")
        loc_b.join("00.json").put_if_absent(b"{}")
        assert loc_a.join("00.json").exists()
        tokens = sorted(fs.options["token"] for fs in _RecordingFS.instances)
        assert tokens == ["A", "B"]
        # same options -> cached client, not a third instance
        Location.resolve("mock://t1/_delta_log",
                         storage_options={"token": "A"}).list_files()
        assert len(_RecordingFS.instances) == 2
        # derived locations inherit the credentials
        child = loc_a.join("sub").join("x.json")
        assert child.storage_options == {"token": "A"}

    def test_registered_prefix_wins_over_options(self, tmp_path,
                                                 clean_registry):
        """A registered filesystem takes precedence (reference
        get_filesystem: registry first, then fsspec with options)."""
        import pyarrow.fs as pafs
        register_filesystem(
            "mockreg://",
            pafs.SubTreeFileSystem(str(tmp_path), pafs.LocalFileSystem()))
        loc = Location.resolve("mockreg://a/b.json",
                               storage_options={"token": "ignored"})
        loc.put_if_absent(b"x")
        assert (tmp_path / "a" / "b.json").read_bytes() == b"x"

    def test_deltatable_threads_options(self, spark, tmp_path,
                                        clean_registry, monkeypatch):
        """DeltaTable(storage_options=...) reaches the log I/O layer."""
        import types
        _RecordingFS.instances = []
        fake = types.ModuleType("fsspec")
        fake.filesystem = lambda proto, **opts: _RecordingFS(
            str(tmp_path), **opts)
        monkeypatch.setitem(sys.modules, "fsspec", fake)

        data = str(tmp_path / "data")
        t = DeltaTable(spark, data, log_location="mock://tbl/_delta_log",
                       storage_options={"token": "secret"})
        t = t.write(spark.createDataFrame(gen_pdf()))
        assert any(fs.options.get("token") == "secret"
                   for fs in _RecordingFS.instances)
        assert (tmp_path / "tbl" / "_delta_log"
                / "00000000000000000000.json").is_file()
        t2 = DeltaTable(spark, data, log_location="mock://tbl/_delta_log",
                        storage_options={"token": "secret"})
        assert t2.version == 0 and t2.to_df().count() == 20

"""Storage abstraction: URL -> filesystem resolution + path math.

Mirrors the reference's two-level design (/root/reference/xdlake/storage.py:
10-237): a process-global prefix->filesystem registry with longest-prefix
matching, plus a ``Location`` value object coupling scheme + path. Relative
local paths are absolutized; add-action paths may be table-relative or
absolute URLs (after clone / import_refs) and resolve via :meth:`Location.
absloc`.

Backends:
- local: plain ``os`` I/O with O_EXCL for atomic put-if-absent commits —
  *stronger* than the reference's exists-then-write (reference
  __init__.py:425-442 is non-atomic; noted in SURVEY §7.3 sharp-edge 3);
- s3/gs/az...: ``pyarrow.fs.FileSystem.from_uri`` when those connectors are
  present, or an fsspec filesystem if registered. The *data* path on a real
  cluster goes through Spark/Hadoop (s3a/gs/abfs) — this module only carries
  the KB-scale JSON log and path math.
"""

from __future__ import annotations

import os
import posixpath
import re
from typing import Any

_REGISTRY: dict[str, Any] = {}

_URL_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://")


def register_filesystem(prefix: str, fs: Any) -> None:
    """Register a filesystem for a URL prefix (longest prefix wins).

    ``fs`` may be a ``pyarrow.fs.FileSystem`` or an fsspec filesystem
    (anything with open/exists/ls); mirrors reference storage.py:10-59.
    """
    _REGISTRY[prefix.rstrip("/")] = fs


def _lookup_filesystem(url: str) -> Any | None:
    best, best_len = None, -1
    for prefix, fs in _REGISTRY.items():
        if url.startswith(prefix) and len(prefix) > best_len:
            best, best_len = fs, len(prefix)
    return best


#: Filesystems built from per-table storage_options, cached by
#: (scheme, frozen options) so two tables with the same credentials share
#: one client but different credentials never cross-contaminate.
_OPTIONS_FS_CACHE: dict[tuple, Any] = {}


def _fs_from_options(scheme: str, options: dict) -> Any | None:
    """Construct a filesystem from per-call credentials
    (reference storage.py:30-59: ``fsspec.filesystem(protocol, **opts)``).

    Prefers fsspec when importable (exact reference semantics); otherwise
    maps the scheme onto the matching pyarrow.fs backend, which accepts
    the same credential kwargs style (access_key, secret_key, ...).
    """
    key = (scheme, tuple(sorted(options.items())))
    if key in _OPTIONS_FS_CACHE:
        return _OPTIONS_FS_CACHE[key]
    fs: Any
    try:
        import fsspec
        fs = fsspec.filesystem(scheme, **options)
    except ModuleNotFoundError:
        if scheme == "file":
            return None  # local I/O takes no credentials
        import pyarrow.fs as pafs
        builders = {"s3": pafs.S3FileSystem, "s3a": pafs.S3FileSystem,
                    "gs": pafs.GcsFileSystem, "gcs": pafs.GcsFileSystem,
                    "hdfs": pafs.HadoopFileSystem}
        if scheme not in builders:
            raise ValueError(
                f"storage_options given but no filesystem backend for "
                f"scheme {scheme!r} (install fsspec or register one via "
                f"register_filesystem)")
        fs = builders[scheme](**options)
    _OPTIONS_FS_CACHE[key] = fs
    return fs


class Location:
    """A storage location: scheme + absolute path (+ resolved filesystem).

    Reference parity: storage.py:79-205. ``storage_options`` carries
    per-table credentials (reference __init__.py:35-48); it takes effect
    when no registered filesystem prefix matches, and is inherited by
    every derived Location (join/absloc of log paths, data files).
    """

    def __init__(self, scheme: str, path: str,
                 storage_options: dict | None = None):
        self.scheme = scheme
        self.path = path
        self.storage_options = storage_options

    # -- construction -------------------------------------------------------

    @classmethod
    def resolve(cls, url_or_path: "str | Location",
                storage_options: dict | None = None) -> "Location":
        if isinstance(url_or_path, Location):
            if storage_options:
                url_or_path.storage_options = storage_options
            return url_or_path
        url = str(url_or_path)
        m = _URL_RE.match(url)
        if m:
            scheme = m.group(1)
            if scheme == "file":
                return cls("file", url[len("file://"):] or "/",
                           storage_options)
            return cls(scheme, url, storage_options)
        # relative local paths are absolutized (reference storage.py:119-128)
        return cls("file", os.path.abspath(url), storage_options)

    # -- path math -----------------------------------------------------------

    def join(self, *parts: str) -> "Location":
        if self.scheme == "file":
            return Location("file", os.path.join(self.path, *parts),
                            self.storage_options)
        return Location(self.scheme, posixpath.join(self.path, *parts),
                        self.storage_options)

    @property
    def url(self) -> str:
        if self.scheme == "file":
            return self.path
        return self.path

    def absloc(self, path: str) -> "Location":
        """Resolve an add-action path: table-relative or absolute URL
        (reference storage.py:220-237). Relative paths inherit this
        location's credentials; absolute foreign refs resolve fresh."""
        if _URL_RE.match(path) or os.path.isabs(path):
            return Location.resolve(path)
        return self.join(path)

    def relative_to(self, other: "Location") -> str | None:
        """This path relative to ``other``, or None if not beneath it."""
        base = other.path.rstrip("/") + "/"
        if self.scheme == other.scheme and self.path.startswith(base):
            return self.path[len(base):]
        return None

    # -- filesystem ops (log-scale I/O only) ----------------------------------

    def _fs(self):
        fs = _lookup_filesystem(self.url)
        if fs is not None:
            return fs
        if self.storage_options:
            return _fs_from_options(self.scheme, self.storage_options)
        if self.scheme == "file":
            return None  # plain os I/O
        import pyarrow.fs as pafs
        fs, _ = pafs.FileSystem.from_uri(self.url)
        register_filesystem(f"{self.scheme}://", fs)
        return fs

    def _strip_scheme(self) -> str:
        m = _URL_RE.match(self.path)
        return self.path[m.end():] if m else self.path

    def exists(self) -> bool:
        fs = self._fs()
        if fs is None:
            return os.path.exists(self.path)
        import pyarrow.fs as pafs
        if isinstance(fs, pafs.FileSystem):
            return fs.get_file_info(self._strip_scheme()).type != pafs.FileType.NotFound
        return fs.exists(self.path)

    def mkdir(self) -> None:
        fs = self._fs()
        if fs is None:
            os.makedirs(self.path, exist_ok=True)
            return
        import pyarrow.fs as pafs
        if isinstance(fs, pafs.FileSystem):
            fs.create_dir(self._strip_scheme(), recursive=True)
        else:
            fs.makedirs(self.path, exist_ok=True)

    def read_bytes(self) -> bytes:
        fs = self._fs()
        if fs is None:
            with open(self.path, "rb") as f:
                return f.read()
        import pyarrow.fs as pafs
        if isinstance(fs, pafs.FileSystem):
            with fs.open_input_stream(self._strip_scheme()) as f:
                return f.read()
        with fs.open(self.path, "rb") as f:
            return f.read()

    def write_bytes(self, data: bytes) -> None:
        fs = self._fs()
        if fs is None:
            os.makedirs(os.path.dirname(self.path), exist_ok=True)
            with open(self.path, "wb") as f:
                f.write(data)
            return
        import pyarrow.fs as pafs
        if isinstance(fs, pafs.FileSystem):
            parent = posixpath.dirname(self._strip_scheme())
            if parent:
                fs.create_dir(parent, recursive=True)
            with fs.open_output_stream(self._strip_scheme()) as f:
                f.write(data)
        else:
            with fs.open(self.path, "wb") as f:
                f.write(data)

    def put_if_absent(self, data: bytes) -> None:
        """Atomic create-exclusive where the backend supports it.

        Local: O_CREAT|O_EXCL (truly atomic). Remote backends, in
        preference order (r11):

        1. a filesystem exposing ``put_if_absent(path, data)`` — a
           native conditional-put backend (the emulated object store
           in tests/emulated_store.py; any user-registered LogStore);
        2. an fsspec filesystem whose ``pipe_file`` accepts
           ``mode="create"`` — fsspec's conditional-put API, mapped
           by s3fs/gcsfs onto HTTP ``If-None-Match: *``, which S3 and
           GCS honor atomically server-side;
        3. check-then-write — the OCC window the reference accepts
           (reference delta_log/__init__.py:422-429); pair it with a
           :meth:`DeltaTable.commit_context` lock for stores without
           conditional writes.

        Raises FileExistsError on conflict — callers treat that as a
        concurrent-commit collision.
        """
        fs = self._fs()
        if fs is None:
            os.makedirs(os.path.dirname(self.path), exist_ok=True)
            fd = os.open(self.path, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
            try:
                os.write(fd, data)
            finally:
                os.close(fd)
            return
        native = getattr(fs, "put_if_absent", None)
        if callable(native):
            native(self.path, data)
            return
        pipe = getattr(fs, "pipe_file", None)
        if callable(pipe):
            try:
                pipe(self.path, data, mode="create")
                return
            except FileExistsError:
                raise FileExistsError(self.url)
            except Exception:
                # backend without conditional-put support: older
                # fsspec versions forward the unknown mode kwarg to
                # the store call, which raises backend-specific types
                # (not just TypeError) — any non-conflict failure
                # falls through to check-then-write. BUT the
                # conditional put may have LANDED server-side before a
                # transient client error (timeout after a 200): read
                # back and compare — identical bytes mean OUR write
                # won and is a success, not a lost race (a commit
                # caller treating it as a collision would rebase and
                # re-apply the same actions at the next version,
                # double-applying them).
                try:
                    if self.exists() and self.read_bytes() == data:
                        return
                except Exception:
                    pass
        if self.exists():
            raise FileExistsError(self.url)
        self.write_bytes(data)

    def delete(self) -> None:
        fs = self._fs()
        if fs is None:
            if os.path.exists(self.path):
                os.remove(self.path)
            return
        import pyarrow.fs as pafs
        if isinstance(fs, pafs.FileSystem):
            fs.delete_file(self._strip_scheme())
        else:
            fs.rm(self.path)

    def rename(self, dst: "Location") -> None:
        """Move this file to ``dst`` (same filesystem), creating parent
        dirs as needed. Local/HDFS rename is O(1); object-store backends
        fall back to their native move (copy+delete on s3)."""
        fs = self._fs()
        if fs is None:
            os.makedirs(os.path.dirname(dst.path), exist_ok=True)
            os.replace(self.path, dst.path)
            return
        import pyarrow.fs as pafs
        if isinstance(fs, pafs.FileSystem):
            parent = posixpath.dirname(dst._strip_scheme())
            if parent:
                fs.create_dir(parent, recursive=True)
            fs.move(self._strip_scheme(), dst._strip_scheme())
        else:
            fs.makedirs(posixpath.dirname(dst.path), exist_ok=True)
            fs.mv(self.path, dst.path)

    def delete_dir(self) -> None:
        """Recursively remove this directory (ignore-missing)."""
        fs = self._fs()
        if fs is None:
            import shutil
            shutil.rmtree(self.path, ignore_errors=True)
            return
        import pyarrow.fs as pafs
        try:
            if isinstance(fs, pafs.FileSystem):
                fs.delete_dir(self._strip_scheme())
            else:
                fs.rm(self.path, recursive=True)
        except FileNotFoundError:
            pass

    def list_files(self) -> list[str]:
        """Names (basenames) of plain files directly under this dir."""
        fs = self._fs()
        if fs is None:
            if not os.path.isdir(self.path):
                return []
            return sorted(
                n for n in os.listdir(self.path)
                if os.path.isfile(os.path.join(self.path, n)))
        import pyarrow.fs as pafs
        if isinstance(fs, pafs.FileSystem):
            sel = pafs.FileSelector(self._strip_scheme(), allow_not_found=True)
            return sorted(i.base_name for i in fs.get_file_info(sel)
                          if i.type == pafs.FileType.File)
        if not fs.exists(self.path):
            return []
        return sorted(posixpath.basename(p) for p in fs.ls(self.path))

    def list_files_recursive(self) -> list[str]:
        """Paths relative to this dir, of all files beneath it."""
        fs = self._fs()
        if fs is None:
            out = []
            for root, _dirs, files in os.walk(self.path):
                for n in files:
                    out.append(os.path.relpath(os.path.join(root, n), self.path))
            return sorted(out)
        import pyarrow.fs as pafs
        if isinstance(fs, pafs.FileSystem):
            sel = pafs.FileSelector(self._strip_scheme(), recursive=True,
                                    allow_not_found=True)
            base = self._strip_scheme().rstrip("/") + "/"
            return sorted(i.path[len(base):] for i in fs.get_file_info(sel)
                          if i.type == pafs.FileType.File)
        base = self.path.rstrip("/") + "/"
        return sorted(p[len(base):] for p in fs.find(self.path))

    def file_size(self) -> int:
        fs = self._fs()
        if fs is None:
            return os.path.getsize(self.path)
        import pyarrow.fs as pafs
        if isinstance(fs, pafs.FileSystem):
            return fs.get_file_info(self._strip_scheme()).size
        return fs.size(self.path)

    def list_files_recursive_info(self) -> "list[tuple[str, int]]":
        """(relative path, mtime epoch-ms) for every file beneath this
        dir — ONE listing pass carries the timestamps, so VACUUM FULL
        never pays a per-file stat round-trip on an object store."""
        fs = self._fs()
        if fs is None:
            out = []
            for root, _dirs, files in os.walk(self.path):
                for n in files:
                    p = os.path.join(root, n)
                    out.append((os.path.relpath(p, self.path),
                                int(os.path.getmtime(p) * 1000)))
            return sorted(out)
        import pyarrow.fs as pafs
        if isinstance(fs, pafs.FileSystem):
            sel = pafs.FileSelector(self._strip_scheme(),
                                    recursive=True,
                                    allow_not_found=True)
            base = self._strip_scheme().rstrip("/") + "/"
            return sorted(
                (i.path[len(base):],
                 int(i.mtime.timestamp() * 1000) if i.mtime else 0)
                for i in fs.get_file_info(sel)
                if i.type == pafs.FileType.File)
        base = self.path.rstrip("/") + "/"
        out = []
        for p, info in fs.find(self.path, detail=True).items():
            mt = info.get("mtime") or info.get("LastModified")
            ms = int(mt.timestamp() * 1000) if hasattr(
                mt, "timestamp") else int(mt or 0)
            out.append((p[len(base):], ms))
        return sorted(out)

    def file_mtime_ms(self) -> int:
        """Last-modified time in epoch milliseconds (VACUUM FULL's
        untracked-file retention check keys on this — the only
        timestamp an untracked file has)."""
        fs = self._fs()
        if fs is None:
            return int(os.path.getmtime(self.path) * 1000)
        import pyarrow.fs as pafs
        if isinstance(fs, pafs.FileSystem):
            mt = fs.get_file_info(self._strip_scheme()).mtime
            return int(mt.timestamp() * 1000) if mt else 0
        mt = fs.modified(self.path)
        return int(mt.timestamp() * 1000)

    def __repr__(self) -> str:
        return f"Location({self.url!r})"

    def __eq__(self, other: object) -> bool:
        return (isinstance(other, Location)
                and (self.scheme, self.path) == (other.scheme, other.path))

    def __hash__(self) -> int:
        return hash((self.scheme, self.path))

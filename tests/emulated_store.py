"""In-process emulated object store (S3 model) for commit-protocol
tests — the sandbox has no minio/moto, so this models exactly the
properties that matter for Delta log commits on cloud storage:

- a flat key -> bytes namespace; PUT overwrites unconditionally; there
  are no real directories (mkdir is a no-op, listing is prefix scan);
- NO create-exclusive open — the local O_EXCL trick does not exist, so
  a naive check-then-write commit has a race window (modeled here with
  an injectable delay between the existence check and the write);
- a CONDITIONAL PUT primitive (``put_if_absent``), atomic under the
  store's internal lock — the semantics S3 (If-None-Match: *, 2024)
  and GCS (x-goog-if-generation-match: 0) provide server-side, which
  Location.put_if_absent prefers when the backend exposes it.

The duck-typed surface matches what xdlake_spark.sources.storage uses
on a non-pyarrow filesystem: exists/open/ls/find/rm/mv/makedirs/size/
modified (the fsspec subset), plus ``put_if_absent``.
"""

from __future__ import annotations

import io
import posixpath
import threading
import time
from datetime import datetime, timezone


class EmulatedObjectStore:
    def __init__(self, check_write_delay_s: float = 0.0,
                 conditional_put: bool = True):
        """``check_write_delay_s`` widens the check-then-write race
        window (sleep between a client's exists() and its write —
        object-store PUT latency). ``conditional_put=False`` hides the
        native primitive, forcing Location.put_if_absent onto the
        naive fallback."""
        self._objects: dict[str, bytes] = {}
        self._mtimes: dict[str, float] = {}
        self._lock = threading.Lock()
        self.check_write_delay_s = check_write_delay_s
        self.put_count = 0
        self.conditional_put_count = 0
        if not conditional_put:
            # hide the primitive: storage falls back to exists+write
            self.put_if_absent = None  # type: ignore[assignment]

    @staticmethod
    def _key(path: str) -> str:
        # strip any scheme; keys are flat strings
        if "://" in path:
            path = path.split("://", 1)[1]
        return path.strip("/")

    # -- conditional put (the whole point) -------------------------------

    def put_if_absent(self, path: str, data: bytes) -> None:
        key = self._key(path)
        with self._lock:
            self.conditional_put_count += 1
            if key in self._objects:
                raise FileExistsError(path)
            self._objects[key] = bytes(data)
            self._mtimes[key] = time.time()

    # -- fsspec-ish duck surface used by sources/storage.py ---------------

    def exists(self, path: str) -> bool:
        key = self._key(path)
        with self._lock:
            if key in self._objects:
                return True
            prefix = key + "/"
            return any(k.startswith(prefix) for k in self._objects)

    def open(self, path: str, mode: str = "rb"):
        key = self._key(path)
        if "r" in mode:
            with self._lock:
                if key not in self._objects:
                    raise FileNotFoundError(path)
                return io.BytesIO(self._objects[key])
        store = self

        class _Writer(io.BytesIO):
            def close(self) -> None:
                # the naive client's race window: time passes between
                # its existence check and the PUT landing
                if store.check_write_delay_s:
                    time.sleep(store.check_write_delay_s)
                with store._lock:
                    store._objects[key] = self.getvalue()
                    store._mtimes[key] = time.time()
                    store.put_count += 1
                super().close()
        return _Writer()

    def makedirs(self, path: str, exist_ok: bool = True) -> None:
        pass  # object stores have no directories

    def ls(self, path: str) -> list:
        prefix = self._key(path) + "/"
        with self._lock:
            direct = {k for k in self._objects
                      if k.startswith(prefix)
                      and "/" not in k[len(prefix):]}
            return sorted(direct)

    def find(self, path: str, detail: bool = False):
        prefix = self._key(path) + "/"
        with self._lock:
            keys = sorted(k for k in self._objects
                          if k.startswith(prefix))
            if not detail:
                return keys
            return {k: {"mtime": datetime.fromtimestamp(
                self._mtimes[k], tz=timezone.utc)} for k in keys}

    def rm(self, path: str, recursive: bool = False) -> None:
        key = self._key(path)
        with self._lock:
            if recursive:
                prefix = key + "/"
                for k in [k for k in self._objects
                          if k == key or k.startswith(prefix)]:
                    self._objects.pop(k, None)
                    self._mtimes.pop(k, None)
                return
            if key not in self._objects:
                raise FileNotFoundError(path)
            del self._objects[key]
            self._mtimes.pop(key, None)

    def mv(self, src: str, dst: str) -> None:
        ks, kd = self._key(src), self._key(dst)
        with self._lock:
            self._objects[kd] = self._objects.pop(ks)
            self._mtimes[kd] = self._mtimes.pop(ks, time.time())

    def size(self, path: str) -> int:
        with self._lock:
            return len(self._objects[self._key(path)])

    def modified(self, path: str):
        with self._lock:
            return datetime.fromtimestamp(
                self._mtimes[self._key(path)], tz=timezone.utc)

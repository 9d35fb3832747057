"""Minimal, local-only stand-in for the ``fsspec`` package.

The reference library (and pyarrow's ``FSSpecHandler``) only need a small
filesystem API; this container has no fsspec, which silently skipped the
entire differential suite. The shim implements exactly the surface those
two consumers touch, for the ``file`` protocol only:

- ``fsspec.filesystem(protocol, **options)`` factory
- ``fsspec.AbstractFileSystem`` (isinstance checks inside pyarrow)
- ``fsspec.core.OpenFile`` (annotation references)
- filesystem methods: exists/isdir/isfile/info/ls/listdir/find/mkdir/
  makedirs/rm/rm_file/mv/copy/open/created/modified

Installed into ``sys.modules`` only when the real fsspec is absent, and
only by the differential tests — library code never imports this.
"""

from __future__ import annotations

import io
import os
import shutil
import sys
import types


class AbstractFileSystem:
    protocol: "str | tuple" = "abstract"
    sep = "/"


class LocalFileSystem(AbstractFileSystem):
    protocol = "file"

    @staticmethod
    def _strip(path: str) -> str:
        if path.startswith("file://"):
            path = path[len("file://"):]
        return path or "/"

    # --- predicates -------------------------------------------------------
    def exists(self, path, **kw):
        return os.path.exists(self._strip(path))

    def isdir(self, path, **kw):
        return os.path.isdir(self._strip(path))

    def isfile(self, path, **kw):
        return os.path.isfile(self._strip(path))

    # --- metadata ---------------------------------------------------------
    def info(self, path, **kw):
        p = self._strip(path)
        st = os.stat(p)  # raises FileNotFoundError as fsspec does
        is_dir = os.path.isdir(p)
        return {
            "name": p,
            "size": 0 if is_dir else st.st_size,
            "type": "directory" if is_dir else "file",
            "mtime": st.st_mtime,
        }

    def size(self, path):
        return self.info(path)["size"]

    def created(self, path):
        return None

    def modified(self, path):
        return self.info(path)["mtime"]

    # --- listing ----------------------------------------------------------
    def ls(self, path, detail=False, **kw):
        p = self._strip(path)
        if os.path.isfile(p):
            entries = [p]
        else:
            entries = [os.path.join(p, e) for e in sorted(os.listdir(p))]
        if detail:
            return [self.info(e) for e in entries]
        return entries

    def listdir(self, path, detail=False, **kw):
        return self.ls(path, detail=detail, **kw)

    def find(self, path, maxdepth=None, withdirs=False, detail=False, **kw):
        p = self._strip(path)
        out = {}
        if os.path.isfile(p):
            out[p] = self.info(p)
        else:
            base_depth = p.rstrip("/").count("/")
            for root, dirs, files in os.walk(p):
                if maxdepth is not None \
                        and root.count("/") - base_depth >= maxdepth:
                    dirs[:] = []
                if withdirs and root != p:
                    out[root] = self.info(root)
                for f in sorted(files):
                    fp = os.path.join(root, f)
                    out[fp] = self.info(fp)
        if detail:
            return out
        return sorted(out)

    # --- mutation ---------------------------------------------------------
    def mkdir(self, path, create_parents=True, **kw):
        p = self._strip(path)
        if create_parents:
            os.makedirs(p, exist_ok=False)
        else:
            os.mkdir(p)

    def makedirs(self, path, exist_ok=False):
        os.makedirs(self._strip(path), exist_ok=exist_ok)

    mkdirs = makedirs

    def rm_file(self, path):
        os.remove(self._strip(path))

    delete = rm_file

    def rm(self, path, recursive=False, maxdepth=None):
        paths = path if isinstance(path, (list, tuple)) else [path]
        for p in paths:
            p = self._strip(p)
            if os.path.isdir(p):
                if recursive:
                    shutil.rmtree(p)
                else:
                    os.rmdir(p)
            else:
                os.remove(p)

    def mv(self, path1, path2, recursive=False, **kw):
        shutil.move(self._strip(path1), self._strip(path2))

    def copy(self, path1, path2, recursive=False, **kw):
        p1, p2 = self._strip(path1), self._strip(path2)
        if os.path.isdir(p1):
            shutil.copytree(p1, p2, dirs_exist_ok=True)
        else:
            shutil.copy2(p1, p2)

    # --- IO ---------------------------------------------------------------
    def open(self, path, mode="rb", **kw):
        p = self._strip(path)
        if any(m in mode for m in ("w", "a", "x")):
            parent = os.path.dirname(p)
            if parent and not os.path.isdir(parent):
                os.makedirs(parent, exist_ok=True)
        return open(p, mode)


def filesystem(protocol, **storage_options):
    if protocol in ("file", "local", ""):
        return LocalFileSystem()
    raise ValueError(
        f"fsspec shim supports only the 'file' protocol, not {protocol!r}")


def install() -> types.ModuleType:
    """Register the shim as ``fsspec`` (+``fsspec.core``) in sys.modules."""
    mod = types.ModuleType("fsspec")
    mod.AbstractFileSystem = AbstractFileSystem
    mod.filesystem = filesystem
    mod.__version__ = "0.0.0+xdlake-shim"
    core = types.ModuleType("fsspec.core")
    core.OpenFile = io.IOBase
    mod.core = core
    sys.modules["fsspec"] = mod
    sys.modules["fsspec.core"] = core
    return mod

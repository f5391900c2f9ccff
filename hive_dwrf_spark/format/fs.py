"""Injectable filesystem seam for the DWRF format core.

Everything in the format layer that touches storage — listing data files,
opening them for read or write, stat-ing them for planning caches — routes
through ONE interface so object-store support (s3/gcs/abfs via an
fsspec-compatible filesystem) is a plug, not a rewrite. The default is the
local filesystem, which is what this sandbox exercises; the signatures are
deliberately the fsspec subset (`open(path, mode)`, `size`, `exists`) plus
the two planning hooks the DataSource needs (`list_files`, `stat_key`).

At 100 TB the seam matters twice over: (a) the scan path opens files on
EXECUTORS, so the filesystem object must be picklable or reconstructable
from a registry — hence `set_fs` installs a module-level default that
executors re-import rather than serialize; (b) driver-side planning stats
thousands of footers, so `stat_key` returns the (size, mtime) identity the
footer cache keys on without a second round-trip.

Reference parity: the reference reads through Hadoop's FileSystem
abstraction (ReaderImpl.java takes a Path + FileSystem); this seam is the
Spark-Python analog.
"""

from __future__ import annotations

import os
from typing import BinaryIO


def strip_file_uri(path: str) -> str:
    """Return the os path for a ``file:``-scheme URI; anything else
    passes through unchanged.

    Spark's SQL surfaces (``CREATE TABLE ... USING dwrf LOCATION``,
    warehouse-managed tables, ``INSERT INTO``) hand the Python DataSource
    a Hadoop URI — ``file:/x``, ``file:///x`` — where the read/write API
    hands it a plain os path. Percent-escapes decode per URI rules
    (Hadoop encodes spaces etc.). Non-``file`` schemes (s3://, gs://)
    pass through untouched for an installed fsspec filesystem to route.
    """
    if not isinstance(path, str) or not path.startswith("file:"):
        return path
    # manual parse instead of urlsplit: a '#' or '?' inside the path is a
    # legal filename character in the strings Hadoop produces (Path only
    # percent-encodes a minimal set), and urlsplit would truncate there
    rest = path[len("file:"):]
    if rest.startswith("//"):
        # file://authority/p/a/t/h — only an EMPTY or localhost authority
        # names this machine; silently reinterpreting file://somehost/data
        # as local /data would read/write the wrong path, so refuse it
        slash = rest.find("/", 2)
        authority = rest[2:slash] if slash >= 0 else rest[2:]
        if authority not in ("", "localhost"):
            raise ValueError(
                f"file: URI with remote authority {authority!r} is not a "
                f"local path: {path!r} (only file:///… or "
                "file://localhost/… resolve locally)"
            )
        rest = rest[slash:] if slash >= 0 else "/"
    from urllib.parse import unquote

    return unquote(rest) or path


class LocalFileSystem:
    """Default local-disk implementation (os/open based). ``file:`` URIs
    are accepted everywhere a path is (see strip_file_uri)."""

    def open(self, path: str, mode: str = "rb") -> BinaryIO:
        return open(strip_file_uri(path), mode)

    def size(self, path: str) -> int:
        return os.path.getsize(strip_file_uri(path))

    def exists(self, path: str) -> bool:
        return os.path.exists(strip_file_uri(path))

    def isfile(self, path: str) -> bool:
        return os.path.isfile(strip_file_uri(path))

    def stat_key(self, path: str) -> tuple:
        """Cheap identity for cache keys: changes whenever content may."""
        st = os.stat(strip_file_uri(path))
        return (st.st_size, st.st_mtime_ns)

    def list_files(self, path: str, suffixes: tuple[str, ...]) -> list[str]:
        """All data files under `path` (or [path] if it is one file),
        skipping hidden/underscore names, in sorted walk order."""
        path = strip_file_uri(path)
        if os.path.isfile(path):
            return [path]
        out = []
        for root, _dirs, files in os.walk(path):
            for fn in sorted(files):
                if fn.endswith(suffixes) and not fn.startswith(("_", ".")):
                    out.append(os.path.join(root, fn))
        return out


_FS = LocalFileSystem()


def get_fs():
    """The process-wide filesystem the format layer reads/writes through."""
    return _FS


def set_fs(fs) -> None:
    """Install a filesystem implementation (e.g. an fsspec adapter).

    Must be called on the driver before building plans AND made effective
    on executors (executors re-import this module, so installation there
    happens via a session-conf/bootstrap hook, not pickling)."""
    global _FS
    _FS = fs

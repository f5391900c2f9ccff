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
import re
from typing import BinaryIO

_SCHEME_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://")


def path_scheme(path) -> str | None:
    """The URI scheme of `path` (``s3``, ``gs``, …) or None for plain
    os paths and ``file:`` URIs (both resolve to the local default)."""
    if not isinstance(path, str):
        return None
    m = _SCHEME_RE.match(path)
    if m is None or m.group(1) == "file":
        return None
    return m.group(1)


def join_path(base: str, *parts: str) -> str:
    """Scheme-preserving path join: plain '/' concatenation, safe for
    both os paths and object-store URIs (os.path.join/normpath would
    collapse the '//' in 's3://bucket')."""
    out = base.rstrip("/")
    for p in parts:
        p = str(p).strip("/")
        if p:
            out += "/" + p
    return out


def rel_subpath(child: str, base: str) -> str:
    """The subpath of `child` under `base` ('' when equal) as pure string
    algebra — the URI-safe replacement for os.path.relpath (normpath
    would mangle 'scheme://'). Raises when child is not under base."""
    b = base.rstrip("/")
    c = child.rstrip("/")
    if c == b:
        return ""
    if c.startswith(b + "/"):
        return c[len(b) + 1 :]
    raise ValueError(f"{child!r} is not under {base!r}")


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

    def mtime_ns(self, path: str) -> int:
        """Last-modified time in ns — the streaming source's file-age
        clock (offset retirement watermark; see streaming/dwrf_stream)."""
        return os.stat(strip_file_uri(path)).st_mtime_ns

    def makedirs(self, path: str) -> None:
        """Ensure a directory exists (no-op hierarchy on object stores —
        a key-value namespace needs no mkdir; local disk needs it before
        open(..., 'wb') of a file inside)."""
        os.makedirs(strip_file_uri(path), exist_ok=True)

    def remove(self, path: str) -> None:
        """Delete one file (object DELETE); missing files are not an
        error (overwrite-commit cleanup races are benign)."""
        try:
            os.remove(strip_file_uri(path))
        except FileNotFoundError:
            pass

    def replace(self, src: str, dst: str) -> None:
        """Atomically move src over dst (manifest-compaction commit
        point). OPTIONAL in the seam: filesystems without rename may omit
        it and callers fall back to a single whole-object overwrite,
        which object stores make atomic at the PUT level."""
        os.replace(strip_file_uri(src), strip_file_uri(dst))

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
_DEFAULT_IS_STOCK = True  # flips false once set_fs installs a user default
_SCHEME_FS: dict[str, object] = {}
_FACTORY_FS: dict[tuple, object] = {}


def _fs_env_signature() -> tuple:
    """The SPARK_GRAFT_FS* environment as a hashable cache key component.

    Reused Spark Python workers run MANY jobs; each distributed format
    job re-applies its own env overlay (compact_table task closures,
    DataSource __init__ snapshots) before touching storage. Keying the
    factory cache on the env that was live at resolution time means two
    jobs sharing a worker but configured with different factory settings
    (e.g. different SPARK_GRAFT_FS_MAPPED_ROOT) each get a filesystem
    built under THEIR config instead of whichever job ran first."""
    return tuple(
        sorted(
            (k, v)
            for k, v in os.environ.items()
            if k.startswith("SPARK_GRAFT_FS")
        )
    )


def get_fs(path: str | None = None):
    """The filesystem the format layer reads/writes `path` through.

    Resolution order:
      1. no scheme / ``file:`` scheme -> the process default (set_fs);
      2. a scheme registered in-process via ``register_fs`` (driver-side
         explicit install);
      3. a scheme named in ``SPARK_GRAFT_FS_FACTORIES`` — a comma list of
         ``scheme=module:callable`` entries; the callable is imported and
         invoked once per (scheme, spec, fs-env) combination and cached.
         This is the EXECUTOR propagation path: workers re-import this
         module rather than deserialize a filesystem object, so a factory
         spec (plain env string, shippable via spark.executorEnv.* or a
         task closure's os.environ.update) is how every process converges
         on the same routing. compact_table forwards the driver's
         SPARK_GRAFT_FS* environment into its merge tasks for exactly
         this reason.
      4. a user-installed process default (set_fs) — it may route schemes
         itself (an fsspec adapter keyed on URL);
      5. otherwise ERROR. The stock local default must never swallow an
         unrouted object-store URI: open('s3://b/t') would collapse to a
         cwd-relative './s3:/b/t' directory, so a distributed write
         "succeeds" locally on each worker and the data is simply gone
         when the workers are torn down. An executor missing the factory
         env, or a typo'd scheme, fails loudly instead."""
    scheme = path_scheme(path)
    if scheme is None:
        return _FS
    if scheme in _SCHEME_FS:
        return _SCHEME_FS[scheme]
    specs = os.environ.get("SPARK_GRAFT_FS_FACTORIES", "")
    for entry in specs.split(","):
        entry = entry.strip()
        if entry and entry.split("=", 1)[0] == scheme:
            key = (scheme, entry, _fs_env_signature())
            fs = _FACTORY_FS.get(key)
            if fs is None:
                import importlib

                mod, _, attr = entry.split("=", 1)[1].partition(":")
                fs = getattr(importlib.import_module(mod), attr)()
                _FACTORY_FS[key] = fs
            return fs
    if _DEFAULT_IS_STOCK:
        raise ValueError(
            f"no filesystem registered for scheme {scheme!r} "
            f"(path {path!r}): install one via register_fs/set_fs or a "
            "SPARK_GRAFT_FS_FACTORIES entry 'scheme=module:callable' "
            "(on executors, set it in the worker environment, e.g. "
            "spark.executorEnv.SPARK_GRAFT_FS_FACTORIES)"
        )
    return _FS


def register_fs(scheme: str, fs) -> None:
    """Install a filesystem for one URI scheme in THIS process (driver-
    side explicit form of the SPARK_GRAFT_FS_FACTORIES env routing; for
    executors use the env spec — see get_fs)."""
    _SCHEME_FS[scheme] = fs


def set_fs(fs) -> None:
    """Install the process-default filesystem (e.g. an fsspec adapter).

    Must be called on the driver before building plans AND made effective
    on executors (executors re-import this module, so installation there
    happens via the SPARK_GRAFT_FS_FACTORIES env hook, not pickling).

    A user default is trusted to route non-file schemes itself (get_fs
    resolution order #4); passing the stock LocalFileSystem restores the
    strict unknown-scheme error."""
    global _FS, _DEFAULT_IS_STOCK
    _FS = fs
    _DEFAULT_IS_STOCK = type(fs) is LocalFileSystem


def fs_env_overlay() -> dict[str, str]:
    """The SPARK_GRAFT_FS* environment entries of this process — the
    driver-side routing config a distributed job forwards into its task
    closures (os.environ.update on the worker) so executors resolve the
    same schemes (see get_fs resolution order #3)."""
    return {
        k: v for k, v in os.environ.items() if k.startswith("SPARK_GRAFT_FS")
    }

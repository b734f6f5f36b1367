"""Temp-path helpers for the driver-contract queries.

Two kinds of scratch data:

* ``pid_tmp_root`` — per-process store/index roots (a query and its
  re-runs overwrite their own copy; other processes never read it).
  Registered for ``atexit`` removal so repeated grading runs don't
  accumulate one copy per pid in /tmp.
* ``ensure_shared_parquet`` — a SHARED materialized corpus read by both
  the Spark query and the DuckDB oracle SQL (possibly from different
  processes, so the path must be stable and never pid-scoped).  Writes go
  to a pid-scoped staging directory followed by one atomic rename, so a
  concurrent reader can never observe a half-written directory; content
  is a pure deterministic function of (seed, n), so whichever writer wins
  the rename produced identical bytes.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil
import tempfile

_registered: set[str] = set()


def pid_tmp_root(prefix: str, sf_dir: str) -> str:
    """Stable-within-process scratch root, removed at interpreter exit."""
    tag = hashlib.blake2b(f"{sf_dir}:{os.getpid()}".encode(), digest_size=6).hexdigest()
    root = f"{tempfile.gettempdir()}/{prefix}_{tag}"
    if root not in _registered:
        _registered.add(root)
        atexit.register(shutil.rmtree, root, ignore_errors=True)
    return root


def ensure_shared_parquet(path: str, write_fn) -> None:
    """Materialize a shared parquet directory exactly once, atomically.

    ``write_fn(staging_path)`` must write a complete parquet directory
    (with _SUCCESS) at the given path; it is invoked only when ``path``
    does not already hold a committed copy."""
    if os.path.exists(f"{path}/_SUCCESS"):
        return
    staging = f"{path}.stage{os.getpid()}"
    shutil.rmtree(staging, ignore_errors=True)
    write_fn(staging)
    try:
        os.rename(staging, path)
    except OSError:
        if os.path.exists(f"{path}/_SUCCESS"):
            # another process won the rename with identical deterministic
            # bytes — our copy is redundant
            shutil.rmtree(staging, ignore_errors=True)
            return
        # the destination is a half-written leftover from a CRASHED prior
        # writer (exists, no _SUCCESS): replace it, don't leave it to
        # poison every future read
        shutil.rmtree(path, ignore_errors=True)
        try:
            os.rename(staging, path)
        except OSError:
            shutil.rmtree(staging, ignore_errors=True)

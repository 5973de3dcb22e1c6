"""Shared JSON-sidecar commit protocol for the layout/index
maintenance operators (z-order layout, per-file Bloom index).

One sidecar file per directory carries the operator's contract
(grid bounds, bitmap geometry, replay marker, current bits-table
pointer). Commits are:

- **atomic**: write to a temp name, fsync, ``os.replace`` — a reader
  sees the old or the new contract, never a partial one;
- **mutually excluded** (:func:`guarded_write`): an ``fcntl.flock``
  on a sibling ``<sidecar>.lock`` file is held across the whole
  read-check-replace sequence, so on one host two racing maintenance
  writers serialize at the kernel and the CAS check below is
  *unconditional* — there is no interleave in which both writers pass
  the check and the second silently replaces the first;
- **optimistic-CAS**: the writer passes the raw text it READ at
  entry; if the file changed since, another maintenance writer
  committed in between and this writer's merge is stale — committing
  it would silently REPLACE the other's contract (for Bloom bits that
  is a false-NEGATIVE class: probes miss committed rows). The
  conflict raises instead. Every guarded commit also bumps a
  ``_cas_rev`` counter derived from the on-disk text, so even a
  commit whose payload is byte-identical to the current contract (a
  touch-commit, or an append whose delta added zero new bits) still
  changes the file's bytes — a concurrent writer's stale token can
  therefore NEVER pass the equality check, closing the
  byte-identical-rewrite blind spot.

The contract stays exactly one maintenance writer per directory (fan
sources into one stream); the lock + rev bump make violations of
that contract surface deterministically instead of best-effort. The
flock is advisory and single-host — writers on different hosts
against shared storage still rely on the CAS text check, whose
window is microseconds (the expensive Spark-side merge happens
before the check).

The returned CAS token is ``json.dumps(committed_meta)`` —
byte-identical to what landed on disk — NOT a post-write re-read:
re-reading would hand a racing writer's just-landed commit back to
the stale writer as its own token, letting its NEXT commit pass the
check (the TOCTOU the token exists to close).
"""

from __future__ import annotations

import json
import os
import uuid
from contextlib import contextmanager

try:  # POSIX; the sandbox and any real cluster host have it
    import fcntl
except ImportError:  # pragma: no cover - non-POSIX fallback
    fcntl = None  # type: ignore[assignment]

#: Reserved field bumped by every guarded commit (see module doc).
REV_FIELD = "_cas_rev"


def read_raw(path: str, filename: str) -> str:
    with open(os.path.join(path, filename), encoding="utf-8") as f:
        return f.read()


def write(path: str, filename: str, meta: dict) -> None:
    target = os.path.join(path, filename)
    tmp = target + f".tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(meta, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, target)


@contextmanager
def _commit_lock(path: str, filename: str):
    """Exclusive advisory lock held across read-check-replace."""
    if fcntl is None:  # pragma: no cover - non-POSIX: CAS-only mode
        yield
        return
    lock_path = os.path.join(path, filename + ".lock")
    fd = os.open(lock_path, os.O_CREAT | os.O_RDWR, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        yield
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)


def guarded_write(
    path: str, filename: str, meta: dict, expected_raw: str, what: str
) -> str:
    """Locked CAS commit: refuse if the sidecar changed since
    ``expected_raw`` was read (see module docstring). ``what`` names
    the operator for the error text. Returns the committed text as
    the caller's next token."""
    with _commit_lock(path, filename):
        cur = read_raw(path, filename)
        if cur != expected_raw:
            raise RuntimeError(
                f"{what} at {path!r}: sidecar changed mid-operation — a "
                "concurrent maintenance writer committed; committing this "
                "writer's stale state would silently REPLACE the other's "
                "(for Bloom bits: false negatives). Run exactly ONE "
                "maintenance writer per directory (fan sources into a "
                "single stream) and retry."
            )
        try:
            prev_rev = int(json.loads(cur).get(REV_FIELD, 0))
        except (ValueError, TypeError, AttributeError):
            prev_rev = 0
        committed = dict(meta)
        committed[REV_FIELD] = prev_rev + 1
        write(path, filename, committed)
        return json.dumps(committed)

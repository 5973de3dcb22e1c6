"""Shared JSON-sidecar commit protocol for the layout/index
maintenance operators (z-order layout, per-file Bloom index).

One sidecar file per directory carries the operator's contract
(grid bounds, bitmap geometry, replay marker, current bits-table
pointer). Commits are:

- **atomic**: write to a temp name, fsync, ``os.replace`` — a reader
  sees the old or the new contract, never a partial one;
- **optimistic-CAS** (:func:`guarded_write`): the writer passes the
  raw text it READ at entry; if the file changed since, another
  maintenance writer committed in between and this writer's merge is
  stale — committing it would silently REPLACE the other's contract
  (for Bloom bits that is a false-NEGATIVE class: probes miss
  committed rows). The conflict raises instead. The check-then-replace
  window is microseconds (the expensive Spark-side merge happens
  before the check), so this is fail-fast DETECTION of a violated
  single-writer contract, not a lock — the contract stays exactly one
  maintenance writer per directory (fan sources into one stream).

The returned CAS token is ``json.dumps(meta)`` — byte-identical to
what :func:`write` put on disk — NOT a post-write re-read: re-reading
would hand a racing writer's just-landed commit back to the stale
writer as its own token, letting its NEXT commit pass the check (the
TOCTOU the token exists to close).
"""

from __future__ import annotations

import json
import os
import uuid


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


def guarded_write(
    path: str, filename: str, meta: dict, expected_raw: str, what: str
) -> str:
    """CAS commit: refuse if the sidecar changed since ``expected_raw``
    was read (see module docstring). ``what`` names the operator for
    the error text. Returns the committed text as the caller's next
    token."""
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
    write(path, filename, meta)
    return json.dumps(meta)

"""Engine service discovery — the Kyuubi-HA / ZooKeeper namespace analog.

The reference platform runs Kyuubi behind a ZooKeeper ensemble: each
engine registers an EPHEMERAL node under a service namespace, clients
list the namespace to find a live engine, and an engine that dies
takes its node with it (``internal/controller/zookeeper.go:104-141``;
the HA wiring in ``kyuubi.go``). No ZooKeeper exists in this
environment, so the same CONTRACT is implemented over a shared
filesystem directory:

- **registration** — one JSON file per engine, written atomically
  (tmp + ``os.replace``), carrying endpoint + load + payload.
- **ephemerality** — a TTL heartbeat: the owner atomically rewrites
  its file (fresh mtime + current load); a SIGKILL'd engine stops
  heartbeating and its entry EXPIRES after ``ttl_s`` exactly like a
  ZK session timeout. Readers treat mtime-stale files as absent and
  may lazily evict them (``evict_stale``), so crash garbage never
  accumulates.
- **selection** — ``pick()`` is deterministic least-``load`` (ties by
  engine id), so every uncoordinated client converges on the same
  engine for the same registry state — no thundering re-elections.

On a real deployment the "shared directory" is the one thing every
engine and client already shares (the warehouse filesystem), which is
also exactly the scope the reference's ZK namespace covers: one
namespace per warehouse. In-process scale limits (dozens of engines,
not thousands) match the reference's engine-pool sizes.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass


class NoLiveEngine(RuntimeError):
    """Raised by ``pick()`` when no registration is live."""


@dataclass(frozen=True)
class EngineInfo:
    engine_id: str
    endpoint: str
    load: int
    payload: dict
    registered_at: float
    age_s: float


class Registration:
    """Owner-side handle: heartbeat keeps the entry live, deregister
    removes it immediately (the clean-shutdown path; crash relies on
    TTL expiry instead)."""

    def __init__(self, registry: "ServiceRegistry", engine_id: str,
                 endpoint: str, payload: dict):
        self._registry = registry
        self.engine_id = engine_id
        self.endpoint = endpoint
        self.payload = payload
        self.registered_at = time.time()
        self._write(load=0)

    def _path(self) -> str:
        return self._registry._entry_path(self.engine_id)

    def _write(self, load: int) -> None:
        body = {
            "engine_id": self.engine_id,
            "endpoint": self.endpoint,
            "load": int(load),
            "payload": self.payload,
            "registered_at": self.registered_at,
        }
        tmp = self._path() + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(json.dumps(body))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._path())

    def heartbeat(self, load: int = 0) -> None:
        """Refresh liveness (fresh mtime) and report current load —
        one atomic rewrite, never a partial file."""
        self._write(load=load)

    def deregister(self) -> None:
        try:
            os.remove(self._path())
        except FileNotFoundError:
            pass


class ServiceRegistry:
    """Discovery namespace rooted at a shared directory.

    ``ttl_s`` is the ZK-session-timeout analog: an entry whose file
    mtime is older than this is dead to every reader, whatever its
    content says."""

    def __init__(self, root: str, ttl_s: float = 10.0):
        if ttl_s <= 0:
            raise ValueError(f"ttl_s must be positive, got {ttl_s}")
        self.root = root
        self.ttl_s = float(ttl_s)
        os.makedirs(root, exist_ok=True)

    def _entry_path(self, engine_id: str) -> str:
        if not engine_id or "/" in engine_id or engine_id.startswith("."):
            raise ValueError(f"invalid engine_id: {engine_id!r}")
        return os.path.join(self.root, engine_id + ".json")

    def register(self, engine_id: str, endpoint: str,
                 payload: dict | None = None) -> Registration:
        return Registration(self, engine_id, endpoint, dict(payload or {}))

    def list_live(self) -> list[EngineInfo]:
        """All live registrations, sorted by (load, engine_id) — the
        pick order. Stale and torn entries are skipped (a reader racing
        an atomic replace sees either version, never a partial)."""
        now = time.time()
        out: list[EngineInfo] = []
        try:
            names = os.listdir(self.root)
        except FileNotFoundError:
            return []
        for name in names:
            if not name.endswith(".json"):
                continue
            path = os.path.join(self.root, name)
            try:
                age = now - os.stat(path).st_mtime
                if age > self.ttl_s:
                    continue
                with open(path, encoding="utf-8") as f:
                    body = json.load(f)
                info = EngineInfo(
                    engine_id=str(body.get("engine_id", name[:-5])),
                    endpoint=str(body.get("endpoint", "")),
                    load=int(body.get("load", 0)),
                    payload=dict(body.get("payload", {})),
                    registered_at=float(body.get("registered_at", 0.0)),
                    age_s=age,
                )
            except Exception:
                # deleted/replaced mid-listing, a crashed writer's
                # leftover, OR well-formed-JSON-of-the-wrong-shape /
                # non-UTF-8 garbage (r11 review finding: a single
                # `5`-bodied file raised AttributeError out of
                # list_live and bricked pick() for every client) —
                # ALL equivalent to "not registered"
                continue
            out.append(info)
        out.sort(key=lambda e: (e.load, e.engine_id))
        return out

    def pick(self) -> EngineInfo:
        """Deterministic least-loaded live engine (ties by id)."""
        live = self.list_live()
        if not live:
            raise NoLiveEngine(f"no live engine under {self.root}")
        return live[0]

    def evict_stale(self) -> list[str]:
        """Remove expired entry files (lazy GC — correctness never
        depends on it; ``list_live`` already ignores stale entries).
        Returns evicted engine ids. A stat→remove race with a
        concurrent heartbeat could delete a JUST-refreshed file, but
        only for an owner that was silent a full ttl and revived at
        that exact instant — and it self-heals: the owner's next
        heartbeat rewrites the complete entry unconditionally.

        Also sweeps ``*.json.tmp.*`` debris left by a writer that
        crashed between creating its tmp file and the atomic replace —
        without this, the "crash garbage never accumulates" contract
        held for entries but not for the staging files themselves. The
        same TTL applies: a tmp younger than ``ttl_s`` may belong to a
        writer mid-replace and is left alone."""
        now = time.time()
        evicted: list[str] = []
        try:
            names = os.listdir(self.root)
        except FileNotFoundError:
            return []
        for name in names:
            is_entry = name.endswith(".json")
            is_tmp = ".json.tmp." in name
            if not (is_entry or is_tmp):
                continue
            path = os.path.join(self.root, name)
            try:
                if now - os.stat(path).st_mtime > self.ttl_s:
                    os.remove(path)
                    if is_entry:
                        evicted.append(name[:-5])
            except (FileNotFoundError, OSError):
                continue
        return evicted

"""The shared sidecar commit protocol (``operators/_sidecar.py``).

The r15 verdict's one hardening ask: the CAS used to be fail-fast
*detection* with a microsecond check-then-replace window — two
writers that both passed ``read_raw`` could both commit, last-write
silently winning (exactly the lost-bits class the CAS exists to
catch). The protocol now holds an ``fcntl.flock`` across the whole
read-check-replace AND bumps a ``_cas_rev`` field on every guarded
commit, so:

1. same-host writers serialize — the hammer test below proves that
   across processes, every successful commit owns exactly one rev
   (final rev == total successes; a silent replace would leave
   rev < successes);
2. a byte-identical payload (touch-commit; append whose delta adds
   zero new bits) still changes the file bytes, so a stale token can
   never slip past the equality check.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os

import pytest

from nineinfra_spark.operators import _sidecar

FN = "_meta.json"


def _hammer_worker(path: str, worker: int, target: int, out, barrier):
    """Commit ``target`` guarded writes, retrying CAS conflicts with a
    freshly-read token (the documented retry protocol). ``barrier``
    synchronizes the loop start across processes — without it a
    staggered process launch can serialize the workers entirely and
    the contention the test exists to exercise never happens."""
    barrier.wait(timeout=60)
    successes = 0
    conflicts = 0
    while successes < target:
        raw = _sidecar.read_raw(path, FN)
        try:
            _sidecar.guarded_write(
                path, FN, {"owner": worker, "n": successes}, raw, "hammer"
            )
            successes += 1
        except RuntimeError:
            conflicts += 1
    out.put((worker, successes, conflicts))


class TestGuardedWriteExclusion:
    def test_two_process_hammer_no_silent_replace(self, tmp_path):
        """4 processes x 50 committed writes against one sidecar: the
        final ``_cas_rev`` must equal the total number of successful
        commits — every success owns exactly one rev generation. Under
        the old unlocked check-then-replace, two writers could pass the
        same check and both stamp rev n+1 (one replace silent), leaving
        rev < successes."""
        path = str(tmp_path)
        _sidecar.write(path, FN, {"owner": -1, "n": -1})
        nproc, target = 4, 50
        out = mp.Queue()
        barrier = mp.Barrier(nproc)
        procs = [
            mp.Process(
                target=_hammer_worker, args=(path, w, target, out, barrier)
            )
            for w in range(nproc)
        ]
        for p in procs:
            p.start()
        results = [out.get(timeout=120) for _ in range(nproc)]
        for p in procs:
            p.join(timeout=30)
            assert p.exitcode == 0
        total = sum(s for _, s, _ in results)
        assert total == nproc * target
        final = json.loads(_sidecar.read_raw(path, FN))
        assert final[_sidecar.REV_FIELD] == total
        # contention actually happened (the start barrier makes all
        # four loops begin together, so zero overlap would require
        # each read-token→commit pair to be effectively atomic across
        # 200 commits — if that ever trips on a 1-core box, weaken to
        # a skip, not a pass)
        assert sum(c for _, _, c in results) > 0

    def test_rev_monotone_single_writer(self, tmp_path):
        path = str(tmp_path)
        _sidecar.write(path, FN, {"v": 0})
        raw = _sidecar.read_raw(path, FN)
        for i in range(1, 4):
            raw = _sidecar.guarded_write(path, FN, {"v": i}, raw, "t")
            assert json.loads(raw)[_sidecar.REV_FIELD] == i
        # token is byte-identical to disk (the no-re-read contract)
        assert raw == _sidecar.read_raw(path, FN)


class TestByteIdenticalCommits:
    def test_touch_commit_trips_stale_token(self, tmp_path):
        """A payload-identical commit (compact's touch-commit; an
        append whose delta adds zero new bits) must STILL invalidate a
        token read before it — the r15 ADVICE blind spot."""
        path = str(tmp_path)
        meta = {"bits_dir": "b_0", "m_bits": 64}
        _sidecar.write(path, FN, meta)
        stale = _sidecar.read_raw(path, FN)
        # writer A touch-commits the SAME payload
        _sidecar.guarded_write(path, FN, dict(meta), stale, "A")
        # writer B holds the pre-touch token: must conflict, not pass
        with pytest.raises(RuntimeError, match="concurrent maintenance"):
            _sidecar.guarded_write(path, FN, {"owner": "B"}, stale, "B")

    def test_repeated_touch_commits_each_bump(self, tmp_path):
        path = str(tmp_path)
        _sidecar.write(path, FN, {"x": 1})
        raw = _sidecar.read_raw(path, FN)
        seen = {raw}
        for _ in range(3):
            raw = _sidecar.guarded_write(path, FN, {"x": 1}, raw, "t")
            assert raw not in seen  # bytes change every commit
            seen.add(raw)

    def test_unguarded_write_resets_then_guard_resumes(self, tmp_path):
        """Initial ``write`` carries no rev; the first guarded commit
        starts the counter at 1 and legacy sidecars (pre-rev files)
        keep working."""
        path = str(tmp_path)
        _sidecar.write(path, FN, {"legacy": True})
        raw = _sidecar.read_raw(path, FN)
        assert _sidecar.REV_FIELD not in json.loads(raw)
        out = _sidecar.guarded_write(path, FN, {"legacy": False}, raw, "t")
        assert json.loads(out)[_sidecar.REV_FIELD] == 1

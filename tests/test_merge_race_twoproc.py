"""Two-PROCESS versioned-merge race (VERDICT r7 item #3).

The reference's multi-tenant gateway (``internal/controller/
kyuubi.go:189-203``) implies independent driver processes racing on
one metastore. The embedded Derby metastore is single-JVM (no
derbynet in the Spark distribution), so the honest in-env version of
that race goes through the gateway tier exactly as Kyuubi tenants do:

- HOST subprocess: Engine with hive metastore + REST frontend, running
  K native ``merge_into_table_versioned`` calls in its main thread.
- CLIENT (this pytest process, no JVM): races M SQL-protocol merges
  through ``POST /api/v1/sql`` — CTAS the merged relation, then the
  SAME archive-rename CAS + publish rename, with optimistic retry.

Both writers contend on the one metastore head. Success = every
writer's row lands, version numbers strictly increasing and never
reused (each CAS won exactly once; gaps are legal — the torn-read
rollback can burn a number), and ``recover_versioned_table``
afterwards is a no-op ("clean").
"""

from __future__ import annotations

import pytest

import json
import secrets
import socket
import subprocess
import sys
import time
import urllib.error
import urllib.request

# multi-process race: two-writer versioned merge — excluded from the default lane (see pytest.ini), run via -m slow
pytestmark = pytest.mark.slow

K_HOST = 5  # native merges in the host process
M_CLIENT = 5  # SQL-protocol merges from this process


def _free_port() -> int:
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


_HOST_SCRIPT = """
import os, sys
from nineinfra_spark.engine import Engine, EngineConfig
from nineinfra_spark.operators.merge import (
    list_versions, merge_into_table_versioned, recover_versioned_table,
)

root, port, k_host = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
eng = Engine(EngineConfig(
    app_name="merge_race_host", master="local[4]",
    warehouse_dir=os.path.join(root, "warehouse"),
    hive_metastore=True,
    metastore_dir=os.path.join(root, "metastore_db"),
    rest_port=port,
)).open()
spark = eng.spark
spark.createDataFrame([(0, "base")], "id long, tag string").write.saveAsTable(
    "race_tbl"
)
print("HOST_READY", flush=True)

import traceback
try:
    for i in range(k_host):
        upd = spark.createDataFrame(
            [(1000 + i, f"host-{i}")], "id long, tag string"
        )
        merge_into_table_versioned(spark, "race_tbl", upd, ["id"], max_retries=200)
except BaseException as exc:
    # surface the PYTHON-side classification failure on stdout, where
    # the parent's assertion message can show it (stderr tail is all
    # Java stack frames)
    print("HOST_MERGE_FAIL|" + type(exc).__name__ + "|" + str(exc)[:800].replace(chr(10), " / "), flush=True)
    traceback.print_exc()
    raise
print("HOST_MERGES_DONE", flush=True)

sys.stdin.readline()  # wait until the client finished its merges

state = recover_versioned_table(spark, "race_tbl")
ids = sorted(r["id"] for r in spark.table("race_tbl").collect())
versions = list_versions(spark, "race_tbl")
print(
    "FINAL|" + state + "|" + ",".join(map(str, ids))
    + "|" + ",".join(map(str, versions)),
    flush=True,
)
eng.close()
"""


def _rest_sql(port: int, sql: str) -> dict:
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/v1/sql",
        data=json.dumps({"sql": sql}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read())


#: Transient transport failures whose OUTCOME IS UNKNOWN (the statement
#: may or may not have applied) — the client must reconcile from state,
#: not blindly retry a rename.
_TRANSIENT = (TimeoutError, ConnectionError, OSError)


def _row_landed(port: int, new_id: int, tag: str) -> bool:
    out = _rest_sql(
        port,
        f"SELECT COUNT(*) AS n FROM race_tbl "
        f"WHERE id = {new_id} AND tag = '{tag}'",
    )
    return out["rows"][0][0] == 1


def _table_exists(port: int, name: str) -> bool:
    out = _rest_sql(port, "SHOW TABLES")
    idx = out["columns"].index("tableName")
    return any(row[idx] == name for row in out["rows"])


def _client_versions(port: int) -> list[int]:
    out = _rest_sql(port, "SHOW TABLES")
    name_idx = out["columns"].index("tableName")
    vs = []
    for row in out["rows"]:
        tn = row[name_idx]
        if tn.startswith("race_tbl__v") and tn[len("race_tbl__v"):].isdigit():
            vs.append(int(tn[len("race_tbl__v"):]))
    return sorted(vs)


def _reconcile_after_unknown(port: int, new_id: int, tag: str, stage: str) -> bool:
    """A rename's transport failed with UNKNOWN outcome. Decide from
    observable state: merged row present → done (True). Live table
    back → we lost or never applied → drop our stage, retry (False).
    Live persistently missing with our stage intact → our archive CAS
    won (the host is never between its own renames for seconds) →
    publish our stage."""
    deadline = time.time() + 120
    misses = 0
    while time.time() < deadline:
        try:
            if _table_exists(port, "race_tbl"):
                if _row_landed(port, new_id, tag):
                    return True
                _rest_sql(port, f"DROP TABLE IF EXISTS {stage}")
                return False
            misses += 1
            if misses >= 3 and _table_exists(port, stage):
                _rest_sql(port, f"ALTER TABLE {stage} RENAME TO race_tbl")
                return True
        except (urllib.error.HTTPError, *_TRANSIENT):
            pass
        time.sleep(2)
    raise AssertionError(f"reconcile for id={new_id}: state never settled")


def _client_backoff(attempt: int) -> None:
    """Jittered exponential backoff — fixed short sleeps livelock
    against the host's own retry loop under CPU load (observed: 200
    attempts burned in lockstep while the host held the head)."""
    import random

    time.sleep(min(1.0, 0.05 * (2 ** min(attempt, 4))) * (0.5 + random.random()))


def _client_merge(port: int, new_id: int, tag: str) -> None:
    """One SQL-protocol versioned merge: CTAS merged relation, archive
    CAS, publish — optimistic retry on any step lost to the host, and
    state reconciliation when a step's outcome is unknown."""
    last_err = None
    for _attempt in range(200):
        stage = f"race_tbl__stage_{secrets.token_hex(6)}"
        try:
            versions = _client_versions(port)
            version = (max(versions) + 1) if versions else 0
            _rest_sql(
                port,
                f"CREATE TABLE {stage} AS "
                f"SELECT * FROM race_tbl WHERE NOT (id = {new_id}) "
                f"UNION ALL SELECT CAST({new_id} AS BIGINT) AS id, "
                f"'{tag}' AS tag",
            )
        except urllib.error.HTTPError as e:
            # live name briefly missing (host between its two renames)
            last_err = ("ctas", e.read()[:400])
            _client_backoff(_attempt)
            continue
        except _TRANSIENT:
            time.sleep(1)
            continue  # reads/CTAS are safe to blind-retry (fresh stage)
        try:
            _rest_sql(port, f"ALTER TABLE race_tbl RENAME TO race_tbl__v{version}")
        except urllib.error.HTTPError as e:
            last_err = ("cas", e.read()[:400])
            _rest_sql(port, f"DROP TABLE IF EXISTS {stage}")
            _client_backoff(_attempt)
            continue
        except _TRANSIENT:
            if _reconcile_after_unknown(port, new_id, tag, stage):
                return
            continue
        # TORN-BASE-READ GUARD, SQL-tenant form (r16; mirrors the
        # engine's post-CAS provenance check in operators/merge.py):
        # the CTAS read can resolve the live name inside a concurrent
        # publish's metastore-commit/directory-move window and scan it
        # as EMPTY — the stage is then missing every pre-existing row,
        # yet the archive CAS wins on a fresh version number. The
        # archive this client just renamed is quiescent and exactly
        # what the CTAS must have read, so the non-merged row counts
        # must agree; on mismatch, un-archive and retry.
        try:
            n_arch = _rest_sql(
                port,
                f"SELECT COUNT(*) AS n FROM race_tbl__v{version} "
                f"WHERE NOT (id = {new_id})",
            )["rows"][0][0]
            n_stage = _rest_sql(
                port,
                f"SELECT COUNT(*) AS n FROM {stage} "
                f"WHERE NOT (id = {new_id})",
            )["rows"][0][0]
        except (urllib.error.HTTPError, *_TRANSIENT):
            if _reconcile_after_unknown(port, new_id, tag, stage):
                return
            continue
        if n_arch != n_stage:
            last_err = ("torn-read", f"stage={n_stage} archive={n_arch}")
            try:
                _rest_sql(
                    port,
                    f"ALTER TABLE race_tbl__v{version} RENAME TO race_tbl",
                )
            except (urllib.error.HTTPError, *_TRANSIENT):
                # rollback outcome unknown: reconcile decides
                if _reconcile_after_unknown(port, new_id, tag, stage):
                    return
                continue
            _rest_sql(port, f"DROP TABLE IF EXISTS {stage}")
            _client_backoff(_attempt)
            continue
        try:
            _rest_sql(port, f"ALTER TABLE {stage} RENAME TO race_tbl")
        except (urllib.error.HTTPError, *_TRANSIENT):
            # CAS was WON — never abandon; publish must roll forward
            if _reconcile_after_unknown(port, new_id, tag, stage):
                return
            continue
        return
    raise AssertionError(
        f"client merge for id={new_id} never won the CAS; last_err={last_err}"
    )


def test_two_process_merge_race(tmp_path):
    port = _free_port()
    # Host stderr goes to a FILE, not a pipe: Spark's logging fills a
    # 64K pipe buffer long before the race finishes, blocking the host
    # JVM mid-merge (observed as client-side REST timeouts).
    err_path = tmp_path / "host_stderr.log"
    err_f = open(err_path, "w")
    proc = subprocess.Popen(
        [sys.executable, "-c", _HOST_SCRIPT, str(tmp_path), str(port), str(K_HOST)],
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
        stderr=err_f,
        text=True,
        cwd="/root/repo",
    )
    try:
        # wait for the host's table + REST frontend
        deadline = time.time() + 180
        ready = False
        while time.time() < deadline:
            line = proc.stdout.readline()
            if "HOST_READY" in line:
                ready = True
                break
            if proc.poll() is not None:
                break
        assert ready, (
            f"host never became ready: {err_path.read_text()[-3000:]}"
        )

        # race the host's native merges with SQL-protocol merges
        for j in range(M_CLIENT):
            _client_merge(port, 2000 + j, f"client-{j}")

        # collect the host's remaining output
        proc.stdin.write("done\n")
        proc.stdin.flush()
        out, _ = proc.communicate(timeout=300)
        assert proc.returncode == 0, (
            f"host failed:\n{out}\n{err_path.read_text()[-3000:]}"
        )
        final = [l for l in out.splitlines() if l.startswith("FINAL|")]
        assert final, f"no FINAL line in host output:\n{out}"
        _, state, ids_s, versions_s = final[0].split("|")

        # recovery after the dust settles is a no-op
        assert state == "clean"
        # every writer's row landed — no lost update on either side
        ids = [int(x) for x in ids_s.split(",")]
        assert ids == sorted(
            [0]
            + [1000 + i for i in range(K_HOST)]
            + [2000 + j for j in range(M_CLIENT)]
        )
        # each merge consumed exactly one version — strictly increasing,
        # never reused, but NOT necessarily contiguous: the torn-read
        # rollback can burn a number another writer already observed
        # (see the burned-version comment in test_concurrency_nsessions)
        versions = [int(x) for x in versions_s.split(",")]
        assert len(versions) == K_HOST + M_CLIENT
        assert versions == sorted(set(versions))
        # bound the burn rate (r16 ADVICE): legitimate torn-read burns
        # are at most ~1 per contended merge, so runaway max+1
        # allocation (many burns per merge) must still fail loudly
        assert max(versions) < (K_HOST + M_CLIENT) * 2, versions
    finally:
        if proc.poll() is None:
            proc.kill()
        err_f.close()

"""N-session concurrency depth (VERDICT r14 item #5).

The reference's envelope is a multi-tenant gateway over one metastore
(PG ``max_connections=300``, ``internal/controller/postgresql.go:
264-271``; Kyuubi tenants ``kyuubi.go:189-203``). This extends the
two-process merge race (``test_merge_race_twoproc.py``) to N
CONCURRENT REST sessions, each interleaving three statement kinds
while the HOST process simultaneously runs native merges, re-publishes
a rollup MV, and keeps a Bloom index fresh with a RUNNING streaming
maintainer:

- **versioned MERGE** — the SQL-protocol CAS loop from the two-proc
  test, now raced from N threads at once;
- **Bloom probes** (``POST /ops/bloom-probe``) against the index the
  maintainer is appending to — bits are MONOTONE, so a seed key must
  be admitted and returned on EVERY probe whatever batch is mid-merge
  (a lost-bits race would surface here as a false negative);
- **rollup-routed aggregates** — the aggregate served from the MV
  (``route_aggregate``'s destination) while the host atomically
  re-publishes it; every answer must be one of the published totals,
  never a torn/partial state (the brief rename window surfaces as a
  retried error, never a wrong value).

Success = every writer's row landed (no lost update), version numbers
strictly increasing and never reused (each CAS won exactly once; gaps
are legal — the torn-read rollback can burn a number, see the in-test
comment), recovery is a no-op, every
probe was exact throughout, every aggregate was a published value, and
after the stream drains the index answers exactly for seed AND
appended keys.
"""

from __future__ import annotations

import pytest

import json
import subprocess
import sys
import threading
import time
import urllib.error
import urllib.request

from test_merge_race_twoproc import _client_merge, _free_port

# multi-process hammer: N concurrent engine sessions — excluded from
# the default lane (see pytest.ini), run via -m slow
pytestmark = pytest.mark.slow

N_SESS = 4  # concurrent REST sessions
MERGES_PER_SESS = 2
K_HOST = 3  # native merges (each followed by an MV re-publish)
N_GROUPS = 5  # rollup groups; each publish adds one row per group

_HOST_SCRIPT = """
import glob, os, shutil, sys
from pyspark.sql import functions as F
from nineinfra_spark.engine import Engine, EngineConfig
from nineinfra_spark.operators.bloomindex import (
    bloom_index_write, bloom_skipping_read, maintain_bloom_stream,
)
from nineinfra_spark.operators.merge import (
    list_versions, merge_into_table_versioned, publish_snapshot,
    recover_versioned_table,
)
from nineinfra_spark.operators.mv import RollupSpec, route_aggregate

root, port, k_host = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
mysql_port = int(sys.argv[4])
eng = Engine(EngineConfig(
    app_name="nsess_host", master="local[8]",
    warehouse_dir=os.path.join(root, "warehouse"),
    hive_metastore=True,
    metastore_dir=os.path.join(root, "metastore_db"),
    rest_port=port,
    mysql_port=mysql_port,
)).open()
spark = eng.spark

# merge target
spark.createDataFrame([(0, "base")], "id long, tag string").write.saveAsTable(
    "race_tbl"
)

# bloom index: 400 seed keys; 8 delta files staged for the maintainer
idx = os.path.join(root, "bloomidx")
seed = spark.range(0, 400).select(
    F.col("id").alias("lay"),
    F.concat(F.lit("seed-"), F.col("id")).alias("key"),
)
bloom_index_write(seed, idx, "lay", "key", 8)
stage_dir = os.path.join(root, "deltas")
os.makedirs(stage_dir)

def stage_delta(b):
    out = os.path.join(root, "tmpd", f"b{b}")
    (spark.range(1000 + b * 50, 1000 + (b + 1) * 50)
     .select(F.col("id").alias("lay"),
             F.concat(F.lit("app-"), F.col("id")).alias("key"))
     .coalesce(1).write.parquet(out))
    shutil.copy(glob.glob(out + "/part-*.parquet")[0],
                os.path.join(stage_dir, f"b{b}.parquet"))

# two deltas up front; the rest land DURING the race (per merge
# iteration below) so the maintainer's appends overlap client probes
staged = 2
for b in range(staged):
    stage_delta(b)
sdf = (spark.readStream.schema("lay bigint, key string")
       .option("maxFilesPerTrigger", "1").parquet(stage_dir))
q = maintain_bloom_stream(sdf, idx, os.path.join(root, "ckpt"))

# rollup MV: fact + published aggregate (route_aggregate's target)
spark.createDataFrame(
    [(g, 1) for g in range({n_groups})], "grp int, n int"
).write.saveAsTable("fact_sales")
mv0 = spark.table("fact_sales").groupBy("grp").agg(F.sum("n").alias("n"))
mv0.write.saveAsTable("mv_sales")

print("HOST_READY", flush=True)

import traceback
try:
    for i in range(k_host):
        upd = spark.createDataFrame(
            [(1000 + i, f"host-{i}")], "id long, tag string"
        )
        merge_into_table_versioned(
            spark, "race_tbl", upd, ["id"], max_retries=400
        )
        for _ in range(2):  # keep the maintainer fed mid-race
            if staged < 8:
                stage_delta(staged)
                staged += 1
        # grow the fact by one row per group, atomically re-publish MV
        spark.createDataFrame(
            [(g, 1) for g in range({n_groups})], "grp int, n int"
        ).write.insertInto("fact_sales")
        publish_snapshot(
            spark, "mv_sales",
            spark.table("fact_sales").groupBy("grp").agg(
                F.sum("n").alias("n")
            ),
        )
except BaseException as exc:
    print("HOST_FAIL|" + type(exc).__name__ + "|"
          + str(exc)[:800].replace(chr(10), " / "), flush=True)
    traceback.print_exc()
    raise
print("HOST_MERGES_DONE", flush=True)

sys.stdin.readline()  # wait for the client threads to finish

# drain the maintainer, then final exactness sweep
q.processAllAvailable()
q.stop()
n_index = spark.read.parquet(idx).count()
checks = (["seed-0", "seed-199", "seed-399"]
          + [f"app-{k}" for k in (1000, 1177, 1399)])
probe_exact = all(
    [r["key"] for r in bloom_skipping_read(spark, idx, [c])[0].collect()]
    == [c]
    for c in checks
)
ra = route_aggregate(
    spark,
    RollupSpec("mv_sales", ("grp",), ("n",), ()),
    ["grp"],
    {"total": ("sum", "n")},
)
routed_total = sum(r["total"] for r in ra.collect())
state = recover_versioned_table(spark, "race_tbl")
ids = sorted(r["id"] for r in spark.table("race_tbl").collect())
versions = list_versions(spark, "race_tbl")
print(
    "FINAL|" + state + "|" + ",".join(map(str, ids))
    + "|" + ",".join(map(str, versions))
    + "|" + str(n_index) + "|" + str(int(probe_exact))
    + "|" + str(routed_total),
    flush=True,
)
eng.close()
"""


#: error signatures of the two DOCUMENTED reader races: a session's
#: cached relation pointing at files a publish_snapshot swap replaced
#: (Spark's own guidance is REFRESH TABLE), and the brief live-name
#: window between the publish renames. Both are availability races —
#: the retried re-read must still return a CONSISTENT value, which the
#: callers assert strictly.
_TRANSIENT_READ = ("FAILED_READ_FILE", "TABLE_OR_VIEW_NOT_FOUND")


def _rest_json(port: int, api: str, body: dict, sid: str) -> dict:
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{api}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json", "X-Session-Id": sid},
    )
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            return json.loads(r.read())
    except urllib.error.HTTPError as e:
        detail = e.read()[:800].decode(errors="replace")
        if any(sig in detail for sig in _TRANSIENT_READ):
            raise _StaleRead(detail) from e
        raise AssertionError(f"{api} -> HTTP {e.code}: {detail}") from e


class _StaleRead(Exception):
    """A read hit one of the documented publish reader races."""


def _probe_seed_exact(port: int, idx_path: str, key: str, sid: str) -> None:
    """A seed key's bits are monotone — EVERY probe during concurrent
    appends must admit and return it (a miss means an append lost
    bits)."""
    deadline = time.time() + 60
    while True:
        try:
            out = _rest_json(
                port,
                "/api/v1/ops/bloom-probe",
                {"path": idx_path, "keys": [key]},
                sid,
            )
            break
        except _StaleRead:
            if time.time() > deadline:
                raise
            time.sleep(0.3)
    keys = [row[out["columns"].index("key")] for row in out["rows"]]
    assert keys == [key], f"probe for {key} returned {keys}"
    assert out["filesTotal"] >= 8


def _routed_total(port: int, sid: str, valid: set[int]) -> None:
    """The MV answer must always be one of the host's published totals
    (the publish is atomic); the rename window may 404 a read — retry,
    never accept a torn value."""
    deadline = time.time() + 120
    while True:
        try:
            out = _rest_json(
                port,
                "/api/v1/sql",
                {"sql": "SELECT CAST(SUM(n) AS BIGINT) AS s FROM mv_sales"},
                sid,
            )
            s = out["rows"][0][0]
            if s is None:
                # third documented reader shape (publish_snapshot doc):
                # the name resolved between the metastore rename and
                # the directory move — a clean-looking EMPTY scan.
                # Same protocol as the error shapes: refresh, re-read.
                raise _StaleRead("empty scan mid-swap")
            assert s in valid, f"torn rollup read: {s} not in {sorted(valid)}"
            return
        except _StaleRead:
            # the session's cached relation predates the publish swap:
            # refresh THIS session's cache and re-read (Spark's own
            # FAILED_READ_FILE guidance); the re-read value is still
            # asserted against the published set — never a torn value
            try:
                _rest_json(
                    port, "/api/v1/sql",
                    {"sql": "REFRESH TABLE mv_sales"}, sid,
                )
            except (_StaleRead, TimeoutError, ConnectionError, OSError):
                pass
            if time.time() > deadline:
                raise
            time.sleep(0.3)
        except (TimeoutError, ConnectionError, OSError):
            if time.time() > deadline:
                raise
            time.sleep(0.5)


def _mysql_worker(mysql_port: int, valid: set[int], errors: list) -> None:
    """The one frontend previously missing from the mix (r15 verdict
    item #5): a raw-socket MySQL-protocol client reading the rollup MV
    and the merge target WHILE the host merges, re-publishes, and
    streams bloom appends. Same strictness as the REST lane: a torn MV
    value is an instant failure; the documented publish reader races
    surface as ERR packets and are retried after REFRESH TABLE."""
    try:
        from test_mysql_wire import Client

        c = Client(mysql_port)
        c.handshake()
        try:
            reads = 0
            deadline = time.time() + 300
            while reads < 6:
                if time.time() > deadline:
                    raise AssertionError("mysql lane starved by races")
                out = c.query(
                    "SELECT CAST(SUM(n) AS BIGINT) AS s FROM mv_sales"
                )
                if isinstance(out, dict):  # ERR packet
                    if any(sig in out.get("msg", "") for sig in _TRANSIENT_READ):
                        c.query("REFRESH TABLE mv_sales")
                        time.sleep(0.3)
                        continue
                    raise AssertionError(f"mysql MV read: {out}")
                if out[1][0][0] is None:
                    # third reader shape (publish_snapshot docstring):
                    # name resolved between metastore rename and
                    # directory move — clean empty scan; refresh+retry
                    c.query("REFRESH TABLE mv_sales")
                    time.sleep(0.3)
                    continue
                s = int(out[1][0][0])
                assert s in valid, (
                    f"torn rollup read over mysql wire: {s} not in {sorted(valid)}"
                )
                out2 = c.query("SELECT COUNT(*) AS c FROM race_tbl")
                if isinstance(out2, dict):
                    if any(sig in out2.get("msg", "") for sig in _TRANSIENT_READ):
                        c.query("REFRESH TABLE race_tbl")
                        time.sleep(0.3)
                        continue
                    raise AssertionError(f"mysql count read: {out2}")
                if int(out2[1][0][0]) == 0:
                    # same third shape on the merge target (race_tbl
                    # always holds >= 1 committed row)
                    c.query("REFRESH TABLE race_tbl")
                    time.sleep(0.3)
                    continue
                assert int(out2[1][0][0]) >= 1
                reads += 1
        finally:
            c.close()
    except BaseException as exc:  # surfaced by the main thread
        errors.append(("mysql", exc))


def _session_worker(
    i: int, port: int, idx_path: str, valid: set[int], errors: list
) -> None:
    sid = f"sess-{i}"
    try:
        for j in range(MERGES_PER_SESS):
            _client_merge(port, 2000 + i * 10 + j, f"c{i}-{j}")
            _probe_seed_exact(port, idx_path, f"seed-{(i * 97 + j * 31) % 400}", sid)
            _routed_total(port, sid, valid)
            _probe_seed_exact(port, idx_path, f"seed-{(i * 13 + j * 7) % 400}", sid)
    except BaseException as exc:  # surfaced by the main thread
        errors.append((i, exc))


def test_n_sessions_interleaved_merge_probe_rollup(tmp_path):
    port = _free_port()
    mysql_port = _free_port()
    err_path = tmp_path / "host_stderr.log"
    err_f = open(err_path, "w")
    script = _HOST_SCRIPT.replace("{n_groups}", str(N_GROUPS))
    proc = subprocess.Popen(
        [
            sys.executable,
            "-c",
            script,
            str(tmp_path),
            str(port),
            str(K_HOST),
            str(mysql_port),
        ],
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
        stderr=err_f,
        text=True,
        cwd="/root/repo",
    )
    # a pump thread owns stdout for the whole host lifetime, so the
    # readiness deadline stays effective even if the host wedges
    # silently (a blocking readline would hang past any deadline)
    host_lines: list = []

    def _pump() -> None:
        for line in proc.stdout:
            host_lines.append(line)

    pump = threading.Thread(target=_pump, daemon=True)
    pump.start()
    try:
        deadline = time.time() + 240
        ready = False
        while time.time() < deadline:
            if any("HOST_READY" in l for l in host_lines):
                ready = True
                break
            if proc.poll() is not None:
                break
            time.sleep(0.5)
        assert ready, f"host never ready: {err_path.read_text()[-3000:]}"

        idx_path = str(tmp_path / "bloomidx")
        # totals the host may have published when a client reads
        valid = {N_GROUPS * k for k in range(1, K_HOST + 2)}
        errors: list = []
        threads = [
            threading.Thread(
                target=_session_worker,
                args=(i, port, idx_path, valid, errors),
                daemon=True,
            )
            for i in range(N_SESS)
        ]
        threads.append(
            threading.Thread(
                target=_mysql_worker,
                args=(mysql_port, valid, errors),
                daemon=True,
            )
        )
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
            assert not t.is_alive(), "session worker hung"
        assert not errors, f"worker failures: {errors}"

        proc.stdin.write("done\n")
        proc.stdin.flush()
        proc.wait(timeout=600)
        pump.join(timeout=10)
        out = "".join(host_lines)
        assert proc.returncode == 0, (
            f"host failed:\n{out}\n{err_path.read_text()[-3000:]}"
        )
        final = [l for l in out.splitlines() if l.startswith("FINAL|")]
        assert final, f"no FINAL line:\n{out}"
        _, state, ids_s, versions_s, n_index, probe_exact, routed = (
            final[0].split("|")
        )
        # merges: no lost update, contiguous versions, clean recovery
        assert state == "clean"
        ids = [int(x) for x in ids_s.split(",")]
        want = sorted(
            [0]
            + [1000 + i for i in range(K_HOST)]
            + [2000 + i * 10 + j for i in range(N_SESS) for j in range(MERGES_PER_SESS)]
        )
        assert ids == want
        versions = [int(x) for x in versions_s.split(",")]
        # Exactly one archive per merge, strictly increasing, never
        # reused. NOT asserted contiguous: the torn-base-read rollback
        # (merge.py post-CAS provenance check / _client_merge's
        # un-archive branch) can BURN a version number — writer A
        # archives v, rolls back on a torn read, while writer B has
        # already observed v and computes v+1; the sequence then skips
        # v forever (max+1 allocation never backfills, by design — see
        # merge_versioned's docstring). No data is lost (the ids
        # assert above is the lost-update check); observed live under
        # heavy co-load in r16.
        assert len(versions) == K_HOST + N_SESS * MERGES_PER_SESS
        assert versions == sorted(set(versions))
        # bound the burn rate (r16 ADVICE): legitimate torn-read burns
        # are at most ~1 per contended merge, so runaway max+1
        # allocation (many burns per merge) must still fail loudly
        assert (
            max(versions) < (K_HOST + N_SESS * MERGES_PER_SESS) * 2
        ), versions
        # bloom: stream drained, every sampled key exact post-append
        assert int(n_index) == 400 + 8 * 50
        assert probe_exact == "1"
        # rollup: the routed aggregate serves the final published total
        assert int(routed) == N_GROUPS * (K_HOST + 1)
    finally:
        if proc.poll() is None:
            proc.kill()
        err_f.close()

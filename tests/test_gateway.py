"""SQL gateway (Kyuubi role): a second client over the thrift wire.

Engine.open with ``thrift_port`` must serve the HiveServer2 protocol;
beeline (Hive JDBC driver, separate process) connects and runs SQL
against the engine's registered views — the reference's THRIFT_BINARY
frontend semantic. Subprocess-isolated: the gateway binds a port and
thrift confs at session build time, which must not leak into the
shared pytest session."""

from __future__ import annotations

import subprocess
import sys

SF = "/root/testdata/sf0.001"
PORT = 10877

_SCRIPT = f"""
from nineinfra_spark.engine import Engine, EngineConfig
from nineinfra_spark.gateway import beeline_sql

eng = Engine(EngineConfig(
    app_name="gateway_test", master="local[4]", thrift_port={PORT}
)).open()
eng.register_dir("{SF}")

# second client, over the wire: aggregate a registered view
out = beeline_sql({PORT}, "SELECT COUNT(*) AS n FROM nation")
assert "25" in out, f"unexpected beeline output: {{out!r}}"

# and a real engine query via SQL text (the gateway user's path)
out2 = beeline_sql({PORT}, (
    "SELECT l_returnflag, COUNT(*) AS n FROM lineitem "
    "GROUP BY l_returnflag ORDER BY l_returnflag"
))
assert "A," in out2 and "N," in out2 and "R," in out2, out2
print("GATEWAY_OK")
eng.close()
"""


def test_thrift_gateway_second_client():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=420,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, (
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-3000:]}"
    )
    assert "GATEWAY_OK" in proc.stdout

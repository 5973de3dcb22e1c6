"""thrift_auth build hygiene: the compiled-jar cache publishes
atomically and leaves NO scratch debris behind (r13 review pass —
the staging-debris class)."""

from __future__ import annotations

import os

from nineinfra_spark.thrift_auth import build_auth_jar


def test_build_leaves_no_scratch_debris(tmp_path):
    wd = str(tmp_path / "auth_wd")
    jar = build_auth_jar(wd)
    assert os.path.exists(jar)
    leftovers = [
        n for n in os.listdir(wd)
        if n.startswith("classes-") or ".tmp-" in n
    ]
    assert leftovers == []
    # cache hit returns the same jar without rebuilding
    assert build_auth_jar(wd) == jar

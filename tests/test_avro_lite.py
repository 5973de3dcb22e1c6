"""avro_lite (sources/avro_lite.py): pure-stdlib Avro Object
Container Files — codec round-trips, spec encoding details (zigzag,
unions, sync markers), DataFrame sink/source wiring, and the
spark-avro env-block probe this module exists because of.
"""

from __future__ import annotations

import io
import os
import shutil

import pytest

from nineinfra_spark.sources import avro_lite as A

OUT = "/tmp/nineinfra_avro_lite_test"

SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": ["null", "double"]},
        {"name": "flag", "type": "boolean"},
        {"name": "blob", "type": "bytes"},
    ],
}

ROWS = [
    (1, "alpha", 1.5, True, b"\x00\x01"),
    (-2, "héllo wörld", None, False, b""),
    (2**40, "", -0.0, True, b"\xff" * 10),
    (0, "z" * 300, 3.14159, False, b"x"),
]


def _roundtrip(codec):
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, f"rt_{codec}.avro")
    n = A.write_avro(path, SCHEMA, ROWS, codec=codec)
    assert n == len(ROWS)
    assert list(A.read_avro(path)) == ROWS


def test_roundtrip_null_codec():
    _roundtrip("null")


def test_roundtrip_deflate_codec():
    _roundtrip("deflate")


def test_deflate_actually_compresses():
    os.makedirs(OUT, exist_ok=True)
    rows = [(i, "the same text " * 20, 1.0, True, b"") for i in range(500)]
    p_null = os.path.join(OUT, "c_null.avro")
    p_defl = os.path.join(OUT, "c_defl.avro")
    A.write_avro(p_null, SCHEMA, rows, codec="null")
    A.write_avro(p_defl, SCHEMA, rows, codec="deflate")
    assert os.path.getsize(p_defl) < os.path.getsize(p_null) / 5
    assert list(A.read_avro(p_defl)) == list(A.read_avro(p_null))


def test_zigzag_is_spec_exact():
    """Values from the Avro spec's binary-encoding table."""
    cases = {0: b"\x00", -1: b"\x01", 1: b"\x02", -2: b"\x03", 2: b"\x04",
             -64: b"\x7f", 64: b"\x80\x01"}
    for n, enc in cases.items():
        assert A._zigzag_encode(n) == enc, n
        assert A._zigzag_decode(io.BytesIO(enc)) == n


def test_multi_block_files_and_sync_check():
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, "blocks.avro")
    rows = [(i, f"n{i}", float(i), i % 2 == 0, b"") for i in range(1000)]
    A.write_avro(path, SCHEMA, rows, rows_per_block=64)
    assert list(A.read_avro(path)) == rows
    # corrupt a sync marker → loud failure, not silent misparse
    data = bytearray(open(path, "rb").read())
    data[-1] ^= 0xFF
    bad = os.path.join(OUT, "bad.avro")
    open(bad, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="sync marker"):
        list(A.read_avro(bad))


def test_range_splits_partition_rows_exactly_once():
    """Sync-marker byte-range splits: for MANY split granularities,
    the union of read_avro_range over consecutive [lo, hi) ranges is
    the whole relation, each row exactly once — blocks belong to the
    split their start offset falls in, crossing blocks are finished
    by the owning split and skipped by the next."""
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, "splits.avro")
    rows = [(i, f"r{i}" * 3, float(i), i % 3 == 0, bytes([i % 256])) for i in range(2000)]
    A.write_avro(path, SCHEMA, rows, codec="deflate", rows_per_block=50)
    size = os.path.getsize(path)
    for split in (64, 500, 1777, size // 3, size, size * 2):
        got = []
        lo = 0
        while lo < size:
            hi = min(lo + split, size)
            got.extend(A.read_avro_range(path, lo, hi))
            lo = hi
        assert got == rows, f"split={split}: {len(got)} rows"


def test_spark_reads_one_file_across_many_tasks(spark):
    """A single large container file fans out to multiple Spark tasks
    via the splitBytes option — the splittability a 100 TB ingest
    needs (no one-task-per-big-file serialization)."""
    A.register(spark)
    os.makedirs(OUT, exist_ok=True)
    d = os.path.join(OUT, "one_big")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    path = os.path.join(d, "big.avro")
    rows = [(i, f"name{i}", float(i), True, b"") for i in range(5000)]
    A.write_avro(path, SCHEMA, rows, codec="null", rows_per_block=100)
    size = os.path.getsize(path)
    df = (
        spark.read.format("avro_lite")
        .option("path", d)
        .option("splitBytes", str(max(1, size // 7)))
        .load()
    )
    assert df.rdd.getNumPartitions() >= 7
    got = sorted(tuple(r)[:2] for r in df.collect())
    assert got == [(i, f"name{i}") for i in range(5000)]


def test_unsupported_schema_rejected():
    with pytest.raises(ValueError, match="unsupported"):
        A.write_avro(
            os.path.join(OUT, "x.avro"),
            {"type": "record", "name": "r",
             "fields": [{"name": "m", "type": {"type": "map", "values": "int"}}]},
            [],
        )


def test_spark_avro_module_remains_env_blocked(spark):
    """The reason this module exists: the bundled spark-avro
    DataSource is absent from this env's pyspark (r9 probe). If this
    test ever fails, the native module appeared — prefer it."""
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException, match="[Aa]vro"):
        spark.read.format("avro").load("/tmp/definitely_missing.avro")


def test_dataframe_sink_and_datasource_roundtrip(spark):
    """Executor-parallel sink (one container file per partition) →
    format('avro_lite') read: relation equality, schema fidelity,
    file-per-task parallelism."""
    import pyspark.sql.functions as F

    A.register(spark)
    out = os.path.join(OUT, "df_roundtrip")
    shutil.rmtree(out, ignore_errors=True)
    df = (
        spark.range(0, 1000)
        .repartition(4)
        .select(
            F.col("id"),
            F.concat(F.lit("name_"), F.col("id")).alias("name"),
            F.when(F.col("id") % 7 != 0, F.col("id") * 1.5).alias("score"),
        )
    )
    files = A.write_avro_dataframe(df, out, codec="deflate")
    assert len(files) == 4
    back = spark.read.format("avro_lite").option("path", out).load()
    assert back.rdd.getNumPartitions() == 4  # one task per file
    assert [f.name for f in back.schema.fields] == ["id", "name", "score"]
    got = sorted(tuple(r) for r in back.collect())
    want = sorted(tuple(r) for r in df.collect())
    assert got == want
    assert sum(v is None for _, _, v in got) == len([i for i in range(1000) if i % 7 == 0])


def test_midstream_failure_leaves_no_inprogress_orphan(tmp_path):
    """An encode failure after several flushed blocks must remove the
    partial .inprogress file (the pre-streaming builder left nothing
    on failure; the streaming writer keeps that contract)."""
    path = str(tmp_path / "fail.avro")

    def rows():
        for i in range(10_000):  # > one 4096-row block flushes first
            yield (i, f"n{i}", None, True, b"")
        yield ("not-a-long", "boom", None, True, b"")

    with pytest.raises(Exception):
        A.write_avro(path, SCHEMA, rows())
    assert not os.path.exists(path)
    assert not os.path.exists(path + ".inprogress")


class TestR11ReviewFindings:
    def test_row_width_mismatch_raises_not_corrupts(self, tmp_path):
        """zip() would silently truncate a short row (or discard a
        long one) while the block header still claimed a full row —
        publishing a container that only fails at read time."""
        path = str(tmp_path / "w.avro")
        with pytest.raises(ValueError, match="values for"):
            A.write_avro(path, SCHEMA, [(1, "only-two")])
        with pytest.raises(ValueError, match="values for"):
            A.write_avro(
                path, SCHEMA, [(1, "a", 1.0, True, b"", "extra")]
            )
        assert not os.path.exists(path)  # nothing published

    def test_failed_job_preserves_previous_output(self, spark, tmp_path):
        """The sink deleted all existing .avro BEFORE the job ran — a
        failed job destroyed the prior successful write. Stage-then-
        swap now: old data survives any task failure."""
        import pyspark.sql.functions as F

        out = str(tmp_path / "persist")
        ok = spark.range(5).select(
            F.col("id"), F.lit("keep").alias("tag")
        )
        first = A.write_avro_dataframe(ok, out)
        assert first

        @F.udf("string")
        def poison(v):
            raise RuntimeError("boom")

        bad = spark.range(5).select(F.col("id"), poison("id").alias("tag"))
        with pytest.raises(Exception):
            A.write_avro_dataframe(bad, out)
        # the previous commit is intact and fully readable
        rows = []
        for f in sorted(os.listdir(out)):
            if f.endswith(".avro"):
                rows += list(A.read_avro(os.path.join(out, f)))
        assert sorted(r[0] for r in rows) == [0, 1, 2, 3, 4]
        assert all(r[1] == "keep" for r in rows)

    def test_successful_write_sweeps_stale_staged_debris(
        self, spark, tmp_path
    ):
        """r12 ADVICE fix: the post-swap sweep only deleted un-kept
        ``.avro`` files, so ``.avro.staged`` debris from a FAILED wide
        run survived every later (narrower) successful run forever."""
        import pyspark.sql.functions as F

        out = str(tmp_path / "sweep")
        os.makedirs(out)
        # simulate a failed 6-wide run's orphans, beyond this run's
        # 2-partition index range
        for i in (4, 5):
            with open(
                os.path.join(out, f"part-{i:05d}.avro.staged"), "wb"
            ) as f:
                f.write(b"debris")
        ok = spark.range(10).repartition(2).select(
            F.col("id"), F.lit("v").alias("tag")
        )
        finals = A.write_avro_dataframe(ok, out)
        listing = sorted(os.listdir(out))
        assert not any(n.endswith(".staged") for n in listing)
        assert listing == sorted(os.path.basename(f) for f in finals)
        rows = []
        for f in finals:
            rows += list(A.read_avro(f))
        assert sorted(r[0] for r in rows) == list(range(10))

    def test_mixed_schema_directory_raises_not_misaligns(
        self, spark, tmp_path
    ):
        """Directory reads took the schema from files[0] while each
        task decoded by its own header — reordered fields silently
        landed values in the wrong columns."""
        out = tmp_path / "mixed"
        out.mkdir()
        s1 = {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "event_id", "type": "long"},
                {"name": "user_id", "type": "long"},
            ],
        }
        s2 = {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "user_id", "type": "long"},
                {"name": "event_id", "type": "long"},
            ],
        }
        A.write_avro(str(out / "part-00000.avro"), s1, [(1, 100)])
        A.write_avro(str(out / "part-00001.avro"), s2, [(200, 2)])
        A.register(spark)
        with pytest.raises(Exception, match="do not match"):
            spark.read.format("avro_lite").option(
                "path", str(out)
            ).load().collect()


class TestForeignAndCorruptHeaders:
    """r16 adversarial pass: codec-negotiation edges — files another
    implementation could legitimately write (snappy codec) must fail
    CLEANLY at plan/read time, and corrupt headers must surface a
    clear error, not a KeyError/short-read from inside the decoder."""

    def _container(self, meta: dict[str, bytes]) -> bytes:
        buf = bytearray(A.MAGIC)
        buf += A._zigzag_encode(len(meta))
        for k, v in meta.items():
            kb = k.encode()
            buf += A._zigzag_encode(len(kb)) + kb
            buf += A._zigzag_encode(len(v)) + v
        buf += A._zigzag_encode(0)
        buf += b"\x07" * 16  # sync
        return bytes(buf)

    def test_foreign_codec_rejected_cleanly(self, tmp_path):
        import json as _json

        p = str(tmp_path / "snappy.avro")
        with open(p, "wb") as f:
            f.write(
                self._container(
                    {
                        "avro.schema": _json.dumps(SCHEMA).encode(),
                        "avro.codec": b"snappy",
                    }
                )
            )
        hdr = A.read_schema(p)
        assert hdr["codec"] == "snappy"  # header parse is fine...
        with pytest.raises(ValueError, match="unsupported codec"):
            list(A.read_avro(p))  # ...decoding refuses up front

    def test_header_missing_schema_raises_valueerror(self, tmp_path):
        p = str(tmp_path / "noschema.avro")
        with open(p, "wb") as f:
            f.write(self._container({"avro.codec": b"null"}))
        with pytest.raises(ValueError, match="avro.schema"):
            A.read_schema(p)

    def test_truncated_header_raises_valueerror(self, tmp_path):
        import json as _json

        p = str(tmp_path / "trunc.avro")
        full = self._container(
            {"avro.schema": _json.dumps(SCHEMA).encode()}
        )
        with open(p, "wb") as f:
            f.write(full[:-10])  # cut into the sync marker
        with pytest.raises(ValueError, match="truncated header"):
            A.read_schema(p)

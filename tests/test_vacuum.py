"""vacuum_orphan_dirs (operators/vacuum.py): storage-level orphan
cleanup under the database location — the complement of the
rename-protocol recovery paths, which only see REGISTERED leftovers.
"""

from __future__ import annotations

import os
import time

from nineinfra_spark.operators.vacuum import (
    database_location,
    list_orphan_dirs,
    vacuum_orphan_dirs,
)


def _make_dir(loc, name, age_s=7200.0):
    path = os.path.join(loc, name)
    os.makedirs(path, exist_ok=True)
    fpath = os.path.join(path, "part-00000.parquet")
    with open(fpath, "wb") as f:
        f.write(b"junk")
    # age the WHOLE subtree: orphan age is now the newest mtime
    # anywhere inside (a genuinely abandoned dir has only old files)
    old = time.time() - age_s
    os.utime(fpath, (old, old))
    os.utime(path, (old, old))
    return path


def test_orphan_identified_and_removed(spark):
    loc = database_location(spark)
    spark.sql("DROP TABLE IF EXISTS vac_keep")
    spark.createDataFrame([(1,)], "id long").write.mode("overwrite").saveAsTable(
        "vac_keep"
    )
    orphan = _make_dir(loc, "vac_orphan_x")
    try:
        found = list_orphan_dirs(spark, grace_s=3600)
        assert orphan in found
        # the registered table's directory is never a candidate
        assert all("vac_keep" not in p for p in found)

        # default call is dry-run: reports but NEVER deletes
        reported = vacuum_orphan_dirs(spark, grace_s=3600)
        assert orphan in reported
        assert os.path.exists(orphan)

        removed = vacuum_orphan_dirs(spark, grace_s=3600, dry_run=False)
        assert orphan in removed
        assert not os.path.exists(orphan)
        # registered table survives, with its data
        assert spark.table("vac_keep").count() == 1
    finally:
        spark.sql("DROP TABLE IF EXISTS vac_keep")
        import shutil

        shutil.rmtree(orphan, ignore_errors=True)


def test_grace_period_protects_young_dirs(spark):
    """A directory younger than the grace period is a table mid-CREATE
    (files land before the metastore commit) — never vacuumed."""
    loc = database_location(spark)
    young = _make_dir(loc, "vac_young_y", age_s=0)
    try:
        assert young not in list_orphan_dirs(spark, grace_s=3600)
        # with grace 0 it becomes eligible — the knob works
        assert young in list_orphan_dirs(spark, grace_s=0)
    finally:
        import shutil

        shutil.rmtree(young, ignore_errors=True)


def test_infrastructure_names_never_touched(spark):
    loc = database_location(spark)
    import shutil

    protected = []
    for name in ("other.db", "_spark_metadata_probe", ".hidden_probe", "metastore_db"):
        path = os.path.join(loc, name)
        existed = os.path.exists(path)
        if not existed:
            os.makedirs(path, exist_ok=True)
            old = time.time() - 7200
            os.utime(path, (old, old))
            protected.append(path)
    try:
        found = vacuum_orphan_dirs(spark, grace_s=0, dry_run=True)
        for name in ("other.db", "_spark_metadata_probe", ".hidden_probe", "metastore_db"):
            assert all(os.path.basename(p) != name for p in found), name
    finally:
        for path in protected:
            shutil.rmtree(path, ignore_errors=True)


def test_cross_database_external_table_never_vacuumed(spark):
    """An EXTERNAL table registered in a DIFFERENT database whose data
    directory sits under default's location must never be classified
    as an orphan — the location check spans all databases (advice
    r8: name-only same-database matching would rmtree it)."""
    loc = database_location(spark)
    data_dir = _make_dir(loc, "vac_ext_data")
    spark.createDataFrame([(7,)], "id long").write.mode("overwrite").parquet(
        data_dir
    )
    old = time.time() - 7200
    os.utime(data_dir, (old, old))
    spark.sql("CREATE DATABASE IF NOT EXISTS vac_other_db")
    spark.sql("DROP TABLE IF EXISTS vac_other_db.ext_t")
    spark.sql(
        f"CREATE TABLE vac_other_db.ext_t (id LONG) USING parquet "
        f"LOCATION '{data_dir}'"
    )
    try:
        found = list_orphan_dirs(spark, grace_s=0)
        assert data_dir not in found
        vacuum_orphan_dirs(spark, grace_s=0, dry_run=False)
        assert os.path.exists(data_dir)
        assert spark.table("vac_other_db.ext_t").count() == 1
    finally:
        spark.sql("DROP TABLE IF EXISTS vac_other_db.ext_t")
        spark.sql("DROP DATABASE IF EXISTS vac_other_db")
        import shutil

        shutil.rmtree(data_dir, ignore_errors=True)


def test_dry_run_reports_without_deleting(spark):
    loc = database_location(spark)
    orphan = _make_dir(loc, "vac_dry_z")
    try:
        found = vacuum_orphan_dirs(spark, grace_s=0, dry_run=True)
        assert orphan in found
        assert os.path.exists(orphan)  # nothing deleted
    finally:
        import shutil

        shutil.rmtree(orphan, ignore_errors=True)


class TestInFlightWriteProtection:
    """r11 review finding: the grace period judged age by the TOP-LEVEL
    directory mtime, which a long write streaming into nested dirs
    never touches — an hours-old in-flight CREATE looked like an
    orphan. Age is now the newest mtime anywhere in the subtree, and a
    Hadoop committer ``_temporary`` staging dir protects the directory
    outright."""

    def test_nested_recent_write_defers_vacuum(self, spark, tmp_path):
        import os
        import time

        from nineinfra_spark.operators.vacuum import (
            database_location,
            vacuum_orphan_dirs,
        )

        loc = database_location(spark, "default")
        stale = os.path.join(loc, "vac_inflight_probe")
        nested = os.path.join(stale, "part=1", "deep")
        os.makedirs(nested, exist_ok=True)
        try:
            old = time.time() - 7200
            # top level AND intermediate look 2h old…
            for p in (stale, os.path.join(stale, "part=1")):
                os.utime(p, (old, old))
            # …but a part file deep inside was written seconds ago
            with open(os.path.join(nested, "part-0001.parquet"), "w") as f:
                f.write("x")
            os.utime(stale, (old, old))  # writing the file bumped nothing above
            found = vacuum_orphan_dirs(spark, grace_s=3600, dry_run=True)
            assert stale not in found
        finally:
            import shutil

            shutil.rmtree(stale, ignore_errors=True)

    def test_temporary_staging_dir_protects_regardless_of_age(
        self, spark
    ):
        import os
        import time

        from nineinfra_spark.operators.vacuum import (
            database_location,
            vacuum_orphan_dirs,
        )

        loc = database_location(spark, "default")
        stale = os.path.join(loc, "vac_committer_probe")
        tmpdir = os.path.join(stale, "_temporary", "0")
        os.makedirs(tmpdir, exist_ok=True)
        try:
            old = time.time() - 7200
            for root, dirs, files in os.walk(stale, topdown=False):
                for e in dirs + files:
                    os.utime(os.path.join(root, e), (old, old))
            os.utime(stale, (old, old))
            found = vacuum_orphan_dirs(spark, grace_s=3600, dry_run=True)
            assert stale not in found
        finally:
            import shutil

            shutil.rmtree(stale, ignore_errors=True)

"""Warehouse orphan-directory vacuum.

The reference stores its warehouse as plain directories on object
storage (MinIO ``datahouse/``, ``internal/controller/minio.go:72-121``)
with the metastore as the source of truth for what exists. A writer
hard-killed between creating a table DIRECTORY and committing the
metastore entry (or after a DROP that removed the entry but died
before the rmdir) leaves an ORPHAN: storage no catalog name points
to. The rename-protocol recovery paths (``merge.recover_published_table``
/ ``recover_versioned_table``) clean up *registered* leftovers; this
module is the storage-level complement — the role Delta's VACUUM and
Iceberg's ``remove_orphan_files`` play.

Safety design (the part that matters more than the rmtree):

- Only TOP-LEVEL directories under the database location are
  considered; a managed table's directory name equals its (lowercase)
  table name in both the in-memory and hive catalogs.
- A GRACE PERIOD (default 1 h, by directory mtime) protects in-flight
  CREATEs — ``saveAsTable`` writes files before the metastore commit,
  so a young unregistered directory is probably a table being born,
  not an orphan.
- Infrastructure names are never touched: nested ``*.db`` database
  dirs, ``metastore_db``, and anything starting with ``.`` or ``_``
  (Spark's ``_spark_metadata``, ``_temporary``, checkpoint dirs).
- Registered table LOCATIONS across **all** databases are consulted,
  not just same-database table names: an external table registered in
  another database whose data directory happens to sit under this
  database's location is never classified as an orphan (advice r8).
- ``dry_run=True`` is the DEFAULT — the function reports candidates
  without deleting; destruction requires an explicit
  ``dry_run=False`` opt-in.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import SparkSession

_PROTECTED = {"metastore_db", "derby.log", "spark-warehouse"}


def _q(identifier: str) -> str:
    """Backtick-quote a catalog identifier, escaping embedded
    backticks (Spark's doubling rule) — an unescaped backtick in a
    name would make the quoted SQL a parse error, and in
    ``_registered_locations`` that error is swallowed, silently
    dropping the table's location from the protection set."""
    return "`" + identifier.replace("`", "``") + "`"


def database_location(spark: SparkSession, database: str = "default") -> str:
    """Filesystem path of ``database``'s location (file: prefix
    stripped)."""
    rows = spark.sql(f"DESCRIBE DATABASE {_q(database)}").collect()
    info = {r[0]: r[1] for r in rows}
    loc = info.get("Location") or info.get("Location URI")
    if not loc:
        raise RuntimeError(
            f"DESCRIBE DATABASE {database} returned no Location: {info}"
        )
    return loc.removeprefix("file:")


def _registered_locations(spark: SparkSession) -> set[str]:
    """Real paths of every registered table's storage location across
    ALL databases — the cross-database safety net: a directory that IS
    some table's location is never an orphan, whatever database it
    visually sits under (external tables can point anywhere, including
    inside another database's directory)."""
    locations: set[str] = set()
    for db in spark.catalog.listDatabases():
        for tbl in spark.catalog.listTables(db.name):
            if tbl.isTemporary:
                continue
            try:
                rows = spark.sql(
                    f"DESCRIBE TABLE EXTENDED {_q(db.name)}.{_q(tbl.name)}"
                ).collect()
            except Exception:
                continue  # concurrently dropped — then it can't claim a dir
            for r in rows:
                if r[0] == "Location" and r[1]:
                    locations.add(os.path.realpath(r[1].removeprefix("file:")))
    return locations


def list_orphan_dirs(
    spark: SparkSession, database: str = "default", grace_s: float = 3600.0
) -> list[str]:
    """Top-level directories under ``database``'s location that (a) no
    catalog table of that database claims by name, (b) are not the
    registered LOCATION of any table in any database, (c) are not
    infrastructure names, and (d) are older than ``grace_s``
    seconds."""
    loc = database_location(spark, database)
    if not os.path.isdir(loc):
        return []
    registered = {
        r["tableName"].lower()
        for r in spark.sql(f"SHOW TABLES IN {_q(database)}").collect()
    }
    claimed = _registered_locations(spark)
    now = time.time()
    orphans = []
    for name in sorted(os.listdir(loc)):
        path = os.path.join(loc, name)
        if not os.path.isdir(path):
            continue  # loose files (e.g. derby.log) are never touched
        if name.startswith((".", "_")) or name.endswith(".db"):
            continue
        if name in _PROTECTED:
            continue
        if name.lower() in registered:
            continue
        if os.path.realpath(path) in claimed:
            continue  # some table somewhere owns this directory
        if _in_flight_write(path):
            continue  # a committer staging dir means a job is writing
        if now - _newest_mtime(path) < grace_s:
            continue  # possibly a table mid-CREATE — leave it
        orphans.append(path)
    return orphans


def _in_flight_write(path: str) -> bool:
    """True when a Hadoop output-committer staging directory
    (``_temporary``) exists anywhere under ``path`` — an uncommitted
    job is actively writing, whatever the directory's age."""
    for root, dirs, _files in os.walk(path):
        if "_temporary" in dirs:
            return True
    return False


def _newest_mtime(path: str) -> float:
    """Newest mtime anywhere in the subtree, not just the top level:
    a long-running write streams part files into NESTED directories
    that never touch the top-level mtime, so judging age by the root
    alone would classify an hours-long in-flight CREATE as an orphan
    and destroy it mid-write (r11 review finding)."""
    newest = os.path.getmtime(path)
    for root, dirs, files in os.walk(path):
        for entry in dirs + files:
            try:
                newest = max(newest, os.path.getmtime(os.path.join(root, entry)))
            except OSError:
                continue  # entry vanished mid-walk (concurrent commit)
    return newest


def vacuum_orphan_dirs(
    spark: SparkSession,
    database: str = "default",
    grace_s: float = 3600.0,
    dry_run: bool = True,
) -> list[str]:
    """Report (default) or remove orphan table directories under
    ``database``'s location. Returns the paths identified.

    ``dry_run`` defaults to **True**: deletion is an explicit
    ``dry_run=False`` opt-in, so a bare call can never destroy data
    (advice r8 — the docstring used to *recommend* a dry run; now the
    API enforces it). See module docstring for the safety rules."""
    orphans = list_orphan_dirs(spark, database, grace_s=grace_s)
    if not dry_run:
        for path in orphans:
            shutil.rmtree(path, ignore_errors=True)
    return orphans

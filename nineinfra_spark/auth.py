"""Gateway authentication (the reference's JDBC-auth role).

The platform validates SQL-gateway users with a salted-MD5 lookup
against a ``users`` table it provisions in PostgreSQL
(``internal/controller/kyuubi.go:138-164`` creates
``users(username TEXT PRIMARY KEY, passwd TEXT)`` and stores
``md5('nineinfra' || password)``; ``kyuubi.go:55-64`` wires Kyuubi's
``kyuubi.authentication=JDBC`` to the lookup
``SELECT 1 FROM users WHERE username=${user} AND
passwd=MD5(CONCAT('nineinfra',${password}))``; the salt constant lives
at ``internal/controller/constants.go:8``).

This module is the engine-native mirror: the same table shape and the
same salted-MD5 scheme, stored as a warehouse table the session owns,
consumed by the REST frontend (``rest.py``) via HTTP Basic. The thrift
frontend (``gateway.py``) documents the equivalent hook — Kyuubi-style
``doAs``/JDBC auth is a server-launch conf, not a per-query API.

Security note: salted MD5 is what the reference ships, so that is what
parity requires — it is NOT a recommendation. A production deployment
would put bcrypt/scrypt behind the same interface; only
:func:`hash_password` would change.

Scale posture: the users table is a tiny dimension (operators, not
end-users of the data). :class:`UserStore` reads it ONCE into an
in-process dict and authenticates per-request from memory — the
gateway never runs a Spark job per login (Kyuubi likewise keeps a
pooled JDBC connection, not a cluster job). ``refresh()`` re-reads
after user changes.
"""

from __future__ import annotations

import hashlib
import hmac
from collections.abc import Mapping

from pyspark.sql import SparkSession

#: The reference's fixed password salt (``constants.go:8``).
PASSWORD_MD5_SALT = "nineinfra"

#: Default warehouse location of the users table (the reference uses a
#: dedicated auth database, ``kyuubi.go:141-143``).
DEFAULT_USERS_TABLE = "nine_auth.users"


def hash_password(password: str) -> str:
    """``hex(md5(salt || password))`` — byte-identical to the
    reference's stored form (``kyuubi.go:155-158``)."""
    return hashlib.md5((PASSWORD_MD5_SALT + password).encode()).hexdigest()


def init_users_table(
    spark: SparkSession,
    users: Mapping[str, str],
    table: str = DEFAULT_USERS_TABLE,
) -> None:
    """Create/replace the ``users`` warehouse table from a
    ``{username: plaintext_password}`` mapping (passwords are stored
    salted-MD5, never plaintext — same as the reference's provisioning
    INSERT, ``kyuubi.go:150-160``)."""
    if "." in table:
        db = table.rsplit(".", 1)[0]
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    df = spark.createDataFrame(
        [(u, hash_password(p)) for u, p in users.items()],
        "username string, passwd string",
    )
    df.write.mode("overwrite").saveAsTable(table)


class UserStore:
    """Authenticator over the users table.

    ``authenticate`` evaluates the reference's lookup predicate
    (``username = ? AND passwd = md5(salt || ?)``) against an
    in-process snapshot of the table."""

    def __init__(self, spark: SparkSession, table: str = DEFAULT_USERS_TABLE):
        self._spark = spark
        self._table = table
        self._users: dict[str, str] = {}
        self.refresh()

    def refresh(self) -> None:
        """Re-read the users dimension (one tiny job)."""
        self._users = {
            r["username"]: r["passwd"]
            for r in self._spark.table(self._table).collect()
        }

    def authenticate(self, username: str, password: str) -> bool:
        stored = self._users.get(username)
        # constant-time digest comparison: an in-process `==` on hex
        # digests leaks a prefix-length timing signal to whoever drives
        # the gateway loop (r12 review hardening)
        return stored is not None and hmac.compare_digest(
            stored, hash_password(password)
        )

    def __call__(self, username: str, password: str) -> bool:
        return self.authenticate(username, password)

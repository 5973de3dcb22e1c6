"""Thrift-frontend authentication (the reference's Kyuubi JDBC-auth
role, enforced ON THE WIRE).

The platform validates thrift/JDBC clients with the salted-MD5 users
lookup (``internal/controller/kyuubi.go:55-64,138-164``; salt constant
``constants.go:8``). HiveServer2's hook for that is
``hive.server2.authentication=CUSTOM`` + a
``PasswdAuthenticationProvider`` implementation — the interface ships
inside ``spark-hive-thriftserver``, so the provider compiles in-env
against Spark's own jars (``java/NineAuthProvider.java``: reads a
``user:md5(salt||password)`` lines file named by the
``nineinfra.auth.file`` system property and rejects with a SASL
``AuthenticationException`` otherwise — byte-identical stored form to
:mod:`nineinfra_spark.auth`, which enforces the same scheme on REST).

Two wiring quirks, discovered empirically and load-bearing:

- ``CustomAuthenticationProviderImpl`` constructs a FRESH
  ``new HiveConf()`` (verified in the bundled bytecode), so the
  provider CLASS NAME must come from a ``hive-site.xml`` on the
  driver classpath — session confs never reach it. We generate that
  file and prepend its directory to ``spark.driver.extraClassPath``.
- ``spark.driver.extraClassPath`` / ``extraJavaOptions`` only apply
  at JVM launch, so the auth profile must be configured BEFORE
  ``getOrCreate`` (``Engine.open`` does this; a process whose JVM is
  already up cannot adopt it — run the auth profile in its own
  process, as the gateway tests do).

What stays env-blocked: ``doAs`` IMPERSONATION (running engine jobs
AS the authenticated user) needs Hadoop proxy-user infrastructure
this container doesn't ship. Authentication itself — the 401-vs-200
half of the reference's contract — is fully enforced here.
"""

from __future__ import annotations

import hashlib
import os
import subprocess
from collections.abc import Mapping
from glob import glob

from nineinfra_spark.auth import hash_password

_JAVA_SRC = os.path.join(os.path.dirname(__file__), "java", "NineAuthProvider.java")
PROVIDER_CLASS = "nineinfra.NineAuthProvider"


def _java_home() -> str:
    jh = os.environ.get("JAVA_HOME")
    if not jh:
        raise RuntimeError("JAVA_HOME not set; cannot compile the auth provider")
    return jh


def _thriftserver_jar() -> str:
    jars = glob("/opt/spark/jars/spark-hive-thriftserver_*.jar")
    if not jars:
        raise RuntimeError(
            "spark-hive-thriftserver jar not found under /opt/spark/jars"
        )
    return jars[0]


def secure_workdir(path: str) -> str:
    """Create (or validate) the auth workdir as an EXCLUSIVELY-OWNED
    0700 directory. The directory feeds ``spark.driver.extraClassPath``
    and holds the credential file, so a pre-created world/group-writable
    or foreign-owned directory is a classpath-injection / credential-
    disclosure vector on a shared host — reject it loudly instead of
    reusing whatever jar/hive-site/users file an attacker planted."""
    os.makedirs(path, mode=0o700, exist_ok=True)
    st = os.stat(path)
    if st.st_uid != os.getuid():
        raise RuntimeError(
            f"thrift-auth workdir {path} is owned by uid {st.st_uid}, "
            f"not us (uid {os.getuid()}); refusing to load jars from it"
        )
    if st.st_mode & 0o022:
        raise RuntimeError(
            f"thrift-auth workdir {path} is group/other-writable "
            f"(mode {oct(st.st_mode & 0o777)}); refusing to load jars from it"
        )
    return path


def build_auth_jar(workdir: str) -> str:
    """Compile ``NineAuthProvider.java`` against Spark's thriftserver
    jar into ``<workdir>/nineauth.jar`` (content-cached: recompiles
    only when the source hash changes). Returns the jar path. The
    workdir must pass :func:`secure_workdir` — a cached jar is only
    reused from a directory we exclusively own."""
    secure_workdir(workdir)
    with open(_JAVA_SRC, "rb") as f:
        src_hash = hashlib.md5(f.read()).hexdigest()[:12]
    jar = os.path.join(workdir, f"nineauth-{src_hash}.jar")
    if os.path.exists(jar):
        return jar
    # per-pid scratch dir: two engines racing the build in a shared
    # workdir must not share class output — `jar cf` could pack a
    # half-written .class the other's javac is still emitting (the
    # PUBLISH below is already atomic; this makes the build inputs
    # race-free too)
    classes = os.path.join(workdir, f"classes-{src_hash}-{os.getpid()}")
    jh = _java_home()
    try:
        subprocess.run(
            [
                os.path.join(jh, "bin", "javac"),
                "-cp",
                _thriftserver_jar(),
                "-d",
                classes,
                _JAVA_SRC,
            ],
            check=True,
            capture_output=True,
        )
        # build to a tmp name and publish with an atomic rename: `jar cf`
        # writing the FINAL path directly meant a crash mid-write (or a
        # second engine racing the build in a shared warehouse workdir)
        # left a truncated jar the exists-check then returned from cache
        # forever (r11 review finding; same idiom as discovery.py)
        tmp = f"{jar}.tmp-{os.getpid()}"
        subprocess.run(
            [os.path.join(jh, "bin", "jar"), "cf", tmp, "-C", classes, "."],
            check=True,
            capture_output=True,
        )
        os.replace(tmp, jar)
    finally:
        # the scratch classes dir (and a tmp jar a failed publish left)
        # must not accumulate per pid in a long-lived warehouse workdir
        # (r13 review pass — the avro/discovery staging-debris class)
        import shutil

        shutil.rmtree(classes, ignore_errors=True)
        try:
            os.remove(f"{jar}.tmp-{os.getpid()}")
        except FileNotFoundError:
            pass
    return jar


def write_users_file(path: str, users: Mapping[str, str]) -> str:
    """Write the provider's credential file from plaintext passwords:
    one ``username:md5(salt||password)`` line per user (the
    reference's stored form; plaintext never touches disk). 0600
    permissions — it is a credential store."""
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    # validate BEFORE creating the file, and refuse any separator or
    # control character — a username containing '\n' would inject an
    # attacker-chosen extra credential line into the store (':' alone
    # was rejected; the newline class is the dangerous one)
    for user in users:
        if ":" in user or any(ch.isspace() or ord(ch) < 0x20 for ch in user):
            raise ValueError(
                f"username may not contain ':', whitespace, or control "
                f"characters: {user!r}"
            )
    # 0600 from the first byte: create-with-mode, never write-then-chmod
    # — under umask 022 the old order left the hashes world-readable
    # until the chmod landed
    fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_TRUNC, 0o600)
    with os.fdopen(fd, "w") as f:
        for user, pw in users.items():
            f.write(f"{user}:{hash_password(pw)}\n")
    os.chmod(path, 0o600)  # pre-existing file: tighten regardless
    return path


def write_conf_dir(workdir: str) -> str:
    """Generate the ``hive-site.xml`` naming the provider class (the
    only channel the factory's fresh HiveConf reads) and return the
    directory to prepend to the driver classpath."""
    conf_dir = os.path.join(workdir, "conf")
    os.makedirs(conf_dir, exist_ok=True)
    with open(os.path.join(conf_dir, "hive-site.xml"), "w") as f:
        f.write(
            "<?xml version=\"1.0\"?>\n<configuration>\n"
            "  <property>\n"
            "    <name>hive.server2.custom.authentication.class</name>\n"
            f"    <value>{PROVIDER_CLASS}</value>\n"
            "  </property>\n"
            "</configuration>\n"
        )
    return conf_dir


def prepare_thrift_auth(workdir: str, users: Mapping[str, str]) -> dict[str, str]:
    """One-call setup: compile the provider, write the credential file
    and hive-site.xml, and return the Spark confs to apply to the
    session BUILDER (before ``getOrCreate``)."""
    jar = build_auth_jar(workdir)
    users_file = write_users_file(os.path.join(workdir, "users.txt"), users)
    conf_dir = write_conf_dir(workdir)
    return {
        "spark.driver.extraClassPath": f"{jar}:{conf_dir}",
        "spark.driver.extraJavaOptions": f"-Dnineinfra.auth.file={users_file}",
        "spark.hadoop.hive.server2.authentication": "CUSTOM",
    }

"""Property tests for merge._missing_path — the exception-text parser
the versioned-merge race classifier trusts (the r12 lesson: parsers
get hypothesis suites, not eyeballs)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from nineinfra_spark.operators.merge import _missing_path

_SEG = st.text(
    alphabet="abcdefghij0123456789_-", min_size=1, max_size=8
)
_PATH = st.lists(_SEG, min_size=1, max_size=5).map(lambda s: "/" + "/".join(s))
_URI_PREFIX = st.sampled_from(["", "file:", "file:/", "file://"])
_DECOY = st.sampled_from(
    [
        "",
        "Table location /warehouse/db.db/orders_stage is unavailable. ",
        "LOCATION '/warehouse/datahouse' set. ",
    ]
)


def _shapes(path: str, uri: str) -> list[str]:
    p = uri.rstrip("/") + path if uri else path
    return [
        f"[FAILED_READ_FILE.FILE_NOT_EXIST] Encountered error while reading file {p}. SQLSTATE: KD001",
        f"java.io.FileNotFoundException: File {p} does not exist",
        f"java.io.FileNotFoundException: {p} (No such file or directory)",
        f"File not found: {p} it may have been moved",
        f"{p} does not exist. It is possible the underlying files were updated.",
    ]


@settings(max_examples=300, deadline=None)
@given(
    path=_PATH,
    uri=_URI_PREFIX,
    decoy=_DECOY,
    shape=st.integers(min_value=0, max_value=4),
)
def test_planted_path_extracted_through_noise(path, uri, decoy, shape):
    """Whatever stable decoy paths precede the FileNotFound clause and
    whatever file:-URI slash style the JVM used, the extracted token is
    the planted path — two errors on different files must never
    extract the same decoy prefix (the r11 ADVICE escalation bug)."""
    msg = decoy + _shapes(path, uri)[shape]
    got = _missing_path(RuntimeError(msg))
    assert got == path, (msg, got)


@settings(max_examples=100, deadline=None)
@given(path=_PATH, decoy=_DECOY)
def test_unanchored_messages_return_none(path, decoy):
    """A message that carries paths but NO FileNotFound clause must
    return None (stay on the bounded retry path) — never guess."""
    msg = f"{decoy}Analysis failed for location {path} with code 42"
    assert _missing_path(RuntimeError(msg)) is None


@settings(max_examples=100, deadline=None)
@given(a=_PATH, b=_PATH)
def test_distinct_planted_paths_extract_distinct(a, b):
    msgs = [
        f"java.io.FileNotFoundException: File {p} does not exist"
        for p in (a, b)
    ]
    got = [_missing_path(RuntimeError(m)) for m in msgs]
    assert (got[0] == got[1]) == (a == b)

"""Engine.close teardown atomicity (r15 review pass): a wedged
frontend's stop() must not leak the other frontends or the JVM —
everything is attempted, the first error propagates last. Pure-fake
test, no JVM."""

from __future__ import annotations

import pytest

from nineinfra_spark.engine import Engine, EngineConfig


class _Fake:
    def __init__(self, fail: bool = False):
        self.fail = fail
        self.stopped = False

    def stop(self) -> None:
        self.stopped = True
        if self.fail:
            raise RuntimeError("wedged gateway")

    deregister = stop  # registration handles share the shape


def test_close_stops_everything_despite_failures():
    eng = Engine(EngineConfig())
    rest, mysql, spark = _Fake(fail=True), _Fake(), _Fake()
    eng.rest_gateway, eng.mysql_gateway, eng._spark = rest, mysql, spark
    with pytest.raises(RuntimeError, match="wedged gateway"):
        eng.close()
    assert rest.stopped and mysql.stopped and spark.stopped
    assert eng.rest_gateway is None and eng.mysql_gateway is None
    assert eng._spark is None


class _Interrupted(_Fake):
    def stop(self) -> None:
        self.stopped = True
        raise KeyboardInterrupt

    deregister = stop


def test_close_prefers_interrupt_over_earlier_exception():
    """r15 ADVICE: an ordinary stop() failure followed by a Ctrl-C in
    a later stop() must re-raise the INTERRUPT, not swallow it behind
    errs[0] — the losing error survives as a __notes__ entry."""
    eng = Engine(EngineConfig())
    rest, mysql, spark = _Fake(fail=True), _Interrupted(), _Fake()
    eng.rest_gateway, eng.mysql_gateway, eng._spark = rest, mysql, spark
    with pytest.raises(KeyboardInterrupt) as exc_info:
        eng.close()
    assert rest.stopped and mysql.stopped and spark.stopped
    notes = "\n".join(getattr(exc_info.value, "__notes__", []))
    assert "wedged gateway" in notes


def test_close_clean_path_no_error():
    eng = Engine(EngineConfig())
    rest, spark = _Fake(), _Fake()
    eng.rest_gateway, eng._spark = rest, spark
    eng.close()
    assert rest.stopped and spark.stopped
    # idempotent second close
    eng.close()

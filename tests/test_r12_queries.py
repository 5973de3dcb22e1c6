"""Semantic pins for the r12-registered queries — the INTENT behind
the hash oracles: the drift monitor must actually flag the engineered
mixture change, in the right direction, and only where support is
adequate. (zorder_skipping_read's semantics live in
tests/test_zorder.py::TestSkippingRead.)"""

from __future__ import annotations

SF01 = "/root/testdata/sf0.01"
SF1 = "/root/testdata/sf0.1"


def _drift(spark, sf):
    from nineinfra_spark.plans import registry

    rows = registry.get("text_snapshot_drift").fn(spark, sf).collect()
    return {(r["lang"], r["source"]): r for r in rows}


class TestSnapshotDriftSemantics:
    def test_engineered_statuses_fire_at_sf01(self, spark):
        """The new snapshot halves 'de' (drift_down), the old one
        lacked a third of 'fr' (drift_up), (zh, src0) disappears
        (gone). Every adequately-supported de/fr cell must carry its
        engineered verdict; untouched languages never report drift."""
        cells = _drift(spark, SF1)
        de = [r for (lang, _), r in cells.items() if lang == "de"]
        fr = [r for (lang, _), r in cells.items() if lang == "fr"]
        assert any(r["status"] == "drift_down" for r in de)
        assert any(r["status"] == "drift_up" for r in fr)
        # engineered cells never report the WRONG direction
        assert not any(r["status"] == "drift_up" for r in de)
        assert not any(r["status"] == "drift_down" for r in fr)
        assert cells[("zh", "src0")]["status"] == "gone"
        # untouched languages: mostly stable. NOT "all stable" — cells
        # near the support floor cross the ±25% band by md5-sampling
        # noise alone (observed: an (es, src1) 51-doc cell at ratio
        # 0.76), which is exactly why real monitors pair a ratio band
        # with a support floor; the engineered signals above must
        # dominate the noise, not silence it.
        untouched = [
            r
            for (lang, _), r in cells.items()
            if lang in ("en", "es") and r["status"] != "low_support"
        ]
        stable = sum(r["status"] == "stable" for r in untouched)
        assert stable >= 0.8 * len(untouched), [
            (r["lang"], r["source"], r["status"]) for r in untouched
        ]
        # and a supported untouched cell can never be new/gone (both
        # snapshots draw 80% windows of the same rows)
        assert not any(r["status"] in ("new", "gone") for r in untouched)

    def test_low_support_gate(self, spark):
        """Cells below the 20-doc support floor report low_support —
        never a noise-driven drift verdict."""
        for cells in (_drift(spark, SF01), _drift(spark, SF1)):
            for r in cells.values():
                if r["n_old"] + r["n_new"] < 20:
                    assert r["status"] == "low_support", r
                else:
                    assert r["status"] != "low_support", r

    def test_counts_are_consistent_views_of_one_corpus(self, spark):
        """Both snapshots are views of the SAME corpus: every cell
        count is bounded by the cell's corpus size, and the md5-keyed
        80% windows overlap — a cell can't have BOTH snapshots empty
        (those rows are filtered out)."""
        cells = _drift(spark, SF01)
        assert cells  # non-empty grid
        for r in cells.values():
            assert r["n_old"] >= 0 and r["n_new"] >= 0
            assert r["n_old"] + r["n_new"] > 0

"""events_funnel_conversion on an EMPTY events table.

The global aggregate still yields ONE row of zero counts, so the
stage-ratio divisions see n1 = 0 — before the r11 guard that raised
ANSI DIVIDE_BY_ZERO (the one registered query with a known crashing
input, found by the r10 repo-wide division sweep). An empty funnel
has NULL conversion rates, never a crashed job.
"""

from __future__ import annotations

SF_SMOKE = "/root/testdata/sf0.001"


class TestEmptyFunnel:
    def _empty_events_dir(self, spark, tmp_path) -> str:
        schema = spark.read.parquet(f"{SF_SMOKE}/events.parquet").schema
        spark.createDataFrame([], schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / "events.parquet"))
        return str(tmp_path)

    def test_empty_events_yield_null_rates_not_error(self, spark, tmp_path):
        from nineinfra_spark.plans.windows import events_funnel_conversion

        rows = {
            r["stage_idx"]: r
            for r in events_funnel_conversion(
                spark, self._empty_events_dir(spark, tmp_path)
            ).collect()
        }
        assert sorted(rows) == [1, 2, 3]
        assert all(rows[k]["n_users"] == 0 for k in rows)
        # stage 1's rate is the definitional 100% literal; the guarded
        # ratios are NULL (0-user prior stage), not a raise
        assert rows[1]["conv_prev_bps"] == 10000
        for k in (2, 3):
            assert rows[k]["conv_prev_bps"] is None
            assert rows[k]["conv_top_bps"] is None

    def test_nonempty_rates_unchanged(self, spark):
        """The guard must be a no-op on real data: every ratio on the
        smoke SF is non-NULL and stage counts are monotone."""
        from nineinfra_spark.plans.windows import events_funnel_conversion

        rows = {
            r["stage_idx"]: r
            for r in events_funnel_conversion(spark, SF_SMOKE).collect()
        }
        assert rows[1]["n_users"] >= rows[2]["n_users"] >= rows[3]["n_users"]
        assert rows[2]["n_users"] > 0, "smoke SF should convert some users"
        for k in (2, 3):
            assert rows[k]["conv_prev_bps"] is not None
            assert rows[k]["conv_top_bps"] is not None

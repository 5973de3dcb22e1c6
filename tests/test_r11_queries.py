"""Property contracts for the three round-11 additions beyond the
oracle sweep (test_oracle_all covers the differential check):

- split_leakage_guard: the guard is NON-VACUOUS — the naive per-doc
  split provably tears duplicate clusters across splits while the
  guarded assignment never does, and the split census is a partition
  of the corpus.
- agg_weighted_median: the reported value satisfies the lower
  weighted-median definition against a brute-force pandas recompute.
- events_path_3gram: a real top-k — fully ordered, monotone counts,
  paths drawn from the corpus's event-type alphabet.
"""

from __future__ import annotations

SF_SMOKE = "/root/testdata/sf0.001"


class TestSplitLeakageGuard:
    def test_guard_holds_and_census_partitions(self, spark):
        from nineinfra_spark.plans.sortlimit import split_leakage_guard

        row = split_leakage_guard(spark, SF_SMOKE).collect()[0]
        n_base = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
        # corpus = originals + one rendition each
        assert row["n_docs"] == 2 * n_base
        # every original+rendition pair clusters → all clusters multi
        assert row["n_multi_clusters"] == row["n_clusters"]
        # the naive split WOULD leak; the guarded one never does
        assert row["naive_leaky_clusters"] > 0
        assert row["guarded_leaky_clusters"] == 0
        # census partitions the corpus
        assert (
            row["train_docs"] + row["valid_docs"] + row["test_docs"]
            == row["n_docs"]
        )


class TestWeightedMedian:
    def test_lower_weighted_median_definition(self, spark):
        from nineinfra_spark.plans.aggregates import agg_weighted_median

        got = {
            r["l_returnflag"]: r
            for r in agg_weighted_median(spark, SF_SMOKE).collect()
        }
        li = (
            spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
            .select("l_returnflag", "l_extendedprice", "l_quantity")
            .toPandas()
        )
        li["cents"] = (li["l_extendedprice"] * 100).round().astype("int64")
        li["w"] = li["l_quantity"].astype("int64")
        for flag, grp in li.groupby("l_returnflag"):
            tot = int(grp["w"].sum())
            med = got[flag]["wmedian_cents"]
            assert got[flag]["total_weight"] == tot
            # mass at or below the median reaches half…
            assert 2 * int(grp.loc[grp["cents"] <= med, "w"].sum()) >= tot
            # …and strictly below it does not (lower weighted median)
            assert 2 * int(grp.loc[grp["cents"] < med, "w"].sum()) < tot


class TestPath3gram:
    def test_topk_ordered_and_from_alphabet(self, spark):
        from nineinfra_spark.plans.windows import events_path_3gram

        rows = events_path_3gram(spark, SF_SMOKE).collect()
        assert len(rows) == 10
        counts = [r["n_paths"] for r in rows]
        assert counts == sorted(counts, reverse=True)
        types = {
            r["event_type"]
            for r in spark.read.parquet(f"{SF_SMOKE}/events.parquet")
            .select("event_type")
            .distinct()
            .collect()
        }
        for r in rows:
            assert {r["step1"], r["step2"], r["step3"]} <= types
            assert r["n_paths"] > 0

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


class TestSplitExpressionParity:
    def test_split_of_matches_sql_rendering_cross_engine(self, spark):
        """The guarded and plain splits share ONE expression pair
        (_split_of / _SPLIT_CASE_SQL — r11 review finding 4); this
        pins the pair itself: both renderings assign the same label
        to the same id on Spark and DuckDB, including the NEGATIVE
        rendition ids (-doc_id-1) the leakage guard feeds it."""
        import random

        import duckdb
        from pyspark.sql import functions as F

        from nineinfra_spark.plans.sortlimit import _SPLIT_CASE_SQL, _split_of

        rng = random.Random(11)
        ids = (
            [0, 1, -1, -2, 255, 256, 2**40, -(2**40)]
            + [rng.randrange(-(2**62), 2**62) for _ in range(200)]
        )
        got = dict(
            spark.createDataFrame([(i,) for i in ids], "id bigint")
            .select("id", _split_of(F.col("id")).alias("s"))
            .collect()
        )
        values = ", ".join(f"({i})" for i in ids)
        sql = (
            f"SELECT id, {_SPLIT_CASE_SQL.format(id='id')} AS s "
            f"FROM (VALUES {values}) AS t(id)"
        )
        want = dict(duckdb.sql(sql).fetchall())
        assert got == want
        # and the assignment really uses all three splits on this draw
        assert set(got.values()) == {"train", "valid", "test"}


class TestWeightedMedianRandomized:
    def test_matches_brute_force_on_random_weighted_multisets(
        self, spark, tmp_path
    ):
        """agg_weighted_median against an independent brute force on
        seeded random inputs, including the exact-half-mass boundary
        (2*cumw == tot) where the lower-median convention decides."""
        import random

        import pandas as pd

        from nineinfra_spark.plans.aggregates import agg_weighted_median

        rng = random.Random(7)
        rows = []
        # group 'E': engineered even-total boundary — two values, equal
        # weight: lower weighted median must be the SMALLER value
        rows += [("E", 10.00, 3.0), ("E", 20.00, 3.0)]
        # group 'S': single row
        rows += [("S", 42.42, 5.0)]
        # groups 'A'/'B': random multisets with duplicate values
        for g in ("A", "B"):
            for _ in range(300):
                rows.append(
                    (g, rng.randrange(1, 50) * 0.25, float(rng.randrange(1, 9)))
                )
        pdf = pd.DataFrame(
            rows, columns=["l_returnflag", "l_extendedprice", "l_quantity"]
        )
        sf = tmp_path / "wm"
        spark.createDataFrame(pdf).write.parquet(str(sf / "lineitem.parquet"))

        got = {
            r["l_returnflag"]: (r["wmedian_cents"], r["total_weight"])
            for r in agg_weighted_median(spark, str(sf)).collect()
        }

        pdf["cents"] = (pdf["l_extendedprice"] * 100).round().astype("int64")
        pdf["w"] = pdf["l_quantity"].astype("int64")
        for g, grp in pdf.groupby("l_returnflag"):
            agg = grp.groupby("cents")["w"].sum().sort_index()
            tot = int(agg.sum())
            cum = 0
            for v, w in agg.items():
                cum += int(w)
                if 2 * cum >= tot:
                    assert got[g] == (v, tot), g
                    break
        assert got["E"][0] == 1000  # lower median at the exact boundary


class TestPath3gramRandomized:
    def test_matches_brute_force_on_random_streams(self, spark, tmp_path):
        """events_path_3gram against an independent pandas brute force
        on a seeded random event log with heavy ts ties (the event_id
        tie-break is what makes the window deterministic)."""
        import random

        import pandas as pd

        from nineinfra_spark.plans.windows import events_path_3gram

        rng = random.Random(3)
        types = ["view", "click", "signup", "purchase"]
        rows = []
        eid = 0
        for user in range(40):
            for _ in range(rng.randrange(1, 12)):
                # coarse ts → many exact ties inside one user stream
                ts = pd.Timestamp("2024-01-01") + pd.Timedelta(
                    hours=rng.randrange(0, 5)
                )
                rows.append((eid, ts, user, rng.choice(types)))
                eid += 1
        pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
        sf = tmp_path / "p3"
        spark.createDataFrame(pdf).write.parquet(str(sf / "events.parquet"))

        got = [
            (r["step1"], r["step2"], r["step3"], r["n_paths"])
            for r in events_path_3gram(spark, str(sf)).collect()
        ]

        pdf = pdf.sort_values(["user_id", "ts", "event_id"])
        counts: dict[tuple, int] = {}
        for _, grp in pdf.groupby("user_id"):
            seq = grp["event_type"].tolist()
            for a, b, c in zip(seq, seq[1:], seq[2:]):
                counts[(a, b, c)] = counts.get((a, b, c), 0) + 1
        want = sorted(
            ((k[0], k[1], k[2], n) for k, n in counts.items()),
            key=lambda r: (-r[3], r[0], r[1], r[2]),
        )[:10]
        assert got == want

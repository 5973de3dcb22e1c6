"""[EXT] pipeline property tests: LSH recall vs exact ground truth,
mapInPandas determinism, and as-of join payload atomicity.

These cover the guarantees hash-equality can't: recall bounds for the
approximate operators and semantic edge cases built from hand-made
frames.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _pairs(df, a="doc_a", b="doc_b"):
    return {(r[a], r[b]) for r in df.select(a, b).collect()}


class TestDedupRecall:
    def test_minhash_recall_and_precision(self, spark):
        """Banded MinHash candidates, after exact-Jaccard verify, must
        recover ≥90% of the exact shingle-Jaccard pairs (j ≥ 0.5) and
        introduce nothing below the threshold (precision 1.0 by
        construction — every emitted pair is exact-verified)."""
        from nineinfra_spark.plans.ext_dedup import (
            dedup_minhash_pairs,
            dedup_shingle_jaccard,
        )

        exact = _pairs(dedup_shingle_jaccard(spark, SF))
        lsh = _pairs(dedup_minhash_pairs(spark, SF))
        assert exact, "ground-truth pair set is empty — testdata changed?"
        recall = len(lsh & exact) / len(exact)
        assert recall >= 0.9, f"minhash recall {recall:.2f} < 0.9"
        assert lsh <= exact, "minhash emitted a pair below the exact threshold"

    def test_minhash_jaccard_values_match_exact(self, spark):
        """For pairs found by both paths, the verified Jaccard must be
        identical (same exact verification kernel)."""
        from nineinfra_spark.plans.ext_dedup import (
            dedup_minhash_pairs,
            dedup_shingle_jaccard,
        )

        exact = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in dedup_shingle_jaccard(spark, SF).collect()
        }
        for r in dedup_minhash_pairs(spark, SF).collect():
            assert exact[(r["doc_a"], r["doc_b"])] == r["jaccard"]


class TestSimilarityRecall:
    def test_lsh_subset_of_exact(self, spark):
        """Sign-code LSH pairs are exact-cosine verified, so they must
        be a subset of the exact threshold join; recall is reported
        loosely (single-probe sign-LSH on weakly-clustered vectors)."""
        from nineinfra_spark.plans.ext_similarity import (
            ann_lsh_buckets,
            sim_join_exact_oracle,
        )

        exact = _pairs(sim_join_exact_oracle(spark, SF), "id_a", "id_b")
        lsh = _pairs(ann_lsh_buckets(spark, SF), "id_a", "id_b")
        assert exact, "ground-truth pair set is empty — testdata changed?"
        assert lsh <= exact
        recall = len(lsh & exact) / len(exact)
        assert recall >= 0.2, f"sign-LSH recall {recall:.2f} < 0.2"

    def test_pandas_kernel_bit_equals_builtin(self, spark):
        """The Arrow/pandas cosine kernel must be bit-identical to the
        JVM expression path (same sequential dim-order fold)."""
        from nineinfra_spark.plans.ext_similarity import (
            ann_cosine_topk,
            ann_cosine_topk_pandas,
        )

        a = ann_cosine_topk(spark, SF).collect()
        b = ann_cosine_topk_pandas(spark, SF).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))


class TestMultimodal:
    def test_decode_features_deterministic(self, spark):
        from nineinfra_spark.plans.ext_multimodal import mm_decode_features

        r1 = mm_decode_features(spark, SF).collect()
        r2 = mm_decode_features(spark, SF).collect()
        assert [tuple(r) for r in r1] == [tuple(r) for r in r2]

    def test_decode_features_shape(self, spark):
        from nineinfra_spark.plans.ext_multimodal import (
            N_HIST_BUCKETS,
            mm_decode_features,
        )

        rows = mm_decode_features(spark, SF).limit(20).collect()
        assert rows
        for r in rows:
            hist = [r[f"h{k}"] for k in range(N_HIST_BUCKETS)]
            assert all(h >= 0 for h in hist)
            assert sum(hist) == r["n_bytes"]  # every byte lands in one bucket
            assert r["n_bytes"] > 0

    def test_decode_image_is_explicit_stub(self):
        from nineinfra_spark.plans.ext_multimodal import decode_image

        with pytest.raises(NotImplementedError):
            decode_image(b"\x89PNG", "png")


class TestAsofAtomicity:
    def test_null_payload_not_mixed_across_rows(self, spark):
        """A matched right row whose payload is NULL must deliver
        (ts_right, NULL) — never an older row's payload stitched to
        the newer row's timestamp."""
        from nineinfra_spark.operators.asof import asof_join

        left = spark.createDataFrame([(1, 10)], "k int, ts int")
        right = spark.createDataFrame(
            [(1, 1, 100), (1, 5, None)], "k int, ts int, v int"
        )
        out = asof_join(left, right, on="k", ts="ts", payload=["v"], suffix="_r").collect()
        assert len(out) == 1
        row = out[0]
        assert row["ts_r"] == 5  # newest right row at-or-before wins
        assert row["v_r"] is None  # ... with ITS payload, not the older 100

    def test_duplicate_ts_tiebreak_deterministic(self, spark):
        """Duplicate right rows at equal (key, ts): the winner is
        chosen by struct-value order (max), not partition layout."""
        from nineinfra_spark.operators.asof import asof_join

        left = spark.createDataFrame([(1, 10)], "k int, ts int")
        right = spark.createDataFrame(
            [(1, 5, 7), (1, 5, 3)], "k int, ts int, v int"
        )
        for n_parts in (1, 2, 8):
            out = asof_join(
                left, right.repartition(n_parts), on="k", ts="ts",
                payload=["v"], suffix="_r",
            ).collect()
            assert out[0]["v_r"] == 7, f"tie-break changed with {n_parts} partitions"

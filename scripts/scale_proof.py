"""Scale-proof: the heaviest headline queries at sf0.1 vs sf1 (10×).

One session, same conf as bench.py; per query: one warm-up + median of
3 timed noop-writes at each SF. A correctly-scaling plan on local[32]
should cost ≲10× wall for 10× data; anything super-linear beyond ~15×
is a plan bug to investigate (AQE partition counts and constant
overheads make small deviations in both directions normal).

Run scripts/make_sf1.py first. Prints one markdown table for NOTES.md.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVIEST = [
    "text_decontaminate",
    "dedup_connected_clusters",
    "dedup_minhash_pairs",
    "fn_math",
    "q1_pricing_summary",
    "stream_tumbling_window",
    "q21_waiting_suppliers",
    "q15_top_supplier",
    "q9_product_type_profit",
    "q8_market_share",
]

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".sf1")


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _median_wall(fn, spark, sf_dir, runs=3) -> float:
    _force(fn(spark, sf_dir))  # warm-up
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        samples.append(time.perf_counter() - t0)
    return statistics.median(samples)


def main() -> int:
    from nineinfra_spark.engine import Engine
    from nineinfra_spark.plans import registry

    engine = Engine().open()
    spark = engine.spark

    names = sys.argv[1:] or HEAVIEST
    print("| Query | sf0.1 s | sf1 s | ratio (10× data) |")
    print("|---|---|---|---|")
    worst = 0.0
    for name in names:
        fn = registry.get(name).fn
        t01 = _median_wall(fn, spark, SF01)
        t1 = _median_wall(fn, spark, SF1)
        ratio = t1 / t01
        worst = max(worst, ratio)
        print(f"| {name} | {t01:.2f} | {t1:.2f} | {ratio:.1f}× |", flush=True)
    print(f"\nworst ratio: {worst:.1f}×", file=sys.stderr)
    engine.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())

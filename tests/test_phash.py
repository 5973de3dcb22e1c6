"""ahash_25 (plans/ext_multimodal.py) — the perceptual-hash kernel
behind mm_phash_neardup, pinned independently of Spark/DuckDB: known
block patterns, brightness invariances, and the pigeonhole guarantee
that makes the banded plan EXACT at the query's hamming threshold."""

from __future__ import annotations

import itertools
import random

import numpy as np

from nineinfra_spark.plans.ext_multimodal import (
    PHASH_BITS,
    PHASH_HAM_T,
    ahash_25,
)

_BANDS = 5
_BAND_BITS = PHASH_BITS // _BANDS


def _img(block_vals):
    """10×10×3 raster from a 5×5 grid of per-block byte values."""
    img = np.zeros((10, 10, 3), dtype=np.uint8)
    for bi in range(5):
        for bj in range(5):
            img[2 * bi : 2 * bi + 2, 2 * bj : 2 * bj + 2, :] = block_vals[bi][bj]
    return img


def test_known_patterns():
    # uniform image: no block exceeds the mean strictly → hash 0
    assert ahash_25(_img([[100] * 5] * 5)) == 0
    # one bright block → exactly that bit set
    vals = [[10] * 5 for _ in range(5)]
    vals[2][3] = 200
    assert ahash_25(_img(vals)) == 1 << (2 * 5 + 3)
    # bright half: rows 0-1 bright → bits 0..9
    vals = [[200] * 5, [200] * 5, [10] * 5, [10] * 5, [10] * 5]
    assert ahash_25(_img(vals)) == (1 << 10) - 1


def test_channel_sum_not_single_channel():
    """Luminance is r+g+b: a block bright in ONE channel only must
    count at a third of the all-channel brightness."""
    vals = [[30] * 5 for _ in range(5)]
    img = _img(vals)
    img[0:2, 0:2, 0] = 120  # red-only block: gray 120+30+30 = 180 > 90
    assert ahash_25(img) == 1


def test_pigeonhole_band_recall_exhaustive():
    """The claim the oracle hash-verifies corpus-wide, proven here in
    the abstract: ANY two 25-bit hashes at hamming ≤ PHASH_HAM_T share
    at least one whole 5-bit band — so band-collision blocking loses
    nothing at the query threshold. Exhaustive over all ≤4-bit error
    masks applied to random hashes."""
    rng = random.Random(7)
    masks = [0]
    for k in range(1, PHASH_HAM_T + 1):
        masks += [
            sum(1 << p for p in pos)
            for pos in itertools.combinations(range(PHASH_BITS), k)
        ]
    for _ in range(20):
        h = rng.getrandbits(PHASH_BITS)
        for m in masks:
            other = h ^ m
            shared = any(
                (h >> (b * _BAND_BITS)) & 31 == (other >> (b * _BAND_BITS)) & 31
                for b in range(_BANDS)
            )
            assert shared, (h, m)
    # and the guarantee is TIGHT: 5 errors, one per band, share nothing
    spread = sum(1 << (b * _BAND_BITS) for b in range(_BANDS))
    h = rng.getrandbits(PHASH_BITS)
    assert not any(
        (h >> (b * _BAND_BITS)) & 31 == ((h ^ spread) >> (b * _BAND_BITS)) & 31
        for b in range(_BANDS)
    )

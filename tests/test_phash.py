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


# -- 64-bit variant (mm_phash_neardup_64) ------------------------------------

from nineinfra_spark.plans.ext_multimodal import (  # noqa: E402
    PHASH64_BITS,
    PHASH64_GRID,
    PHASH64_HAM_T,
    ahash_grid,
)

_BANDS64 = 4
_BAND64_BITS = PHASH64_BITS // _BANDS64


def _img16(block_vals):
    """16×16×3 raster from an 8×8 grid of per-block byte values."""
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    for bi in range(8):
        for bj in range(8):
            img[2 * bi : 2 * bi + 2, 2 * bj : 2 * bj + 2, :] = block_vals[bi][bj]
    return img


def test_ahash64_known_patterns():
    assert ahash_grid(_img16([[100] * 8] * 8), PHASH64_GRID) == 0
    vals = [[10] * 8 for _ in range(8)]
    vals[3][5] = 200
    assert ahash_grid(_img16(vals), PHASH64_GRID) == 1 << (3 * 8 + 5)
    # the top bit is reachable: bright bottom-right block sets bit 63
    vals = [[10] * 8 for _ in range(8)]
    vals[7][7] = 200
    assert ahash_grid(_img16(vals), PHASH64_GRID) == 1 << 63


def test_signed_int64_packing_roundtrip():
    """Bit 63 packs into a SIGNED int64 (two's complement) for the
    Spark `long` column; band extraction masks after the arithmetic
    shift, so the signed value carries the same 4×16-bit bands and
    the same XOR popcount as the unsigned hash."""
    h = (1 << 63) | (1 << 17) | 5  # top bit set → negative as int64
    signed = h - (1 << 64)
    assert signed < 0
    for b in range(_BANDS64):
        assert (signed >> (b * _BAND64_BITS)) & 65535 == (
            h >> (b * _BAND64_BITS)
        ) & 65535
    other = h ^ 0b1011
    signed_other = other - (1 << 64) if other >= 1 << 63 else other
    assert bin((signed ^ signed_other) & ((1 << 64) - 1)).count("1") == 3


def test_pigeonhole_band_recall_64():
    """ANY two 64-bit hashes at hamming ≤ PHASH64_HAM_T share at
    least one whole 16-bit band (4 bands, 3 errors — pigeonhole);
    and the bound is tight: 4 spread errors can touch every band."""
    rng = random.Random(11)
    for _ in range(50):
        h = rng.getrandbits(PHASH64_BITS)
        k = rng.randint(0, PHASH64_HAM_T)
        m = sum(1 << p for p in rng.sample(range(PHASH64_BITS), k))
        other = h ^ m
        assert any(
            (h >> (b * _BAND64_BITS)) & 65535
            == (other >> (b * _BAND64_BITS)) & 65535
            for b in range(_BANDS64)
        ), (h, m)
    spread = sum(1 << (b * _BAND64_BITS) for b in range(_BANDS64))
    h = rng.getrandbits(PHASH64_BITS)
    assert not any(
        (h >> (b * _BAND64_BITS)) & 65535
        == ((h ^ spread) >> (b * _BAND64_BITS)) & 65535
        for b in range(_BANDS64)
    )

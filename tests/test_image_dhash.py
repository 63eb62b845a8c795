"""Perceptual image dHash near-dup (multimodal.dhash_from_png /
dhash_neardup_pairs): planted near-identical PNGs (one perturbed pixel)
must pair within a small Hamming radius through the REAL encode->decode
boundary; structurally different images must not; the hash keeps bit 63
clear so it stays in signed-64 range cross-engine."""

from __future__ import annotations

import numpy as np

from redshift_to_pendo_api_data_pipeline_spark.operators.multimodal import (
    dhash_from_png,
    dhash_neardup_pairs,
    png_encode,
)


def _img(mult: int, off: int, flip: int | None = None) -> bytes:
    idx = np.arange(256, dtype=np.int64) + 1
    px = (mult * idx + off) % 251
    if flip is not None:
        px[flip] = (px[flip] + 100) % 251
    return png_encode(px.astype(np.uint8).reshape(16, 16))


def test_dhash_neardup_pairs(spark):
    rows = [
        (1, _img(97, 5)),
        (2, _img(97, 5, flip=3)),      # near-dup of 1 (one pixel)
        (3, _img(97, 5, flip=6)),      # near-dup of 1 and 2
        (4, _img(151, 88)),            # different image
        (5, _img(151, 88, flip=2)),    # near-dup of 4
    ]
    df = spark.createDataFrame(rows, "doc_id long, png binary")
    hashes = dhash_from_png(df, "png", "doc_id")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dhash_neardup_pairs(hashes, "doc_id", max_hamming=6).collect()
    }
    assert {(1, 2), (1, 3), (2, 3), (4, 5)} <= set(pairs)
    assert all(h <= 4 for h in pairs.values())
    # the two families never cross-pair
    assert not any(a <= 3 < b for (a, b) in pairs)


def test_dhash_is_63_bit_nonnegative(spark):
    df = spark.createDataFrame(
        [(i, _img(64 + 7 * i, 3 * i)) for i in range(10)],
        "doc_id long, png binary",
    )
    vals = [r["dhash"] for r in dhash_from_png(df, "png", "doc_id").collect()]
    assert all(0 <= v < (1 << 63) for v in vals)
    assert len(set(vals)) == 10  # distinct ramps hash apart


def test_dhash_identical_images_hamming_zero(spark):
    df = spark.createDataFrame(
        [(1, _img(101, 9)), (2, _img(101, 9))], "doc_id long, png binary"
    )
    out = dhash_neardup_pairs(
        dhash_from_png(df, "png", "doc_id"), "doc_id"
    ).collect()
    assert len(out) == 1 and out[0]["hamming"] == 0


def test_audio_fingerprint_neardup(spark):
    import numpy as np

    from redshift_to_pendo_api_data_pipeline_spark.operators.multimodal import (
        audio_fingerprint_from_wav,
        wav_encode,
    )

    def clip(mult, off, spike=None):
        j = np.arange(1024, dtype=np.int64) + 1
        v = ((mult * j + off) % 2003) - 1001
        if spike is not None:
            v[spike] = 32000
        return wav_encode(v.astype("<i2"))

    rows = [
        (1, clip(97, 5)),
        (2, clip(97, 5, spike=19)),    # one corrupted sample
        (3, clip(151, 88)),            # different clip
    ]
    df = spark.createDataFrame(rows, "doc_id long, wav binary")
    prints = audio_fingerprint_from_wav(df, "wav", "doc_id")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dhash_neardup_pairs(prints, "doc_id", max_hamming=6).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 4
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_dhash_default_bands_guarantee_recall_at_max_hamming(spark):
    # pair differing in exactly 6 bits spread across the hash: every
    # 16-bit band differs (a 4-band config would miss it), but the
    # default n_bands = max_hamming + 1 pigeonholes one clean band
    h2 = sum(1 << b for b in (0, 10, 20, 30, 40, 50))
    df = spark.createDataFrame([(1, 0), (2, h2)], "doc_id long, dhash long")
    found = dhash_neardup_pairs(df, "doc_id", max_hamming=6).collect()
    assert len(found) == 1 and found[0]["hamming"] == 6
    missed = dhash_neardup_pairs(
        df, "doc_id", max_hamming=6, n_bands=4
    ).collect()
    assert missed == []  # the documented recall trade-off of small n_bands

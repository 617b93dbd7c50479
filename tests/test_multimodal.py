"""Multimodal-column invariants: schema/plumbing are real even though
the codec is synthetic (container has no media libs)."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from steaminganalysis_spark.operators.multimodal import (
    HDR_SIZE,
    _unpack_header,
    decode_media,
    decode_with_real_codec,
    image_features,
    media_table,
    resize_images,
    sample_video_frames,
)

SF = "/root/testdata/sf0.001"


def test_media_table_binary_and_metadata(spark):
    media = media_table(spark, SF)
    assert dict(media.dtypes)["payload"] == "binary"
    rows = media.collect()
    assert len(rows) == 500  # one per document
    mods = {r.modality for r in rows}
    assert mods == {"image", "audio", "video"}
    # payload header agrees with synthesis rules
    r = next(r for r in rows if r.modality == "image")
    magic, modality, w, h, nf = _unpack_header(r.payload)
    assert magic == b"SA" and modality == 1 and nf == 1
    assert len(r.payload) == HDR_SIZE + w * h


def test_decode_is_deterministic_and_consistent(spark):
    d1 = {r.media_id: r for r in decode_media(media_table(spark, SF)).collect()}
    d2 = {r.media_id: r for r in decode_media(media_table(spark, SF)).collect()}
    assert len(d1) == 500
    for mid, r in d1.items():
        s = d2[mid]
        assert (r.width, r.height, r.n_frames, r.n_bytes, r.mean_intensity) == (
            s.width,
            s.height,
            s.n_frames,
            s.n_bytes,
            s.mean_intensity,
        )
        assert 0 <= r.mean_intensity <= 255
        if r.modality != "audio":
            assert r.n_bytes == HDR_SIZE + r.width * r.height * r.n_frames


def test_image_features_are_normalized_histograms(spark):
    feats = image_features(media_table(spark, SF), n_bins=8).collect()
    assert feats
    for r in feats:
        assert len(r.features) == 8
        assert abs(sum(r.features) - 1.0) < 1e-3


def test_resize_roundtrip(spark):
    resized = resize_images(media_table(spark, SF), out_w=4, out_h=4)
    for r in resized.collect():
        magic, modality, w, h, nf = _unpack_header(r.payload)
        assert (w, h) == (4, 4)
        assert len(r.payload) == HDR_SIZE + 4 * 4 * nf


def test_video_frame_sampling(spark):
    media = media_table(spark, SF)
    frames = sample_video_frames(media, every=2)
    got = frames.groupBy("media_id").agg(F.count("*").alias("k")).collect()
    decoded = {
        r.media_id: r.n_frames
        for r in decode_media(media).filter(F.col("modality") == "video").collect()
    }
    assert got
    for r in got:
        expected = (decoded[r.media_id] + 1) // 2  # ceil(nf / 2)
        assert r.k == expected
    one = frames.first()
    assert one.frame_idx % 2 == 0


def test_audio_features_shapes_and_consistency(spark):
    import math

    from steaminganalysis_spark.operators.multimodal import audio_features, media_table

    media = media_table(spark, SF)
    rows = audio_features(media).collect()
    assert rows, "no audio rows"
    for r in rows:
        assert r.sample_rate == 8000
        assert len(r.window_rms) == 4
        assert all(w >= 0 for w in r.window_rms)
        # overall RMS consistent with per-window energies: equal-ish
        # windows → rms^2 ≈ mean of window rms^2 (windows differ by ≤1
        # sample, so allow a small tolerance)
        approx = math.sqrt(sum(w * w for w in r.window_rms) / 4)
        assert abs(approx - r.rms) < 2.0, (r.rms, approx)
        assert 0 <= r.zero_crossings < r.n_samples


def test_real_codec_is_clearly_stubbed(spark):
    with pytest.raises(NotImplementedError, match="not available"):
        decode_with_real_codec(media_table(spark, SF))


def test_registered_query_runs(spark):
    from steaminganalysis_spark.registry import collect_queries

    Q, O = collect_queries()
    assert "q_multimodal_decode" in Q and "q_multimodal_decode" not in O
    rows = Q["q_multimodal_decode"](spark, SF).collect()
    assert rows and {r.modality for r in rows} == {"image", "audio", "video"}


def test_registered_image_features_invariants(spark):
    """Histogram mass sums to ~1 per image and the top bin is a valid
    fraction."""
    from steaminganalysis_spark.registry import collect_queries

    QUERIES, _ = collect_queries()
    rows = QUERIES["q_multimodal_image_features"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert abs(r.hist_mass - 1.0) < 1e-3, r
        assert 0.0 < r.top_bin_frac <= 1.0


def test_registered_frame_sample_invariants(spark):
    """Every-2nd-frame sampling: first index 0, last index even, byte
    total positive."""
    from steaminganalysis_spark.registry import collect_queries

    QUERIES, _ = collect_queries()
    rows = QUERIES["q_multimodal_frame_sample"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert r.first_idx == 0 and r.last_idx % 2 == 0
        assert r.n_sampled >= 1 and r.total_bytes > 0


def test_registered_audio_features_invariants(spark):
    """Registered audio features: positive RMS, window count fixed,
    zero-crossings bounded by sample count."""
    from steaminganalysis_spark.registry import collect_queries

    QUERIES, _ = collect_queries()
    rows = QUERIES["q_multimodal_audio_features"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert r.rms > 0
        assert len(r.window_rms_s.split(",")) == 4
        assert 0 <= r.zero_crossings < r.n_samples


def test_phash_pairs_complete_and_planted_found(spark):
    """q_multimodal_phash must emit EXACTLY the brute-force pair set at
    the threshold (banding recall is guaranteed for hamming <= 7 by
    pigeonhole — completeness is a theorem here, so we assert it), and
    every planted companion pair must appear with hamming <= 2 (the
    two-sample swap keeps the grid mean, so at most the two swapped
    bits differ)."""
    from steaminganalysis_spark.operators.multimodal import (
        PHASH_COMPANION_OFFSET,
        PHASH_PLANT_MOD,
        PHASH_THRESHOLD,
        images_with_companions,
        phash_images,
    )
    from steaminganalysis_spark.registry import collect_queries

    QUERIES, _ = collect_queries()

    got = {
        (r.media_id_a, r.media_id_b): r.hamming
        for r in QUERIES["q_multimodal_phash"](spark, SF).collect()
    }
    hashes = {
        r.media_id: r.phash
        for r in phash_images(images_with_companions(spark, SF)).collect()
    }
    ids = sorted(hashes)
    expect = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1")
            if d <= PHASH_THRESHOLD:
                expect[(a, b)] = d
    assert got == expect
    planted = [
        i
        for i in ids
        if i < PHASH_COMPANION_OFFSET
        and i % PHASH_PLANT_MOD == 0
        and i + PHASH_COMPANION_OFFSET in hashes
    ]
    assert planted, "fixture produced no planted companions"
    for i in planted:
        pair = (i, i + PHASH_COMPANION_OFFSET)
        assert pair in got and got[pair] <= 2, pair


def test_phash_candidates_from_band_join_not_cartesian(spark):
    """Candidates must come from the (band, value) equi-join — no
    cartesian / broadcast-nested-loop product of the image table."""
    from steaminganalysis_spark.registry import collect_queries

    QUERIES, _ = collect_queries()
    df = QUERIES["q_multimodal_phash"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_multimodal_resize_key_invariants(spark):
    """The registered q_multimodal_resize key: every image resized to
    8×8 with n_bytes == header + 64·n_frames (re-derived independently
    from the source media's frame counts), checksums deterministic
    across invocations, exactly one row per image, and the row count
    matches the media table's image population."""
    from steaminganalysis_spark.operators.multimodal import (
        HDR_SIZE,
        _unpack_header,
        media_table,
    )
    from steaminganalysis_spark.registry import collect_queries

    QUERIES, _ = collect_queries()
    rows = QUERIES["q_multimodal_resize"](spark, SF).collect()
    assert rows
    media = media_table(spark, SF)
    imgs = media.filter("modality = 'image'").collect()
    nf_by_id = {}
    for r in imgs:
        _, _, _w, _h, nf = _unpack_header(r.payload)
        nf_by_id[r.media_id] = nf
    assert {r.media_id for r in rows} == set(nf_by_id)
    assert len(rows) == len(nf_by_id)
    for r in rows:
        assert (r.out_w, r.out_h) == (8, 8)
        assert r.n_bytes == HDR_SIZE + 8 * 8 * nf_by_id[r.media_id]
        assert 0 <= r.checksum < 2147483647
    again = {
        r.media_id: r.checksum
        for r in QUERIES["q_multimodal_resize"](spark, SF).collect()
    }
    assert again == {r.media_id: r.checksum for r in rows}

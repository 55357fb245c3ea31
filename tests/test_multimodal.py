import pytest

from duckdb_faiss_ext_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    return M.synthetic_media(spark, n=30).cache()


def test_extract_features_shape_and_determinism(media):
    feats = M.extract_features(media, dim=16).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r["feature"]) == 16
        assert len(r["content_hash"]) == 64
        assert r["n_bytes"] > 0
    # determinism: same payload bytes -> same feature
    again = {r["media_id"]: r["feature"] for r in M.extract_features(media, dim=16).collect()}
    first = {r["media_id"]: r["feature"] for r in feats}
    assert again == first


def test_frame_sampling_only_video(media):
    frames = M.sample_frames(media, every_ms=1000).collect()
    vids = {r["media_id"] for r in media.filter("modality = 'video'").collect()}
    assert {r["media_id"] for r in frames} == vids
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, fs in by_media.items():
        assert [f["frame_idx"] for f in sorted(fs, key=lambda x: x["frame_idx"])] == [0, 1, 2]
        assert all(f["ts_ms"] == f["frame_idx"] * 1000 for f in fs)
        assert len({bytes(f["frame_payload"]) for f in fs}) == 3  # distinct frames


def test_media_stats(media):
    stats = {r["modality"]: r for r in M.media_stats(media).collect()}
    assert set(stats) == {"image", "audio", "video"}
    assert stats["image"]["max_w"] == 64 and stats["image"]["max_h"] == 48
    assert stats["audio"]["max_w"] is None
    assert all(r["total_bytes"] > 0 for r in stats.values())


def test_resize_real_pixels(media):
    """resize_images decodes REAL PPM payloads, resamples, re-encodes."""
    from duckdb_faiss_ext_spark.operators import media_codecs as C

    images = media.filter("modality = 'image'")
    out = M.resize_images(images, 32, 24)
    rows = out.collect()
    assert all(r["width"] == 32 and r["height"] == 24 for r in rows)
    originals = {r["media_id"]: bytes(r["payload"]) for r in images.collect()}
    for r in rows:
        pixels = C.decode_ppm(bytes(r["payload"]))
        assert pixels.shape == (24, 32, 3)
        expect = C.resize_nearest(C.decode_ppm(originals[r["media_id"]]), 32, 24)
        assert (pixels == expect).all()


def test_resize_strict_rejects_codecless_formats(media):
    import pytest as _pytest

    videos = M.resize_images(media.filter("modality = 'video'"), 8, 8, strict=True)
    with _pytest.raises(Exception, match="no codec"):
        videos.collect()
    # default (non-strict): metadata-only passthrough, payload untouched
    loose = M.resize_images(media.filter("modality = 'video'"), 8, 8).collect()
    assert all(r["width"] == 8 and r["fmt"] == "mp4" for r in loose)


def test_extract_features_real_decode(media):
    """Image features are grid means over ACTUAL pixels; audio features are
    RMS energies over ACTUAL samples — not the stub embed."""
    import numpy as np

    from duckdb_faiss_ext_spark.operators import media_codecs as C

    feats = {r["media_id"]: r for r in M.extract_features(media, dim=16).collect()}
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    modality = {r["media_id"]: r["modality"] for r in media.collect()}
    for mid, row in feats.items():
        p = payloads[mid]
        if modality[mid] == "image":
            expect = C.image_grid_feature(C.decode_ppm(p), 16)
            assert np.allclose(row["feature"], expect)
        elif modality[mid] == "audio":
            samples, _ = C.decode_wav(p)
            expect = C.audio_energy_feature(samples, 16)
            assert np.allclose(row["feature"], expect)
            assert all(v >= 0 for v in row["feature"])  # energies, not noise


def test_feature_join_into_knn(spark, media):
    """Multimodal features flow into the vector engine unchanged."""
    from duckdb_faiss_ext_spark import FaissSparkEngine
    import pyspark.sql.functions as F

    feats = M.extract_features(media, dim=16)
    eng = FaissSparkEngine(spark)
    eng.create("media_idx", 16, "IDMap,Flat", metric_type="L2")
    eng.add("media_idx", feats.select("media_id", "feature"))
    q = feats.limit(3).select(
        F.col("media_id").alias("qid"), F.col("feature").alias("vector")
    )
    res = eng.search_flat("media_idx", 1, q).collect()
    assert all(r["label"] == r["qid"] and r["distance"] < 1e-5 for r in res)


def test_corrupt_decodable_payload_falls_back_to_stub(spark):
    """ADVICE r5: a payload that SNIFFS as PPM/BMP/WAV/PNG but is malformed
    must take the stub embed, not fail the whole extraction job."""
    import numpy as np

    from duckdb_faiss_ext_spark.operators import multimodal as MM

    bad_rows = [
        (1, "image", "ppm", bytearray(b"P6\n9 9\n255\nshort"), 9, 9, None, None),
        (2, "audio", "wav", bytearray(b"RIFF\x10\x00\x00\x00WAVEjunk"), None, None, 5, 8000),
        (3, "image", "png", bytearray(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16), 4, 4, None, None),
    ]
    df = spark.createDataFrame(bad_rows, schema=MM.MEDIA_SCHEMA)
    out = MM.extract_features(df, dim=8).collect()
    assert len(out) == 3
    for r in out:
        feat = np.asarray(r["feature"])
        assert feat.shape == (8,)
        assert not np.isnan(feat).any()
        # and it matches the stub embed exactly (deterministic contract)
        expect = MM._decode_stub(bytes([row for row in bad_rows if row[0] == r["media_id"]][0][3]), 8)
        assert np.allclose(feat, expect)


def test_resize_corrupt_payload_passthrough_and_strict(spark):
    from duckdb_faiss_ext_spark.operators import media_codecs as C
    from duckdb_faiss_ext_spark.operators import multimodal as MM

    bad = bytearray(b"P6\n9 9\n255\nshort")
    df = spark.createDataFrame(
        [(1, "image", "ppm", bad, 9, 9, None, None)], schema=MM.MEDIA_SCHEMA
    )
    out = MM.resize_images(df, 4, 4).collect()
    assert bytes(out[0]["payload"]) == bytes(bad)  # passed through untouched
    with pytest.raises(Exception, match="truncated|MediaDecodeError"):
        MM.resize_images(df, 4, 4, strict=True).collect()


def test_extract_and_resize_png_payload(spark):
    import numpy as np

    from duckdb_faiss_ext_spark.operators import media_codecs as C
    from duckdb_faiss_ext_spark.operators import multimodal as MM

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    payload = C.encode_png(px)
    df = spark.createDataFrame(
        [(1, "image", "png", bytearray(payload), 8, 8, None, None)],
        schema=MM.MEDIA_SCHEMA,
    )
    feat = np.asarray(MM.extract_features(df, dim=16).collect()[0]["feature"])
    assert np.allclose(feat, C.image_grid_feature(px, 16))  # REAL pixels
    resized = MM.resize_images(df, 4, 4).collect()[0]
    assert resized["fmt"] == "ppm"
    assert np.array_equal(
        C.decode_ppm(bytes(resized["payload"])), C.resize_nearest(px, 4, 4)
    )

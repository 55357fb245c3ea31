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


def test_resize_metadata_path(media):
    out = M.resize_images(media.filter("modality = 'image'"), 32, 32)
    rows = out.collect()
    assert all(r["width"] == 32 and r["height"] == 32 for r in rows)


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

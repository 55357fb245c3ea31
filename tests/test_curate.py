"""curate_media: one-pass sniff -> metadata -> policy -> decode-or-reject
(VERDICT r8 task 6).  Mixed good/corrupt/progressive/MP4/MP3 payloads."""

import numpy as np
import pytest

from duckdb_faiss_ext_spark.operators.curate import MediaPolicy, curate_media
from duckdb_faiss_ext_spark.operators.media_codecs import encode_ppm, encode_wav
from duckdb_faiss_ext_spark.operators.jpeg import encode_jpeg_progressive
from test_media_meta import build_mp3, build_mp4


def _mixed_df(spark):
    rng = np.random.default_rng(7)
    big = encode_ppm(rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8))
    tiny = encode_ppm(rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8))
    prog = encode_jpeg_progressive(
        rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8), quant=1
    )
    corrupt_jpeg = prog[:40] + b"\x00" * 10  # valid SOI/headers, cut body
    wav = encode_wav(
        (8000 * np.sin(np.arange(1600) / 10.0)).astype(np.int16), 16000
    )
    rows = [
        (0, bytearray(big)),            # kept (ppm, 64x48)
        (1, bytearray(tiny)),           # filtered:min_width (8x8)
        (2, bytearray(prog)),           # kept (progressive jpeg decodes)
        (3, bytearray(corrupt_jpeg)),   # decode_error (jpeg magic, cut body)
        (4, bytearray(wav)),            # kept (wav)
        (5, bytearray(build_mp4())),    # kept_stub (container metadata only)
        (6, bytearray(build_mp3(n_frames=8))),  # kept_stub
        (7, bytearray(b"\x00\x01gibberish")),   # filtered:unknown_format
    ]
    return spark.createDataFrame(rows, "media_id bigint, payload binary")


def test_curate_media_dispositions(spark):
    pol = MediaPolicy(min_width=16, min_height=16)
    out = curate_media(_mixed_df(spark), pol).orderBy("media_id").collect()
    status = {r["media_id"]: r["status"] for r in out}
    assert status == {
        0: "kept",
        1: "filtered:min_width",
        2: "kept",
        3: "decode_error",
        4: "kept",
        5: "kept_stub",
        6: "kept_stub",
        7: "filtered:unknown_format",
    }
    by_id = {r["media_id"]: r for r in out}
    # every row accounted for, metadata real where parseable
    assert by_id[0]["width"] == 64 and by_id[0]["height"] == 48
    assert by_id[2]["codec"] == "jpeg-progressive"
    assert by_id[5]["fmt"] == "mp4" and by_id[5]["has_video"]
    assert by_id[6]["fmt"] == "mp3" and by_id[6]["duration_ms"] > 0
    # features only where status is kept/kept_stub; real decode = 16 floats
    for mid, r in by_id.items():
        if r["status"].startswith("kept"):
            assert r["feature"] is not None and len(r["feature"]) == 16
        else:
            assert r["feature"] is None
    assert by_id[3]["reason"]  # decode_error carries the codec message


def test_curate_policy_scoping(spark):
    # formats scoping: only wav accepted; image dims must not reject mp3
    pol = MediaPolicy(formats=("wav",), min_duration_ms=50)
    out = curate_media(_mixed_df(spark), pol).collect()
    status = {r["media_id"]: r["status"] for r in out}
    assert status[4] == "kept"
    assert status[0] == "filtered:formats"
    assert status[6] == "filtered:formats"
    # duration gate on wav
    pol2 = MediaPolicy(formats=("wav",), min_duration_ms=10**9)
    out2 = curate_media(_mixed_df(spark), pol2).collect()
    assert {r["media_id"]: r["status"] for r in out2}[4] == "filtered:min_duration_ms"


def test_curate_require_video_and_bytes(spark):
    pol = MediaPolicy(formats=("mp4", "mp3"), require_video=True)
    out = {r["media_id"]: r["status"] for r in curate_media(_mixed_df(spark), pol).collect()}
    assert out[5] == "kept_stub"            # mp4 has video track
    assert out[6] == "filtered:require_video"
    pol2 = MediaPolicy(max_bytes=10)
    out2 = {r["media_id"]: r["status"] for r in curate_media(_mixed_df(spark), pol2).collect()}
    assert out2[0] == "filtered:max_bytes"


def test_curate_feature_matches_extract_features(spark):
    """kept-row features are IDENTICAL to multimodal.extract_features on the
    same payloads — one operator, same embed contract."""
    from duckdb_faiss_ext_spark.operators.multimodal import extract_features

    df = _mixed_df(spark)
    cur = {
        r["media_id"]: r["feature"]
        for r in curate_media(df, MediaPolicy()).collect()
        if r["feature"] is not None
    }
    ref = {
        r["media_id"]: r["feature"]
        for r in extract_features(
            df.selectExpr("media_id", "'x' as modality", "payload")
        ).collect()
    }
    for mid, f in cur.items():
        if mid == 3:
            continue
        assert np.allclose(f, ref[mid], atol=1e-6), mid

"""Container-metadata extraction (r8): MP4 box walking, MP3 frame headers,
header-only JPEG dims (incl. progressive SOF2), and the Arrow-batched Spark
wiring.  Synthetic blobs are built field-by-field from the public format
layouts, so every expected value is known by construction."""

import struct

import numpy as np
import pytest

from duckdb_faiss_ext_spark.operators import media_meta as M
from duckdb_faiss_ext_spark.operators.jpeg import encode_jpeg


# ------------------------------------------------------------- builders


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def build_mp4(width=320, height=240, timescale=1000, duration=5000) -> bytes:
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomavc1")
    mvhd = _box(
        b"mvhd",
        b"\x00\x00\x00\x00"  # version/flags
        + struct.pack(">II", 0, 0)  # ctime/mtime
        + struct.pack(">II", timescale, duration)
        + b"\x00" * 80,
    )
    tkhd = _box(
        b"tkhd",
        b"\x00\x00\x00\x07"
        + struct.pack(">IIII", 0, 0, 1, 0)  # ctime/mtime/track id/reserved
        + b"\x00" * 56  # duration + reserved + layer/group/volume + matrix
        + struct.pack(">II", width << 16, height << 16),
    )
    hdlr = _box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12 + b"VideoHandler\x00")
    avc1 = _box(b"avc1", b"\x00" * 78)
    stsd = _box(b"stsd", b"\x00" * 8 + avc1[:8])  # entry count + first fourcc
    stbl = _box(b"stbl", stsd)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + moov


def build_mp3(n_frames=10, bitrate_idx=9, sr_idx=0, with_id3=True) -> bytes:
    """MPEG1 Layer III frames: version bits 11, layer bits 01."""
    hdr = bytes(
        [0xFF, 0xFB, (bitrate_idx << 4) | (sr_idx << 2), 0b11000000]
    )  # mono
    bitrate = M._MP3_BITRATE_V1L3[bitrate_idx]
    sr = M._MP3_SAMPLERATE[3][sr_idx]
    flen = 144 * bitrate * 1000 // sr
    frame = hdr + b"\x00" * (flen - 4)
    blob = frame * n_frames
    if with_id3:
        tag_body = b"\x00" * 37
        blob = b"ID3\x03\x00\x00" + bytes([0, 0, 0, len(tag_body)]) + tag_body + blob
    return blob


# --------------------------------------------------------------- parsers


def test_mp4_meta_roundtrip():
    meta = M.parse_mp4_meta(build_mp4())
    assert meta["fmt"] == "mp4"
    assert meta["width"] == 320 and meta["height"] == 240
    assert meta["duration_ms"] == 5000
    assert meta["codec"] == "avc1"  # stsd entry wins over ftyp brand
    assert meta["has_video"] is True and meta["n_tracks"] == 1


def test_mp4_meta_64bit_and_truncation():
    blob = build_mp4(width=1920, height=1080, timescale=90000, duration=90000 * 7)
    meta = M.parse_mp4_meta(blob)
    assert meta["duration_ms"] == 7000
    assert meta["width"] == 1920
    # truncation keeps what was parseable, never raises
    partial = M.parse_mp4_meta(blob[: len(blob) // 2])
    assert partial["fmt"] == "mp4"


def test_mp3_meta_cbr():
    blob = build_mp3(n_frames=20, bitrate_idx=9, sr_idx=0)  # 128 kbps @ 44100
    meta = M.parse_mp3_meta(blob)
    assert meta["sample_rate"] == 44100
    assert meta["channels"] == 1
    assert meta["bitrate_kbps"] == 128
    assert meta["n_frames"] == 20
    # 20 frames x 1152 samples @ 44100 Hz = 522.4 ms
    assert abs(meta["duration_ms"] - 522) <= 1


def test_mp3_meta_without_id3_and_sniff():
    blob = build_mp3(n_frames=4, with_id3=False)
    assert M.sniff_container(blob) == "mp3"
    assert M.sniff_container(build_mp3()) == "mp3"  # via ID3 magic
    assert M.sniff_container(build_mp4()) == "mp4"
    assert M.sniff_container(b"\x00" * 64) is None
    meta = M.parse_mp3_meta(blob)
    assert meta["n_frames"] == 4


def test_jpeg_meta_baseline_and_progressive():
    px = (np.arange(16 * 24 * 3, dtype=np.uint8).reshape(16, 24, 3)) % 255
    blob = encode_jpeg(px, quant=2)
    meta = M.parse_jpeg_meta(blob)
    assert (meta["width"], meta["height"]) == (24, 16)
    assert meta["codec"] == "jpeg-baseline"
    # hand-flip the SOF marker to SOF2: progressive files yield dims too
    i = blob.index(b"\xff\xc0")
    prog = blob[:i] + b"\xff\xc2" + blob[i + 2 :]
    meta2 = M.parse_jpeg_meta(prog)
    assert (meta2["width"], meta2["height"]) == (24, 16)
    assert meta2["codec"] == "jpeg-progressive"


def test_dispatch_parse_media_meta():
    assert M.parse_media_meta(build_mp4())["fmt"] == "mp4"
    assert M.parse_media_meta(build_mp3())["fmt"] == "mp3"
    assert M.parse_media_meta(b"garbage-not-a-format")["fmt"] is None
    from duckdb_faiss_ext_spark.operators.media_codecs import encode_png

    px = np.zeros((5, 7, 3), dtype=np.uint8)
    meta = M.parse_media_meta(encode_png(px))
    assert meta["fmt"] == "png" and (meta["width"], meta["height"]) == (7, 5)


# ------------------------------------------------------------ Spark wiring


@pytest.mark.usefixtures("spark")
def test_extract_media_metadata_spark(spark):
    rows = [
        (0, bytearray(build_mp4())),
        (1, bytearray(build_mp3(n_frames=8))),
        (2, bytearray(encode_jpeg(np.full((8, 8, 3), 77, dtype=np.uint8)))),
        (3, bytearray(b"unknown-binary-payload")),
    ]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    out = {r["media_id"]: r for r in M.extract_media_metadata(df).collect()}
    assert out[0]["fmt"] == "mp4" and out[0]["width"] == 320
    assert out[1]["fmt"] == "mp3" and out[1]["n_frames"] == 8
    assert out[2]["fmt"] == "jpeg" and out[2]["codec"] == "jpeg-baseline"
    assert out[3]["fmt"] is None and out[3]["n_bytes"] == 22
    assert all(r["n_bytes"] > 0 for r in out.values())


def test_media_pipeline_example(spark):
    """examples/media_pipeline.py: triage -> decode -> featurize -> dup
    groups over the synthetic media table; real images/audio survive, the
    MJPEG half of the video rows decodes for REAL (r10), the random-byte
    half dies at the metadata filter."""
    from duckdb_faiss_ext_spark.operators.multimodal import synthetic_media
    from examples.media_pipeline import run_pipeline

    media = synthetic_media(spark, n=24)
    out = run_pipeline(media)
    # 24 rows = 8 image + 8 audio + 8 video (4 real MJPEG mp4 + 4 garbage);
    # images/audio/MJPEG survive, garbage dies at triage
    assert out["survivors"].count() == 20
    assert out["features"].count() == 20
    meta = {r["media_id"]: r for r in out["meta"].collect()}
    assert meta[0]["fmt"] == "ppm" and meta[0]["width"] == 64
    assert meta[1]["fmt"] == "wav" and meta[1]["duration_ms"] == 100
    assert meta[2]["fmt"] == "mp4" and meta[2]["status"] == "kept"  # MJPEG
    assert meta[5]["fmt"] is None  # random bytes: honestly unknown


def build_flac(sr=44100, channels=2, bps=16, total=441000, last=True) -> bytes:
    """Hand-packed STREAMINFO per the public xiph spec: sr:20 |
    (channels-1):3 | (bps-1):5 | total:36 in bytes 10..18."""
    bits = (sr << 44) | ((channels - 1) << 41) | ((bps - 1) << 36) | total
    body = (
        (4096).to_bytes(2, "big") * 2      # min/max block size
        + (0).to_bytes(3, "big") * 2       # min/max frame size (unknown)
        + bits.to_bytes(8, "big")
        + b"\x00" * 16                     # md5 of unencoded audio
    )
    hdr = bytes([(0x80 if last else 0x00) | 0x00]) + len(body).to_bytes(3, "big")
    return b"fLaC" + hdr + body


def test_wav_meta_header_only():
    """parse_wav_meta reads fmt/data chunk headers only — correct fields
    even when the sample body is REPLACED by garbage (proof no decode)."""
    from duckdb_faiss_ext_spark.operators.media_codecs import encode_wav

    wave = (1000 * np.sin(np.arange(3200) / 7.0)).astype(np.int16)
    blob = bytearray(encode_wav(wave, 16000))
    meta = M.parse_wav_meta(bytes(blob))
    assert meta["fmt"] == "wav" and meta["codec"] == "pcm"
    assert meta["sample_rate"] == 16000
    assert meta["duration_ms"] == 3200 * 1000 // 16000  # 200 ms
    assert meta["has_audio"]
    # corrupt every sample byte; header metadata must be unchanged
    blob[-6400:] = b"\xff" * 6400
    assert M.parse_wav_meta(bytes(blob)) == meta
    # dispatch routes wav through the header path
    assert M.parse_media_meta(bytes(blob))["sample_rate"] == 16000


def test_flac_meta_streaminfo():
    blob = build_flac(sr=48000, channels=1, bps=24, total=48000 * 10)
    assert M.sniff_container(blob) == "flac"
    meta = M.parse_flac_meta(blob)
    assert meta == {
        "fmt": "flac", "codec": "flac", "sample_rate": 48000,
        "channels": 1, "duration_ms": 10000, "has_audio": True,
    }
    assert M.parse_media_meta(blob)["fmt"] == "flac"
    # 36-bit total-samples boundary: large corpora do exceed 2^32 samples
    big = build_flac(sr=96000, total=(1 << 35) + 5)
    assert M.parse_flac_meta(big)["duration_ms"] == ((1 << 35) + 5) * 1000 // 96000
    # truncated/garbage stays loud-free with fmt tagged
    assert M.parse_flac_meta(b"fLaC\x00\x00")["fmt"] == "flac"

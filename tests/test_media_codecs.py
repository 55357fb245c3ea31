"""Pure-numpy media codecs (VERDICT r4 task 3): golden-byte decodes of the
uncompressed public formats — PPM (P6), 24-bit BMP, PCM16 WAV."""

import numpy as np
import pytest

from duckdb_faiss_ext_spark.operators import media_codecs as C


# ------------------------------------------------------------------- PPM

PPM_2X2 = b"P6\n2 2\n255\n" + bytes(
    [255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255]
)
PPM_PIXELS = np.array(
    [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8
)


def test_ppm_golden_decode():
    assert np.array_equal(C.decode_ppm(PPM_2X2), PPM_PIXELS)


def test_ppm_header_comments():
    with_comment = b"P6\n# a netpbm comment\n2 2\n# another\n255\n" + PPM_2X2[-12:]
    assert np.array_equal(C.decode_ppm(with_comment), PPM_PIXELS)


def test_ppm_roundtrip_and_errors():
    assert np.array_equal(C.decode_ppm(C.encode_ppm(PPM_PIXELS)), PPM_PIXELS)
    with pytest.raises(C.MediaDecodeError, match="truncated"):
        C.decode_ppm(PPM_2X2[:-1])
    with pytest.raises(C.MediaDecodeError, match="P6"):
        C.decode_ppm(b"P5\n2 2\n255\n" + PPM_2X2[-12:])
    with pytest.raises(C.MediaDecodeError, match="maxval"):
        C.decode_ppm(b"P6\n2 2\n65535\n" + PPM_2X2[-12:] * 2)


# ------------------------------------------------------------------- BMP


def _bmp_24(pixels: np.ndarray, top_down: bool = False) -> bytes:
    """Hand-built 24-bit BI_RGB BMP (the golden INPUT, not the codec)."""
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3
    rows = pixels[:, :, ::-1]  # RGB -> BGR
    if not top_down:
        rows = rows[::-1]
    raster = b"".join(
        rows[r].tobytes() + b"\x00" * (stride - w * 3) for r in range(h)
    )
    dib = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + (-h if top_down else h).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB
        + len(raster).to_bytes(4, "little")
        + (0).to_bytes(4, "little") * 4
    )
    header = (
        b"BM"
        + (14 + len(dib) + len(raster)).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
        + (14 + len(dib)).to_bytes(4, "little")
    )
    return header + dib + raster


def test_bmp_golden_decode_bottom_up_and_top_down():
    assert np.array_equal(C.decode_bmp(_bmp_24(PPM_PIXELS)), PPM_PIXELS)
    assert np.array_equal(
        C.decode_bmp(_bmp_24(PPM_PIXELS, top_down=True)), PPM_PIXELS
    )


def test_bmp_row_padding():
    """Width 3 -> 9 pixel bytes padded to a 12-byte stride."""
    px = np.arange(3 * 3 * 3, dtype=np.uint8).reshape(3, 3, 3)
    assert np.array_equal(C.decode_bmp(_bmp_24(px)), px)


def test_bmp_rejects_unsupported():
    payload = bytearray(_bmp_24(PPM_PIXELS))
    payload[28:30] = (8).to_bytes(2, "little")  # 8-bit palette
    with pytest.raises(C.MediaDecodeError, match="24-bit"):
        C.decode_bmp(bytes(payload))
    payload = bytearray(_bmp_24(PPM_PIXELS))
    payload[30:34] = (1).to_bytes(4, "little")  # BI_RLE8
    with pytest.raises(C.MediaDecodeError, match="uncompressed"):
        C.decode_bmp(bytes(payload))


# ------------------------------------------------------------------- WAV


def test_wav_roundtrip_mono_and_stereo():
    mono = np.array([0, 1000, -1000, 32767, -32768], dtype=np.int16)
    out, sr = C.decode_wav(C.encode_wav(mono, 16000))
    assert sr == 16000 and np.array_equal(out[:, 0], mono)
    stereo = np.array([[1, -1], [2, -2], [3, -3]], dtype=np.int16)
    out, sr = C.decode_wav(C.encode_wav(stereo, 44100))
    assert sr == 44100 and np.array_equal(out, stereo)


def test_wav_skips_metadata_chunks():
    body = C.encode_wav(np.array([5, 6], dtype=np.int16), 8000)
    # splice a LIST chunk between fmt and data
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + (4).to_bytes(4, "little") + b"INFO"
    spliced = bytearray(body[:fmt_end] + extra + body[fmt_end:])
    spliced[4:8] = (len(spliced) - 8).to_bytes(4, "little")
    out, sr = C.decode_wav(bytes(spliced))
    assert sr == 8000 and out[:, 0].tolist() == [5, 6]


def test_wav_rejects_non_pcm16():
    body = bytearray(C.encode_wav(np.array([1], dtype=np.int16), 8000))
    body[20:22] = (3).to_bytes(2, "little")  # IEEE float
    with pytest.raises(C.MediaDecodeError, match="PCM16"):
        C.decode_wav(bytes(body))


# ------------------------------------------------------ features / resize


def test_sniff_format():
    assert C.sniff_format(PPM_2X2) == "ppm"
    assert C.sniff_format(_bmp_24(PPM_PIXELS)) == "bmp"
    assert C.sniff_format(C.encode_wav(np.array([1], dtype=np.int16), 8000)) == "wav"
    assert C.sniff_format(b"\xff\xd8\xff\xe0 jpeg") == "jpeg"  # r7: real codec
    assert C.sniff_format(b"\xff\xd8\x00 not jpeg") is None
    assert C.sniff_format(None) is None


def test_image_grid_feature_exact():
    feat = C.image_grid_feature(PPM_PIXELS, 4)
    expect = PPM_PIXELS.astype(np.float32).mean(axis=2).reshape(-1) / 255.0
    assert np.allclose(feat, expect)


def test_audio_energy_feature_exact():
    samples = np.array([100, -100, 200, -200], dtype=np.int16)
    feat = C.audio_energy_feature(samples, 2)
    assert np.allclose(feat, np.array([100.0, 200.0]) / 32768.0)


def test_resize_nearest_golden():
    up = C.resize_nearest(PPM_PIXELS, 4, 4)
    assert up.shape == (4, 4, 3)
    # each source pixel becomes a 2x2 block under center-of-cell mapping
    for r in range(4):
        for c in range(4):
            assert np.array_equal(up[r, c], PPM_PIXELS[r // 2, c // 2])
    down = C.resize_nearest(up, 2, 2)
    assert np.array_equal(down, PPM_PIXELS)


# ------------------------------------------------------------------- PNG


def _png_filter_rows(px: np.ndarray, filters: list) -> bytes:
    """Spec-forward filterer (RFC 2083 §6): build the raw (pre-zlib) stream
    with a chosen filter id per row — the golden INPUT generator that
    exercises decode_png's unfilter recurrences."""
    h, w, ch = px.shape
    flat = px.astype(np.int16)
    out = b""
    for y in range(h):
        cur = flat[y].reshape(-1)
        prev = flat[y - 1].reshape(-1) if y else np.zeros(w * ch, dtype=np.int16)
        left = np.concatenate([np.zeros(ch, dtype=np.int16), cur[:-ch]])
        ul = np.concatenate([np.zeros(ch, dtype=np.int16), prev[:-ch]])
        f = filters[y]
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            filt = cur - ((left + prev) >> 1)
        else:  # Paeth
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul))
            filt = cur - pred
        out += bytes([f]) + (filt % 256).astype(np.uint8).tobytes()
    return out


def _png_raw(w, h, ctype, raw, depth=8, interlace=0):
    """Assemble a PNG container around a pre-filtered raw stream."""
    import zlib

    def chunk(t, d):
        return len(d).to_bytes(4, "big") + t + d + zlib.crc32(t + d).to_bytes(4, "big")

    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes(
        [depth, ctype, 0, 0, interlace]
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_roundtrip_golden():
    assert np.array_equal(C.decode_png(C.encode_png(PPM_PIXELS)), PPM_PIXELS)
    assert C.sniff_format(C.encode_png(PPM_PIXELS)) == "png"


def test_png_all_filters_decode():
    """One row per filter id 0..4 — pins each unfilter recurrence against
    the spec-forward filterer."""
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    raw = _png_filter_rows(px, [0, 1, 2, 3, 4])
    assert np.array_equal(C.decode_png(_png_raw(7, 5, 2, raw)), px)


def test_png_gray_and_rgba():
    rng = np.random.default_rng(11)
    gray = rng.integers(0, 256, size=(3, 4, 1), dtype=np.uint8)
    raw = _png_filter_rows(gray, [0, 2, 4])
    out = C.decode_png(_png_raw(4, 3, 0, raw))
    assert np.array_equal(out, np.repeat(gray, 3, axis=2))
    rgba = rng.integers(0, 256, size=(3, 4, 4), dtype=np.uint8)
    raw = _png_filter_rows(rgba, [1, 3, 4])
    out = C.decode_png(_png_raw(4, 3, 6, raw))
    assert np.array_equal(out, rgba[:, :, :3])  # alpha dropped


def test_png_split_idat_chunks():
    """IDAT is ONE zlib stream across chunks — split it and decode."""
    import zlib

    def chunk(t, d):
        return len(d).to_bytes(4, "big") + t + d + zlib.crc32(t + d).to_bytes(4, "big")

    full = C.encode_png(PPM_PIXELS)
    raw = _png_filter_rows(PPM_PIXELS, [0, 0])
    comp = zlib.compress(raw)
    ihdr = (2).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    split = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", comp[:5])
        + chunk(b"IDAT", comp[5:])
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(C.decode_png(split), C.decode_png(full))


def test_png_rejects_unsupported():
    raw = _png_filter_rows(PPM_PIXELS, [0, 0])
    with pytest.raises(C.MediaDecodeError, match="interlaced"):
        C.decode_png(_png_raw(2, 2, 2, raw, interlace=1))
    with pytest.raises(C.MediaDecodeError, match="bit depth 8"):
        C.decode_png(_png_raw(2, 2, 2, raw, depth=16))
    with pytest.raises(C.MediaDecodeError, match="color type 3"):
        C.decode_png(_png_raw(2, 2, 3, raw))
    with pytest.raises(C.MediaDecodeError, match="signature"):
        C.decode_png(b"\x89PNX" + b"\x00" * 32)
    good = C.encode_png(PPM_PIXELS)
    with pytest.raises(C.MediaDecodeError):
        C.decode_png(good[:-8])  # truncated: IEND gone
    with pytest.raises(C.MediaDecodeError, match="inflate|size"):
        C.decode_png(_png_raw(2, 2, 2, raw[:-3]))  # short raster


def test_image_grid_feature_small_image_no_nan():
    """ADVICE r5: image smaller than the feature grid must yield 0.0 for
    empty cells, never NaN (NaN would silently break cosine dedup)."""
    feat = C.image_grid_feature(PPM_PIXELS, 16)  # 2x2 image, 4x4 grid
    assert feat.shape == (16,)
    assert not np.isnan(feat).any()
    # the populated corner cells still carry the real block means
    expect4 = PPM_PIXELS.astype(np.float32).mean(axis=2).reshape(-1) / 255.0
    assert np.allclose(sorted(feat[feat > 0]), sorted(expect4[expect4 > 0]))


# -------------------------------------------------------- MJPEG-in-MP4 (r10)


def _clip(n_frames=3, h=48, w=64, seed=7):
    rng = np.random.default_rng(seed)
    return [
        rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for _ in range(n_frames)
    ]


def test_mjpeg_mp4_frame_grab_matches_standalone_jpeg():
    from duckdb_faiss_ext_spark.operators.jpeg import decode_jpeg, encode_jpeg

    frames = _clip()
    mp4 = C.encode_mjpeg_mp4(frames, fps=10, quant=1)
    # every sample's bytes and pixels match the standalone JPEG encode
    for f, frame in enumerate(frames):
        assert C.extract_mp4_frame(mp4, f) == encode_jpeg(frame, quant=1)
        assert np.array_equal(
            C.decode_mp4_frame(mp4, f), decode_jpeg(encode_jpeg(frame, quant=1))
        )


def test_mjpeg_mp4_metadata_parses():
    from duckdb_faiss_ext_spark.operators.media_meta import parse_media_meta

    mp4 = C.encode_mjpeg_mp4(_clip(n_frames=5), fps=10)
    meta = parse_media_meta(mp4)
    assert meta["fmt"] == "mp4" and meta["codec"] == "jpeg"
    assert (meta["width"], meta["height"]) == (64, 48)
    assert meta["duration_ms"] == 500  # 5 frames @ 10 fps
    assert meta["has_video"] and not meta.get("has_audio")


def test_mjpeg_mp4_rejections():
    mp4 = C.encode_mjpeg_mp4(_clip())
    with pytest.raises(C.MediaDecodeError, match="not resolvable"):
        C.decode_mp4_frame(mp4, 99)
    with pytest.raises(C.MediaDecodeError, match="not an MP4"):
        C.extract_mp4_frame(b"garbage bytes here!!")
    # a non-MJPEG codec keeps metadata but rejects decode: rewrite the
    # sample-entry fourcc to avc1 in place
    hacked = mp4.replace(b"jpeg", b"avc1")
    with pytest.raises(C.MediaDecodeError, match="no decoder"):
        C.extract_mp4_frame(hacked)
    # truncating mid-mdat: tables resolve but the sample range is gone...
    # the box walker stops at the malformed box, so either error is loud
    with pytest.raises(C.MediaDecodeError):
        C.extract_mp4_frame(mp4[:100])


def test_curate_media_keeps_real_mjpeg_mp4(spark):
    from duckdb_faiss_ext_spark.operators.curate import MediaPolicy, curate_media

    frames = _clip(n_frames=2)
    good = C.encode_mjpeg_mp4(frames, fps=10)
    hacked = good.replace(b"jpeg", b"avc1")  # valid container, no codec
    df = spark.createDataFrame(
        [(0, bytearray(good)), (1, bytearray(hacked))],
        "media_id bigint, payload binary",
    )
    out = {
        r["media_id"]: r
        for r in curate_media(df, MediaPolicy(formats=("mp4",)), dim=16).collect()
    }
    assert out[0]["status"] == "kept"  # real pixels decoded
    feat = np.array(out[0]["feature"], dtype=np.float32)
    ref = C.image_grid_feature(C.decode_mp4_frame(good), 16)
    assert np.allclose(feat, ref, atol=1e-6)
    assert out[1]["status"] == "kept_stub"  # honest stub for avc1


def test_curate_mjpeg_without_sample_tables_is_kept_stub(spark):
    """A container that declares an MJPEG video track but whose sample
    tables don't resolve (fragmented-MP4 shape: samples outside stbl)
    keeps the honest kept_stub disposition — its metadata is real, the
    decode is legitimately unavailable (r10 review fix)."""
    from duckdb_faiss_ext_spark.operators.curate import MediaPolicy, curate_media
    from duckdb_faiss_ext_spark.operators.media_codecs import _mp4_box

    entry = _mp4_box(b"jpeg", b"\x00" * 6 + (1).to_bytes(2, "big") + b"\x00" * 70)
    stsd = _mp4_box(b"stsd", (0).to_bytes(4, "big") + (1).to_bytes(4, "big") + entry)
    hdlr = _mp4_box(
        b"hdlr", (0).to_bytes(4, "big") * 2 + b"vide" + b"\x00" * 12
    )
    moov = _mp4_box(
        b"moov",
        _mp4_box(b"trak", _mp4_box(b"mdia", hdlr + _mp4_box(b"minf", _mp4_box(b"stbl", stsd)))),
    )
    frag = _mp4_box(b"ftyp", b"isom" + b"\x00" * 4 + b"iso5") + moov
    with pytest.raises(C.MediaDecodeError, match="not resolvable"):
        C.extract_mp4_frame(frag)
    df = spark.createDataFrame([(0, bytearray(frag))], "media_id bigint, payload binary")
    out = curate_media(df, MediaPolicy(formats=("mp4",)), dim=8).collect()
    assert out[0]["status"] == "kept_stub", out[0]

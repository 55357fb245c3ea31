"""Baseline JPEG codec (VERDICT r6 task 6).

Golden strategy mirrors PNG: a spec-forward encoder (encode_jpeg, with
per-image canonical DHT tables — the decoder runs the same generic table
builder web/camera files exercise) generates inputs; decode must
round-trip within quantization error.  Rejects pin the honest-stub
boundary (progressive, 12-bit, bad Huffman)."""

import numpy as np
import pytest

from duckdb_faiss_ext_spark.operators import media_codecs as C
from duckdb_faiss_ext_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)


def _grad(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255 // max(w - 1, 1)).astype(np.uint8)
    g = (yy * 255 // max(h - 1, 1)).astype(np.uint8)
    b = ((xx + yy) * 255 // max(h + w - 2, 1)).astype(np.uint8)
    return np.stack([r, g, b], axis=2)


def test_roundtrip_444_near_lossless():
    px = _grad(16, 24)
    out = decode_jpeg(encode_jpeg(px, quant=1))
    assert out.shape == px.shape and out.dtype == np.uint8
    # quant=1: error budget = DCT rounding + color transform, a few LSB
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 6
    assert np.abs(out.astype(float) - px).mean() < 2.0


def test_roundtrip_nonmultiple_of_8():
    px = _grad(13, 19)  # edge-padding + crop path
    out = decode_jpeg(encode_jpeg(px, quant=1))
    assert out.shape == (13, 19, 3)
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 6


def test_roundtrip_420_subsampled():
    px = _grad(32, 32)
    out = decode_jpeg(encode_jpeg(px, quant=1, subsample=True))
    assert out.shape == (32, 32, 3)
    # chroma is 2x2-averaged + nearest-upsampled: smooth gradients survive
    assert np.abs(out.astype(float) - px).mean() < 6.0
    # luminance survives almost exactly even at 4:2:0
    lum = lambda a: 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]  # noqa: E731
    assert np.abs(lum(out.astype(float)) - lum(px.astype(float))).mean() < 2.0


def test_roundtrip_coarse_quant_degrades_gracefully():
    px = _grad(16, 16)
    out = decode_jpeg(encode_jpeg(px, quant=16))
    assert out.shape == px.shape
    assert np.abs(out.astype(float) - px).mean() < 12.0  # lossy but sane


def test_roundtrip_grayscale_frame():
    px = _grad(10, 12)
    out = decode_jpeg(encode_jpeg(px, quant=1, gray=True))
    assert out.shape == (10, 12, 3)
    # single-component frame decodes Y replicated across RGB
    assert np.array_equal(out[..., 0], out[..., 1])
    lum = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
    assert np.abs(out[..., 0].astype(float) - lum).max() <= 4


def test_constant_image_and_extremes():
    for val in (0, 128, 255):
        px = np.full((8, 8, 3), val, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(px, quant=1))
        assert np.abs(out.astype(int) - int(val)).max() <= 2


def test_dispatch_through_decode_image():
    px = _grad(9, 9)
    payload = encode_jpeg(px, quant=1)
    assert C.sniff_format(payload) == "jpeg"
    out = C.decode_image(payload)
    assert out.shape == (9, 9, 3)


def test_sof2_flag_on_baseline_scan_rejects():
    """A baseline stream hand-flipped to SOF2 is MALFORMED progressive (a
    progressive DC scan must have Se=0) — the decoder says so rather than
    misreading the baseline scan."""
    px = _grad(8, 8)
    payload = bytearray(encode_jpeg(px))
    i = payload.find(b"\xff\xc0")
    payload[i + 1] = 0xC2
    with pytest.raises(C.MediaDecodeError, match="progressive"):
        decode_jpeg(bytes(payload))


def test_reject_12bit_precision():
    px = _grad(8, 8)
    payload = bytearray(encode_jpeg(px))
    i = payload.find(b"\xff\xc0")
    payload[i + 4] = 12  # SOF precision byte
    with pytest.raises(C.MediaDecodeError, match="12-bit"):
        decode_jpeg(bytes(payload))


def test_reject_truncated_entropy():
    px = _grad(16, 16)
    payload = encode_jpeg(px)
    with pytest.raises(C.MediaDecodeError):
        decode_jpeg(payload[: len(payload) // 2])


def test_reject_missing_soi():
    with pytest.raises(C.MediaDecodeError, match="SOI"):
        decode_jpeg(b"\x00\x01\x02\x03")


def test_malformed_jpeg_takes_stub_in_multimodal():
    """A payload that SNIFFS as jpeg but is corrupt must fall back to the
    stub embed in the pipeline (corpus-scale: one bad blob never kills a
    batch)."""
    from duckdb_faiss_ext_spark.operators.multimodal import _decode_stub, _embed_payload

    bad = b"\xff\xd8\xff\xe0 definitely not a real jpeg body"
    feat = _embed_payload(bad, 8)
    assert feat.shape == (8,)
    assert np.allclose(feat, _decode_stub(bad, 8))  # fell back, didn't raise
    # a VALID jpeg takes the REAL pixel path (differs from the stub)
    good = encode_jpeg(_grad(16, 16), quant=1)
    assert not np.allclose(_embed_payload(good, 8), _decode_stub(good, 8))


def test_roundtrip_with_restart_markers():
    """DRI + RSTn every 2 MCUs: the decoder's byte-align + DC-predictor
    reset path round-trips identically to the no-restart encoding."""
    px = _grad(24, 40)  # 3 x 5 = 15 MCUs at 4:4:4
    payload = encode_jpeg(px, quant=1, restart=2)
    assert b"\xff\xdd" in payload  # DRI present
    assert any(bytes([0xFF, 0xD0 + i]) in payload for i in range(8))
    out = decode_jpeg(payload)
    ref = decode_jpeg(encode_jpeg(px, quant=1))
    assert np.array_equal(out, ref)


def test_restart_markers_with_subsampling():
    px = _grad(32, 48)
    out = decode_jpeg(encode_jpeg(px, quant=1, subsample=True, restart=1))
    ref = decode_jpeg(encode_jpeg(px, quant=1, subsample=True))
    assert np.array_equal(out, ref)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_roundtrip_random_images(seed):
    """Property-style: random (non-smooth) images survive quant=1 within
    the DCT rounding budget at 4:4:4."""
    rng = np.random.default_rng(seed)
    h, w = int(rng.integers(8, 40)), int(rng.integers(8, 40))
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(px, quant=1))
    assert out.shape == (h, w, 3)
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 8


def test_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2: any run of 0xFF fill bytes may pad the stream before a
    marker byte; real encoders emit them for alignment (ADVICE r7)."""
    px = _grad(16, 16)
    blob = encode_jpeg(px, quant=1)
    assert blob[:2] == b"\xff\xd8"
    # inject fill bytes between SOI and the first segment, and again before
    # the next marker after the first segment ends
    seglen = int.from_bytes(blob[4:6], "big")
    first_end = 2 + 2 + seglen
    padded = (
        blob[:2] + b"\xff\xff\xff" + blob[2:first_end] + b"\xff" + blob[first_end:]
    )
    out_plain = decode_jpeg(blob)
    out_padded = decode_jpeg(padded)
    assert np.array_equal(out_plain, out_padded)


def test_grayscale_rounding_matches_color_path():
    """Single-component samples must ROUND like the YCbCr path, not truncate
    (ADVICE r7: 1-LSB downward bias)."""
    # a gentle gradient whose IDCT output lands near x.5 fractions often
    # enough that truncation vs rounding is visible in the mean
    yy, xx = np.mgrid[0:24, 0:24]
    g = ((xx + yy) * 255 // 46).astype(np.uint8)
    px = np.stack([g, g, g], axis=2)
    out = decode_jpeg(encode_jpeg(px, quant=1, gray=True))
    lum = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
    bias = (out[..., 0].astype(float) - lum).mean()
    # truncation showed ~-0.5 systematic bias; rounding must center near 0
    assert abs(bias) < 0.3


# ------------------------------------------------------- progressive (r8)
# The progressive encoder quantizes through the SAME front half as the
# baseline encoder, so the two streams carry IDENTICAL coefficients — the
# cross-decoder identity below is exact, and any progressive decode bug
# shows up as a pixel diff against the already-golden baseline decoder.

_DEEP_SA = [
    ((0, 1, 2), 0, 0, 0, 2), ((0, 1, 2), 0, 0, 2, 1), ((0, 1, 2), 0, 0, 1, 0),
    ((0,), 1, 20, 0, 3), ((0,), 21, 63, 0, 3),
    ((0,), 1, 20, 3, 2), ((0,), 21, 63, 3, 2),
    ((0,), 1, 20, 2, 1), ((0,), 21, 63, 2, 1),
    ((0,), 1, 20, 1, 0), ((0,), 21, 63, 1, 0),
    ((1,), 1, 63, 0, 1), ((1,), 1, 63, 1, 0),
    ((2,), 1, 63, 0, 1), ((2,), 1, 63, 1, 0),
]


@pytest.mark.parametrize(
    "case",
    [
        ("grad", 16, 24, 1, False),
        ("grad_nonmult8", 13, 19, 1, False),
        ("grad_sub", 32, 32, 1, True),
        ("coarse", 16, 16, 16, False),
        ("random", 40, 56, 2, False),
        ("random_sub_q8", 48, 48, 8, True),
    ],
)
def test_progressive_matches_baseline_decode(case):
    name, h, w, q, sub = case
    if name.startswith("grad"):
        px = _grad(h, w)
    else:
        px = np.random.default_rng(17).integers(0, 256, (h, w, 3)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(px, quant=q, subsample=sub))
    prog = decode_jpeg(encode_jpeg_progressive(px, quant=q, subsample=sub))
    assert np.array_equal(base, prog)  # pixel-EXACT


def test_progressive_deep_successive_approximation():
    rng = np.random.default_rng(23)
    px = rng.integers(0, 256, (24, 40, 3)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(px, quant=2))
    prog = decode_jpeg(encode_jpeg_progressive(px, quant=2, scans=_DEEP_SA))
    assert np.array_equal(base, prog)


def test_progressive_eob_runs_and_zrl():
    """A flat image with rare speckles maximizes EOB runs across blocks and
    long zero runs (ZRL) inside blocks — the two AC code paths the default
    gradient images barely touch."""
    rng = np.random.default_rng(5)
    px = np.where(rng.random((80, 80, 3)) < 0.002, 255, 10).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(px, quant=4))
    prog = decode_jpeg(encode_jpeg_progressive(px, quant=4))
    assert np.array_equal(base, prog)


def test_progressive_constant_and_extremes():
    for val in (0, 128, 255):
        px = np.full((8, 8, 3), val, dtype=np.uint8)
        assert np.array_equal(
            decode_jpeg(encode_jpeg_progressive(px)), decode_jpeg(encode_jpeg(px))
        )


def test_progressive_dispatches_through_decode_image():
    px = _grad(16, 16)
    blob = encode_jpeg_progressive(px)
    out = C.decode_image(blob)
    assert np.array_equal(out, decode_jpeg(encode_jpeg(px)))


def test_progressive_truncated_rejects():
    px = _grad(16, 16)
    blob = encode_jpeg_progressive(px)
    with pytest.raises(C.MediaDecodeError):
        decode_jpeg(blob[: len(blob) // 3])


@pytest.mark.parametrize("seed", [101, 202, 303, 404, 505])
def test_progressive_fuzz_random_shapes(seed):
    """Random dims/quant/subsample/content — a 100-seed sweep of this ran
    clean at r8; these five pin the property permanently."""
    rng = np.random.default_rng(seed)
    h, w = int(rng.integers(6, 40)), int(rng.integers(6, 40))
    q = int(rng.choice([1, 2, 4, 8, 16, 32]))
    sub = bool(rng.integers(0, 2))
    px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(px, quant=q, subsample=sub))
    prog = decode_jpeg(encode_jpeg_progressive(px, quant=q, subsample=sub))
    assert np.array_equal(base, prog)


def test_progressive_with_restart_markers():
    """DRI + RSTn inside progressive scans: EOB runs close and DC
    predictors reset at every boundary, in every scan kind (a 40-seed
    sweep over dims/quant/subsample/interval ran clean at r8)."""
    rng = np.random.default_rng(31)
    px = rng.integers(0, 256, (24, 40, 3)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(px, quant=4))
    for ri in (1, 3, 7):
        prog = decode_jpeg(encode_jpeg_progressive(px, quant=4, restart=ri))
        assert np.array_equal(base, prog)
    # subsampled + restart combines MCU interleave with boundary resets
    base_s = decode_jpeg(encode_jpeg(px, quant=4, subsample=True))
    prog_s = decode_jpeg(encode_jpeg_progressive(px, quant=4, subsample=True, restart=2))
    assert np.array_equal(base_s, prog_s)


def _handmade_progressive(dc_table_id=0, ac_table_id=0):
    """A minimal SOF2 progressive JPEG authored BYTE-BY-BYTE from the public
    T.81 spec (not emitted by this repo's encoder — an independent interop
    fixture, ADVICE r8): 8x8 grayscale, all-ones quant table, two scans
    (DC first Ss=0..0 Ah=Al=0, then AC first Ss=1..63 ending in EOB0).
    DC diff = 16 (category 5, bits '10000'), so the only coefficient is
    DC=16 and every decoded pixel is 128 + 16/8 = 130.  Both Huffman tables
    are one-symbol canonical tables (single length-1 code '0')."""
    b = bytearray()
    b += b"\xff\xd8"                                # SOI
    b += b"\xff\xdb" + (67).to_bytes(2, "big")      # DQT, Pq=0/Tq=0, all 1s
    b += b"\x00" + b"\x01" * 64
    b += b"\xff\xc2" + (11).to_bytes(2, "big")      # SOF2: 8-bit 8x8, 1 comp
    b += b"\x08" + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
    b += b"\x01" + b"\x01\x11\x00"                  # comp 1, H=V=1, Tq=0
    b += b"\xff\xc4" + (20).to_bytes(2, "big")      # DHT DC0: one code '0'
    b += b"\x00" + b"\x01" + b"\x00" * 15 + b"\x05"  # -> symbol 5 (size 5)
    b += b"\xff\xda" + (8).to_bytes(2, "big")       # SOS scan 1: DC first
    b += b"\x01\x01" + bytes([dc_table_id << 4])    # comp 1, Td, Ta=0
    b += b"\x00\x00\x00"                            # Ss=0 Se=0 Ah=0 Al=0
    b += bytes([0b01000011])                        # '0'+'10000' pad '11'
    b += b"\xff\xc4" + (20).to_bytes(2, "big")      # DHT AC1(class1,id0)
    b += b"\x10" + b"\x01" + b"\x00" * 15 + b"\x00"  # one code '0' -> EOB0
    b += b"\xff\xda" + (8).to_bytes(2, "big")       # SOS scan 2: AC first
    b += b"\x01\x01" + bytes([ac_table_id])         # comp 1, Td=0, Ta
    b += b"\x01\x3f\x00"                            # Ss=1 Se=63 Ah=0 Al=0
    b += bytes([0b01111111])                        # EOB0 then pad
    b += b"\xff\xd9"                                # EOI
    return bytes(b)


def test_handmade_progressive_fixture_decodes():
    """Interop pin independent of this repo's own progressive encoder: a
    hand-authored T.81 SOF2 stream with DC=16 only must decode to a flat
    gray 130 image (IDCT of a DC-only block is DC/8, level-shifted)."""
    out = decode_jpeg(_handmade_progressive())
    assert out.shape == (8, 8, 3)
    assert np.all(out == 130), np.unique(out)


def test_progressive_undefined_dht_raises_media_error():
    """ADVICE r8: a progressive scan referencing a never-defined DHT slot
    must raise MediaDecodeError (the module contract), not bare KeyError."""
    for kwargs in ({"dc_table_id": 3}, {"ac_table_id": 3}):
        with pytest.raises(C.MediaDecodeError, match="undefined Huffman"):
            decode_jpeg(_handmade_progressive(**kwargs))

"""Pure-numpy media codecs for the multimodal pipeline (VERDICT r4 task 3).

No image/audio libraries exist in the runtime, so the decodable surface is
the uncompressed public formats a numpy ``frombuffer`` can parse exactly:

- **PPM (P6)** — binary RGB, the netpbm interchange format;
- **BMP** — Windows bitmap, 24-bit uncompressed (BI_RGB) only;
- **PNG** — 8-bit grayscale/RGB/RGBA, non-interlaced (stdlib ``zlib``
  inflate + numpy unfilter; the most common scraped-web image format);
- **JPEG** — baseline sequential DCT *and* progressive (SOF2, spectral
  selection + successive approximation), 8-bit, up to 2x2 sampling
  (operators/jpeg.py — pure-numpy Huffman + IDCT; arithmetic-coded and
  12-bit files reject loudly);
- **WAV** — RIFF PCM, 16-bit integer samples.

- **MJPEG-in-MP4** (r10) — real video frame-grab: ISO BMFF sample tables
  (media_meta.parse_mp4_tracks) locate each sample, and every MJPEG
  sample is a complete JPEG the jpeg.py decoder handles
  (``decode_mp4_frame``; ``encode_mjpeg_mp4`` builds the fixtures).

Each decoder is strict: malformed or unsupported payloads raise
``MediaDecodeError`` with the reason (the remaining no-codec cases —
MP3, and MP4 tracks in non-MJPEG codecs — are *detected* by
``sniff_format``/``media_meta`` and their container METADATA parses for
real (operators/media_meta.py); only their sample/pixel decode rejects.
Wiring a richer codec replaces exactly these functions, the signatures
are the contract).  ``sniff_format`` dispatches on magic bytes so a
payload column can mix formats row by row.

Features are deterministic numpy reductions over the decoded arrays —
the Arrow-batched ``extract_features`` pipeline (operators/multimodal.py)
routes decodable payloads here and falls back to the seeded stub embed
for everything else.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = [
    "MediaDecodeError",
    "IMAGE_FORMATS",
    "sniff_format",
    "decode_ppm",
    "encode_ppm",
    "decode_bmp",
    "decode_png",
    "encode_png",
    "decode_wav",
    "encode_wav",
    "encode_mjpeg_mp4",
    "extract_mp4_frame",
    "decode_mp4_frame",
    "decode_image",
    "image_grid_feature",
    "audio_energy_feature",
    "resize_nearest",
]

# formats decode_image() can dispatch — callers route these through the real
# pixel path and everything else through the stub embed
IMAGE_FORMATS = frozenset({"ppm", "bmp", "png", "jpeg"})


class MediaDecodeError(ValueError):
    """Payload failed to decode: wrong magic, truncated, or an unsupported
    sub-format (e.g. compressed BMP, float WAV)."""


def sniff_format(payload: bytes) -> Optional[str]:
    """Magic-byte format detection: 'ppm' | 'bmp' | 'wav' | None.

    None means "no codec here" — the caller decides between the stub
    feature path and a loud error."""
    if payload is None or len(payload) < 4:
        return None
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return None


# ------------------------------------------------------------------ PPM (P6)


def _ppm_tokens(payload: bytes, count: int, start: int) -> tuple[list[int], int]:
    """Read ``count`` ASCII integer tokens from ``start``, skipping
    whitespace and '#' comments (netpbm header grammar)."""
    toks: list[int] = []
    i = start
    n = len(payload)
    while len(toks) < count:
        while i < n and payload[i : i + 1].isspace():
            i += 1
        if i < n and payload[i : i + 1] == b"#":
            while i < n and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and not payload[j : j + 1].isspace():
            j += 1
        if j == i:
            raise MediaDecodeError("ppm: truncated header")
        try:
            toks.append(int(payload[i:j]))
        except ValueError as e:
            raise MediaDecodeError(f"ppm: non-numeric header token {payload[i:j]!r}") from e
        i = j
    return toks, i


def decode_ppm(payload: bytes) -> np.ndarray:
    """P6 binary PPM -> (height, width, 3) uint8 RGB."""
    if not payload or payload[:2] != b"P6":
        raise MediaDecodeError("ppm: missing P6 magic")
    (w, h, maxval), i = _ppm_tokens(payload, 3, 2)
    if w <= 0 or h <= 0:
        raise MediaDecodeError(f"ppm: bad dimensions {w}x{h}")
    if not 0 < maxval < 256:
        raise MediaDecodeError(f"ppm: only 8-bit maxval supported, got {maxval}")
    i += 1  # exactly ONE whitespace byte separates header from raster
    need = w * h * 3
    raster = payload[i : i + need]
    if len(raster) != need:
        raise MediaDecodeError(f"ppm: raster truncated ({len(raster)}/{need} bytes)")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> P6 binary PPM bytes."""
    x = np.ascontiguousarray(np.asarray(pixels, dtype=np.uint8))
    if x.ndim != 3 or x.shape[2] != 3:
        raise MediaDecodeError(f"encode_ppm: expected (h, w, 3), got {x.shape}")
    h, w, _ = x.shape
    return b"P6\n%d %d\n255\n" % (w, h) + x.tobytes()


# ----------------------------------------------------------------------- BMP


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed (BI_RGB) BMP -> (height, width, 3) uint8 RGB.

    Handles both bottom-up (positive height, the common layout) and
    top-down (negative height) row orders; rows are 4-byte aligned."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise MediaDecodeError("bmp: missing BM magic or truncated header")
    data_off = int.from_bytes(payload[10:14], "little")
    dib = int.from_bytes(payload[14:18], "little")
    if dib < 40:
        raise MediaDecodeError(f"bmp: unsupported DIB header size {dib}")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24:
        raise MediaDecodeError(f"bmp: only 24-bit supported, got {bpp}-bit")
    if comp != 0:
        raise MediaDecodeError(f"bmp: only BI_RGB (uncompressed) supported, got compression {comp}")
    if w <= 0 or h == 0:
        raise MediaDecodeError(f"bmp: bad dimensions {w}x{h}")
    top_down = h < 0
    ah = abs(h)
    stride = (w * 3 + 3) & ~3
    need = stride * ah
    raster = payload[data_off : data_off + need]
    if len(raster) != need:
        raise MediaDecodeError(f"bmp: raster truncated ({len(raster)}/{need} bytes)")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(ah, stride)
    bgr = rows[:, : w * 3].reshape(ah, w, 3)
    rgb = bgr[:, :, ::-1]
    return np.ascontiguousarray(rgb if top_down else rgb[::-1])


# ----------------------------------------------------------------------- PNG

# (filter id, color type) per the PNG spec (RFC 2083 / ISO 15948); decoded
# with stdlib zlib only — no image libraries in this runtime
_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+alpha, RGBA


def _png_chunks(payload: bytes):
    """Yield (type, data) for each chunk; stops at IEND.  Truncated chunk
    lists raise."""
    i = 8
    n = len(payload)
    while i + 8 <= n:
        length = int.from_bytes(payload[i : i + 4], "big")
        ctype = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + length]
        if len(data) != length:
            raise MediaDecodeError(f"png: chunk {ctype!r} truncated")
        yield ctype, data
        if ctype == b"IEND":
            return
        i += 12 + length  # length + type + data + CRC
    raise MediaDecodeError("png: no IEND chunk (truncated stream)")


def _png_paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over a pixel's channels (int16 math so
    the |p-x| distances don't wrap)."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def decode_png(payload: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG -> (height, width, 3) uint8 RGB.

    Critical chunks only; color types 0 (gray), 2 (RGB), 4 (gray+alpha),
    6 (RGBA) at bit depth 8.  IDAT is one zlib stream across chunks; rows
    unfilter in numpy (Up fully vectorized; Sub/Average/Paeth run the
    spec's left-to-right recurrence per pixel).  Alpha is dropped and gray
    broadcast so every image format lands on the same (h, w, 3) contract
    as PPM/BMP.  Rejected loudly: interlaced (Adam7), 16-bit, palette
    (color type 3) — the documented swap point for a richer runtime."""
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise MediaDecodeError("png: missing PNG signature")
    ihdr = None
    idat = []
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.append(data)
    if ihdr is None or len(ihdr) < 13:
        raise MediaDecodeError("png: missing/short IHDR")
    if not idat:
        raise MediaDecodeError("png: no IDAT data")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, ctype_id, comp, filt, interlace = ihdr[8], ihdr[9], ihdr[10], ihdr[11], ihdr[12]
    if w <= 0 or h <= 0:
        raise MediaDecodeError(f"png: bad dimensions {w}x{h}")
    if comp != 0 or filt != 0:
        raise MediaDecodeError("png: nonstandard compression/filter method")
    if interlace != 0:
        raise MediaDecodeError("png: interlaced (Adam7) not supported")
    if depth != 8:
        raise MediaDecodeError(f"png: only bit depth 8 supported, got {depth}")
    if ctype_id not in _PNG_CHANNELS:
        raise MediaDecodeError(
            f"png: color type {ctype_id} not supported (palette needs PLTE)"
        )
    ch = _PNG_CHANNELS[ctype_id]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise MediaDecodeError(f"png: IDAT inflate failed ({e})") from None
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise MediaDecodeError(
            f"png: decompressed size {len(raw)} != expected {h * (stride + 1)}"
        )
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = lines[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    zero_px = np.zeros(ch, dtype=np.uint8)
    for y in range(h):
        f = int(filters[y])
        cur = lines[y, 1:].copy()
        if f == 0:
            pass
        elif f == 2:  # Up — vectorized over the whole row
            cur += prev
        elif f == 1:  # Sub — o[x] = sum(raw[0..x]) mod 256: one cumsum
            cur = (
                np.cumsum(cur.reshape(w, ch), axis=0, dtype=np.uint64) & 0xFF
            ).astype(np.uint8).reshape(stride)
        elif f in (3, 4):  # Average/Paeth: true left-recurrences (the
            # floor-half / predictor choice depends on the PREVIOUS output
            # pixel), so these stay per-pixel Python — O(w*h) interpreter
            # steps, orders slower than the vectorized paths (ADVICE r6).
            # Paeth is what real encoders emit most, so corpus-scale PNG
            # decode wants a C-level codec swapped in (multimodal.py
            # documents the dispatch point); this stdlib path is the
            # correctness baseline, golden-pinned in test_media_codecs.
            row = cur.reshape(w, ch)
            up = prev.reshape(w, ch)
            left = zero_px
            for x in range(w):
                if f == 3:
                    row[x] += ((left.astype(np.uint16) + up[x]) >> 1).astype(np.uint8)
                else:
                    ul = up[x - 1] if x else zero_px
                    row[x] += _png_paeth(left, up[x], ul).astype(np.uint8)
                left = row[x]
        else:
            raise MediaDecodeError(f"png: bad filter byte {f} on row {y}")
        out[y] = cur
        prev = cur
    px = out.reshape(h, w, ch)
    if ctype_id == 0:
        return np.ascontiguousarray(np.repeat(px, 3, axis=2))
    if ctype_id == 2:
        return np.ascontiguousarray(px)
    if ctype_id == 4:
        return np.ascontiguousarray(np.repeat(px[:, :, :1], 3, axis=2))
    return np.ascontiguousarray(px[:, :, :3])  # RGBA -> RGB


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> minimal valid PNG (color type 2, filter 0
    rows, one IDAT).  The golden-test inverse of decode_png."""
    import zlib

    px = np.ascontiguousarray(np.asarray(pixels, dtype=np.uint8))
    if px.ndim != 3 or px.shape[2] != 3:
        raise MediaDecodeError(f"encode_png: need (h, w, 3), got {px.shape}")
    h, w = px.shape[:2]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + ctype
            + data
            + zlib.crc32(ctype + data).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    )
    raster = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raster))
        + chunk(b"IEND", b"")
    )


# ----------------------------------------------------------------------- WAV


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF PCM16 WAV -> ((n_samples, n_channels) int16, sample_rate).

    Walks the chunk list (fmt / data; LIST etc. are skipped), so files with
    metadata chunks decode too."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise MediaDecodeError("wav: missing RIFF/WAVE magic")
    i = 12
    fmt = None
    data = None
    n = len(payload)
    while i + 8 <= n:
        cid = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise MediaDecodeError("wav: fmt chunk truncated")
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise MediaDecodeError("wav: missing fmt or data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits != 16:
        raise MediaDecodeError(
            f"wav: only PCM16 supported (format {audio_format}, {bits}-bit)"
        )
    if channels <= 0 or sample_rate <= 0:
        raise MediaDecodeError(f"wav: bad fmt (channels {channels}, rate {sample_rate})")
    usable = (len(data) // (2 * channels)) * 2 * channels
    samples = np.frombuffer(data[:usable], dtype="<i2").reshape(-1, channels)
    return samples, sample_rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n, channels) or (n,) int16 -> PCM16 RIFF WAV bytes."""
    x = np.asarray(samples, dtype="<i2")
    if x.ndim == 1:
        x = x[:, None]
    if x.ndim != 2:
        raise MediaDecodeError(f"encode_wav: expected (n,) or (n, ch), got {x.shape}")
    ch = x.shape[1]
    data = np.ascontiguousarray(x).tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = (
        b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + ch.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (ch * 2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    chunk = b"data" + len(data).to_bytes(4, "little") + data
    body = b"WAVE" + fmt + chunk
    return b"RIFF" + len(body).to_bytes(4, "little") + body


# -------------------------------------------------------- MJPEG-in-MP4 (r10)
# One CONTAINER format gets a real video decode path (VERDICT r9 stretch
# 7): Motion-JPEG tracks store every sample as a complete baseline/
# progressive JPEG image, so the repo's own clean-room JPEG codec
# (operators/jpeg.py) decodes real frames once the ISO BMFF sample tables
# (media_meta.parse_mp4_tracks, public spec) locate the sample bytes.
# Non-MJPEG codecs (avc1/hevc/mp4v...) still reject loudly — metadata
# stays the honest surface there.

_MJPEG_FOURCC = frozenset({"jpeg", "mjpa", "mjpb", "mjpg"})


def _mp4_box(btype: bytes, body: bytes) -> bytes:
    return (8 + len(body)).to_bytes(4, "big") + btype + body


def encode_mjpeg_mp4(
    frames: list, fps: int = 10, quant: int = 1
) -> bytes:
    """List of (h, w, 3) uint8 RGB frames -> MJPEG-in-MP4 bytes: each frame
    JPEG-encoded (operators/jpeg.encode_jpeg) as one sample in a single
    chunk; minimal ftyp/mdat/moov with a 'vide' track whose sample entry
    fourcc is 'jpeg'.  Deterministic — the fixture source for the decode
    path and the synthetic media table."""
    from duckdb_faiss_ext_spark.operators.jpeg import encode_jpeg

    if not frames:
        raise MediaDecodeError("encode_mjpeg_mp4: need at least one frame")
    px = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = px[0].shape[0], px[0].shape[1]
    samples = [encode_jpeg(f, quant=quant) for f in px]
    sizes = [len(s) for s in samples]
    ftyp = _mp4_box(b"ftyp", b"isom" + (0).to_bytes(4, "big") + b"isomiso2")
    mdat_off = len(ftyp) + 8  # absolute offset of the first sample byte
    mdat = _mp4_box(b"mdat", b"".join(samples))
    n = len(samples)
    timescale, dur = fps, n  # 1 tick per frame at `fps` ticks/sec
    mvhd = _mp4_box(
        b"mvhd",
        (0).to_bytes(4, "big")
        + (0).to_bytes(8, "big")  # creation/modification
        + timescale.to_bytes(4, "big")
        + dur.to_bytes(4, "big")
        + (0x00010000).to_bytes(4, "big")  # rate 1.0
        + (0x0100).to_bytes(2, "big")  # volume
        + b"\x00" * 10
        + b"".join(
            v.to_bytes(4, "big")
            for v in (0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        )
        + b"\x00" * 24
        + (2).to_bytes(4, "big"),  # next track id
    )
    tkhd = _mp4_box(
        b"tkhd",
        (7).to_bytes(4, "big")  # version 0, flags: enabled|in-movie|preview
        + (0).to_bytes(8, "big")
        + (1).to_bytes(4, "big")  # track id
        + (0).to_bytes(4, "big")
        + dur.to_bytes(4, "big")
        + b"\x00" * 16
        + b"".join(
            v.to_bytes(4, "big")
            for v in (0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        )
        + (w << 16).to_bytes(4, "big")
        + (h << 16).to_bytes(4, "big"),
    )
    hdlr = _mp4_box(
        b"hdlr",
        (0).to_bytes(4, "big")
        + (0).to_bytes(4, "big")
        + b"vide"
        + b"\x00" * 12
        + b"mjpeg\x00",
    )
    mdhd = _mp4_box(
        b"mdhd",
        (0).to_bytes(4, "big")
        + (0).to_bytes(8, "big")
        + timescale.to_bytes(4, "big")
        + dur.to_bytes(4, "big")
        + (0x55C4).to_bytes(2, "big")  # und language
        + (0).to_bytes(2, "big"),
    )
    # VisualSampleEntry 'jpeg': 78-byte body per the public spec layout
    entry = _mp4_box(
        b"jpeg",
        b"\x00" * 6
        + (1).to_bytes(2, "big")  # data-reference index
        + b"\x00" * 16
        + w.to_bytes(2, "big")
        + h.to_bytes(2, "big")
        + (0x00480000).to_bytes(4, "big") * 2  # 72 dpi
        + (0).to_bytes(4, "big")
        + (1).to_bytes(2, "big")  # frame count per sample
        + b"\x05mjpeg" + b"\x00" * 26  # compressor name (pascal, 32 bytes)
        + (24).to_bytes(2, "big")
        + (0xFFFF).to_bytes(2, "big"),
    )
    stsd = _mp4_box(
        b"stsd", (0).to_bytes(4, "big") + (1).to_bytes(4, "big") + entry
    )
    stts = _mp4_box(
        b"stts",
        (0).to_bytes(4, "big")
        + (1).to_bytes(4, "big")
        + n.to_bytes(4, "big")
        + (1).to_bytes(4, "big"),
    )
    stsc = _mp4_box(
        b"stsc",
        (0).to_bytes(4, "big")
        + (1).to_bytes(4, "big")
        + (1).to_bytes(4, "big")  # first chunk
        + n.to_bytes(4, "big")  # samples per chunk: all in one
        + (1).to_bytes(4, "big"),
    )
    stsz = _mp4_box(
        b"stsz",
        (0).to_bytes(4, "big")
        + (0).to_bytes(4, "big")
        + n.to_bytes(4, "big")
        + b"".join(s.to_bytes(4, "big") for s in sizes),
    )
    stco = _mp4_box(
        b"stco",
        (0).to_bytes(4, "big") + (1).to_bytes(4, "big") + mdat_off.to_bytes(4, "big"),
    )
    stbl = _mp4_box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _mp4_box(b"minf", stbl)
    mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
    trak = _mp4_box(b"trak", tkhd + mdia)
    moov = _mp4_box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def extract_mp4_frame(payload: bytes, frame: int = 0) -> bytes:
    """Raw sample bytes of a video-track frame.  MJPEG tracks only — for
    any other codec this raises (the honest metadata-plus-reject
    surface); sample-table math is public ISO BMFF (stsz/stco/stsc)."""
    from duckdb_faiss_ext_spark.operators.media_meta import (
        mp4_sample_location,
        parse_mp4_tracks,
        sniff_container,
    )

    if sniff_container(payload) != "mp4":
        raise MediaDecodeError("extract_mp4_frame: payload is not an MP4")
    tracks = parse_mp4_tracks(payload)
    video = [t for t in tracks if t["handler"] == "vide"]
    if not video:
        raise MediaDecodeError("mp4: no video track")
    mjpeg = [
        t for t in video if (t["codec"] or "").lower() in _MJPEG_FOURCC
    ]
    if not mjpeg:
        codecs = sorted({t["codec"] for t in video if t["codec"]})
        raise MediaDecodeError(
            f"mp4: video codec {codecs or 'unknown'} has no decoder "
            "(MJPEG only); metadata remains available"
        )
    loc = mp4_sample_location(mjpeg[0], frame)
    if loc is None:
        raise MediaDecodeError(
            f"mp4: sample {frame} not resolvable from the sample tables "
            "(truncated tables or out of range)"
        )
    off, size = loc
    if size <= 0 or off < 0 or off + size > len(payload):
        raise MediaDecodeError(
            f"mp4: sample {frame} at [{off}, {off + size}) lies outside "
            f"the {len(payload)}-byte payload"
        )
    return payload[off : off + size]


def decode_mp4_frame(payload: bytes, frame: int = 0) -> np.ndarray:
    """MJPEG-in-MP4 frame-grab -> (h, w, 3) uint8 RGB via the clean-room
    JPEG decoder."""
    return decode_image(extract_mp4_frame(payload, frame))


# ------------------------------------------------------------------ features


def decode_image(payload: bytes) -> np.ndarray:
    """Dispatch PPM/BMP/PNG by magic -> (h, w, 3) uint8 RGB."""
    kind = sniff_format(payload)
    if kind == "ppm":
        return decode_ppm(payload)
    if kind == "bmp":
        return decode_bmp(payload)
    if kind == "png":
        return decode_png(payload)
    if kind == "jpeg":
        # local import: jpeg.py imports MediaDecodeError from this module
        from duckdb_faiss_ext_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(payload)
    raise MediaDecodeError(f"no image codec for payload (sniffed {kind!r})")


def image_grid_feature(pixels: np.ndarray, dim: int) -> np.ndarray:
    """Deterministic image embed: g x g grid of grayscale block means
    (g = ceil(sqrt(dim))), first ``dim`` cells, scaled to [0, 1] float32.
    The classic tiny-thumbnail descriptor — enough structure for the
    near-dup cosine path to work on REAL pixels."""
    gray = np.asarray(pixels, dtype=np.float32).mean(axis=2) / 255.0
    g = int(np.ceil(np.sqrt(dim)))
    # images smaller than the grid yield EMPTY blocks from array_split, and
    # an empty slice's .mean() is NaN — which would flow silently into
    # indexes and cosine dedup (all-false comparisons, missed near-dups).
    # Mirror audio_energy_feature's empty-window guard: empty cell -> 0.0.
    cells = [
        c.mean() if c.size else 0.0
        for row in np.array_split(gray, g, axis=0)
        for c in np.array_split(row, g, axis=1)
    ]
    return np.asarray(cells[:dim], dtype=np.float32)


def audio_energy_feature(samples: np.ndarray, dim: int) -> np.ndarray:
    """Deterministic audio embed: RMS energy of ``dim`` equal time windows
    over the mono mix, scaled by int16 full-scale — float32[dim]."""
    mono = np.asarray(samples, dtype=np.float64)
    if mono.ndim == 2:
        mono = mono.mean(axis=1)
    if len(mono) == 0:
        return np.zeros(dim, dtype=np.float32)
    out = np.asarray(
        [np.sqrt(np.mean(w * w)) if len(w) else 0.0 for w in np.array_split(mono, dim)],
        dtype=np.float32,
    )
    return out / np.float32(32768.0)


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample (h, w, 3) -> (height, width, 3), the
    center-of-cell index map (same convention as OpenCV INTER_NEAREST)."""
    if width <= 0 or height <= 0:
        raise MediaDecodeError(f"resize: bad target {width}x{height}")
    h, w = pixels.shape[:2]
    rows = np.minimum((np.arange(height) + 0.5) * h / height, h - 1).astype(np.int64)
    cols = np.minimum((np.arange(width) + 0.5) * w / width, w - 1).astype(np.int64)
    return np.ascontiguousarray(pixels[rows[:, None], cols[None, :]])

"""Container/stream METADATA extraction for multimodal columns.

A 100 TB training-data pipeline filters and validates media by metadata
(dimensions, duration, codec, bitrate) long before it pays for a decode —
and metadata parsing needs only the container headers, so it runs at scan
speed over opaque ``binary`` columns.  This module adds pure-Python
parsers for the formats whose full DECODE is an honest stub in this
runtime (`multimodal.py`): MP4/ISO-BMFF box walking, MP3 frame-header
scanning, and a header-only JPEG dimension probe (including progressive
SOF2 files, which `jpeg.py` deliberately rejects for pixel decode).

Reference parity note: the reference engine has no media operators at all
(SURVEY.md §2) — this is part of the beyond-reference training-data
surface, same tier as dedup/similarity.  Public knowledge only: ISO/IEC
14496-12 box structure, MPEG-1/2 audio frame header layout (public
bitrate/samplerate tables), T.81 marker layout.

Everything returns plain dicts / None — the Spark wiring lives in
``extract_media_metadata`` (Arrow-batched ``mapInPandas``, one pass over
the payload column, no UDF-per-field fanout).
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional

import numpy as np
import pandas as pd

__all__ = [
    "sniff_container",
    "parse_mp4_meta",
    "parse_mp4_tracks",
    "mp4_sample_location",
    "parse_mp3_meta",
    "parse_jpeg_meta",
    "parse_wav_meta",
    "parse_flac_meta",
    "parse_media_meta",
    "extract_media_metadata",
    "MEDIA_META_SCHEMA",
]


def sniff_container(payload: bytes) -> Optional[str]:
    """Extend codec sniffing to container formats the decode path stubs:
    'mp4' | 'mp3' | None.  (Image/audio codecs with real decoders keep
    using media_codecs.sniff_format.)"""
    if payload is None or len(payload) < 12:
        return None
    if payload[4:8] == b"ftyp":
        return "mp4"
    if payload[:3] == b"ID3":
        return "mp3"
    if payload[:4] == b"fLaC":
        return "flac"
    if len(payload) >= 2 and payload[0] == 0xFF and (payload[1] & 0xE0) == 0xE0:
        # frame sync; require a parseable header to avoid false positives
        if _mp3_frame_len(payload, 0) is not None:
            return "mp3"
    return None


# --------------------------------------------------------------- MP4 / BMFF
# ISO/IEC 14496-12: a file is a sequence of boxes [size u32][type 4cc][body];
# size==1 means a u64 largesize follows; size==0 means "to end of file".

_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _mp4_boxes(buf: bytes, start: int, end: int):
    i = start
    while i + 8 <= end:
        size = struct.unpack_from(">I", buf, i)[0]
        btype = buf[i + 8 - 4 : i + 8]
        hdr = 8
        if size == 1:
            if i + 16 > end:
                return
            size = struct.unpack_from(">Q", buf, i + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - i
        if size < hdr or i + size > end:
            return  # malformed/truncated: stop walking, keep what we have
        yield btype, i + hdr, i + size
        i += size


def parse_mp4_meta(payload: bytes) -> dict:
    """Walk ftyp/moov for brand, movie duration, per-track dimensions and
    handler/codec.  Returns partial metadata on truncation (a pipeline
    wants 'what CAN be known cheaply', not an exception per bad row)."""
    out: dict = {"fmt": "mp4"}
    tracks: list = []

    def walk(start: int, end: int) -> None:
        for btype, b0, b1 in _mp4_boxes(payload, start, end):
            if btype == b"ftyp" and b1 - b0 >= 4:
                out["codec"] = payload[b0 : b0 + 4].decode("latin1").strip()
            elif btype == b"mvhd" and b1 - b0 >= 20:
                ver = payload[b0]
                if ver == 1 and b1 - b0 >= 28:
                    ts = struct.unpack_from(">I", payload, b0 + 20)[0]
                    dur = struct.unpack_from(">Q", payload, b0 + 24)[0]
                else:
                    ts = struct.unpack_from(">I", payload, b0 + 12)[0]
                    dur = struct.unpack_from(">I", payload, b0 + 16)[0]
                if ts:
                    out["duration_ms"] = int(dur * 1000 / ts)
            elif btype == b"tkhd" and b1 - b0 >= 84:
                ver = payload[b0]
                off = b1 - b0 - 8  # width/height are the LAST 8 body bytes
                w = struct.unpack_from(">I", payload, b0 + off)[0] >> 16
                h = struct.unpack_from(">I", payload, b0 + off + 4)[0] >> 16
                if w and h:
                    out.setdefault("width", w)
                    out.setdefault("height", h)
            elif btype == b"hdlr" and b1 - b0 >= 12:
                tracks.append(payload[b0 + 8 : b0 + 12].decode("latin1"))
            elif btype == b"stsd" and b1 - b0 >= 16:
                # first sample entry's fourcc = the track codec
                out["codec"] = payload[b0 + 12 : b0 + 16].decode("latin1").strip()
            elif btype in _MP4_CONTAINERS:
                walk(b0, b1)

    walk(0, len(payload))
    if tracks:
        out["n_tracks"] = len(tracks)
        out["has_video"] = "vide" in tracks
        out["has_audio"] = "soun" in tracks
    return out


def parse_mp4_tracks(payload: bytes, max_samples: int = 256) -> list:
    """Per-track sample tables (ISO BMFF stbl boxes, public spec): handler,
    sample-entry fourcc, and the first ``max_samples`` of stsz sizes /
    stco|co64 chunk offsets / stsc runs — everything a frame-grab needs
    (media_codecs.decode_mp4_frame) without reading sample data.  Strictly
    bounded and exception-free on truncated/garbage boxes, like every
    parser in this module."""
    tracks: list = []

    def walk_into(tr: dict, b0: int, b1: int) -> None:
        for btype, s, e in _mp4_boxes(payload, b0, b1):
            body = e - s
            if btype == b"hdlr" and body >= 12:
                tr["handler"] = payload[s + 8 : s + 12].decode("latin1")
            elif btype == b"stsd" and body >= 16:
                tr["codec"] = payload[s + 12 : s + 16].decode("latin1").strip()
            elif btype == b"stsz" and body >= 12:
                fixed = struct.unpack_from(">I", payload, s + 4)[0]
                cnt = struct.unpack_from(">I", payload, s + 8)[0]
                if fixed:
                    tr["sizes"] = [fixed] * min(cnt, max_samples)
                else:
                    m = min(cnt, max_samples, max(0, (body - 12) // 4))
                    tr["sizes"] = (
                        list(struct.unpack_from(f">{m}I", payload, s + 12))
                        if m
                        else []
                    )
            elif btype == b"stco" and body >= 8:
                cnt = struct.unpack_from(">I", payload, s + 4)[0]
                m = min(cnt, max_samples, max(0, (body - 8) // 4))
                tr["offsets"] = (
                    list(struct.unpack_from(f">{m}I", payload, s + 8)) if m else []
                )
            elif btype == b"co64" and body >= 8:
                cnt = struct.unpack_from(">I", payload, s + 4)[0]
                m = min(cnt, max_samples, max(0, (body - 8) // 8))
                tr["offsets"] = (
                    list(struct.unpack_from(f">{m}Q", payload, s + 8)) if m else []
                )
            elif btype == b"stsc" and body >= 8:
                cnt = struct.unpack_from(">I", payload, s + 4)[0]
                m = min(cnt, max_samples, max(0, (body - 8) // 12))
                tr["stsc"] = [
                    struct.unpack_from(">III", payload, s + 8 + 12 * i)
                    for i in range(m)
                ]
            elif btype in _MP4_CONTAINERS:
                walk_into(tr, s, e)

    for btype, s, e in _mp4_boxes(payload, 0, len(payload)):
        if btype == b"moov":
            for bt2, s2, e2 in _mp4_boxes(payload, s, e):
                if bt2 == b"trak":
                    tr = {
                        "handler": None,
                        "codec": None,
                        "sizes": [],
                        "offsets": [],
                        "stsc": [],
                    }
                    walk_into(tr, s2, e2)
                    tracks.append(tr)
    return tracks


def mp4_sample_location(track: dict, sample: int) -> Optional[tuple]:
    """(absolute_offset, size) of ``sample`` within the file, resolved from
    the track's stsz/stco/stsc tables, or None when the tables don't cover
    it (truncated parse or out-of-range index)."""
    sizes, offs = track.get("sizes") or [], track.get("offsets") or []
    if sample < 0 or sample >= len(sizes) or not offs:
        return None
    stsc = track.get("stsc") or [(1, len(sizes), 1)]
    # expand the stsc runs into per-chunk sample counts over known chunks
    spc: list = []
    for i, (first, count, _desc) in enumerate(stsc):
        if first < 1 or count < 1:
            return None
        last = (stsc[i + 1][0] - 1) if i + 1 < len(stsc) else len(offs)
        spc += [count] * max(0, last - first + 1)
        if len(spc) >= len(offs):
            break
    seen = 0
    for ci, cnt in enumerate(spc[: len(offs)]):
        if sample < seen + cnt:
            within = sample - seen
            return (
                offs[ci] + sum(sizes[seen : seen + within]),
                sizes[sample],
            )
        seen += cnt
    return None


# ---------------------------------------------------------------------- MP3
# MPEG-1/2 audio frame header (public tables).  Layer III only — the
# training-data case; other layers report None and fall to the stub.

_MP3_BITRATE_V1L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_MP3_BITRATE_V2L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
_MP3_SAMPLERATE = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000], 0: [11025, 12000, 8000]}


def _mp3_frame_len(buf: bytes, i: int) -> Optional[tuple]:
    """Parse one frame header at ``i``: (frame_bytes, bitrate_kbps,
    sample_rate, channels) or None if not a valid V1/V2/V2.5 L3 header."""
    if i + 4 > len(buf):
        return None
    b1, b2, b3 = buf[i + 1], buf[i + 2], buf[i + 3]
    if buf[i] != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    version = (b1 >> 3) & 0x3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    layer = (b1 >> 1) & 0x3  # 1 = Layer III
    if version == 1 or layer != 1:
        return None
    br_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 0x3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    bitrate = (_MP3_BITRATE_V1L3 if version == 3 else _MP3_BITRATE_V2L3)[br_idx]
    sample_rate = _MP3_SAMPLERATE[version][sr_idx]
    padding = (b2 >> 1) & 0x1
    channels = 1 if ((b3 >> 6) & 0x3) == 3 else 2
    coef = 144 if version == 3 else 72  # samples/8 per frame for L3
    frame_bytes = coef * bitrate * 1000 // sample_rate + padding
    if frame_bytes < 24:
        return None
    return frame_bytes, bitrate, sample_rate, channels


def parse_mp3_meta(payload: bytes, max_frames: int = 4096) -> dict:
    """Skip ID3v2 if present, then walk frame headers: duration is the sum
    of per-frame durations (correct for VBR too, up to ``max_frames``)."""
    out: dict = {"fmt": "mp3"}
    i = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        # syncsafe 28-bit size
        sz = 0
        for b in payload[6:10]:
            sz = (sz << 7) | (b & 0x7F)
        i = 10 + sz
    n = len(payload)
    frames = 0
    dur_ms = 0.0
    bitrates: list = []
    while i + 4 <= n and frames < max_frames:
        fr = _mp3_frame_len(payload, i)
        if fr is None:
            if frames:
                break  # trailing junk/tag after valid frames
            i += 1  # resync scan before the first frame
            continue
        frame_bytes, bitrate, sample_rate, channels = fr
        frames += 1
        bitrates.append(bitrate)
        out["sample_rate"] = sample_rate
        out["channels"] = channels
        spf = 1152 if sample_rate >= 32000 else 576
        dur_ms += spf * 1000.0 / sample_rate
        i += frame_bytes
    if frames:
        out["n_frames"] = frames
        out["duration_ms"] = int(round(dur_ms))
        out["bitrate_kbps"] = int(round(sum(bitrates) / len(bitrates)))
        out["codec"] = "mp3"
    return out


# --------------------------------------------------------------------- JPEG


def parse_jpeg_meta(payload: bytes) -> dict:
    """Header-only dimension probe: walk markers to the first SOFn.  Unlike
    jpeg.decode_jpeg this accepts PROGRESSIVE (SOF2) files — metadata is
    knowable even where pixel decode is stubbed."""
    out: dict = {"fmt": "jpeg"}
    if payload[:2] != b"\xff\xd8":
        return out
    i, n = 2, len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            break
        while i + 1 < n and payload[i + 1] == 0xFF:  # T.81 fill bytes
            i += 1
        marker = payload[i + 1]
        i += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            continue
        if i + 2 > n:
            break
        seglen = struct.unpack_from(">H", payload, i)[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 7 <= n:
                out["height"] = struct.unpack_from(">H", payload, i + 3)[0]
                out["width"] = struct.unpack_from(">H", payload, i + 5)[0]
                out["codec"] = "jpeg-progressive" if marker == 0xC2 else "jpeg-baseline"
            return out
        if marker == 0xDA:
            break
        i += seglen
    return out


# --------------------------------------------------------------- WAV / FLAC
# RIFF chunk layout (public Microsoft/IBM WAVE spec) and the FLAC
# STREAMINFO metadata block (public xiph.org format spec) — header-only,
# same pattern as MP4/MP3: duration/rates without touching sample data.


def parse_wav_meta(payload: bytes) -> dict:
    """Header-only RIFF/WAVE walk: fmt chunk fields + duration from the
    data chunk SIZE (no sample decode — decode_wav reads the samples)."""
    out: dict = {"fmt": "wav"}
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return out
    i, n = 12, len(payload)
    byte_rate = None
    while i + 8 <= n:
        cid = payload[i : i + 4]
        size = struct.unpack_from("<I", payload, i + 4)[0]
        body = i + 8
        if cid == b"fmt " and body + 16 <= n:
            fmt_tag, channels, sr, br = struct.unpack_from("<HHII", payload, body)
            out.update(
                codec="pcm" if fmt_tag == 1 else f"wave-fmt-{fmt_tag}",
                channels=int(channels),
                sample_rate=int(sr),
                bitrate_kbps=int(br * 8 // 1000),
            )
            byte_rate = br
        elif cid == b"data" and byte_rate:
            out["duration_ms"] = int(size * 1000 // byte_rate)
            out["has_audio"] = True
        i = body + size + (size & 1)  # chunks are word-aligned
    return out


def parse_flac_meta(payload: bytes) -> dict:
    """FLAC STREAMINFO (block type 0, always first): sample rate (20 bits),
    channels (3), bits-per-sample (5), total samples (36) — packed fields
    per the public format spec."""
    out: dict = {"fmt": "flac", "codec": "flac"}
    if payload[:4] != b"fLaC" or len(payload) < 8:
        return out
    i, n = 4, len(payload)
    while i + 4 <= n:
        hdr = payload[i]
        btype, last = hdr & 0x7F, bool(hdr & 0x80)
        blen = int.from_bytes(payload[i + 1 : i + 4], "big")
        body = i + 4
        if btype == 0 and body + 18 <= n:
            b = payload[body : body + 18]
            # bytes 10..18 pack: sr:20 | (channels-1):3 | (bps-1):5 | total:36
            bits = int.from_bytes(b[10:18], "big")
            sr = (bits >> 44) & 0xFFFFF
            channels = ((bits >> 41) & 0x7) + 1
            total = bits & 0xFFFFFFFFF  # low 36 bits
            if sr:
                out.update(
                    sample_rate=int(sr),
                    channels=int(channels),
                    duration_ms=int(total * 1000 // sr),
                    has_audio=True,
                )
            return out
        if last:
            break
        i = body + blen
    return out


def parse_media_meta(payload: bytes) -> dict:
    """Dispatch on magic bytes; unknown formats return {'fmt': None}."""
    from duckdb_faiss_ext_spark.operators import media_codecs as C

    kind = C.sniff_format(payload)
    if kind == "jpeg":
        return parse_jpeg_meta(payload)
    if kind == "wav":
        # header-only RIFF walk (r9) — metadata must not pay sample decode
        return parse_wav_meta(payload)
    if kind is not None:
        # image formats with full decoders: dimensions via the real codec
        out = {"fmt": kind}
        try:
            px = C.decode_image(payload)
            out.update(height=px.shape[0], width=px.shape[1], codec=kind)
        except C.MediaDecodeError:
            pass
        return out
    kind = sniff_container(payload)
    if kind == "mp4":
        return parse_mp4_meta(payload)
    if kind == "mp3":
        return parse_mp3_meta(payload)
    if kind == "flac":
        return parse_flac_meta(payload)
    return {"fmt": None}


MEDIA_META_SCHEMA = (
    "media_id bigint, fmt string, codec string, width int, height int, "
    "duration_ms bigint, sample_rate int, channels int, bitrate_kbps int, "
    "n_frames int, n_tracks int, has_video boolean, has_audio boolean, "
    "n_bytes bigint"
)

_META_COLS = [
    "fmt", "codec", "width", "height", "duration_ms", "sample_rate",
    "channels", "bitrate_kbps", "n_frames", "n_tracks", "has_video",
    "has_audio",
]


def extract_media_metadata(
    df, id_col: str = "media_id", payload_col: str = "payload"
):
    """(media_id, payload) -> typed metadata row per payload.

    One Arrow-batched ``mapInPandas`` pass: each executor batch parses
    headers only (no pixel/sample decode for containers), so throughput is
    bounded by scan I/O, not codec CPU — the right shape for a metadata
    filter stage in front of a 100 TB decode."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, raw in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(raw) if raw is not None else b""
                meta = parse_media_meta(raw)
                rows.append(
                    {
                        "media_id": mid,
                        **{c: meta.get(c) for c in _META_COLS},
                        "n_bytes": len(raw),
                    }
                )
            out = pd.DataFrame(rows)
            # nullable ints must stay pandas-nullable for Arrow
            for c in (
                "width", "height", "duration_ms", "sample_rate", "channels",
                "bitrate_kbps", "n_frames", "n_tracks",
            ):
                out[c] = out[c].astype("Int64")
            yield out[["media_id"] + _META_COLS + ["n_bytes"]]

    return df.select(id_col, payload_col).mapInPandas(run, MEDIA_META_SCHEMA)

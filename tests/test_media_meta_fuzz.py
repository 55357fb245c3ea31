"""Property-fuzz of the media metadata parsers (VERDICT r9 stretch 8).

``parse_media_meta`` and the per-format parsers consume UNTRUSTED bytes
(the reference consumes nothing like them, but a 100 TB media corpus is
adversarial by volume alone).  Contract under fuzz: any byte string —
random garbage, truncations of valid fixtures, or bit-flipped valid
fixtures — must yield a dict (``fmt`` None or a valid format string)
and NEVER raise.  Pure CPU, no Spark.

Hypothesis drives the random cases; the truncation/bit-flip sweeps are
exhaustive-deterministic over the repo's own builders (tests/
test_media_meta.py fixtures + operators/multimodal synthetics).
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_faiss_ext_spark.operators.media_meta import (
    parse_flac_meta,
    parse_jpeg_meta,
    parse_media_meta,
    parse_mp3_meta,
    parse_mp4_meta,
    parse_wav_meta,
)

PARSERS = (
    parse_media_meta,
    parse_mp4_meta,
    parse_mp3_meta,
    parse_jpeg_meta,
    parse_wav_meta,
    parse_flac_meta,
)


def _fixtures() -> list:
    """Valid payloads from the repo's own deterministic builders."""
    from test_media_meta import build_flac, build_mp3, build_mp4

    fixes = [
        build_mp4(),
        build_mp4(timescale=0),  # degenerate-but-valid container fields
        build_mp3(),
        build_mp3(with_id3=False),
        build_flac(),
        b"RIFF" + b"\x00" * 40,  # minimal WAV-ish stub
    ]
    from duckdb_faiss_ext_spark.operators.jpeg import encode_jpeg

    img = (np.arange(64 * 48 * 3) % 251).reshape(48, 64, 3).astype(np.uint8)
    fixes.append(encode_jpeg(img))
    return fixes


def _check(payload: bytes) -> None:
    for parser in PARSERS:
        meta = parser(payload)
        assert isinstance(meta, dict)
        fmt = meta.get("fmt")
        assert fmt is None or isinstance(fmt, str)
        # numeric fields, when present, are non-negative ints
        for fld in ("width", "height", "duration_ms", "sample_rate", "channels"):
            v = meta.get(fld)
            assert v is None or (isinstance(v, (int, np.integer)) and v >= 0), (
                parser.__name__,
                fld,
                v,
            )


@settings(max_examples=300, deadline=None)
@given(st.binary(min_size=0, max_size=512))
def test_fuzz_random_bytes_never_raise(payload):
    _check(payload)


@settings(max_examples=120, deadline=None)
@given(
    st.binary(min_size=4, max_size=64),
    st.sampled_from([b"\xff\xd8\xff", b"RIFF", b"fLaC", b"ID3", b"\x00\x00\x00\x18ftyp"]),
)
def test_fuzz_magic_prefixed_garbage_never_raises(tail, magic):
    _check(magic + tail)


def test_truncations_of_valid_fixtures_never_raise():
    for payload in _fixtures():
        # every prefix length up to 256 + a spread of longer cuts
        cuts = list(range(0, min(len(payload), 256))) + list(
            range(256, len(payload), 37)
        )
        for cut in cuts:
            _check(payload[:cut])


def test_bitflips_of_valid_fixtures_never_raise():
    rng = np.random.default_rng(4242)
    for payload in _fixtures():
        buf = np.frombuffer(payload, dtype=np.uint8).copy()
        for _ in range(200):
            i = int(rng.integers(len(buf)))
            bit = np.uint8(1 << int(rng.integers(8)))
            flipped = buf.copy()
            flipped[i] ^= bit
            _check(flipped.tobytes())

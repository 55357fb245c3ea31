"""curate_media: one-pass media curation — sniff -> metadata -> policy
filter -> decode-or-reject (VERDICT r8 task 6).

The triage economics the r8 example demonstrated, folded into ONE
first-class operator with a declared output schema: each Arrow batch is
sniffed and header-parsed for every row (scan-speed, no pixel work), the
POLICY is evaluated on the typed metadata, and only the survivors pay the
decode + featurize cost — all inside a single ``mapInPandas`` pass, so a
100 TB corpus is curated in one scan with no intermediate shuffle or
second read of the binary column.

Statuses (the complete disposition of every input row — nothing is
silently dropped; filter downstream on ``status``):

- ``kept``          — policy passed, REAL decode succeeded, feature present
- ``kept_stub``     — policy passed but no decoder exists in this runtime
  (mp3/mp4 containers, arithmetic JPEG): the feature is the clearly-marked
  DETERMINISTIC STUB embed (multimodal._decode_stub), never fake pixels
- ``decode_error``  — policy passed, decode raised (corrupt body behind a
  valid header); feature is NULL, ``reason`` carries the codec message
- ``filtered:<f>``  — first policy constraint that failed (e.g.
  ``filtered:min_width``); feature NULL
- ``filtered:unknown_format`` — magic bytes matched nothing

Reference has zero media operators; this extends the engine for the
multimodal training-data pipelines the 100 TB target serves.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from duckdb_faiss_ext_spark.operators.media_meta import (
    _META_COLS,
    parse_media_meta,
)

__all__ = ["MediaPolicy", "curate_media", "CURATE_SCHEMA"]


@dataclass(frozen=True)
class MediaPolicy:
    """Declarative constraints evaluated on header metadata (never pixels).

    ``formats=None`` accepts any KNOWN format; unknown formats are always
    ``filtered:unknown_format``.  Dimension/duration constraints apply only
    when the metadata field is present — an mp3 row is not rejected by
    ``min_width`` (use ``formats`` to scope).  ``require_video`` /
    ``require_audio`` apply to container formats that report tracks."""

    formats: Optional[tuple] = None
    min_width: Optional[int] = None
    min_height: Optional[int] = None
    max_width: Optional[int] = None
    max_height: Optional[int] = None
    min_duration_ms: Optional[int] = None
    max_duration_ms: Optional[int] = None
    min_bytes: Optional[int] = None
    max_bytes: Optional[int] = None
    require_video: bool = False
    require_audio: bool = False

    def first_violation(self, meta: dict, n_bytes: int) -> Optional[str]:
        """Name of the first failing constraint, or None if all pass."""
        if meta.get("fmt") is None:
            return "unknown_format"
        if self.formats is not None and meta["fmt"] not in self.formats:
            return "formats"
        if self.min_bytes is not None and n_bytes < self.min_bytes:
            return "min_bytes"
        if self.max_bytes is not None and n_bytes > self.max_bytes:
            return "max_bytes"
        for fld, lo, hi in (
            ("width", self.min_width, self.max_width),
            ("height", self.min_height, self.max_height),
            ("duration_ms", self.min_duration_ms, self.max_duration_ms),
        ):
            v = meta.get(fld)
            if v is None:
                continue
            if lo is not None and v < lo:
                return f"min_{fld}"
            if hi is not None and v > hi:
                return f"max_{fld}"
        if self.require_video and not meta.get("has_video"):
            return "require_video"
        if self.require_audio and not meta.get("has_audio"):
            return "require_audio"
        return None


CURATE_SCHEMA = (
    "media_id bigint, fmt string, codec string, width int, height int, "
    "duration_ms bigint, sample_rate int, channels int, bitrate_kbps int, "
    "n_frames int, n_tracks int, has_video boolean, has_audio boolean, "
    "n_bytes bigint, status string, reason string, feature array<float>"
)

_NULLABLE_INTS = (
    "width", "height", "duration_ms", "sample_rate", "channels",
    "bitrate_kbps", "n_frames", "n_tracks",
)


def _decode_feature(payload: bytes, fmt: str, dim: int):
    """(feature, status, reason) for a policy-passing row: real decode when
    a codec exists, the deterministic stub when none does, a loud
    decode_error when the body is corrupt behind a valid header."""
    from duckdb_faiss_ext_spark.operators import media_codecs as C
    from duckdb_faiss_ext_spark.operators.multimodal import _decode_stub

    try:
        if fmt in C.IMAGE_FORMATS:
            return (
                C.image_grid_feature(C.decode_image(payload), dim),
                "kept",
                None,
            )
        if fmt == "wav":
            samples, _sr = C.decode_wav(payload)
            return C.audio_energy_feature(samples, dim), "kept", None
        if fmt == "mp4":
            # real frame-grab for MJPEG tracks (r10); other codecs raise
            # and fall through to the honest stub below
            try:
                frame = C.decode_mp4_frame(payload)
            except C.MediaDecodeError as e:
                # honest-stub cases: codec we can't decode, no video
                # track, or sample tables that don't cover the request
                # (fragmented/moof MP4s keep samples outside stbl — their
                # metadata is real, the decode is legitimately unavailable;
                # r10 review finding).  Only a corrupt sample range or a
                # broken JPEG behind a valid header is a decode_error.
                if (
                    "no decoder" in str(e)
                    or "no video track" in str(e)
                    or "not resolvable" in str(e)
                ):
                    return _decode_stub(payload, dim), "kept_stub", None
                raise  # corrupt MJPEG sample behind a valid header
            return C.image_grid_feature(frame, dim), "kept", None
    except C.MediaDecodeError as e:
        return None, "decode_error", str(e)
    # container formats (mp3, non-MJPEG mp4): metadata is real, decode is
    # the honest stub — shape/dtype contract of a real decoder, clearly
    # marked
    return _decode_stub(payload, dim), "kept_stub", None


def curate_media(
    df: DataFrame,
    policy: MediaPolicy | None = None,
    id_col: str = "media_id",
    payload_col: str = "payload",
    dim: int = 16,
) -> DataFrame:
    """Sniff -> header metadata -> policy filter -> decode-or-reject, one
    Arrow-batched ``mapInPandas`` pass over (id, payload) rows.

    Every input row yields exactly one output row with its full metadata
    and a ``status`` disposition (see module docstring), so the operator is
    simultaneously the metadata extractor, the filter log, and the feature
    source: ``out.filter("status = 'kept'")`` is the decoded survivor set,
    the rest is the audit trail a curation pipeline needs anyway."""
    policy = policy or MediaPolicy()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for mid, raw in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(raw) if raw is not None else b""
                meta = parse_media_meta(raw)
                violation = policy.first_violation(meta, len(raw))
                if violation is not None:
                    feature, status, reason = None, f"filtered:{violation}", None
                else:
                    feature, status, reason = _decode_feature(
                        raw, meta["fmt"], dim
                    )
                rows.append(
                    {
                        "media_id": mid,
                        **{c: meta.get(c) for c in _META_COLS},
                        "n_bytes": len(raw),
                        "status": status,
                        "reason": reason,
                        "feature": (
                            feature.astype(np.float32).tolist()
                            if feature is not None
                            else None
                        ),
                    }
                )
            out = pd.DataFrame(rows)
            for c in _NULLABLE_INTS:
                out[c] = out[c].astype("Int64")
            yield out[
                ["media_id"] + list(_META_COLS)
                + ["n_bytes", "status", "reason", "feature"]
            ]

    return df.select(id_col, payload_col).mapInPandas(run, CURATE_SCHEMA)

"""End-to-end multimodal curation pipeline over a mixed binary-payload table.

The flow a 100 TB media corpus actually runs — cheap header-only triage
FIRST, expensive pixel/sample work only on the survivors:

  1. metadata extraction — ONE Arrow-batched pass (operators/media_meta):
     container/codec sniff, dimensions, duration, sample rate, bitrate,
     byte size.  Header parsing only: throughput is scan-I/O-bound.
  2. metadata filtering  — pure Catalyst predicates on the typed columns
     (drop undersized images, silent clips, unknown formats) — this is
     where most of a crawled corpus dies, at ~zero CPU per row.
  3. decode + featurize  — operators/multimodal.extract_features on the
     filtered survivors: real codecs (PPM/BMP/PNG/JPEG incl. progressive,
     PCM WAV) embed actual pixels/samples; no-codec rows keep the
     deterministic stub embed.
  4. near-dup grouping   — embedding cosine over the feature vectors
     (operators/dedup.cosine_pairs shape): here a cheap exact
     demonstration via grouped feature hashing.

Run: python examples/media_pipeline.py  (uses the deterministic
synthetic media table — image/audio rows carry REAL decodable payloads).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F


def run_pipeline(media_df):
    """media_df: (media_id, modality, fmt, payload, ...) -> dict of stages."""
    from duckdb_faiss_ext_spark.operators.media_meta import extract_media_metadata
    from duckdb_faiss_ext_spark.operators.multimodal import extract_features

    # 1. header-only metadata, one Arrow pass
    meta = extract_media_metadata(media_df, id_col="media_id", payload_col="payload")

    # 2. triage on typed columns — Catalyst-only, no Python
    keep = meta.filter(
        (
            F.col("fmt").isin("ppm", "bmp", "png", "jpeg")
            & (F.col("width") >= 32)
            & (F.col("height") >= 32)
        )
        | (F.col("fmt") == "wav") & (F.col("duration_ms") >= 50)
        | (F.col("fmt") == "mp4") & F.col("has_video")
    ).select("media_id")

    survivors = media_df.join(F.broadcast(keep), "media_id")

    # 3. decode + featurize only the survivors
    feats = extract_features(
        survivors.select("media_id", "modality", "payload"), dim=16
    )

    # 4. exact feature-level dup groups (same decoded content -> same
    # feature vector); rounded to make float equality meaningful
    sig = feats.select(
        "media_id",
        F.md5(F.to_json(F.transform("feature", lambda v: F.round(v, 5)))).alias("sig"),
    )
    groups = (
        sig.groupBy("sig")
        .agg(F.count("*").alias("n"), F.min("media_id").alias("keep_id"))
        .filter(F.col("n") > 1)
    )
    return {
        "meta": meta,
        "survivors": survivors,
        "features": feats,
        "dup_groups": groups,
    }


def main():
    from duckdb_faiss_ext_spark.operators.multimodal import synthetic_media
    from duckdb_faiss_ext_spark.session import get_spark

    spark = get_spark("media-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    media = synthetic_media(spark, n=48)
    out = run_pipeline(media)
    total = media.count()
    kept = out["survivors"].count()
    nfeat = out["features"].count()
    ndup = out["dup_groups"].count()
    print(f"rows={total} survivors={kept} featurized={nfeat} dup_groups={ndup}")
    out["meta"].show(6, truncate=False)


if __name__ == "__main__":
    main()

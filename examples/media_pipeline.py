"""End-to-end multimodal curation pipeline over a mixed binary-payload table.

The flow a 100 TB media corpus actually runs — cheap header-only triage
FIRST, expensive pixel/sample work only on the survivors:

  1. curation — ONE pass (operators/curate.curate_media, r9): sniff ->
     header metadata (dimensions, duration, sample rate, bitrate) ->
     declarative MediaPolicy filter -> decode-or-reject.  The binary
     column is read once; rows that fail the policy never touch a codec,
     and every row leaves with a status disposition (the audit trail).
  2. near-dup grouping — embedding cosine over the kept rows' feature
     vectors (operators/dedup.cosine_pairs shape): here a cheap exact
     demonstration via grouped feature hashing.

Run: python examples/media_pipeline.py  (uses the deterministic
synthetic media table — image/audio rows carry REAL decodable payloads).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F


def run_pipeline(media_df):
    """media_df: (media_id, modality, fmt, payload, ...) -> dict of stages.

    Stages 1-3 are ONE operator since r9: ``curate_media`` runs sniff ->
    header metadata -> policy filter -> decode-or-reject in a single
    ``mapInPandas`` pass, so the binary column is read once and only
    policy survivors pay decode CPU.  (The staged composition this example
    previously spelled out — extract_media_metadata, Catalyst triage,
    extract_features — remains available for pipelines that need to
    persist the intermediate metadata table.)"""
    from duckdb_faiss_ext_spark.operators.curate import MediaPolicy, curate_media

    curated = curate_media(
        media_df,
        MediaPolicy(
            formats=("ppm", "bmp", "png", "jpeg", "wav", "mp4"),
            min_width=32,
            min_height=32,
            min_duration_ms=50,
        ),
        dim=16,
    )
    # Per-format refinement on the SNIFFED metadata: mp4 containers must
    # carry a video track (the staged pipeline's original
    # `fmt='mp4' AND has_video` triage — ADVICE r9: the policy alone let
    # audio-only MP4s through as kept_stub).  require_video can't sit in
    # the single MediaPolicy above because it would also reject wav rows,
    # which never report tracks; a Catalyst re-disposition over the curate
    # output columns is the one-pass way to scope it.
    audio_only_mp4 = (F.col("fmt") == "mp4") & ~F.coalesce(
        F.col("has_video"), F.lit(False)
    )
    curated = curated.withColumns(
        {
            "status": F.when(
                audio_only_mp4 & F.col("status").startswith("kept"),
                "filtered:require_video",
            ).otherwise(F.col("status")),
            "feature": F.when(audio_only_mp4, F.lit(None)).otherwise(
                F.col("feature")
            ),
        }
    ).cache()

    feats = curated.filter(F.col("status").isin("kept", "kept_stub")).select(
        "media_id", "feature"
    )

    # exact feature-level dup groups (same decoded content -> same feature
    # vector); rounded to make float equality meaningful
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
        "meta": curated.drop("feature"),
        "survivors": feats,
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

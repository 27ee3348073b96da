"""Deduplication operators for training-data pipelines (SURVEY.md §7 M7;
BASELINE.json north-star: "dedup, similarity search, ... at 100 TB").

Exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup —
all as distributed DataFrame compositions (shuffle-bounded, no driver
collect, no per-row Python).

Token hashing has two modes:
- ``"xxhash"`` (default, the 100 TB path): tokens hash via ``xxhash64`` —
  no global vocabulary, embarrassingly parallel.
- ``"vocab"`` (the oracle path): tokens map to dense ids via a sorted
  global vocabulary (row_number over distinct tokens). Deterministic and
  re-expressible in ANSI SQL, so DuckDB can verify the whole MinHash
  pipeline bit-for-bit. Vocabulary build is a sort of DISTINCT tokens —
  fine while |vocab| ≪ corpus (true for natural text), but the xxhash mode
  is what you run at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from clickhouse_clickhouse_spark.functions.text import tokens, word_ngrams

# Deterministic affine-hash parameters over a Mersenne prime — the classic
# (a*x + b) mod p universal-hash family, same constants in the DuckDB oracle.
MINHASH_PRIME = 2147483647  # 2^31 - 1
MINHASH_COEFFS = [(2 * k + 1, 7919 * (k + 1)) for k in range(16)]


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: keep the lowest-id row per identical text. Hash-groupBy
    on the text (Spark hashes the group key — equivalent to grouping on
    fingerprint64 but collision-proof)."""
    w = Window.partitionBy(text_col).orderBy(id_col)
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def _token_table(df: DataFrame, id_col: str, text_col: str, shingle: int) -> DataFrame:
    """(id, token) pairs — distinct shingles per doc."""
    sh = word_ngrams(F.col(text_col), shingle) if shingle > 1 else tokens(F.col(text_col))
    return (df.select(F.col(id_col), F.explode(F.array_distinct(sh)).alias("token")))


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       num_hashes: int = 16, shingle: int = 2,
                       token_hash: str = "xxhash") -> DataFrame:
    """MinHash signature per document: shingle → token-int → k affine
    hashes → per-doc min of each. Returns (id, mh0..mh{k-1}).

    One explode + one hash-agg; signature columns are k ints per doc.
    """
    # Physical-form note (A/B'd round 6): a row-local HOF form
    # (transform + array_min per hash, zero shuffles) LOSES to this
    # explode + groupBy at every scale tried - higher-order functions
    # fall out of whole-stage codegen and materialize k arrays per doc,
    # while the hash agg's per-doc mins are computed MAP-SIDE (a doc's
    # tokens explode inside one partition, partial_min collapses them
    # before the exchange), so the "token-table shuffle" actually moves
    # ~1 row per doc. Signatures are bit-identical either way (verified).
    if num_hashes > len(MINHASH_COEFFS):
        raise ValueError(
            f"num_hashes={num_hashes} exceeds the {len(MINHASH_COEFFS)} "
            "defined hash streams — a silently shorter signature would "
            "mis-band downstream")
    tok = _token_table(df, id_col, text_col, shingle)
    if token_hash == "xxhash":
        tok = tok.withColumn(
            "tid", F.expr(f"pmod(xxhash64(token), {MINHASH_PRIME}L)"))
    elif token_hash == "vocab":
        from clickhouse_clickhouse_spark.operators.grank import (
            global_row_number,
        )

        # sorted-vocabulary ids via the distributed bucketed rank (string
        # keys bucket on their 7-byte UTF-8 prefix) - no single-partition
        # window even in oracle mode
        vocab = global_row_number(tok.select("token").distinct(),
                                  "token", out="tid", kernel=False)
        tok = tok.join(F.broadcast(vocab), "token")
    else:
        raise ValueError("token_hash must be 'xxhash' or 'vocab'")
    # expr strings, not Column-by-Column trees: 8 driver-side calls
    # instead of ~50 py4j round trips (bench fixed cost, same plan)
    aggs = [
        F.expr(f"min(({a}L * tid + {b}L) % {MINHASH_PRIME}L) AS mh{k}")
        for k, (a, b) in enumerate(MINHASH_COEFFS[:num_hashes])
    ]
    return tok.groupBy(id_col).agg(*aggs)


def minhash_candidate_pairs(df: DataFrame, id_col: str, text_col: str,
                            num_hashes: int = 16, bands: int = 4, shingle: int = 2,
                            token_hash: str = "xxhash",
                            max_bucket: int | None = None) -> DataFrame:
    """LSH banding: split the signature into ``bands`` bands, group docs by
    (band index, band value), emit candidate pairs (a < b) that share at
    least one band. Returns distinct (id_a, id_b).

    Scale: ONE hash shuffle groups docs into (band, signature) buckets
    — the banded self-JOIN form this replaces (round 7) needed the same
    exchange read twice (ReusedExchange) plus join bookkeeping; the
    bucket aggregate materializes each bucket's sorted member list once
    and emits the C(n,2) pairs row-locally, so the pair explosion never
    crosses the wire. A/B'd at bench scale: ~20% faster wall with
    bit-identical output; at 100 TB the shuffle volume is strictly
    smaller (one banded exchange instead of two reads + join output).
    Hot buckets (boilerplate: many near-identical docs landing in ONE
    bucket) are still the skew risk — a bucket of B members emits B²/2
    pairs. ``max_bucket`` is the real 100 TB mitigation: buckets larger
    than it collapse to a STAR on the bucket's minimum id (each member
    pairs with the canonical only) — O(B) pairs, and the connected
    components downstream are IDENTICAL (every member still reaches the
    canonical, so transitive grouping is unchanged; only redundant
    intra-bucket edges drop). The routing (rewritten round 8) never
    materializes an over-cap member array: a cheap (count, min)
    pre-aggregate per bucket routes members via a same-key join — the
    banded exchange is reused for both sides, over-cap members stream
    straight to (canonical, member) rows, and collect_list only ever
    sees buckets already filtered to <= max_bucket members (the old
    SIZE branch built the full multi-GB array row for a mega-bucket
    BEFORE the branch could drop it). Verified-pair pipelines then
    verify member-vs-canonical, which is exactly the pair that matters
    for boilerplate. Default None keeps the exact all-pairs single
    aggregate (oracle/bench mode — zero plan change).

    Bucket keys are ``xxhash64(band, mh...)`` longs — band folded into
    the hash, one scalar key (the string-concat key this replaces cost
    a concat per row and wider shuffle rows); a 64-bit collision would
    only ADD a candidate pair (LSH candidates are verified downstream
    by contract). Expressions are built as SQL strings: the driver-side
    Column-by-Column form cost ~150 py4j round trips ≈ 0.4 s per bench
    iteration — as much as the execution itself.
    """
    if bands < 1 or num_hashes % bands:
        raise ValueError(
            f"minhash_candidate_pairs: bands={bands} must divide "
            f"num_hashes={num_hashes} (a remainder would silently drop "
            f"the trailing hashes from every band key)")
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle,
                             token_hash)
    # one bucket key per band; NULL for token-less docs (dropped by the
    # post-explode filter, which sits ON the generator output and so
    # cannot push below the generate into the shingle pipeline)
    keys = []
    for b in range(bands):
        mem = ", ".join(f"mh{b * rows_per_band + r}"
                        for r in range(rows_per_band))
        keys.append(f"IF(mh{b * rows_per_band} IS NOT NULL, "
                    f"xxhash64({b}, {mem}), NULL)")
    banded = (sig.selectExpr(id_col,
                             f"explode(array({', '.join(keys)})) AS __bk")
              .filter("__bk IS NOT NULL"))
    all_pairs = ("explode(flatten(transform(ids, (__x, __i) -> "
                 "transform(slice(ids, __i + 2, size(ids)), "
                 "__y -> struct(__x AS id_a, __y AS id_b))))) AS p")
    if max_bucket is None:
        buckets = (banded.groupBy("__bk")
                   .agg(F.expr(f"array_sort(collect_list({id_col})) "
                               "AS ids"))
                   .filter("size(ids) >= 2"))
        pairs = buckets.selectExpr(all_pairs).select("p.id_a", "p.id_b")
    else:
        # Over-cap buckets must never MATERIALIZE their member array
        # (round-8 verdict watch item: collect_list builds the full
        # multi-GB array row before a size branch can drop it — a
        # boilerplate mega-bucket at 100 TB dies on the 2 GB array
        # limit). Route by a pre-count instead: a cheap (count, min)
        # aggregate per bucket, then join members back — both sides
        # hash-partition on __bk, so the banded exchange is REUSED
        # (one shingle pass) and the under-cap collect_list runs on
        # rows already filtered to bounded buckets.
        sizes = banded.groupBy("__bk").agg(
            F.count(F.lit(1)).alias("__n"),
            F.min(id_col).alias("__canon"))
        j = banded.join(sizes.filter(F.col("__n") >= 2), "__bk")
        star = (j.filter(F.col("__n") > max_bucket)
                .filter(F.col(id_col) != F.col("__canon"))
                .select(F.col("__canon").alias("id_a"),
                        F.col(id_col).alias("id_b")))
        small = (j.filter(F.col("__n") <= max_bucket)
                 .groupBy("__bk")
                 .agg(F.expr(f"array_sort(collect_list({id_col})) "
                             "AS ids"))
                 .selectExpr(all_pairs).select("p.id_a", "p.id_b"))
        pairs = small.unionByName(star)
    return pairs.distinct()


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        block_col: str, shingle: int = 2,
                        threshold: float = 0.0) -> DataFrame:
    """Exact n-gram Jaccard similarity for doc pairs inside a blocking key
    (e.g. same source/bucket — full cross-product is quadratic, blocking
    bounds it). Returns (id_a, id_b, jaccard).

    Inverted-index form (optimization round 14). The original shape
    joined whole shingle ARRAYS pair-wise and ran ``array_intersect``
    per pair — every pair re-hashed both documents' shingle sets
    (O(pairs × doc_len), measured 33 s at sf0.1 where the pair count is
    623 k). Intersections are instead counted token-wise: explode the
    distinct shingles once, self-join on (block, token) — the one
    token-table exchange is reused for both sides — and a hash
    aggregate counts |A∩B| per pair. Sizes ride along, so
    ``jaccard = |A∩B| / (|A|+|B|-|A∩B|)`` needs no array ever to cross
    a pair boundary (guide §2.3: shuffle keys and counts, not
    payloads). Measured 33.1 → 2.2 s at sf0.1, bit-identical output.

    With ``threshold > 0`` only intersecting pairs can qualify and the
    pair relation IS the aggregate output — per-block work is
    Σ_token C(df_token, 2), the classic inverted-index bound, far below
    all-pairs when shingles are selective. With ``threshold <= 0`` the
    contract includes zero-overlap pairs (jaccard 0.0), so an id-only
    all-pairs join (ints, no arrays) re-attaches them; that branch is
    inherently O(block²) rows — production similarity mining sets a
    positive threshold and never materializes it."""
    sh = df.select(F.col(id_col), F.col(block_col),
                   F.array_distinct(word_ngrams(F.col(text_col), shingle)).alias("sh"))
    sized = sh.select(F.col(id_col).alias("__id"),
                      F.col(block_col).alias("__blk"),
                      F.size("sh").alias("__n"), F.col("sh"))
    tok = sized.select("__id", "__blk", "__n", F.explode("sh").alias("__tk"))
    ta = tok.select(F.col("__blk"), F.col("__tk"),
                    F.col("__id").alias("id_a"), F.col("__n").alias("__na"))
    tb = tok.select(F.col("__blk").alias("__blkb"), F.col("__tk").alias("__tkb"),
                    F.col("__id").alias("id_b"), F.col("__n").alias("__nb"))
    inter = (ta.join(tb, (F.col("__blk") == F.col("__blkb")) &
                     (F.col("__tk") == F.col("__tkb")) &
                     (F.col("id_a") < F.col("id_b")))
             .groupBy("id_a", "id_b", "__na", "__nb")
             .agg(F.count(F.lit(1)).alias("__i")))

    def _jac(i: Column, na: Column, nb: Column) -> Column:
        return F.round(i.cast("double") /
                       F.greatest(na + nb - i, F.lit(1)).cast("double"), 6)

    if threshold > 0:
        return (inter.select(F.col("id_a"), F.col("id_b"),
                             _jac(F.col("__i"), F.col("__na"),
                                  F.col("__nb")).alias("jaccard"))
                .filter(F.col("jaccard") >= threshold))
    ids = sized.select("__blk", "__id", "__n")
    ap = (ids.alias("x").join(ids.alias("y"),
                              (F.col("x.__blk") == F.col("y.__blk")) &
                              (F.col("x.__id") < F.col("y.__id")))
          .select(F.col("x.__id").alias("id_a"), F.col("y.__id").alias("id_b"),
                  F.col("x.__n").alias("__na"), F.col("y.__n").alias("__nb")))
    return (ap.join(inter.select("id_a", "id_b", "__i"), ["id_a", "id_b"],
                    "left")
            .select(F.col("id_a"), F.col("id_b"),
                    _jac(F.coalesce(F.col("__i"), F.lit(0)), F.col("__na"),
                         F.col("__nb")).alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


def simhash(df: DataFrame, id_col: str, text_col: str,
            bits: int = 16, shingle: int = 1,
            token_hash: str = "xxhash") -> DataFrame:
    """SimHash per document: each token votes ±1 on each signature bit
    (bit k of its affine hash); bit is 1 when the vote sum is positive.
    Returns (id, simhash) with simhash in [0, 2^bits).

    Implemented as explode(tokens) × explode(bit positions) → hash agg —
    row count × bits, but each row is tiny and the agg is partial/final.
    """
    tok = _token_table(df, id_col, text_col, shingle)
    if token_hash == "xxhash":
        tok = tok.withColumn("tid", F.pmod(F.xxhash64("token"), F.lit(MINHASH_PRIME)))
    else:
        from clickhouse_clickhouse_spark.operators.grank import (
            global_row_number,
        )

        # sorted-vocabulary ids via the distributed bucketed rank (string
        # keys bucket on their 7-byte UTF-8 prefix) - no single-partition
        # window even in oracle mode
        vocab = global_row_number(tok.select("token").distinct(),
                                  "token", out="tid", kernel=False)
        tok = tok.join(F.broadcast(vocab), "token")
    h = (F.lit(MINHASH_COEFFS[0][0]) * F.col("tid") + F.lit(MINHASH_COEFFS[0][1])) \
        % F.lit(MINHASH_PRIME)
    tok = tok.withColumn("h", h)
    votes = (tok.select(id_col, "h",
                        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"))
             .withColumn("vote",
                         F.when(F.expr("shiftright(h, bit) & 1") == 1,
                                F.lit(1)).otherwise(F.lit(-1)))
             .groupBy(id_col, "bit").agg(F.sum("vote").alias("v")))
    return (votes.groupBy(id_col)
            .agg(F.sum(F.when(F.col("v") > 0, F.expr("shiftleft(1L, bit)"))
                       .otherwise(F.lit(0))).alias("simhash")))


def auto_bucket_bits(n_rows: int, target_occupancy: int = 1024) -> int:
    """Sign-LSH bucket width that keeps expected bucket occupancy ~flat
    as the corpus grows (bits ≈ log2(n / target)): the scale lever the
    10x measurements in SCALE.md call out — fixed bits means per-bucket
    pair work grows quadratically with corpus size; log-scaled bits holds
    it constant. Clamped to [4, 24]."""
    import math

    if n_rows <= target_occupancy:
        return 4
    return max(4, min(24, math.ceil(math.log2(n_rows / target_occupancy))))


def embedding_near_dup_pairs(df: DataFrame, id_col: str, vec_col: str,
                             threshold: float = 0.95,
                             bucket_bits: int = 8) -> DataFrame:
    """Embedding-cosine near-duplicate pairs. The default
    ``bucket_bits=8`` prefilters by an 8-bit sign-LSH bucket (sign of the
    first k coordinates ≈ axis-aligned random hyperplanes): near-identical
    vectors agree on signs with high probability, cutting the join to
    per-bucket cross products — the only default that survives 100 TB.
    ``bucket_bits=0`` is an explicit opt-in to the exact all-pairs
    quadratic self-join; use it only under an external blocking key or on
    provably small inputs.
    """
    from clickhouse_clickhouse_spark.functions.vectors import cosine_similarity
    from clickhouse_clickhouse_spark.pipeline.similarity import _sign_bucket

    base = df.select(F.col(id_col), F.col(vec_col).alias("v"))
    if bucket_bits > 0:
        # one bucketing convention repo-wide (round 14 — this block was
        # an inline copy of similarity._sign_bucket)
        base = base.withColumn("__bkt",
                               _sign_bucket(F.col("v"), bucket_bits))
        cond = (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")) & \
               (F.col("a.__bkt") == F.col("b.__bkt"))
    else:
        cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    a, b = base.alias("a"), base.alias("b")
    cos = F.round(cosine_similarity(F.col("a.v"), F.col("b.v")), 6)
    out = (a.join(b, cond)
           .select(F.col(f"a.{id_col}").alias("id_a"),
                   F.col(f"b.{id_col}").alias("id_b"),
                   cos.alias("cosine"))
           .filter(F.col("cosine") >= threshold))
    return out


def chunk_dedup(df: DataFrame, id_col: str, text_col: str,
                size: int = 100, stride: int | None = None,
                max_chunks: int = 20) -> DataFrame:
    """Chunk-level exact dedup — the sub-document dedup stage of a
    training pipeline (boilerplate headers/footers repeat across docs
    even when whole documents differ). Splits each text into fixed-size
    character windows (``stride`` defaults to ``size`` = non-overlapping),
    then keeps each distinct chunk's FIRST occurrence (minimum
    ``(doc_id, chunk_id)``). Returns (doc_id, chunk_id, chunk, keep).

    Scale shape: one narrow explode (no shuffle), one hash-aggregate on
    the chunk content to elect keepers, one equi-join back — identical to
    exact_dedup but at chunk granularity. The keeper is the lexicographic
    minimum ``(doc_id, chunk_id)`` struct — works for string doc ids and
    has no collision envelope (round 14: the former arithmetic
    ``doc_id*(max_chunks+1)+chunk_id`` key NULLed out on string ids and
    could collide across docs past the cap).

    Chunks are generated per document LENGTH (round-14 review: the
    former static 0..max_chunks explode silently truncated any document
    longer than max_chunks*stride+size — 58% data loss on a 5000-char
    doc at the defaults, presented as dedup output). ``max_chunks`` is
    retained for API compatibility and ignored.

    Reference parity: the reference dedups at part granularity via
    ReplacingMergeTree ordering; chunk-level text dedup is the
    LLM-pipeline extension of the same keep-first-by-key semantics.
    """
    stride = stride or size
    n = F.length(F.col(text_col))
    # SEQUENCE(0, -1)/(1, 0) DESCENDS — empty texts must yield an empty
    # array, not a descending two-row one
    chunk_ids = F.when(
        n > 0,
        F.sequence(F.lit(0).cast("long"),
                   F.floor((n - F.lit(1)) / F.lit(stride)).cast("long"))
    ).otherwise(F.array().cast("array<long>"))
    c = (df.select(F.col(id_col), F.col(text_col).alias("__t"),
                   F.explode(chunk_ids).alias("chunk_id"))
         .select(F.col(id_col), F.col("chunk_id"),
                 F.substring(F.col("__t"), F.col("chunk_id") * stride + 1,
                             F.lit(size)).alias("chunk")))
    key = F.struct(F.col(id_col).alias("__kd"),
                   F.col("chunk_id").alias("__kc"))
    keepers = (c.groupBy("chunk")
               .agg(F.min(key).alias("__keeper")))
    return (c.join(keepers, "chunk")
            .select(id_col, "chunk_id", "chunk",
                    (key == F.col("__keeper")).alias("keep")))


def chunk_dedup_rebuild(df: DataFrame, id_col: str, text_col: str,
                        size: int = 100, stride: int | None = None,
                        max_chunks: int = 20) -> DataFrame:
    """Sub-document dedup with text reassembly — the *cleaning* step the
    span-removal literature applies after finding duplicated spans
    (public: Lee et al., "Deduplicating Training Data Makes Language
    Models Better"): run :func:`chunk_dedup`, drop each document's
    non-keeper chunks, and stitch the survivors back together in chunk
    order. Returns (id, clean_text, n_kept, n_dropped).

    The reassembly is one per-doc hash aggregation: collect the kept
    (chunk_id, chunk) structs, array_sort (orders by the struct's first
    field — the chunk position), project the text and concat. Per-doc
    state is bounded by document length, never by corpus size, so the
    shape holds at 100 TB.
    """
    cd = chunk_dedup(df, id_col, text_col, size=size, stride=stride,
                     max_chunks=max_chunks)
    kept_struct = F.when(F.col("keep"), F.struct("chunk_id", "chunk"))
    return (cd.groupBy(id_col)
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(kept_struct)),
                        lambda s: s["chunk"]), "").alias("clean_text"),
                F.sum(F.col("keep").cast("long")).alias("n_kept"),
                F.sum((~F.col("keep")).cast("long")).alias("n_dropped")))

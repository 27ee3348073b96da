"""Cross-document repeated n-gram (boilerplate) detection.

The within-document repetition filters (``functions/text.py``: Gopher
ratios, ``repetition_profile``) can't see *cross*-document repetition —
boilerplate headers, license blocks, templated spans duplicated across
thousands of pages. The public recipe (Lee et al., "Deduplicating
Training Data Makes Language Models Better", ACL 2022, which removes
substrings repeated across the corpus) maps to Spark as:

1. shingle every document into word n-grams **with positions** (explode —
   linear, no shuffle);
2. count distinct documents per gram (one hash shuffle on the gram key);
   grams in ≥ ``min_docs`` documents form the boilerplate set;
3. semi-join the positioned grams against that set and union the covered
   token intervals per document → per-doc repeated-span coverage.

Scale notes: the gram-count shuffle is the only wide stage; at 100 TB
group on ``xxhash64(gram)`` instead of the string to cut shuffle bytes
~10× (collisions are ~2⁻⁶⁴ — irrelevant for a ≥k-docs filter), and cap
per-doc positions with ``max_positions`` to bound explode width on
pathological documents. Coverage counting explodes only *flagged*
positions (post-filter), not all grams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _positioned_grams(docs: DataFrame, n: int, id_col: str, text_col: str,
                      max_positions: int | None) -> DataFrame:
    """(id, i, g, n_tokens): word n-gram starting at 1-based token i.
    Tokenization is a plain single-space split of the lowercased text —
    the oracle-replayable convention used across the text pipeline."""
    w = F.split(F.lower(F.col(text_col)), " ")
    out = docs.select(F.col(id_col), w.alias("__w"),
                      F.size(w).alias("n_tokens"))
    hi = F.col("n_tokens") - (n - 1)
    if max_positions is not None:
        hi = F.least(hi, F.lit(max_positions))
    # sequence(1, 0) would generate a DESCENDING [1, 0] — guard sub-n-token
    # documents with an empty array (explode then drops them; callers
    # re-add short docs explicitly)
    positions = F.when(hi >= 1, F.sequence(F.lit(1), hi)) \
                 .otherwise(F.array().cast("array<int>"))
    return (out.select(
        id_col, "n_tokens",
        F.explode(positions).alias("i"),
        F.col("__w"))
        .withColumn("g", F.array_join(F.slice("__w", F.col("i"), n), " "))
        .drop("__w"))


def frequent_ngrams(docs: DataFrame, *, n: int = 5, min_docs: int = 3,
                    id_col: str = "doc_id", text_col: str = "text",
                    max_positions: int | None = None,
                    hash_grams: bool = False) -> DataFrame:
    """The corpus-wide boilerplate set: (gram, n_docs) for every word
    n-gram appearing in at least ``min_docs`` distinct documents.
    ``hash_grams=True`` shuffles/groups on ``xxhash64(gram)`` instead of
    the gram string (column ``gh``) — ~10× fewer shuffle bytes at
    corpus scale, collisions ~2⁻⁶⁴; the oracle-checked string mode stays
    the default for replayability."""
    grams = _positioned_grams(docs, n, id_col, text_col, max_positions)
    key = F.xxhash64("g").alias("gh") if hash_grams else F.col("g")
    return (grams.groupBy(key)
            .agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
            .filter(F.col("n_docs") >= min_docs))


def repeated_span_stats(docs: DataFrame, *, n: int = 5, min_docs: int = 3,
                        id_col: str = "doc_id", text_col: str = "text",
                        max_positions: int | None = None,
                        hash_grams: bool = False) -> DataFrame:
    """Per-document repeated-span coverage: how much of each document is
    covered by corpus-frequent n-grams.

    Returns (id, n_tokens, n_gram_pos, n_rep_pos, n_cov_tokens,
    rep_fraction): gram positions, positions whose gram is boilerplate,
    distinct tokens covered by the union of those spans, and the covered
    fraction of the document — the score a curation pipeline thresholds
    to drop or trim templated documents."""
    grams = _positioned_grams(docs, n, id_col, text_col, max_positions)
    freq = frequent_ngrams(docs, n=n, min_docs=min_docs, id_col=id_col,
                           text_col=text_col, max_positions=max_positions,
                           hash_grams=hash_grams)
    if hash_grams:
        grams = grams.withColumn("gh", F.xxhash64("g"))
        flagged = grams.join(freq.select("gh"), "gh", "left_semi")
    else:
        flagged = grams.join(freq.select("g"), "g", "left_semi")
    # ONE pass over the flagged positions (round 14): coverage of the
    # interval union ∪[i, i+n-1] via an interval sweep — positions are
    # unique per (doc, i), so in ascending-i order each row adds
    # min(n, i - prev) new covered tokens (n when it starts a new
    # island). n_rep_pos = count(*) rides the same aggregate. The
    # pre-round-14 shape ran rep (pre-explode count) and cov (explode
    # every position n-fold + count_distinct) as separate branches,
    # re-executing the shingle explode + semi-join subtree once per
    # branch; the sweep also keeps the row count independent of n
    # (the explode form multiplies the aggregate input n×). A/B at
    # sf0.1: explode+distinct 1.39 s vs sweep 1.23 s, identical rows.
    from pyspark.sql import Window

    wspec = Window.partitionBy(id_col).orderBy("i")
    prev = F.lag("i").over(wspec)
    contrib = F.when(prev.isNull() | (F.col("i") - prev >= n), F.lit(n)) \
               .otherwise(F.col("i") - prev)
    rep = (flagged.withColumn("__c", contrib)
           .groupBy(id_col)
           .agg(F.count("*").alias("n_rep_pos"),
                F.sum("__c").cast("long").alias("n_cov_tokens")))
    # n_tokens / n_gram_pos are algebraic in the token count — no gram
    # explode, no count branch, no short-doc anti-join union (the
    # pre-round-14 shape paid TWO more full shingle explodes here):
    # positions = sequence(1, hi) has exactly max(hi, 0) entries.
    w = F.split(F.lower(F.col(text_col)), " ")
    hi = F.size(w) - (n - 1)
    if max_positions is not None:
        hi = F.least(hi, F.lit(max_positions))
    base = docs.select(F.col(id_col), F.size(w).alias("n_tokens"),
                       F.greatest(hi, F.lit(0)).cast("long")
                        .alias("n_gram_pos"))
    return (base
            .join(rep, id_col, "left")
            .select(
                id_col, "n_tokens", "n_gram_pos",
                F.coalesce("n_rep_pos", F.lit(0)).alias("n_rep_pos"),
                F.coalesce("n_cov_tokens", F.lit(0)).alias("n_cov_tokens"),
                F.round(F.coalesce("n_cov_tokens", F.lit(0))
                        / F.col("n_tokens").cast("double"), 6)
                .alias("rep_fraction")))


def exact_substring_spans(docs: DataFrame, *, n: int = 50,
                          min_docs: int = 2,
                          id_col: str = "doc_id", text_col: str = "text",
                          max_positions: int | None = None,
                          hash_grams: bool = False) -> DataFrame:
    """Exact-substring dedup SPANS (Lee et al. ACL'22 §4.1 — remove any
    substring of >= n tokens that appears verbatim in >= ``min_docs``
    documents): every stride-1 length-n window shared across documents
    is flagged, and overlapping/adjacent flagged windows merge into
    maximal token intervals. Returns (id, span_start, span_end) with
    1-based INCLUSIVE token positions.

    This is the suffix-array recipe re-expressed as joins: the
    positioned-gram explode is the suffix enumeration, the gram-count
    shuffle is the cross-doc match, and the island merge (one
    hash-partitioned window per doc) replaces the sorted-suffix scan —
    no global sort, no driver state.
    """
    grams = _positioned_grams(docs, n, id_col, text_col, max_positions)
    freq = frequent_ngrams(docs, n=n, min_docs=min_docs, id_col=id_col,
                           text_col=text_col, max_positions=max_positions,
                           hash_grams=hash_grams)
    if hash_grams:
        grams = grams.withColumn("gh", F.xxhash64("g"))
        flagged = grams.join(freq.select("gh"), "gh", "left_semi")
    else:
        flagged = grams.join(freq.select("g"), "g", "left_semi")
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("i")
    # windows [i, i+n-1] and [j, j+n-1] merge iff j <= i + n (overlap or
    # touch); a gap starts a new island
    prev = F.lag("i").over(w)
    isl = (flagged
           .withColumn("__new", F.when(prev.isNull()
                                       | (F.col("i") > prev + n), 1)
                       .otherwise(0))
           .withColumn("__island", F.sum("__new").over(
               w.rowsBetween(Window.unboundedPreceding, 0))))
    return (isl.groupBy(id_col, "__island")
            .agg(F.min("i").alias("span_start"),
                 (F.max("i") + (n - 1)).cast("long").alias("span_end"))
            .drop("__island"))


def remove_repeated_spans(docs: DataFrame, spans: DataFrame, *,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Apply :func:`exact_substring_spans`: rebuild each document with
    the span tokens REMOVED (the Lee et al. cut — survivors keep one
    copy because spans only flag cross-doc matches per document that
    has them; pair with exact/minhash dedup for the keep-one policy).
    Token positions are the same 1-based single-space-split convention
    the span extractor used. Documents without spans pass through."""
    sp = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__sp"))
    d = docs.join(sp, id_col, "left")
    toks = F.split(F.col(text_col), " ")
    kept = F.filter(
        toks,
        lambda t, i: ~F.exists(
            F.coalesce(F.col("__sp"), F.array()),
            lambda s: (i + 1 >= s["span_start"])
            & (i + 1 <= s["span_end"])))
    return (d.withColumn(text_col, F.array_join(kept, " "))
            .drop("__sp"))

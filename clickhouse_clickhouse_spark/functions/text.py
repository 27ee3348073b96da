"""Text-analysis functions for the LLM-data-pipeline surface
(BASELINE.json north-star; SURVEY.md §7 M7): tokenization, n-grams,
quality scoring, language ID, fingerprinting.

All built on JVM-side expressions (split / higher-order functions /
regexp) — no Python UDFs in the hot path, so they survive 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword seeds for the n-gram/stopword language
# heuristic. Deliberately small and deterministic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"],
    "es": ["el", "la", "los", "las", "y", "de", "un", "una", "es", "que"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (fixtures are space-separated word soup);
    filters empty tokens."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish token estimate: word-pieces + digits + punctuation split via
    regex (a public GPT-2-style pre-tokenizer shape), counted JVM-side."""
    pieces = F.filter(
        F.split(text, r"(?=[\s\p{Punct}])|(?<=[\s\p{Punct}])"),
        lambda t: F.trim(t) != "")
    return F.size(pieces)


def word_ngrams(text: Column, n: int) -> Column:
    """Word n-gram shingles as an array<string>; empty array when the doc
    has fewer than n tokens.

    Built by zipping the token array against its own shifted slices —
    n-1 slices + zips, each a single O(len) pass. (The naive
    transform-over-index-sequence with a per-element slice is O(len·n)
    with a much larger constant: 4-5x slower on the documents fixture.)
    zip_with null-pads the shorter side and concat propagates the null,
    so the trailing partial shingles drop in one filter pass.

    The token array is bound ONCE via the single-element transform
    trick (optimization round 15): the bare Column reuse spliced the
    split+filter subtree into both zip_with sides, so every row paid
    the tokenization twice (visible verbatim in the r15 minhash before
    plans). Same expressions, same output — one evaluation.
    """
    toks = tokens(text)
    if n == 1:
        return toks

    def _grams(tv: Column) -> Column:
        g = tv
        for j in range(1, n):
            shifted = F.slice(tv, j + 1, 1 << 30)
            g = F.zip_with(g, shifted,
                           lambda a, b: F.concat(a, F.lit(" "), b))
        return F.filter(g, lambda x: x.isNotNull())

    return F.element_at(F.transform(F.array(toks), _grams), 1)


def char_ngrams(text: Column, n: int) -> Column:
    t = text
    return F.when(
        F.length(t) >= n,
        F.transform(F.sequence(F.lit(1), F.length(t) - (n - 1)),
                    lambda i: F.substring(t, i, n)),
    ).otherwise(F.array().cast("array<string>"))


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[\p{Punct}]", "")
    return (F.length(text) - F.length(stripped)) / F.greatest(F.length(text), F.lit(1))


def digit_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[0-9]", "")
    return (F.length(text) - F.length(stripped)) / F.greatest(F.length(text), F.lit(1))


def mean_word_length(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total / F.greatest(F.size(toks), F.lit(1))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    toks = tokens(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column) -> Column:
    """Composite heuristic quality score in [0,1]: rewards moderate length,
    low punctuation/digit noise, plausible word lengths. Deterministic,
    expression-only — the standard cheap pre-filter of a training-data
    pipeline."""
    length_term = F.least(token_count(text) / F.lit(50.0), F.lit(1.0))
    noise_term = F.lit(1.0) - F.least(punct_ratio(text) * 4 + digit_ratio(text) * 2, F.lit(1.0))
    wl = mean_word_length(text)
    wl_term = F.when((wl >= 2) & (wl <= 12), F.lit(1.0)).otherwise(F.lit(0.3))
    return F.round(length_term * 0.4 + noise_term * 0.4 + wl_term * 0.2, 6)


def lang_guess(text: Column) -> Column:
    """Stopword-vote language ID over the seeded languages; 'und' when no
    stopword hits. Expression-only n-gram-heuristic analog."""
    toks = tokens(F.lower(text))
    scores = []
    for lang, words in STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        scores.append(
            F.struct(F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).alias("hits"),
                     F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint64(text: Column) -> Column:
    """Document fingerprint: xxhash64 of the normalized (lowercased,
    whitespace-collapsed) text — exact-dup key that survives trivial
    formatting differences."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.xxhash64(norm)


def winnowing_fingerprints(df, id_col: str, text_col: str,
                           k: int = 5, w: int = 4,
                           max_chars: int = 256):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS algorithm): k-gram polynomial rolling hashes, then per window of
    ``w`` consecutive grams keep the minimum hash (rightmost on ties).
    Guarantees a match of length >= w+k-1 between two documents shares at
    least one fingerprint — the property LSH-free local dedup relies on.

    Pure column ops: positions exploded JVM-side, the window minimum is a
    per-document ROWS frame (hash-partitioned by doc — parallel), and the
    rightmost-tie rule is encoded arithmetically (ord = h * 2^21 +
    (2^20 - pos), so min(ord) = min hash with the LARGEST position) —
    the same integer arithmetic an ANSI oracle can replay exactly.
    Returns (id, fingerprint hash, gram position), distinct.
    """
    from pyspark.sql import Window

    B, M = 131, 1073741789           # polynomial base / modulus (< 2^30)
    t = F.regexp_replace(F.lower(F.substring(F.col(text_col), 1, max_chars)),
                         "[^a-z0-9 ]", "")
    d = df.select(F.col(id_col), t.alias("__t"),
                  F.length(t).alias("__len"))
    d = d.filter(F.col("__len") >= k)
    d = d.select(id_col, "__t",
                 F.explode(F.sequence(F.lit(1),
                                      F.col("__len") - (k - 1)))
                 .alias("p"))
    h = F.lit(0).cast("long")
    for j in range(k):
        # ascii() is int32 — widen BEFORE multiplying (131^4 * 122
        # overflows int)
        h = h + F.ascii(F.substring(F.col("__t"), F.col("p") + j,
                                    F.lit(1))).cast("long") * (B ** j)
    d = d.withColumn("h", h % M)
    d = d.withColumn("ord", F.col("h") * 2097152
                     + (1048576 - F.col("p")))
    frame = (Window.partitionBy(id_col).orderBy("p")
             .rowsBetween(-(w - 1), 0))
    d = d.withColumn("mo", F.min("ord").over(frame))
    # complete windows only (frame end >= w), except docs shorter than w
    # windows which contribute their single partial-window minimum
    d = d.withColumn("maxp", F.max("p").over(Window.partitionBy(id_col)))
    d = d.filter((F.col("p") >= w)
                 | ((F.col("maxp") < w) & (F.col("p") == F.col("maxp"))))
    return (d.select(F.col(id_col),
                     (F.col("mo") / 2097152).cast("long").alias("fp_hash"),
                     (1048576 - F.col("mo") % 2097152).cast("long")
                     .alias("fp_pos"))
            .distinct())


# -- PII redaction + repetition filters (Gopher-rule family) ---------------

# Ordered: email before phone (digits in local parts), card before phone
# (a 4-4-4-4 card contains phone-shaped digit runs), ip before phone.
# Patterns are kept to syntax shared by Java regex (Spark) and RE2
# (DuckDB) so the oracle runs the same automaton.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("card", r"\b[0-9]{4}-[0-9]{4}-[0-9]{4}-[0-9]{4}\b", "<CARD>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "<PHONE>"),
]


def redact_pii(text: Column) -> Column:
    """Scrub emails / card numbers / IPv4s / phone numbers, replacing
    each with a typed tag — the standard pre-training privacy pass.
    Pure chained ``regexp_replace`` (JVM-side, whole-stage codegen)."""
    out = text
    for _, pat, tag in PII_PATTERNS:
        out = F.regexp_replace(out, pat, tag)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-type match counts (for audit metrics alongside the scrub)."""
    return {kind: F.regexp_count(text, F.lit(pat))
            for kind, pat, _ in PII_PATTERNS}


def word_repetition_fraction(text: Column) -> Column:
    """Fraction of tokens that are repeats of an earlier token:
    1 - distinct/total. One of the Gopher repetition signals."""
    toks = tokens(text)
    return (F.lit(1.0)
            - F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1)))


def repetition_profile(df, id_col: str = "doc_id", text_col: str = "text",
                       *, max_word_rep: float = 0.6,
                       max_top_bigram: float = 0.10):
    """Gopher-style repetition filter profile per document:
    ``(id_col, word_rep_frac, top_bigram_frac, keep)``.

    top_bigram_frac (share of all bigrams taken by the most common one)
    needs a per-(doc, gram) count — one keyed shuffle on the doc id, so
    the whole profile is embarrassingly parallel at corpus scale; no
    global state, no driver collection.

    word_rep_frac is materialized in a projection BELOW the bigram
    Generate (round 14): a single select mixing the explode with the
    tokenize+array_distinct fold puts that fold in the post-Generate
    projection, re-evaluating it once per BIGRAM instead of once per
    doc (~50x more evaluations on the fixture; 6.1 -> 0.9 s at sf0.1).
    Generate is a CollapseProject barrier, so the staged form is
    stable.
    """
    pre = df.select(F.col(id_col),
                    F.round(word_repetition_fraction(F.col(text_col)), 6)
                     .alias("word_rep_frac"),
                    F.col(text_col))
    d = pre.select(F.col(id_col), F.col("word_rep_frac"),
                   F.explode(word_ngrams(F.col(text_col), 2)).alias("gram"))
    per_gram = d.groupBy(id_col, "word_rep_frac", "gram").count()
    prof = (per_gram.groupBy(id_col, "word_rep_frac")
            .agg(F.round(F.max("count") / F.sum("count"), 6)
                 .alias("top_bigram_frac")))
    return prof.withColumn(
        "keep",
        (F.col("word_rep_frac") <= max_word_rep)
        & (F.col("top_bigram_frac") <= max_top_bigram))


def hashed_linear_score(text: Column, dim: int = 1024,
                        seed: int = 0) -> Column:
    """fastText-style linear classifier inference via the hashing trick
    (public: Joulin et al., "Bag of Tricks for Efficient Text
    Classification"; Weinberger et al., "Feature Hashing for Large Scale
    Multitask Learning"): token → hash-bucket feature id → mean of the
    bucket weights, squashed by a logistic.

    Both the token hash and the weight table are deterministic
    ANSI-replayable placeholders (char-arithmetic bucket; bucket id
    scattered by the Knuth constant to [-0.5, 0.5]) so the whole path is
    expression-only and oracle-checkable. Production swaps: bucket →
    ``xxhash64(token) % dim``; weights → a broadcast-joined trained
    weight column. The featurization/scoring plumbing is the product;
    weights are a deployment artifact. Expression-only (aggregate over
    the token array — stays inside codegen, no explode, no shuffle)."""
    toks_arr = tokens(F.lower(text))

    def bucket(t: Column) -> Column:
        h = (F.ascii(F.substring(t, 1, 1)) * 961
             + F.ascii(F.substring(t, F.length(t), 1)) * 31
             + F.length(t) + F.lit(seed))
        return F.pmod(h, F.lit(dim))

    def weight(b: Column) -> Column:
        return ((b.cast("long") * F.lit(2654435761)) % F.lit(1000)
                ).cast("double") / F.lit(1000.0) - F.lit(0.5)

    total = F.aggregate(toks_arr, F.lit(0.0),
                        lambda acc, t: acc + weight(bucket(t)))
    mean = total / F.greatest(F.size(toks_arr), F.lit(1)).cast("double")
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-mean * 10)), 6)


def html_extract_text(html: Column) -> Column:
    """HTML → visible text extraction — the web-corpus ingestion stage
    upstream of every text filter (public ancestry: jusText/trafilatura's
    strip-and-collapse core, simplified to the tag/entity layer; block
    scoring is model territory). Chained JVM regexes, no Python per row:

    1. drop <script>/<style> blocks wholesale (their content is code,
       not text) — spelled per-tag because the DuckDB oracle's RE2 has
       no backreferences;
    2. drop comments, then all remaining tags;
    3. decode the common named entities (&amp; last so it can't
       re-introduce entity starts);
    4. collapse runs of whitespace and trim.
    """
    out = F.regexp_replace(html, r"(?is)<script[^>]*>.*?</script>", " ")
    out = F.regexp_replace(out, r"(?is)<style[^>]*>.*?</style>", " ")
    out = F.regexp_replace(out, r"(?s)<!--.*?-->", " ")
    out = F.regexp_replace(out, r"(?s)<[^>]*>", " ")
    for ent, lit in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""),
                     ("&apos;", "'"), ("&#39;", "'"), ("&nbsp;", " "),
                     ("&amp;", "&")):
        out = F.replace(out, F.lit(ent), F.lit(lit))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def word_shingle_simhash(text: Column, shingle: int = 2,
                         bits: int = 16) -> Column:
    """Scalar ``wordShingleSimHash`` analog ([U]
    src/Functions/FunctionsStringHash.cpp): per-string SimHash over
    DISTINCT word shingles — each shingle votes ±1 on every signature
    bit of its affine xxhash; bit set when the vote sum is positive.
    Same hash family and vote rule as the corpus-level
    pipeline/dedup.simhash (verified equal in pytest), so per-string
    and per-corpus signatures interoperate. Pure column expressions —
    bits × |shingles| lambda steps, no UDF."""
    from clickhouse_clickhouse_spark.pipeline.dedup import (
        MINHASH_COEFFS,
        MINHASH_PRIME,
    )

    grams = F.array_distinct(
        word_ngrams(text, shingle) if shingle > 1 else tokens(text))
    a, b = MINHASH_COEFFS[0]
    hashes = F.transform(
        grams,
        lambda g: (F.lit(a) * F.pmod(F.xxhash64(g), F.lit(MINHASH_PRIME))
                   + F.lit(b)) % F.lit(MINHASH_PRIME))
    # shiftright/shiftleft take a python int in the DataFrame API, so
    # bit extraction uses exact power-of-two arithmetic (hashes < 2^31,
    # well inside double precision)
    pow2 = lambda bit: F.pow(F.lit(2.0), bit).cast("long")
    vote = lambda bit: F.aggregate(
        hashes, F.lit(0).cast("long"),
        lambda acc, h: acc + F.when(
            (F.floor(h / pow2(bit)).cast("long") % 2) == 1, 1)
        .otherwise(-1))
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        F.lit(0).cast("long"),
        lambda acc, bit: acc + F.when(vote(bit) > 0, pow2(bit))
        .otherwise(F.lit(0).cast("long")))


def ngram_simhash(text: Column, n: int = 3, bits: int = 16) -> Column:
    """Scalar ``ngramSimHash`` analog: the character-n-gram twin of
    :func:`word_shingle_simhash` (same hash family and vote rule over
    DISTINCT character n-grams of the lowercased string)."""
    from clickhouse_clickhouse_spark.pipeline.dedup import (
        MINHASH_COEFFS,
        MINHASH_PRIME,
    )

    low = F.lower(text)
    grams = F.array_distinct(F.when(
        F.length(low) >= n,
        F.transform(F.sequence(F.lit(1), F.length(low) - (n - 1)),
                    lambda i: F.substring(low, i, n)))
        .otherwise(F.array().cast("array<string>")))
    a, b = MINHASH_COEFFS[0]
    hashes = F.transform(
        grams,
        lambda g: (F.lit(a) * F.pmod(F.xxhash64(g), F.lit(MINHASH_PRIME))
                   + F.lit(b)) % F.lit(MINHASH_PRIME))
    # shiftright/shiftleft take a python int in the DataFrame API, so
    # bit extraction uses exact power-of-two arithmetic (hashes < 2^31,
    # well inside double precision)
    pow2 = lambda bit: F.pow(F.lit(2.0), bit).cast("long")
    vote = lambda bit: F.aggregate(
        hashes, F.lit(0).cast("long"),
        lambda acc, h: acc + F.when(
            (F.floor(h / pow2(bit)).cast("long") % 2) == 1, 1)
        .otherwise(-1))
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        F.lit(0).cast("long"),
        lambda acc, bit: acc + F.when(vote(bit) > 0, pow2(bit))
        .otherwise(F.lit(0).cast("long")))


def _affine_hashes(grams: Column, num_hashes: int) -> list[Column]:
    """k affine xxhash streams over a gram array — the EXACT hash family
    of pipeline/dedup.minhash_signatures (xxhash token mode), so scalar
    and corpus-level MinHash signatures interoperate."""
    from clickhouse_clickhouse_spark.pipeline.dedup import (
        MINHASH_COEFFS,
        MINHASH_PRIME,
    )

    if num_hashes > len(MINHASH_COEFFS):
        raise ValueError(
            f"num_hashes={num_hashes} exceeds the {len(MINHASH_COEFFS)} "
            "defined hash streams — a silently shorter signature would "
            "mis-band downstream")
    tid = lambda g: F.pmod(F.xxhash64(g), F.lit(MINHASH_PRIME))

    # closure factory, NOT default-arg lambdas — defaults change the
    # detected HOF arity (round-6 gotcha)
    def one(a: int, b: int) -> Column:
        return F.transform(
            grams, lambda g: (F.lit(a) * tid(g) + F.lit(b))
            % F.lit(MINHASH_PRIME))

    return [one(a, b) for a, b in MINHASH_COEFFS[:num_hashes]]


def word_shingle_minhash(text: Column, shingle: int = 2,
                         num_hashes: int = 16) -> Column:
    """Scalar ``wordShingleMinHash`` analog ([U]
    src/Functions/FunctionsStringHash.cpp): per-string MinHash signature
    over DISTINCT word shingles as ``array<bigint>`` — element k is the
    min of affine hash k, the same (coeffs, prime, xxhash) family as
    ``pipeline/dedup.minhash_signatures(token_hash='xxhash')``, so the
    scalar signature EQUALS the corpus pipeline's (mh0..mhk) row
    (pytest-verified). Upstream returns Tuple(UInt64, UInt64) of
    combined hashes — same contract (signature for near-dup detection),
    different representation, documented deviation. Empty/short input
    yields an empty array (the pipeline drops such docs pre-agg)."""
    grams = F.array_distinct(
        word_ngrams(text, shingle) if shingle > 1 else tokens(text))
    sig = F.array(*[F.array_min(h)
                    for h in _affine_hashes(grams, num_hashes)])
    return (F.when(F.size(grams) > 0, sig)
            .otherwise(F.array().cast("array<bigint>")))


def ngram_minhash(text: Column, n: int = 3,
                  num_hashes: int = 16) -> Column:
    """Scalar ``ngramMinHash`` analog: character-n-gram twin of
    :func:`word_shingle_minhash` (distinct lowercased char n-grams,
    same hash family)."""
    grams = F.array_distinct(char_ngrams(F.lower(text), n))
    sig = F.array(*[F.array_min(h)
                    for h in _affine_hashes(grams, num_hashes)])
    return (F.when(F.size(grams) > 0, sig)
            .otherwise(F.array().cast("array<bigint>")))


# hasToken tokenizer class: maximal runs of [0-9A-Za-z_] (upstream
# tokenbf/hasToken split on non-alphanumeric). RE2-compatible groups
# (not lookarounds) so the DuckDB oracle can run the SAME pattern.
_TOKEN_BOUNDARY = "[^0-9A-Za-z_]"


def has_token(haystack: Column, token: str,
              case_insensitive: bool = False) -> Column:
    """``hasToken[CaseInsensitive]`` ([U]
    src/Functions/HasTokenImpl.h): true when ``token`` appears as a
    WHOLE token (maximal alphanumeric run) of the haystack. The needle
    must itself be one token — anything containing a separator refuses
    loudly, matching the upstream error contract."""
    if not isinstance(token, str):
        raise ValueError("has_token: the needle must be a constant "
                         "string (upstream requires a constant)")
    import re as _re

    if not _re.fullmatch(r"[0-9A-Za-z_]+", token):
        raise ValueError(
            f"has_token: needle {token!r} must be a single token "
            "(alphanumeric/underscore only), as in the reference")
    pat = (f"(^|{_TOKEN_BOUNDARY}){token}({_TOKEN_BOUNDARY}|$)")
    if case_insensitive:
        pat = "(?i)" + pat
    return haystack.rlike(pat)


def multi_match_any(haystack: Column, patterns) -> Column:
    """``multiMatchAny`` ([U] src/Functions/MultiMatchAnyImpl.h): true
    when ANY of the regex patterns matches. Patterns may be a python
    list (unrolled to ORed RLIKEs — stays in codegen) or an array
    Column (EXISTS + per-row regex compile)."""
    if isinstance(patterns, (list, tuple)):
        out = F.lit(False)
        for p in patterns:
            out = out | haystack.rlike(p)
        return out
    return F.exists(patterns, lambda p: F.regexp_like(haystack, p))


def multi_match_any_index(haystack: Column, patterns) -> Column:
    """``multiMatchAnyIndex``: 1-based index of the first matching
    pattern, 0 when none match."""
    arr = (F.array(*[F.lit(p) for p in patterns])
           if isinstance(patterns, (list, tuple)) else patterns)
    flags = F.transform(arr, lambda p: F.regexp_like(haystack, p))
    return F.coalesce(F.array_position(flags, F.lit(True)),
                      F.lit(0)).cast("bigint")


def multi_fuzzy_match_any(haystack: Column, distance: int,
                          patterns) -> Column:
    """``multiFuzzyMatchAny`` ([U] MultiMatchAnyImpl with hyperscan
    edit-distance): true when any pattern occurs as a SUBSTRING of the
    haystack within Levenshtein distance ``distance``. Supported for
    LITERAL patterns (no regex metacharacters) — the common
    needle-with-typos migration shape; regex patterns refuse loudly
    (hyperscan approximate-regex is out of scope). Cost: |text| ×
    (2d+1) levenshteins per pattern — a scalar-predicate tool, not a
    corpus-dedup one (pipeline/dedup owns that at scale)."""
    import re as _re

    if not isinstance(patterns, (list, tuple)):
        raise ValueError("multi_fuzzy_match_any takes a python list of "
                         "literal patterns")
    d = int(distance)
    out = F.lit(False)
    for p in patterns:
        if _re.search(r"[.^$*+?()\[\]{}|\\]", p):
            raise ValueError(
                f"multi_fuzzy_match_any: pattern {p!r} contains regex "
                "metacharacters — only literal needles are supported "
                "(approximate-regex matching is out of scope)")
        lp = len(p)

        # closure factory (default-arg lambdas change HOF arity)
        def window_hit(w: int, pat: str) -> Column:
            return F.exists(
                F.sequence(F.lit(1), F.greatest(F.length(haystack),
                                                F.lit(1))),
                lambda i: F.levenshtein(
                    F.substring(haystack, i, w), F.lit(pat)) <= d)

        # a window of each length in [lp-d, lp+d] at each start; any
        # window within distance d is a fuzzy hit
        hit = F.lit(False)
        for w in range(max(lp - d, 1), lp + d + 1):
            hit = hit | window_hit(w, p)
        out = out | (hit & (F.length(haystack) > 0)) | \
            ((F.length(haystack) == 0) & F.lit(lp <= d))
    return out


def ngram_distance(a: Column, b: Column, n: int = 4,
                   case_insensitive: bool = False) -> Column:
    """``ngramDistance`` ([U] src/Functions/FunctionsStringSimilarity.cpp):
    multiset symmetric difference of the two strings' character
    n-grams, normalized by the total gram count — 0.0 identical
    profiles, 1.0 disjoint. Both-empty → 0.0, one-empty → 1.0 (the
    normalized formula's own limits)."""
    if case_insensitive:
        a, b = F.lower(a), F.lower(b)
    ga, gb = char_ngrams(a, n), char_ngrams(b, n)
    symdiff = F.aggregate(
        F.array_distinct(F.concat(ga, gb)), F.lit(0),
        lambda s, g: s + F.abs(
            F.size(F.filter(ga, lambda x: x == g))
            - F.size(F.filter(gb, lambda x: x == g))))
    total = F.size(ga) + F.size(gb)
    return (F.when(total == 0, F.lit(0.0))
            .otherwise(symdiff.cast("double") / total))

"""Approximate-nearest-neighbor / similarity search over embedding columns
(SURVEY.md §7 M7; the reference's vector-distance functions power the same
use case — ``arrayDistance.cpp`` / ``cosineDistance``).

- ``brute_force_topk``: exact top-k by cosine — broadcast the (small) query
  set against the full corpus; one pass, no corpus shuffle. The
  correctness baseline.
- ``lsh_bucketed_topk``: sign-LSH bucketed ANN — queries only probe
  matching buckets (with multi-probe on neighboring buckets), cutting the
  scanned fraction ~2^bits-fold at the cost of recall. The 100 TB path:
  bucket is a partition key, so each query touches a few partitions
  instead of the whole corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from clickhouse_clickhouse_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)


def _paired_cosine(cv, qv, cn, qn):
    """Cosine for an (exploded) pair join from per-row precomputed norms.

    ``dot/(cn*qn)`` evaluates the identical double arithmetic to
    ``cosine_similarity`` (= ``dot/(sqrt(dot_aa)*sqrt(dot_bb))``), so
    scores are bit-equal — but the two norm folds run once per ROW
    before the join instead of once per candidate PAIR (optimization
    round 14, guide §2.3: HOF folds are interpreted, and the pair side
    is the explosive one — corpus×queries here)."""
    return dot_product(cv, qv) / (cn * qn)


def _sign_bucket(vec, bits: int):
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        F.lit(0).cast("long"),
        lambda acc, i: acc * 2 + F.when(F.element_at(vec, i + 1) > 0, 1).otherwise(0),
    )


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int,
                     corpus_id: str = "vec_id", corpus_vec: str = "embedding",
                     query_id: str = "query_id", query_vec: str = "embedding",
                     exclude_self: bool = True) -> DataFrame:
    """Exact cosine top-k per query vector. Queries are broadcast (the
    query set is small by assumption); ranking is a per-query window.
    Deterministic tiebreak: (rounded cosine desc, corpus id asc)."""
    q = queries.select(F.col(query_id).alias("query_id"),
                       F.col(query_vec).alias("qv")) \
               .withColumn("__qn", l2_norm(F.col("qv")))
    c = corpus.select(F.col(corpus_id).alias("corpus_id"),
                      F.col(corpus_vec).alias("cv")) \
              .withColumn("__cn", l2_norm(F.col("cv")))
    joined = c.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.filter(F.col("corpus_id") != F.col("query_id"))
    scored = joined.select(
        "query_id", "corpus_id",
        F.round(_paired_cosine(F.col("cv"), F.col("qv"),
                               F.col("__cn"), F.col("__qn")),
                6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("corpus_id").asc())
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k))


def lsh_bucketed_topk(corpus: DataFrame, queries: DataFrame, k: int,
                      bits: int = 6, multiprobe: int = 1,
                      corpus_id: str = "vec_id", corpus_vec: str = "embedding",
                      query_id: str = "query_id", query_vec: str = "embedding",
                      exclude_self: bool = True) -> DataFrame:
    """Sign-LSH ANN: bucket corpus by the sign pattern of the first ``bits``
    coordinates; each query probes its own bucket plus all buckets at
    Hamming distance ≤ ``multiprobe`` (explode of a small static bucket
    list). Approximate — recall grows with multiprobe.

    At scale the corpus side is written partitioned by ``__bkt`` so a probe
    is a partition-pruned scan, not a full-corpus join.
    """
    c = corpus.select(F.col(corpus_id).alias("corpus_id"),
                      F.col(corpus_vec).alias("cv")) \
              .withColumn("__bkt", _sign_bucket(F.col("cv"), bits)) \
              .withColumn("__cn", l2_norm(F.col("cv")))
    q = queries.select(F.col(query_id).alias("query_id"),
                       F.col(query_vec).alias("qv")) \
               .withColumn("__qbkt", _sign_bucket(F.col("qv"), bits)) \
               .withColumn("__qn", l2_norm(F.col("qv")))
    # Multi-probe: query bucket XOR each mask with popcount <= multiprobe.
    masks = [m for m in range(1 << bits) if bin(m).count("1") <= multiprobe]
    probe = q.withColumn("__bkt",
                         F.explode(F.array(*[
                             F.col("__qbkt").bitwiseXOR(F.lit(m)) for m in masks])))
    joined = c.join(F.broadcast(probe), "__bkt")
    if exclude_self:
        joined = joined.filter(F.col("corpus_id") != F.col("query_id"))
    scored = joined.select(
        "query_id", "corpus_id",
        F.round(_paired_cosine(F.col("cv"), F.col("qv"),
                               F.col("__cn"), F.col("__qn")),
                6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("corpus_id").asc())
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k))


def label_centroids(embeddings: DataFrame, label: str = "label",
                    vec: str = "embedding") -> DataFrame:
    """Per-label centroid: posexplode → (label, dim) mean → re-assemble a
    dense array ordered by dimension. The relational form (label, dim,
    mean) is what downstream joins use; the array assembly is for ANN
    seeding. Fully distributed (one explode + one agg)."""
    per_dim = (embeddings
               .select(F.col(label), F.posexplode(F.col(vec)).alias("dim", "val"))
               .groupBy(label, "dim")
               .agg(F.avg("val").alias("mean_val")))
    return (per_dim.groupBy(label)
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "mean_val"))),
                lambda s: s["mean_val"]).alias("centroid")))


def kmeans_centroids(corpus: DataFrame, k: int, iterations: int = 2,
                     vec: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Coarse k-means for IVF: seeds = the k lowest-id vectors
    (deterministic), then Lloyd iterations entirely as DataFrame ops —
    assignment is a broadcast-centroid cosine argmax, update is the
    label_centroids aggregation. Returns (centroid_id, centroid).

    Scale: each iteration is one broadcast join + one explode/agg over the
    corpus — no driver-side data motion beyond the k centroid vectors.
    """
    c = corpus.select(F.col(id_col).alias("cid"), F.col(vec).alias("centroid"))
    # k lowest ids via TakeOrderedAndProject (per-partition heaps), then a
    # tiny k-row window for the 0..k-1 numbering — not a full-corpus scan
    # through one task
    from pyspark.sql import Window

    seeds = c.orderBy("cid").limit(k)
    # Input here is <= k rows (post-TakeOrderedAndProject), so a
    # single-partition window is harmless at any corpus scale; the
    # non-foldable constant key keeps the plan identical while silencing
    # Spark's "No Partition Defined" warning so plan audits stay
    # signal-clean (a bare F.lit(0) is constant-folded out of the
    # partition spec inside larger plans, bringing the warning back).
    from clickhouse_clickhouse_spark.operators.grank import single_partition_key
    w = Window.partitionBy(single_partition_key("cid")).orderBy("cid")
    cents = (seeds.withColumn("rn", F.row_number().over(w))
             .select((F.col("rn") - 1).alias("centroid_id"), "centroid"))
    for _ in range(iterations):
        # keep_vec: the assignment is a projection, so the vector rides
        # along and the former ``assigned ⋈ corpus`` shuffle join (one
        # per Lloyd iteration) is gone (optimization round 14)
        assigned = assign_to_centroids(corpus, cents, vec=vec,
                                       id_col=id_col, keep_vec=True)
        new_cents = (label_centroids(assigned,
                                     label="centroid_id", vec=vec)
                     .withColumnRenamed("centroid", "__nc"))
        # empty-cluster carry-forward: a centroid no vector chose keeps
        # its previous position instead of vanishing (round-14 review —
        # a dropped id silently shrinks the inverted-list count)
        cents = (cents.join(new_cents, "centroid_id", "left")
                 .select("centroid_id",
                         F.coalesce(F.col("__nc"),
                                    F.col("centroid")).alias("centroid")))
        # k tiny rows; persisting each Lloyd step stops the lineage from
        # re-running every earlier iteration once per downstream branch
        # (assign + the next update both read it) — the standard Spark
        # iterative-training idiom. LRU-evictable, lazy.
        cents = cents.persist()
    return cents


def assign_to_centroids(corpus: DataFrame, centroids: DataFrame,
                        vec: str = "embedding", id_col: str = "vec_id",
                        keep_vec: bool = False) -> DataFrame:
    """Nearest-centroid assignment by cosine, as a vectorized numpy
    argmax (optimization round 14).

    The former shape crossJoined the broadcast centroids (corpus × k
    rows, each evaluating an interpreted 64-element dot-product HOF
    fold) and collapsed them with a min_by hash aggregate. The
    centroids are tiny (k rows — they were already broadcast;
    collecting them is the same driver motion), so the argmax now runs
    inside ONE Arrow-batched pandas UDF over the corpus rows: cosines
    to all centroids are (rows × k) float64 array arithmetic, the
    k-fold row explosion never exists, and the result is a projection
    — no aggregate, no exchange. ``keep_vec`` carries the vector
    through, letting callers (kmeans update, semdedup pair build, IVF
    list build) skip re-joining the assignment back to the corpus.

    Bit-equal to the min_by form (differential-verified at sf0.1):
    - dot products and norms accumulate LEFT-ASSOCIATIVELY in double
      over elements cast from their stored type — exactly the
      ``dot_product``/``l2_norm`` fold arithmetic (collected centroid
      cells are the exact doubles Spark held: float32 → double is
      value-preserving, and label_centroids means are double already);
    - ``sim = dot / (vn * cn)`` in that operand order;
    - ``np.argmax`` returns the FIRST maximal index == min_by's
      (-sim, centroid_id) lexicographic tiebreak (centroids laid out
      sorted by centroid_id);
    - degenerate cases follow Spark's ANSI-off arithmetic + struct
      ordering exactly (pinned in tests/test_ann_kernels.py): a ZERO
      denominator makes Spark's division NULL, and NULL sorts FIRST
      under (-sim, ci) — i.e. a zero-norm centroid CAPTURES every row
      (masked to +inf here, ties to the lowest id); a NaN sim (NaN
      input values) sorts LAST as -sim — never chosen (masked to
      -inf); an all-degenerate row falls back to the lowest centroid
      id either way.
    """
    from pyspark.sql.functions import pandas_udf

    crows = centroids.select("centroid_id", "centroid").collect()
    crows.sort(key=lambda r: r["centroid_id"])
    if not crows:
        # old lazy form: crossJoin with an empty broadcast produced an
        # EMPTY assignment — reproduce without crashing the kernel
        cols = [F.col(id_col)] + ([F.col(vec)] if keep_vec else [])
        return (corpus.select(*cols,
                              F.lit(None).cast("int").alias("centroid_id"))
                .filter(F.lit(False)))
    cids = np.asarray([int(r["centroid_id"]) for r in crows],
                      dtype=np.int64)
    # a NULL centroid (or one with NULL elements) made every sim NULL
    # in the old form, and NULL sorts FIRST under (-sim, ci) — i.e. it
    # CAPTURES rows like a zero-norm centroid does; an all-zeros row
    # reproduces exactly that (denominator 0 → +inf mask below)
    dim0 = next((len(r["centroid"]) for r in crows
                 if r["centroid"] is not None
                 and all(x is not None for x in r["centroid"])), 1)
    C = np.asarray([list(r["centroid"])
                    if r["centroid"] is not None
                    and all(x is not None for x in r["centroid"])
                    else [0.0] * dim0 for r in crows], dtype=np.float64)
    cn = np.zeros(C.shape[0], dtype=np.float64)
    for i in range(C.shape[1]):
        cn += C[:, i] * C[:, i]          # left-assoc self-dot
    cn = np.sqrt(cn)

    all_null_cents = not any(
        r["centroid"] is not None
        and all(x is not None for x in r["centroid"]) for r in crows)

    @pandas_udf("long")
    def _nearest_centroid(v: pd.Series) -> pd.Series:
        out = np.full(len(v), cids[0], dtype=np.int64)
        valid = v.notna().to_numpy()
        if all_null_cents:
            # every sim NULL in the old form → lowest centroid id
            return pd.Series(out)
        if valid.any():
            A = np.stack(v[valid].to_list()).astype(np.float64)
            vn = np.zeros(A.shape[0], dtype=np.float64)
            dot = np.zeros((A.shape[0], C.shape[0]), dtype=np.float64)
            for i in range(A.shape[1]):
                vn += A[:, i] * A[:, i]              # left-assoc
                dot += A[:, i:i + 1] * C[None, :, i]  # left-assoc
            denom = np.sqrt(vn)[:, None] * cn[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = dot / denom
            if np.isnan(sims).any():
                sims[np.isnan(sims)] = -np.inf   # NaN input: never wins
            sims[denom == 0.0] = np.inf          # Spark /0 → NULL: wins
            out[valid] = cids[np.argmax(sims, axis=1)]
        return pd.Series(out)

    cols = [F.col(id_col)] + ([F.col(vec)] if keep_vec else [])
    assigned = corpus.select(
        *cols, _nearest_centroid(F.col(vec)).alias("centroid_id"))
    # centroid_id stays the integer type row_number produced (the old
    # min_by returned it unchanged); kmeans ids are ints
    return assigned.withColumn("centroid_id",
                               F.col("centroid_id").cast("int"))


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int,
             n_centroids: int = 8, n_probe: int = 2,
             corpus_id: str = "vec_id", corpus_vec: str = "embedding",
             query_id: str = "query_id", query_vec: str = "embedding",
             exclude_self: bool = True) -> DataFrame:
    """IVF ANN: coarse-quantize the corpus into n_centroids inverted lists
    (k-means), score each query only against its n_probe nearest lists.
    At scale the corpus is WRITTEN partitioned by centroid_id, so a probe
    is a partition-pruned scan of n_probe/n_centroids of the data.
    Approximate; recall grows with n_probe."""
    from pyspark.sql import Window

    cents = kmeans_centroids(corpus, n_centroids, iterations=2,
                             vec=corpus_vec, id_col=corpus_id)
    # keep_vec carries the corpus vector through the assignment
    # projection — the former corpus ⋈ lists shuffle join is gone
    # (optimization round 14)
    c = (assign_to_centroids(corpus, cents, vec=corpus_vec,
                             id_col=corpus_id, keep_vec=True)
         .select(F.col(corpus_id).alias("corpus_id"),
                 F.col(corpus_vec).alias("cv"), "centroid_id")
         .withColumn("__cn", l2_norm(F.col("cv"))))
    # queries probe their n_probe closest centroids
    q = queries.select(F.col(query_id).alias("query_id"),
                       F.col(query_vec).alias("qv")) \
               .withColumn("__qn", l2_norm(F.col("qv")))
    qs = (q.crossJoin(F.broadcast(cents))
          .select("query_id", "qv", "__qn", "centroid_id",
                  cosine_similarity(F.col("qv"), F.col("centroid")).alias("csim")))
    wq = Window.partitionBy("query_id").orderBy(F.col("csim").desc(),
                                                F.col("centroid_id"))
    probes = (qs.withColumn("rn", F.row_number().over(wq))
              .filter(F.col("rn") <= n_probe)
              .select("query_id", "qv", "__qn", "centroid_id"))
    joined = c.join(F.broadcast(probes), "centroid_id")
    if exclude_self:
        joined = joined.filter(F.col("corpus_id") != F.col("query_id"))
    scored = joined.select(
        "query_id", "corpus_id",
        F.round(_paired_cosine(F.col("cv"), F.col("qv"),
                               F.col("__cn"), F.col("__qn")),
                6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("corpus_id").asc())
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k))


# -- Product quantization (PQ) -------------------------------------------

def _subvectors(df: DataFrame, m: int, dim: int, vec: str,
                id_col: str) -> DataFrame:
    """(id, sub, subvec): each vector sliced into m contiguous blocks of
    dim/m — built as one posexplode of an array-of-slices (no UDF)."""
    d = dim // m
    slices = F.array(*[F.slice(F.col(vec), s * d + 1, d) for s in range(m)])
    return df.select(F.col(id_col),
                     F.posexplode(slices).alias("sub", "subvec"))


def _l2sq(a, b, d: int | None = None):
    """Squared L2 between two float arrays. With ``d`` (the statically
    known width — PQ subvectors are dim/m elements), the sum is
    UNROLLED into plain column arithmetic that whole-stage codegen
    compiles, instead of an interpreted ``aggregate`` fold: the fold
    was the dominant cost of PQ training/encoding (8 M+ evaluations per
    Lloyd iteration at codes=256 — see OPTIMIZATION_r14.md). Bit-equal
    to the fold by construction: each squared difference is computed in
    FLOAT (as ``zip_with`` did), widened to double, and added
    left-associatively from the first term (the fold's ``0.0 + t1``
    is exact, so dropping it changes nothing)."""
    if d is None:
        return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                           F.lit(0.0), lambda acc, v: acc + v)
    terms = []
    for i in range(1, d + 1):
        diff = F.element_at(a, i) - F.element_at(b, i)
        terms.append((diff * diff).cast("double"))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def l2_normalize(df: DataFrame, vec: str = "embedding") -> DataFrame:
    """Scale each vector to unit L2 norm (pure column ops). On unit
    vectors, squared L2 = 2 − 2·cosine, so PQ's L2-trained codebooks and
    ADC ranking align with the cosine ground truth — the standard
    normalize-before-PQ preparation for cosine retrieval. Cosine itself
    is norm-invariant, so downstream cosine scores are unchanged."""
    n = F.sqrt(F.aggregate(
        F.col(vec), F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double")))
    return df.withColumn(vec, F.transform(
        F.col(vec), lambda x: (x.cast("double") / n).cast("float")))


def _rerank_exact(cands: DataFrame, corpus: DataFrame, queries: DataFrame,
                  k: int, corpus_id: str, corpus_vec: str,
                  query_id: str, query_vec: str) -> DataFrame:
    """Exact-cosine re-rank of an ANN candidate set (FAISS refine /
    upstream MergeTreeIndexVectorSimilarity posting-list rescore): join
    the candidates back to their RAW corpus vectors — at scale a point
    lookup of |candidates| rows, never a corpus scan — and emit the true
    top-k per query by cosine. Output schema matches brute_force_topk
    (query_id, corpus_id, cosine, rk)."""
    cv = corpus.select(F.col(corpus_id).alias("corpus_id"),
                       F.col(corpus_vec).alias("__cv")) \
               .withColumn("__cn", l2_norm(F.col("__cv")))
    qv = queries.select(F.col(query_id).alias("query_id"),
                        F.col(query_vec).alias("__qv")) \
                .withColumn("__qn", l2_norm(F.col("__qv")))
    scored = (cands.select("query_id", "corpus_id")
              .join(cv, "corpus_id")
              .join(F.broadcast(qv), "query_id")
              .select("query_id", "corpus_id",
                      F.round(_paired_cosine(F.col("__cv"), F.col("__qv"),
                                             F.col("__cn"), F.col("__qn")),
                              6).alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("corpus_id").asc())
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k))


def pq_train(corpus: DataFrame, *, m: int = 8, codes: int = 16, dim: int,
             iterations: int = 2, vec: str = "embedding",
             id_col: str = "vec_id") -> DataFrame:
    """Train a product-quantization codebook: m independent sub-space
    k-means (squared-L2 Lloyd), all sub-spaces in ONE DataFrame pipeline
    per iteration. Returns (sub, code_id, codeword).

    Seeds are the subvectors of the ``codes`` lowest-id corpus rows
    (deterministic, TakeOrderedAndProject — no full scan through one
    task). Each iteration: broadcast the m*codes codewords, argmin
    assign (window keyed by (id, sub) — parallel), re-average per
    (sub, code, dim). No driver data motion beyond the codebook.
    """
    subs = _subvectors(corpus, m, dim, vec, id_col)
    seed_ids = corpus.select(id_col).orderBy(id_col).limit(codes)
    from pyspark.sql import Window
    w = Window.partitionBy("sub").orderBy(id_col)
    cb = (subs.join(F.broadcast(seed_ids), id_col)
          .withColumn("code_id", F.row_number().over(w) - 1)
          .select("sub", "code_id", F.col("subvec").alias("codeword")))
    for _ in range(iterations):
        # keep_subvec: the assignment is a projection, so the subvector
        # rides along and the former ``assigned ⋈ subs`` shuffle join
        # (one per Lloyd iteration) is gone (optimization round 14)
        assigned = _pq_assign(subs, cb, id_col, d=dim // m,
                              keep_subvec=True)
        new_cb = (assigned
                  .select("sub", "code_id",
                          F.posexplode("subvec").alias("dim", "v"))
                  .groupBy("sub", "code_id", "dim")
                  .agg(F.avg("v").alias("mv"))
                  .groupBy("sub", "code_id")
                  .agg(F.transform(
                      F.array_sort(F.collect_list(F.struct("dim", "mv"))),
                      lambda s: s["mv"].cast("float")).alias("__ncw")))
        # empty-cluster carry-forward (round-14 review): a codeword no
        # subvector chose KEEPS its previous value — the codebook stays
        # DENSE in code_id, which the positional ADC lookup
        # (_adc_table rows) depends on; a dropped id would misalign
        # every lookup above the gap and NULL out the top code
        cb = (cb.join(new_cb, ["sub", "code_id"], "left")
              .select("sub", "code_id",
                      F.coalesce(F.col("__ncw"),
                                 F.col("codeword")).alias("codeword")))
        # m*codes tiny rows; see kmeans_centroids — persisting per Lloyd
        # step keeps downstream branches (encode + query tables) from
        # re-running the whole training chain.
        cb = cb.persist()
    return cb


def _pq_assign(subs: DataFrame, codebook: DataFrame,
               id_col: str, d: int | None = None,
               keep_subvec: bool = False) -> DataFrame:
    """Nearest codeword per (id, sub) row, as a vectorized numpy argmin.
    ``keep_subvec`` carries the subvector through (the assignment is a
    projection now, not an aggregate), letting pq_train's update step
    skip re-joining the assignment back to the subvectors.

    The former shape exploded to (id, sub) × codes rows (broadcast
    join) and ran the unrolled L2 + a min_by hash aggregate over them —
    corpus·m·codes rows of codegen arithmetic and aggregate state
    (8.2 M rows per call at the tuned m=16/codes=256 settings on the
    2 k-row sf0.1 fixture, and training + encode run it 3-4 times per
    query). The codebook is tiny (m·codes rows — it was already
    broadcast; collecting it is the same driver motion), so the argmin
    now runs inside ONE Arrow-batched pandas UDF over the corpus·m
    subvector rows: distances to all codewords are (rows × codes)
    array arithmetic, codes-fold fewer rows ever exist, and the result
    is a projection — no aggregate, no exchange.

    Bit-equal to the min_by form (differential-verified over the full
    sf0.1 trajectory — seed assignment, trained codebook, encodings):

    - each squared difference is computed in FLOAT32 and widened to
      double, accumulated LEFT-ASSOCIATIVELY over the d elements —
      exactly the unrolled ``_l2sq`` arithmetic;
    - ``np.argmin`` returns the FIRST minimal index == min_by's
      (distance, code_id) lexicographic tiebreak (codewords are laid
      out sorted by code_id);
    - NaN distances sort HIGHEST under Spark's double ordering, so
      they are masked to +inf before the argmin; all-NaN / NULL rows
      fall back to the lowest code id, the old struct-ordering result.
    """
    from pyspark.sql.functions import pandas_udf

    rows = codebook.select("sub", "code_id", "codeword").collect()
    by_sub: dict[int, list] = {}
    for r in rows:
        by_sub.setdefault(int(r["sub"]), []).append(
            (int(r["code_id"]), r["codeword"]))
    mats: dict[int, "np.ndarray"] = {}
    ids: dict[int, "np.ndarray"] = {}
    null_codes: dict[int, "np.ndarray"] = {}
    for s, lst in by_sub.items():
        lst.sort(key=lambda t: t[0])
        # a NULL codeword (or NULL element) made that code's distance
        # NULL in the old unrolled form, and NULL sorts FIRST under
        # (distance, code_id) — i.e. it WINS; mark it and force -inf
        isnull = [cw is None or any(x is None for x in cw)
                  for _, cw in lst]
        d0 = next((len(cw) for (_, cw), n in zip(lst, isnull) if not n), 1)
        mats[s] = np.asarray(
            [[0.0] * d0 if n else list(cw)
             for (_, cw), n in zip(lst, isnull)], dtype=np.float32)
        ids[s] = np.asarray([cid for cid, _ in lst], dtype=np.int32)
        null_codes[s] = np.asarray(isnull, dtype=bool)
    # rows whose sub has no codebook entry were DROPPED by the old
    # inner broadcast join — reproduce with a pre-filter
    if by_sub:
        subs = subs.filter(F.col("sub").isin([int(s) for s in by_sub]))
    else:
        subs = subs.filter(F.lit(False))

    @pandas_udf("int")
    def _nearest(sub: pd.Series, sv: pd.Series) -> pd.Series:
        out = np.zeros(len(sub), dtype=np.int32)
        subv = sub.to_numpy()
        valid = sv.notna().to_numpy()
        for s in np.unique(subv):
            cid = ids[int(s)]
            sel = subv == s
            mask = sel & valid
            rest = sel & ~valid
            if rest.any():
                out[rest] = cid[0]
            if not mask.any():
                continue
            nc = null_codes[int(s)]
            if nc.all():
                # every codeword NULL → every distance NULL → the old
                # struct ordering picked the lowest code id
                out[mask] = cid[0]
                continue
            A = np.stack(sv[mask].to_list()).astype(np.float32,
                                                    copy=False)
            C = mats[int(s)]
            acc = np.zeros((A.shape[0], C.shape[0]), dtype=np.float64)
            for i in range(A.shape[1]):
                diff = A[:, i:i + 1] - C[None, :, i]      # float32
                acc += (diff * diff).astype(np.float64)   # left-assoc
            if np.isnan(acc).any():
                acc[np.isnan(acc)] = np.inf
            if nc.any():
                acc[:, nc] = -np.inf   # NULL codeword: old NULL-first
            out[mask] = cid[np.argmin(acc, axis=1)]
        return pd.Series(out)

    cols = [id_col, "sub"] + (["subvec"] if keep_subvec else [])
    return subs.select(*cols,
                       _nearest(F.col("sub"), F.col("subvec"))
                       .alias("code_id"))


def _adc_table(qsubs: DataFrame, cb: DataFrame, qid: str,
               d: int | None = None) -> DataFrame:
    """Per-query nested ADC lookup table: qtab[sub][code] = squared L2
    of the query subvector to that codeword. Rows are positionally
    indexed by code_id — safe because pq_train keeps the codebook
    DENSE (empty-cluster carry-forward). Shared by pq_topk and
    ivf_pq_topk (previously duplicated verbatim, round-14 review)."""
    return (qsubs.join(F.broadcast(cb), "sub")
            .select(qid, "sub", "code_id",
                    _l2sq(F.col("subvec"), F.col("codeword"), d).alias("d"))
            .groupBy(qid, "sub")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("code_id", "d"))),
                lambda s: s["d"]).alias("row"))
            .groupBy(qid)
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "row"))),
                lambda s: s["row"]).alias("qtab")))


def pq_encode(corpus: DataFrame, codebook: DataFrame, *, m: int, dim: int,
              vec: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """(id, codes): each vector reduced to m small ints — the 100 TB
    storage form (m bytes/vector at codes<=256 vs 4*dim)."""
    subs = _subvectors(corpus, m, dim, vec, id_col)
    a = _pq_assign(subs, codebook, id_col, d=dim // m)
    return (a.groupBy(id_col)
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "code_id"))),
                lambda s: s["code_id"]).alias("codes")))


def pq_topk(corpus: DataFrame, queries: DataFrame, k: int, *, m: int = 8,
            codes: int = 16, dim: int, iterations: int = 2,
            normalize: bool = False, rerank: int = 0,
            corpus_id: str = "vec_id", corpus_vec: str = "embedding",
            query_id: str = "query_id", query_vec: str = "embedding",
            exclude_self: bool = True) -> DataFrame:
    """PQ ANN top-k by asymmetric distance (ADC): exact query subvectors
    against quantized corpus codes. Per query, distances to the m*codes
    codewords form a lookup table; a corpus row's distance is m table
    lookups summed — pure JVM expression over the broadcast tables, NO
    per-query shuffle of the corpus (the only corpus-wide exchange is
    the final per-query top-k window, on hit rows only after rank
    pruning). Approximate; quality grows with m and codes.

    Production knobs (round 10): ``normalize=True`` unit-normalizes both
    sides so L2 codebooks/ADC rank by cosine; ``rerank=C`` (C > k) keeps
    the top-C ADC candidates and re-scores them by EXACT cosine against
    the raw corpus vectors (a |C|-row point lookup at scale — the FAISS
    refine / upstream vector-index rescore step). With both, the output
    is exact top-k as long as the true neighbors survive into the ADC
    top-C; RECALL.md records 1.0 at the tuned parameterization.
    """
    from pyspark.sql import Window

    raw_corpus, raw_queries = corpus, queries
    if normalize:
        corpus = l2_normalize(corpus, corpus_vec)
        queries = l2_normalize(queries, query_vec)
    cb = pq_train(corpus, m=m, codes=codes, dim=dim, iterations=iterations,
                  vec=corpus_vec, id_col=corpus_id)
    enc = pq_encode(corpus, cb, m=m, dim=dim, vec=corpus_vec,
                    id_col=corpus_id)
    qsubs = _subvectors(
        queries.select(F.col(query_id), F.col(query_vec).alias("__qv")),
        m, dim, "__qv", query_id)
    qtab = _adc_table(qsubs, cb, query_id, d=dim // m)
    hits = (enc.withColumnRenamed(corpus_id, "corpus_id")
            .crossJoin(F.broadcast(qtab)))
    if exclude_self:
        hits = hits.filter(F.col("corpus_id") != F.col(query_id))
    scored = (hits
              .select(query_id, "corpus_id",
                      F.round(F.aggregate(
                          F.sequence(F.lit(0), F.lit(m - 1)), F.lit(0.0),
                          lambda acc, s: acc + F.element_at(
                              F.element_at(F.col("qtab"), s + 1),
                              F.element_at(F.col("codes"), s + 1) + 1))
                       , 6).alias("adc_dist")))
    w = Window.partitionBy(query_id).orderBy("adc_dist", "corpus_id")
    if rerank:
        if rerank < k:
            raise ValueError(f"pq_topk: rerank={rerank} must be >= k={k}")
        cands = (scored.withColumn("rank", F.row_number().over(w))
                 .filter(F.col("rank") <= rerank)
                 .withColumnRenamed(query_id, "query_id"))
        return _rerank_exact(cands, raw_corpus, raw_queries, k,
                             corpus_id, corpus_vec, query_id, query_vec)
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def ivf_pq_topk(corpus: DataFrame, queries: DataFrame, k: int, *,
                n_centroids: int = 8, n_probe: int = 2, m: int = 8,
                codes: int = 16, dim: int, iterations: int = 2,
                normalize: bool = False, rerank: int = 0,
                corpus_id: str = "vec_id", corpus_vec: str = "embedding",
                query_id: str = "query_id", query_vec: str = "embedding",
                exclude_self: bool = True) -> DataFrame:
    """IVF-PQ — the standard billion-scale ANN composition: the IVF
    coarse quantizer prunes the corpus to n_probe/n_centroids of its
    inverted lists, then PQ ADC scores only those candidates (no
    residual encoding — codes are trained on the raw vectors, the
    simpler FAISS ``IVFx,PQy`` non-residual variant, documented).

    At scale the corpus is stored partitioned by centroid_id with the
    m-byte PQ codes as columns: a query touches n_probe partitions and
    never reads the raw vectors.

    ``normalize``/``rerank`` as in pq_topk: unit-normalize for cosine
    alignment; re-score the top-C ADC candidates by exact cosine (with
    rerank the raw vectors of ONLY the C candidates are fetched —
    n_probe partition pruning still bounds the scan).
    """
    from pyspark.sql import Window

    raw_corpus, raw_queries = corpus, queries
    if normalize:
        corpus = l2_normalize(corpus, corpus_vec)
        queries = l2_normalize(queries, query_vec)
    cents = kmeans_centroids(corpus, n_centroids, iterations=iterations,
                             vec=corpus_vec, id_col=corpus_id)
    lists = assign_to_centroids(corpus, cents, vec=corpus_vec,
                                id_col=corpus_id)
    cb = pq_train(corpus, m=m, codes=codes, dim=dim, iterations=iterations,
                  vec=corpus_vec, id_col=corpus_id)
    enc = (pq_encode(corpus, cb, m=m, dim=dim, vec=corpus_vec,
                     id_col=corpus_id)
           .join(lists, corpus_id)
           .withColumnRenamed(corpus_id, "corpus_id"))

    q = queries.select(F.col(query_id), F.col(query_vec).alias("__qv"))
    qs = (q.crossJoin(F.broadcast(cents))
          .select(query_id, "__qv", "centroid_id",
                  cosine_similarity(F.col("__qv"),
                                    F.col("centroid")).alias("csim")))
    wq = Window.partitionBy(query_id).orderBy(F.col("csim").desc(),
                                              F.col("centroid_id"))
    probes = (qs.withColumn("rn", F.row_number().over(wq))
              .filter(F.col("rn") <= n_probe)
              .select(query_id, "__qv", "centroid_id"))

    qsubs = _subvectors(probes.select(query_id, "__qv").distinct(),
                        m, dim, "__qv", query_id)
    qtab = _adc_table(qsubs, cb, query_id, d=dim // m)

    cand = (enc.join(F.broadcast(probes.select(query_id, "centroid_id")),
                     "centroid_id")
            .join(F.broadcast(qtab), query_id))
    if exclude_self:
        cand = cand.filter(F.col("corpus_id") != F.col(query_id))
    scored = cand.select(
        query_id, "corpus_id",
        F.round(F.aggregate(
            F.sequence(F.lit(0), F.lit(m - 1)), F.lit(0.0),
            lambda acc, s: acc + F.element_at(
                F.element_at(F.col("qtab"), s + 1),
                F.element_at(F.col("codes"), s + 1) + 1)), 6)
        .alias("adc_dist"))
    w = Window.partitionBy(query_id).orderBy("adc_dist", "corpus_id")
    if rerank:
        if rerank < k:
            raise ValueError(
                f"ivf_pq_topk: rerank={rerank} must be >= k={k}")
        cands = (scored.withColumn("rank", F.row_number().over(w))
                 .filter(F.col("rank") <= rerank)
                 .withColumnRenamed(query_id, "query_id"))
        return _rerank_exact(cands, raw_corpus, raw_queries, k,
                             corpus_id, corpus_vec, query_id, query_vec)
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def production_knobs(n: int) -> dict:
    """Corpus-scaled ANN parameterization (the production contract,
    RECALL.md): recall at FIXED knobs degrades as the corpus grows
    (measured round 11: PQ rerank=20 gives 1.000 recall@5 at 60k rows
    but 0.800 at 10x), so the rescore set and inverted-list count must
    grow with n:
      rerank ~ n / 1500   (exact-cosine rescore; cost per QUERY)
      lists  ~ sqrt(n)/16 (classic IVF sqrt rule), probe ~ 3/8 lists.
    Shared by tools/scale_ann.py (the soak harness) and
    ann_scaled_recall_gate (the per-round sweep gate) so the contract
    the gate checks is the contract the soak validated."""
    return {
        "rerank_pq": max(40, n // 1500),
        "rerank_ivfpq": max(80, n // 750),
        "lists": max(8, round(n ** 0.5 / 16)),
        "probe": max(6, round(n ** 0.5 / 16 * 3 / 8)),
    }

"""Round-14 kernel pins: the vectorized numpy argmin/argmax assignment
kernels in pipeline/similarity must be BIT-EQUAL to the former
explode + min_by aggregate forms (the forms they replaced), including
on adversarial inputs the fixtures never produce — exact distance
ties (the code-id / centroid-id tiebreak) and degenerate zero-norm
vectors (NaN cosine ordering)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_clickhouse_spark.functions.vectors import l2_norm
from clickhouse_clickhouse_spark.pipeline.similarity import (
    _l2sq,
    _paired_cosine,
    _pq_assign,
    _subvectors,
    assign_to_centroids,
)


@pytest.fixture(scope="module")
def spark():
    from clickhouse_clickhouse_spark.session import get_spark

    return get_spark("test_ann_kernels", cores=4)


def _pq_assign_reference(subs, codebook, id_col, d):
    """The pre-kernel form: broadcast-join explode + min_by over
    (distance, code_id)."""
    scored = (subs.join(F.broadcast(codebook), "sub")
              .select(id_col, "sub", "code_id",
                      _l2sq(F.col("subvec"), F.col("codeword"),
                            d).alias("d")))
    return (scored.groupBy(id_col, "sub")
            .agg(F.min_by("code_id",
                          F.struct(F.col("d").alias("dd"),
                                   F.col("code_id").alias("cc")))
                 .alias("code_id")))


def _assign_reference(corpus, centroids, vec, id_col):
    """The pre-kernel form: crossJoin + min_by over (-sim, centroid_id)."""
    scored = (corpus.select(F.col(id_col), F.col(vec).alias("__v"))
              .withColumn("__vn", l2_norm(F.col("__v")))
              .crossJoin(F.broadcast(
                  centroids.withColumn("__cn",
                                       l2_norm(F.col("centroid")))))
              .select(id_col, "centroid_id",
                      _paired_cosine(F.col("__v"), F.col("centroid"),
                                     F.col("__vn"),
                                     F.col("__cn")).alias("sim")))
    return (scored.groupBy(id_col)
            .agg(F.min_by("centroid_id",
                          F.struct((-F.col("sim")).alias("ns"),
                                   F.col("centroid_id").alias("ci")))
                 .alias("centroid_id")))


def _vec(seed: int, dim: int) -> list[float]:
    # deterministic pseudo-random floats without Python's random module
    return [float(((seed * 1103515245 + i * 12345 + 6789) % 2000) - 1000)
            / 997.0 for i in range(dim)]


def test_pq_assign_matches_min_by_form(spark):
    dim, m = 8, 4
    corpus = spark.createDataFrame(
        [(i, _vec(i, dim)) for i in range(64)],
        "vec_id long, embedding array<float>")
    subs = _subvectors(corpus, m, dim, "embedding", "vec_id")
    # codebook with a planted EXACT tie: code 3 duplicates code 1 in
    # every subspace, so every row nearest code 1 ties with code 3 and
    # the (distance, code_id) tiebreak must pick 1
    cw = {c: _vec(100 + c, dim // m) for c in range(4)}
    cw[3] = cw[1]
    cb = spark.createDataFrame(
        [(s, c, cw[c]) for s in range(m) for c in range(4)],
        "sub int, code_id int, codeword array<float>")
    got = sorted(tuple(r) for r in
                 _pq_assign(subs, cb, "vec_id", d=dim // m).collect())
    ref = sorted(tuple(r) for r in
                 _pq_assign_reference(subs, cb, "vec_id",
                                      dim // m).collect())
    assert got == ref
    assert not any(c == 3 for _, _, c in got)  # the tie landed on 1


def test_pq_assign_keep_subvec_schema(spark):
    dim, m = 8, 2
    corpus = spark.createDataFrame(
        [(i, _vec(i, dim)) for i in range(8)],
        "vec_id long, embedding array<float>")
    subs = _subvectors(corpus, m, dim, "embedding", "vec_id")
    cb = spark.createDataFrame(
        [(s, c, _vec(50 + 10 * s + c, dim // m))
         for s in range(m) for c in range(3)],
        "sub int, code_id int, codeword array<float>")
    kept = _pq_assign(subs, cb, "vec_id", d=dim // m, keep_subvec=True)
    assert kept.columns == ["vec_id", "sub", "subvec", "code_id"]
    plain = _pq_assign(subs, cb, "vec_id", d=dim // m)
    assert (sorted(map(tuple, kept.select("vec_id", "sub",
                                          "code_id").collect()))
            == sorted(map(tuple, plain.collect())))


def test_assign_to_centroids_matches_min_by_form(spark):
    dim = 8
    rows = [(i, _vec(i, dim)) for i in range(48)]
    rows.append((900, [0.0] * dim))            # zero-norm row: NULL sims
    rows.append((901, _vec(7, dim)))           # exact copy of id 7
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>")
    # centroid 2 duplicates centroid 0 -> every row nearest 0 ties with
    # 2 and the (-sim, centroid_id) tiebreak must keep 0
    cvs = {0: _vec(500, dim), 1: _vec(501, dim)}
    cvs[2] = cvs[0]
    cents = spark.createDataFrame(
        [(c, v) for c, v in cvs.items()],
        "centroid_id int, centroid array<float>")
    got = sorted(tuple(r) for r in
                 assign_to_centroids(corpus, cents).collect())
    ref = sorted(tuple(r) for r in
                 _assign_reference(corpus, cents, "embedding",
                                   "vec_id").collect())
    assert got == ref
    by_id = dict(got)
    assert by_id[901] == by_id[7]
    assert not any(c == 2 for _, c in got)       # ties land on 0
    assert by_id[900] == 0   # zero-norm row: all sims NULL -> lowest id


def test_assign_to_centroids_zero_norm_centroid(spark):
    """ANSI-off Spark makes dot/(vn*cn) NULL when a centroid has zero
    norm, and NULL sorts FIRST under the (-sim, centroid_id) struct —
    the zero centroid captures every row. The kernel must reproduce
    that exactly (it bit the first kernel draft, which treated the
    degenerate sims as never-chosen NaN)."""
    dim = 8
    corpus = spark.createDataFrame(
        [(i, _vec(i, dim)) for i in range(16)],
        "vec_id long, embedding array<float>")
    cents = spark.createDataFrame(
        [(0, _vec(500, dim)), (1, [0.0] * dim), (2, [0.0] * dim)],
        "centroid_id int, centroid array<float>")
    got = sorted(tuple(r) for r in
                 assign_to_centroids(corpus, cents).collect())
    ref = sorted(tuple(r) for r in
                 _assign_reference(corpus, cents, "embedding",
                                   "vec_id").collect())
    assert got == ref
    assert all(c == 1 for _, c in got)  # lowest zero-norm centroid wins


def test_assign_degenerate_inputs_match_min_by_form(spark):
    """Round-14 review fixes: empty centroid relations must yield an
    EMPTY assignment (the old crossJoin form's behavior), and a NULL
    centroid must CAPTURE rows (NULL sims sort first under (-sim, ci)),
    both without crashing the kernel."""
    dim = 4
    corpus = spark.createDataFrame(
        [(i, _vec(i, dim)) for i in range(6)],
        "vec_id long, embedding array<float>")
    empty = spark.createDataFrame(
        [], "centroid_id int, centroid array<float>")
    out = assign_to_centroids(corpus, empty)
    assert out.count() == 0
    assert out.columns == ["vec_id", "centroid_id"]

    cents = spark.createDataFrame(
        [(0, _vec(300, dim)), (1, None), (2, None)],
        "centroid_id int, centroid array<float>")
    got = sorted(tuple(r) for r in
                 assign_to_centroids(corpus, cents).collect())
    ref = sorted(tuple(r) for r in
                 _assign_reference(corpus, cents, "embedding",
                                   "vec_id").collect())
    assert got == ref
    assert all(c == 1 for _, c in got)  # lowest NULL centroid captures


def test_pq_assign_degenerate_inputs_match_min_by_form(spark):
    """Round-14 review fixes: a NULL codeword's distance was NULL in
    the old min_by form and NULL sorts FIRST (it WINS); rows whose sub
    has no codebook entry were dropped by the old inner join."""
    dim, m = 4, 2
    corpus = spark.createDataFrame(
        [(i, _vec(i, dim)) for i in range(8)],
        "vec_id long, embedding array<float>")
    subs = _subvectors(corpus, m, dim, "embedding", "vec_id")
    # sub 0: codes 0 (real), 1 (NULL -> wins); sub 1 missing entirely
    cb = spark.createDataFrame(
        [(0, 0, _vec(40, dim // m)), (0, 1, None)],
        "sub int, code_id int, codeword array<float>")
    got = sorted(tuple(r) for r in
                 _pq_assign(subs, cb, "vec_id", d=dim // m).collect())
    ref = sorted(tuple(r) for r in
                 _pq_assign_reference(subs, cb, "vec_id",
                                      dim // m).collect())
    assert got == ref
    assert got and all(s == 0 and c == 1 for _, s, c in got)


def test_assign_to_centroids_keep_vec_schema(spark):
    dim = 4
    corpus = spark.createDataFrame(
        [(i, _vec(i, dim)) for i in range(6)],
        "vec_id long, embedding array<float>")
    cents = spark.createDataFrame(
        [(c, _vec(300 + c, dim)) for c in range(2)],
        "centroid_id int, centroid array<float>")
    kept = assign_to_centroids(corpus, cents, keep_vec=True)
    assert kept.columns == ["vec_id", "embedding", "centroid_id"]
    plain = assign_to_centroids(corpus, cents)
    assert (sorted(map(tuple, kept.select("vec_id",
                                          "centroid_id").collect()))
            == sorted(map(tuple, plain.collect())))

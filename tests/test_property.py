"""Property-based tests (hypothesis) — the analog of the reference's
query fuzzing (SURVEY.md §5): random inputs, independent ground truth.

Example counts are kept small: each example pays a Spark job.
"""

import datetime

import pandas as pd
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from clickhouse_clickhouse_spark.operators.joins import asof_join
from clickhouse_clickhouse_spark.operators.aggregates import limit_by

_ts = st.integers(min_value=0, max_value=10_000).map(
    lambda s: datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s))

_events = st.lists(
    st.tuples(st.integers(1, 3), _ts), min_size=1, max_size=25)


@settings(max_examples=12, deadline=None)
@given(left=_events, right=_events)
def test_asof_matches_pandas_merge_asof(spark, left, right):
    """Backward non-strict ASOF must agree with pandas merge_asof for any
    key/timestamp distribution (ties, missing keys, duplicates)."""
    ldf = spark.createDataFrame([(k, t, i) for i, (k, t) in enumerate(left)],
                                "k long, ts timestamp, lid long")
    rdf = spark.createDataFrame([(k, t, float(i)) for i, (k, t) in enumerate(right)],
                                "k long, rts timestamp, v double")
    got = asof_join(ldf, rdf, ["k"], "ts", "rts", "backward", how="left")
    got_map = {r.lid: r.asof_rts for r in got.collect()}

    lp = pd.DataFrame([(k, t, i) for i, (k, t) in enumerate(left)],
                      columns=["k", "ts", "lid"]).sort_values(["ts", "lid"])
    rp = pd.DataFrame([(k, t, float(i)) for i, (k, t) in enumerate(right)],
                      columns=["k", "rts", "v"]).sort_values(["rts", "v"])
    exp = pd.merge_asof(lp, rp, left_on="ts", right_on="rts", by="k",
                        direction="backward")
    exp_map = {int(r.lid): (None if pd.isna(r.rts) else r.rts.to_pydatetime())
               for r in exp.itertuples()}
    assert got_map == exp_map


@settings(max_examples=10, deadline=None)
@given(rows=st.lists(st.tuples(st.integers(1, 4), st.integers(0, 50)),
                     min_size=1, max_size=40),
       n=st.integers(1, 3))
def test_limit_by_matches_python(spark, rows, n):
    """LIMIT n BY k over (k, v, uid) must equal the sorted-slice-per-key
    computed in plain Python."""
    data = [(k, v, i) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "k long, v long, uid long")
    got = sorted((r.k, r.v, r.uid) for r in
                 limit_by(df, n, ["k"], ["v", "uid"]).collect())
    by_key = {}
    for k, v, uid in data:
        by_key.setdefault(k, []).append((v, uid))
    exp = sorted((k, v, uid) for k, items in by_key.items()
                 for v, uid in sorted(items)[:n])
    assert got == exp


@settings(max_examples=8, deadline=None)
@given(vals=st.lists(st.floats(min_value=-1e6, max_value=1e6,
                               allow_nan=False), min_size=1, max_size=60))
def test_percentile_bounds(spark, vals):
    """Exact percentile stays within [min, max] and median of a singleton
    equals it — sanity property for the quantile surface."""
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    row = df.agg(F.percentile("v", F.lit(0.5)).alias("med"),
                 F.min("v").alias("lo"), F.max("v").alias("hi")).collect()[0]
    assert row.lo <= row.med <= row.hi


_vals = st.lists(st.tuples(st.integers(-50, 50), st.integers(0, 10_000)),
                 min_size=1, max_size=60)


@settings(max_examples=10, deadline=None)
@given(rows=_vals)
def test_global_row_number_matches_single_window(spark, rows):
    """The bucketed distributed rank must equal row_number over a plain
    global window for any value distribution (duplicates, negatives,
    skew), with few buckets forcing multi-bucket offsets."""
    from pyspark.sql import Window

    from clickhouse_clickhouse_spark.operators.grank import global_row_number

    df = spark.createDataFrame([(v, i) for v, (v, i) in
                                zip([r[0] for r in rows], rows)],
                               "v long, tb long")
    got = {(r.v, r.tb): r.rn for r in
           global_row_number(df, "v", ["tb"], out="rn", buckets=4).collect()}
    w = Window.orderBy(F.col("v").asc(), F.col("tb").asc())
    want = {(r.v, r.tb): r.rn for r in
            df.withColumn("rn", F.row_number().over(w)).collect()}
    assert got == want


@settings(max_examples=8, deadline=None)
@given(rows=_vals)
def test_global_range_count_matches_single_window(spark, rows):
    from pyspark.sql import Window

    from clickhouse_clickhouse_spark.operators.grank import global_range_count

    df = spark.createDataFrame([(float(v), i) for i, (v, _t) in
                                enumerate(rows)], "v double, id long")
    got = {r.id: r.n for r in
           global_range_count(df, "v", 10, out="n", buckets=4).collect()}
    w = Window.orderBy("v").rangeBetween(-10, 0)
    want = {r.id: r.n for r in
            df.withColumn("n", F.count("*").over(w)).collect()}
    assert got == want


_strs = st.lists(st.tuples(st.text(alphabet=st.characters(
    codec="utf-8", min_codepoint=32, max_codepoint=0x2FFF),
    max_size=12), st.integers(0, 1000)), min_size=1, max_size=40)


@settings(max_examples=8, deadline=None)
@given(rows=_strs)
def test_global_row_number_string_keys(spark, rows):
    """String-keyed bucketed rank (7-byte UTF-8 prefix buckets) must
    equal the single-window row_number for arbitrary unicode strings —
    UTF-8 byte order == code-point order makes the prefix key monotone."""
    from pyspark.sql import Window

    from clickhouse_clickhouse_spark.operators.grank import global_row_number

    df = spark.createDataFrame(rows, "s string, tb long")
    got = {(r.s, r.tb): r.rn for r in
           global_row_number(df, "s", ["tb"], out="rn", buckets=4).collect()}
    w = Window.orderBy(F.col("s").asc(), F.col("tb").asc())
    want = {(r.s, r.tb): r.rn for r in
            df.withColumn("rn", F.row_number().over(w)).collect()}
    assert got == want


_words = st.sampled_from(["a", "b", "c", "d", "e"])
_doc = st.lists(_words, min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=10)


@settings(max_examples=10, deadline=None)
@given(train=_corpus, bench=_corpus, n=st.integers(2, 4))
def test_ngram_contamination_matches_bruteforce(spark, train, bench, n):
    """Contamination report must equal the brute-force Python n-gram
    intersection for any corpus shape (short docs, empty docs, shared
    ids between train and bench, duplicate grams)."""
    from clickhouse_clickhouse_spark.pipeline.decontam import ngram_contamination

    tdf = spark.createDataFrame(list(enumerate(train)),
                                "doc_id long, text string")
    # bench ids overlap train ids (0..) on purpose: same-id self matches
    # must not count
    bdf = spark.createDataFrame(list(enumerate(bench)),
                                "doc_id long, text string")

    def grams(s):
        t = s.split(" ") if s else []
        return {" ".join(t[i:i + n]) for i in range(len(t) - n + 1)}

    exp = {}
    bg = [(i, grams(s)) for i, s in enumerate(bench)]
    for i, s in enumerate(train):
        g = grams(s)
        hit_grams, hit_docs = set(), set()
        for j, gb in bg:
            if j == i:
                continue
            inter = g & gb
            if inter:
                hit_grams |= inter
                hit_docs.add(j)
        if hit_grams:
            exp[i] = (len(hit_grams), len(hit_docs))

    got = {r.doc_id: (r.n_gram_hits, r.n_bench_docs)
           for r in ngram_contamination(tdf, bdf, n=n).collect()}
    assert got == exp


_text_cell = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FF),
        max_size=24))

_fmt_rows = st.lists(
    st.tuples(st.integers(-2**31, 2**31 - 1), _text_cell, _text_cell),
    min_size=1, max_size=12)


@settings(max_examples=10, deadline=None)
@given(rows=_fmt_rows)
def test_format_roundtrips_arbitrary_strings(spark, rows):
    """TSV, CSV, and JSONEachRow serialize→parse must be the identity for
    arbitrary unicode cells (tabs, newlines, quotes, backslashes, NULLs)
    — the property the reference's format fuzz tests pin."""
    from clickhouse_clickhouse_spark.sources.render import (
        parse_lines,
        serialize_lines,
    )

    from conftest import run_parallel

    df = spark.createDataFrame(rows, "k int, a string, b string")
    expect = sorted(map(tuple, df.collect()), key=repr)

    def one(fmt):
        back = parse_lines(serialize_lines(df, fmt), fmt, df.schema)
        got = sorted(map(tuple, back.collect()), key=repr)
        assert got == expect, (fmt, got, expect)

    # the four formats are independent checks — overlap their actions
    run_parallel(["TSV", "CSV", "JSONEachRow", "Values"], one, workers=4)

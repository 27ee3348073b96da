"""Property tests — the analog of the reference's query fuzzing
(SURVEY.md §5): randomized inputs, independent ground truth (pandas /
plain Python / single-window Spark).

Round 11: converted from serial hypothesis @given loops to SEEDED case
pools executed through ``conftest.run_parallel`` (the same pattern as
the fuzz differentials and test_event_bruteforce). Each test now
PLANTS the adversarial shapes hypothesis used to find by chance
(duplicates, all-equal skew, negatives, unicode, empties, ties) as
explicit leading cases, then adds seeded random draws from the same
distributions — deterministic across runs, and the N independent
Spark actions overlap on the thread pool instead of paying N serial
job walls.
"""

import datetime
import random

import pandas as pd
from pyspark.sql import functions as F

from clickhouse_clickhouse_spark.operators.aggregates import limit_by
from clickhouse_clickhouse_spark.operators.joins import asof_join

from conftest import run_parallel

_EPOCH = datetime.datetime(2024, 1, 1)


def _ts(s: int) -> datetime.datetime:
    return _EPOCH + datetime.timedelta(seconds=s)


def _gen_events(rng, n):
    return [(rng.randint(1, 3), _ts(rng.randint(0, 10_000)))
            for _ in range(n)]


def test_asof_matches_pandas_merge_asof(spark):
    """Backward non-strict ASOF must agree with pandas merge_asof for
    any key/timestamp distribution (ties, missing keys, duplicates)."""
    rng = random.Random(1101)
    cases = [
        # planted: missing right key, exact tie, duplicate timestamps
        ([(1, _ts(5))], [(2, _ts(5))]),
        ([(1, _ts(5)), (1, _ts(5))], [(1, _ts(5)), (1, _ts(5))]),
        ([(1, _ts(9)), (2, _ts(9)), (3, _ts(9))], [(1, _ts(10))]),
    ] + [(_gen_events(rng, rng.randint(1, 25)),
          _gen_events(rng, rng.randint(1, 25))) for _ in range(9)]

    def check(case):
        left, right = case
        ldf = spark.createDataFrame(
            [(k, t, i) for i, (k, t) in enumerate(left)],
            "k long, ts timestamp, lid long")
        rdf = spark.createDataFrame(
            [(k, t, float(i)) for i, (k, t) in enumerate(right)],
            "k long, rts timestamp, v double")
        got = asof_join(ldf, rdf, ["k"], "ts", "rts", "backward",
                        how="left")
        got_map = {r.lid: r.asof_rts for r in got.collect()}
        lp = pd.DataFrame([(k, t, i) for i, (k, t) in enumerate(left)],
                          columns=["k", "ts", "lid"]) \
            .sort_values(["ts", "lid"])
        rp = pd.DataFrame(
            [(k, t, float(i)) for i, (k, t) in enumerate(right)],
            columns=["k", "rts", "v"]).sort_values(["rts", "v"])
        exp = pd.merge_asof(lp, rp, left_on="ts", right_on="rts",
                            by="k", direction="backward")
        exp_map = {int(r.lid):
                   (None if pd.isna(r.rts) else r.rts.to_pydatetime())
                   for r in exp.itertuples()}
        assert got_map == exp_map

    run_parallel(cases, check, workers=12)


def test_limit_by_matches_python(spark):
    """LIMIT n BY k over (k, v, uid) must equal the sorted-slice-per-key
    computed in plain Python."""
    rng = random.Random(1102)
    cases = [([(1, 0)] * 6, 2),                        # all-duplicate key
             ([(k, 0) for k in (1, 2, 3, 4)], 1)]      # tie values
    cases += [([(rng.randint(1, 4), rng.randint(0, 50))
                for _ in range(rng.randint(1, 40))], rng.randint(1, 3))
              for _ in range(8)]

    def check(case):
        rows, n = case
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

    run_parallel(cases, check, workers=10)


def test_percentile_bounds(spark):
    """Exact percentile stays within [min, max] and median of a
    singleton equals it — sanity property for the quantile surface."""
    rng = random.Random(1103)
    cases = [[0.0], [-1e6, 1e6], [5.0] * 7]
    cases += [[rng.uniform(-1e6, 1e6) for _ in range(rng.randint(1, 60))]
              for _ in range(5)]

    def check(vals):
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        row = df.agg(F.percentile("v", F.lit(0.5)).alias("med"),
                     F.min("v").alias("lo"),
                     F.max("v").alias("hi")).collect()[0]
        assert row.lo <= row.med <= row.hi
        if len(vals) == 1:
            assert row.med == vals[0]

    run_parallel(cases, check, workers=8)


def _gen_vals(rng, n):
    return [(rng.randint(-50, 50), rng.randint(0, 10_000))
            for _ in range(n)]


def test_global_row_number_matches_single_window(spark):
    """The bucketed distributed rank must equal row_number over a plain
    global window for any value distribution (duplicates, negatives,
    skew), with few buckets forcing multi-bucket offsets."""
    rng = random.Random(1104)
    cases = [
        [(0, i) for i in range(20)],                   # all-equal skew
        [(-50, 1), (-50, 0), (50, 1), (50, 0)],        # extreme + ties
        [(v, 0) for v in range(-5, 6)],                # distinct run
    ] + [_gen_vals(rng, rng.randint(1, 60)) for _ in range(5)]

    def check(rows):
        from pyspark.sql import Window

        from clickhouse_clickhouse_spark.operators.grank import (
            global_row_number,
        )

        df = spark.createDataFrame(rows, "v long, tb long")
        got = {(r.v, r.tb): r.rn for r in
               global_row_number(df, "v", ["tb"], out="rn",
                                 buckets=4).collect()}
        w = Window.orderBy(F.col("v").asc(), F.col("tb").asc())
        want = {(r.v, r.tb): r.rn for r in
                df.withColumn("rn", F.row_number().over(w)).collect()}
        assert got == want

    run_parallel(cases, check, workers=8)


def test_global_range_count_matches_single_window(spark):
    rng = random.Random(1105)
    cases = [
        [(0, 0)] * 10,                                  # all equal
        [(-50, 0), (-45, 1), (50, 2)],                  # sparse edges
    ] + [_gen_vals(rng, rng.randint(1, 60)) for _ in range(6)]

    def check(rows):
        from pyspark.sql import Window

        from clickhouse_clickhouse_spark.operators.grank import (
            global_range_count,
        )

        df = spark.createDataFrame(
            [(float(v), i) for i, (v, _t) in enumerate(rows)],
            "v double, id long")
        got = {r.id: r.n for r in
               global_range_count(df, "v", 10, out="n",
                                  buckets=4).collect()}
        w = Window.orderBy("v").rangeBetween(-10, 0)
        want = {r.id: r.n for r in
                df.withColumn("n", F.count("*").over(w)).collect()}
        assert got == want

    run_parallel(cases, check, workers=8)


def test_global_row_number_string_keys(spark):
    """String-keyed bucketed rank (7-byte UTF-8 prefix buckets) must
    equal the single-window row_number for arbitrary unicode strings —
    UTF-8 byte order == code-point order makes the prefix key
    monotone."""
    rng = random.Random(1106)
    alphabet = ("abzAZ09 _-" + "éüßñ" + "Ω≈ж中日 ₪" + "\u0301\u2e00")

    def gen_str():
        return "".join(rng.choice(alphabet)
                       for _ in range(rng.randint(0, 12)))

    cases = [
        [("", 0), ("", 1), ("a", 0)],                  # empty-string ties
        [("中中中中中中中中", 0), ("中", 1), ("a", 2)],   # >7-byte prefix
    ] + [[(gen_str(), rng.randint(0, 1000))
          for _ in range(rng.randint(1, 40))] for _ in range(6)]

    def check(rows):
        from pyspark.sql import Window

        from clickhouse_clickhouse_spark.operators.grank import (
            global_row_number,
        )

        df = spark.createDataFrame(rows, "s string, tb long")
        got = {(r.s, r.tb): r.rn for r in
               global_row_number(df, "s", ["tb"], out="rn",
                                 buckets=4).collect()}
        w = Window.orderBy(F.col("s").asc(), F.col("tb").asc())
        want = {(r.s, r.tb): r.rn for r in
                df.withColumn("rn", F.row_number().over(w)).collect()}
        assert got == want

    run_parallel(cases, check, workers=8)


def test_ngram_contamination_matches_bruteforce(spark):
    """Contamination report must equal the brute-force Python n-gram
    intersection for any corpus shape (short docs, empty docs, shared
    ids between train and bench, duplicate grams)."""
    rng = random.Random(1107)
    words = ["a", "b", "c", "d", "e"]

    def gen_doc():
        return " ".join(rng.choice(words)
                        for _ in range(rng.randint(0, 12)))

    def gen_corpus():
        return [gen_doc() for _ in range(rng.randint(1, 10))]

    cases = [
        (["a b c"], ["a b c"], 2),        # same id self-match excluded
        ([""], ["a b"], 2),               # empty train doc
        (["a a a a"], ["a a"], 2),        # duplicate grams
    ] + [(gen_corpus(), gen_corpus(), rng.randint(2, 4))
         for _ in range(7)]

    def check(case):
        from clickhouse_clickhouse_spark.pipeline.decontam import (
            ngram_contamination,
        )

        train, bench, n = case
        tdf = spark.createDataFrame(list(enumerate(train)),
                                    "doc_id long, text string")
        # bench ids overlap train ids (0..) on purpose: same-id self
        # matches must not count
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

    run_parallel(cases, check, workers=10)


def test_format_roundtrips_arbitrary_strings(spark):
    """TSV, CSV, and JSONEachRow serialize→parse must be the identity
    for arbitrary unicode cells (tabs, newlines, quotes, backslashes,
    NULLs) — the property the reference's format fuzz tests pin. Each
    (dataset, format) pair is an independent pooled check."""
    from clickhouse_clickhouse_spark.sources.render import (
        parse_lines,
        serialize_lines,
    )

    rng = random.Random(1108)
    alphabet = "ab\t\n\"'\\,;|%€ж中\x01=:[]{}"

    def gen_cell():
        if rng.random() < 0.15:
            return None
        return "".join(rng.choice(alphabet)
                       for _ in range(rng.randint(0, 24)))

    datasets = [
        [(0, "\t\n\\", "\"x\"")], [(1, None, "")],      # planted nasties
    ] + [[(rng.randint(-2**31, 2**31 - 1), gen_cell(), gen_cell())
          for _ in range(rng.randint(1, 12))] for _ in range(8)]

    prepared = []
    for rows in datasets:
        df = spark.createDataFrame(rows, "k int, a string, b string")
        expect = sorted(map(tuple, rows), key=repr)
        for fmt in ("TSV", "CSV", "JSONEachRow", "Values"):
            prepared.append((df, expect, fmt))

    def check(case):
        df, expect, fmt = case
        back = parse_lines(serialize_lines(df, fmt), fmt, df.schema)
        got = sorted(map(tuple, back.collect()), key=repr)
        assert got == expect, (fmt, got, expect)

    run_parallel(prepared, check, workers=16)

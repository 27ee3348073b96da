"""Tests for scalar/vector/text function helpers (SURVEY.md §2.8)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from clickhouse_clickhouse_spark.functions.datetime_fmt import ch_format_to_java
from clickhouse_clickhouse_spark.functions import text as TXT
from clickhouse_clickhouse_spark.functions.vectors import (
    cosine_similarity, dot_product, l2_distance, l2_norm,
)


def test_ch_format_translation():
    assert ch_format_to_java("%Y-%m-%d") == "yyyy-MM-dd"
    assert ch_format_to_java("%H:%M:%S") == "HH:mm:ss"
    assert ch_format_to_java("%F %T") == "yyyy-MM-dd HH:mm:ss"
    assert ch_format_to_java("%d/%m/%y") == "dd/MM/yy"
    with pytest.raises(ValueError):
        ch_format_to_java("%q")


def test_ch_format_quotes_literals(spark):
    # alphabetic literal text must be quoted, not parsed as pattern letters
    java = ch_format_to_java("%Yyear")
    df = spark.createDataFrame([("2024-03-05 01:02:03",)], "s string")
    out = df.select(F.date_format(F.col("s").cast("timestamp"), java).alias("x")).collect()
    assert out[0].x == "2024year"


def test_vector_math_matches_numpy(spark):
    a = [0.5, -1.0, 2.0, 0.0]
    b = [1.0, 1.0, 0.5, -3.0]
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    row = df.select(
        dot_product(F.col("a"), F.col("b")).alias("dot"),
        l2_norm(F.col("a")).alias("na"),
        l2_distance(F.col("a"), F.col("b")).alias("d"),
        cosine_similarity(F.col("a"), F.col("b")).alias("cos")).collect()[0]
    na, nb = np.array(a), np.array(b)
    assert math.isclose(row.dot, float(na @ nb), rel_tol=1e-12)
    assert math.isclose(row.na, float(np.linalg.norm(na)), rel_tol=1e-12)
    assert math.isclose(row.d, float(np.linalg.norm(na - nb)), rel_tol=1e-12)
    assert math.isclose(row.cos, float(na @ nb / (np.linalg.norm(na) * np.linalg.norm(nb))),
                        rel_tol=1e-12)


def test_tokens_and_ngrams(spark):
    df = spark.createDataFrame([("a b c d",), ("x",)], "text string")
    out = df.select(
        TXT.token_count(F.col("text")).alias("n"),
        TXT.word_ngrams(F.col("text"), 2).alias("bi"),
        TXT.char_ngrams(F.col("text"), 3).alias("tri")).collect()
    assert out[0].n == 4
    assert out[0].bi == ["a b", "b c", "c d"]
    assert out[0].tri[:2] == ["a b", " b "]
    assert out[1].n == 1 and out[1].bi == []  # shorter than shingle


def test_quality_and_ratios(spark):
    df = spark.createDataFrame([("clean words here only now",),
                                ("!!! 123 ### 456 $$$",)], "text string")
    rows = df.select(
        TXT.punct_ratio(F.col("text")).alias("p"),
        TXT.digit_ratio(F.col("text")).alias("d"),
        TXT.quality_score(F.col("text")).alias("q")).collect()
    assert rows[0].p == 0.0 and rows[0].d == 0.0
    assert rows[1].p > 0.3 and rows[1].d > 0.2
    assert rows[0].q > rows[1].q  # clean text scores higher


def test_lang_guess_votes(spark):
    df = spark.createDataFrame(
        [("the cat and the dog is in a house for it",),
         ("der hund und die katze ist von dem haus zu",),
         ("zzz qqq xxx",)], "text string")
    got = [r.g for r in df.select(TXT.lang_guess(F.col("text")).alias("g")).collect()]
    assert got[0] == "en" and got[1] == "de" and got[2] == "und"


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame([("Hello  World",), ("hello world",)], "text string")
    fps = [r.f for r in df.select(TXT.fingerprint64(F.col("text")).alias("f")).collect()]
    assert fps[0] == fps[1]


def test_siphash24_official_paper_vectors():
    """SipHash-2-4 core vs the official test vectors from the SipHash
    paper (key 000102..0f, messages of increasing length)."""
    from clickhouse_clickhouse_spark.functions.hashing import siphash64_py

    k0 = int.from_bytes(bytes(range(8)), "little")
    k1 = int.from_bytes(bytes(range(8, 16)), "little")
    # first eight rows of the published vectors_sip64 table
    expected = [0x726FDB47DD0E0E31, 0x74F839C593DC67FD, 0x0D6C8009D9A94F5A,
                0x85676696D7FB7E2D, 0xCF2794E0277187B7, 0x18765564CD99A68D,
                0xCBC9466E58FEE3CE, 0xAB0200F58B01D137]
    for n, want in enumerate(expected):
        assert siphash64_py(bytes(range(n)), k0, k1) == want, n
    # the 15-byte vector quoted in the paper body
    assert siphash64_py(bytes(range(15)), k0, k1) == 0xA129CA6149BE45E5


def test_cityhash64_pinned_regression_vectors():
    """CityHash64 v1.0.2 implementation pinned by regression — empty
    input must equal the algorithm's k2 constant, and known lengths
    crossing every size-class boundary stay stable."""
    from clickhouse_clickhouse_spark.functions.hashing import cityhash64_py

    assert cityhash64_py(b"") == 0x9AE16A3B2F90404F  # k2 by definition
    pinned = {b"a": 0x2420662CD003ACFA,
              b"0123456789abcdef": 0x099D21E99DAC3317,
              b"x" * 17: 0xCCDE5B4C17D97655,
              b"y" * 33: 0xF7770436C8C4F917,
              b"z" * 65: 0xFDF05150BA8C92AB,
              b"w" * 200: 0x5E2472CC5058C894}
    for data, want in pinned.items():
        assert cityhash64_py(data) == want, data[:4]


def test_html_extract_text(spark):
    from pyspark.sql import functions as F

    from clickhouse_clickhouse_spark.functions.text import (
        html_extract_text,
    )

    html = ('<html><head><style>p{x:1}</style><script src="a.js">var i=0;'
            '</script></head><body>  <h1>Title</h1><!-- c --><p>A &amp; B '
            '&lt;ok&gt;&nbsp;end</p></body></html>')
    r = spark.range(1).select(
        html_extract_text(F.lit(html)).alias("t")).collect()[0]
    assert r.t == "Title A & B <ok> end"


def test_scalar_simhash_matches_pipeline(spark, sf_dir):
    """word_shingle_simhash (scalar, column expressions) must equal the
    corpus-level pipeline/dedup.simhash signature for every document —
    the per-string and per-corpus paths interoperate."""
    from pyspark.sql import functions as F

    from clickhouse_clickhouse_spark.functions.text import (
        ngram_simhash, word_shingle_simhash,
    )
    from clickhouse_clickhouse_spark.pipeline.dedup import simhash
    from clickhouse_clickhouse_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents").limit(60)
    scalar = d.select("doc_id", word_shingle_simhash(
        F.col("text"), shingle=1, bits=16).alias("sh"))
    pipe = simhash(d, "doc_id", "text", bits=16, shingle=1)
    j = scalar.join(pipe, "doc_id")
    assert j.filter(F.col("sh") != F.col("simhash")).count() == 0
    # ngram variant: near-identical strings land near in hamming space
    rows = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy cat"),
         (3, "completely different words entirely here")],
        "id int, t string").select(
        "id", ngram_simhash(F.col("t")).alias("h")).collect()
    h = {r.id: r.h for r in rows}
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(h[1], h[2]) < ham(h[1], h[3])


def test_scalar_minhash_matches_pipeline(spark, sf_dir):
    """wordShingleMinHash (scalar, column expressions) must equal the
    corpus-level pipeline/dedup.minhash_signatures row per document —
    per-string and per-corpus MinHash interoperate (round-7; same
    stance as the r6 SimHash twins)."""
    from pyspark.sql import functions as F

    from clickhouse_clickhouse_spark.functions.text import (
        ngram_minhash, word_shingle_minhash,
    )
    from clickhouse_clickhouse_spark.pipeline.dedup import (
        minhash_signatures,
    )
    from clickhouse_clickhouse_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents").limit(60)
    scalar = d.select("doc_id", word_shingle_minhash(
        F.col("text"), shingle=2, num_hashes=8).alias("sig"))
    pipe = minhash_signatures(d, "doc_id", "text", num_hashes=8,
                              shingle=2)
    j = scalar.join(pipe, "doc_id")
    bad = j.filter(
        F.col("sig") != F.array(*[F.col(f"mh{k}") for k in range(8)]))
    assert bad.count() == 0
    # ngram variant: near-identical strings share most signature slots
    rows = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy cat"),
         (3, "completely different words entirely here")],
        "id int, t string").select(
        "id", ngram_minhash(F.col("t"), 3, 16).alias("s")).collect()
    s = {r.id: r.s for r in rows}
    shared = lambda a, b: sum(1 for x, y in zip(a, b) if x == y)
    assert shared(s[1], s[2]) > shared(s[1], s[3])


def test_multi_fuzzy_and_token_predicates(spark):
    from pyspark.sql import functions as F

    from clickhouse_clickhouse_spark.functions.text import (
        has_token, multi_fuzzy_match_any, multi_match_any,
        ngram_distance,
    )

    d = spark.createDataFrame(
        [("the cat sat",), ("concatenate",), ("",)], "t string")
    r = d.select(
        has_token(F.col("t"), "cat").alias("ht"),
        multi_match_any(F.col("t"), [r"c.t", r"^x"]).alias("mm"),
        multi_fuzzy_match_any(F.col("t"), 1, ["zat"]).alias("fz"),
        F.round(ngram_distance(F.col("t"), F.col("t"), 3), 6)
        .alias("self_d")).collect()
    # 'cat' is a token of the first row only (substring != token)
    assert [x.ht for x in r] == [True, False, False]
    assert [x.mm for x in r] == [True, True, False]
    # 'sat'/'cat' are within distance 1 of 'zat'
    assert [x.fz for x in r] == [True, True, False]
    assert all(x.self_d == 0.0 for x in r if x.self_d is not None)
    import pytest as _p

    with _p.raises(ValueError, match="single token"):
        d.select(has_token(F.col("t"), "two words"))
    with _p.raises(ValueError, match="metacharacters"):
        d.select(multi_fuzzy_match_any(F.col("t"), 1, ["a.b"]))

"""Tests for the LLM-pipeline operators: dedup, similarity, multimodal
(SURVEY.md §7 M7)."""

import numpy as np
from pyspark.sql import functions as F

from clickhouse_clickhouse_spark.pipeline.dedup import (
    embedding_near_dup_pairs, exact_dedup, minhash_candidate_pairs,
    minhash_signatures, ngram_jaccard_pairs, simhash,
)
from clickhouse_clickhouse_spark.pipeline.multimodal import (
    FEATURE_DIM, extract_features, synthetic_media,
)
from clickhouse_clickhouse_spark.pipeline.similarity import (
    brute_force_topk, label_centroids, lsh_bucketed_topk,
)


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "s1"),
        (2, "the quick brown fox jumps over the lazy cat", "s1"),  # near-dup of 1
        (3, "the quick brown fox jumps over the lazy dog", "s1"),  # exact dup of 1
        (4, "completely different text about spark engines here", "s1"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_exact_dedup_keeps_lowest_id(spark):
    out = exact_dedup(_docs(spark), "text", "doc_id")
    assert sorted(r.doc_id for r in out.collect()) == [1, 2, 4]


def test_minhash_finds_near_dups_both_hash_modes(spark):
    for mode in ("xxhash", "vocab"):
        pairs = {(r.id_a, r.id_b) for r in
                 minhash_candidate_pairs(_docs(spark), "doc_id", "text",
                                         num_hashes=8, bands=4, shingle=2,
                                         token_hash=mode).collect()}
        assert (1, 3) in pairs  # exact dups always collide
        assert (1, 2) in pairs or (2, 3) in pairs  # near-dup shares bands
        assert not any(4 in p for p in pairs)  # unrelated doc never pairs


def test_minhash_signature_identical_for_identical_docs(spark):
    sig = minhash_signatures(_docs(spark), "doc_id", "text", 8, 2).collect()
    by_id = {r.doc_id: tuple(r)[1:] for r in sig}
    assert by_id[1] == by_id[3]
    assert by_id[1] != by_id[4]


def test_ngram_jaccard_values(spark):
    out = {(r.id_a, r.id_b): r.jaccard for r in
           ngram_jaccard_pairs(_docs(spark), "doc_id", "text", "source",
                               shingle=2).collect()}
    assert out[(1, 3)] == 1.0          # identical
    assert 0.5 < out[(1, 2)] < 1.0     # near-dup
    assert out[(1, 4)] == 0.0          # disjoint


def test_simhash_close_for_near_dups(spark):
    out = {r.doc_id: r.simhash for r in
           simhash(_docs(spark), "doc_id", "text", bits=16).collect()}
    assert out[1] == out[3]
    ham_near = bin(out[1] ^ out[2]).count("1")
    ham_far = bin(out[1] ^ out[4]).count("1")
    assert ham_near < ham_far


def _vectors(spark, n=50, dim=16, seed=7):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        v = rng.normal(size=dim)
        rows.append((i, (v / np.linalg.norm(v)).astype(float).tolist(), i % 3))
    # vector 100: near-duplicate of vector 0
    base = np.array(rows[0][1])
    noisy = base + rng.normal(scale=0.01, size=dim)
    rows.append((100, (noisy / np.linalg.norm(noisy)).tolist(), 0))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")


def test_brute_force_topk_matches_numpy(spark):
    df = _vectors(spark)
    q = df.filter(F.col("vec_id") == 0)
    got = [(r.corpus_id, r.cosine) for r in
           brute_force_topk(df, q, k=3, query_id="vec_id").orderBy("rk").collect()]
    emb = {r.vec_id: np.array(r.embedding) for r in df.collect()}
    sims = sorted(((i, float(emb[0] @ v)) for i, v in emb.items() if i != 0),
                  key=lambda t: -t[1])[:3]
    assert [g[0] for g in got] == [s[0] for s in sims]
    assert got[0][0] == 100  # the planted near-duplicate ranks first


def test_embedding_near_dup_pairs_finds_planted_dup(spark):
    df = _vectors(spark)
    pairs = embedding_near_dup_pairs(df, "vec_id", "embedding",
                                     threshold=0.95).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(0, 100)}
    # sign-LSH bucketing keeps the (near-identical) pair
    bucketed = embedding_near_dup_pairs(df, "vec_id", "embedding",
                                        threshold=0.95, bucket_bits=4).collect()
    assert {(r.id_a, r.id_b) for r in bucketed} == {(0, 100)}


def test_lsh_topk_recovers_near_neighbor(spark):
    df = _vectors(spark)
    q = df.filter(F.col("vec_id") == 0)
    got = lsh_bucketed_topk(df, q, k=3, bits=4, multiprobe=1,
                            query_id="vec_id").orderBy("rk").collect()
    assert got and got[0].corpus_id == 100  # planted dup found despite pruning


def test_label_centroids_match_numpy(spark):
    df = _vectors(spark)
    cents = {r.label: np.array(r.centroid) for r in label_centroids(df).collect()}
    rows = df.collect()
    for lbl in (0, 1, 2):
        expect = np.mean([np.array(r.embedding) for r in rows if r.label == lbl], axis=0)
        assert np.allclose(cents[lbl], expect, atol=1e-12)


def test_multimodal_feature_plumbing(spark):
    media = synthetic_media(spark, n=8)
    feats = extract_features(media).collect()
    assert len(feats) == 8
    for r in feats:
        assert len(r.feature) == FEATURE_DIM
        assert abs(sum(r.feature) - 1.0) < 1e-5  # normalized histogram
    # deterministic: same payload -> same feature
    again = extract_features(media).collect()
    assert {r.media_id: tuple(r.feature) for r in feats} == \
           {r.media_id: tuple(r.feature) for r in again}


def test_ivf_topk_recovers_planted_dup(spark):
    from clickhouse_clickhouse_spark.pipeline.similarity import (
        assign_to_centroids, ivf_topk, kmeans_centroids,
    )
    df = _vectors(spark)
    q = df.filter(F.col("vec_id") == 0)
    got = ivf_topk(df, q, k=3, n_centroids=4, n_probe=2,
                   query_id="vec_id").orderBy("rk").collect()
    assert got and got[0].corpus_id == 100  # planted near-dup survives IVF pruning
    # centroids: k rows, correct dimensionality, every vector assigned
    cents = kmeans_centroids(df, 4)
    assert cents.count() == 4
    assert all(len(r.centroid) == 16 for r in cents.collect())
    assigned = assign_to_centroids(df, cents)
    assert assigned.count() == df.count()


def test_connected_components_clusters_and_canonical_dedup(spark):
    from clickhouse_clickhouse_spark.pipeline.components import (
        connected_components, dedup_keep_canonical,
    )

    # two chains and one singleton edge: {1,2,3,4}, {10,11}, {20,21}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)], "id_a long, id_b long")
    comp = {r.n: r.lbl for r in
            connected_components(edges, "id_a", "id_b").collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}

    docs = spark.createDataFrame([(i, f"d{i}") for i in
                                  [1, 2, 3, 4, 10, 11, 20, 21, 99]],
                                 "doc_id long, body string")
    kept = sorted(r.doc_id for r in
                  dedup_keep_canonical(docs, "doc_id", edges,
                                       "id_a", "id_b").collect())
    assert kept == [1, 10, 20, 99]  # one canonical per cluster + untouched


def test_winnowing_shared_substring_guarantee(spark):
    """Winnowing's core property: documents sharing a substring of length
    >= w + k - 1 (= 8 for k=5, w=4) share at least one fingerprint."""
    from clickhouse_clickhouse_spark.functions.text import (
        winnowing_fingerprints,
    )

    shared = "the quick brown fox jumps over the lazy dog"
    docs = spark.createDataFrame(
        [(1, "aaa " + shared + " bbb ccc ddd"),
         (2, "zzz yyy " + shared + " qqq"),
         (3, "completely different content with no overlap here at all")],
        "doc_id long, text string")
    fp = winnowing_fingerprints(docs, "doc_id", "text", k=5, w=4)
    by_doc = {i: {r.fp_hash for r in rows} for i, rows in
              ((i, [r for r in fp.collect() if r.doc_id == i])
               for i in (1, 2, 3))}
    assert by_doc[1] & by_doc[2], "shared substring must share a fingerprint"
    # and fingerprinting is selective, not all-grams
    assert len(by_doc[1]) < 40


def test_auto_bucket_bits_scales_with_corpus():
    from clickhouse_clickhouse_spark.pipeline.dedup import auto_bucket_bits

    assert auto_bucket_bits(500) == 4
    assert auto_bucket_bits(1 << 20) == 10          # 1M rows -> 2^10 buckets
    assert auto_bucket_bits(1 << 30) == 20          # 1B rows
    assert auto_bucket_bits(10**12) == 24           # clamped
    # occupancy stays ~target across 3 orders of magnitude
    for n in (10**5, 10**7, 10**9):
        bits = auto_bucket_bits(n)
        assert 256 <= n / (1 << bits) <= 2048


def test_star_components_matches_label_propagation(spark):
    """Large/small-star CC must agree with label propagation on random
    graphs AND on the adversarial long chain that label propagation
    needs O(n) rounds for (star converges in O(log n))."""
    import random

    from clickhouse_clickhouse_spark.pipeline.components import (
        connected_components, connected_components_star,
    )

    rng = random.Random(7)
    rand_edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(50)]
    df = spark.createDataFrame(
        [(a, b) for a, b in rand_edges if a != b], "id_a long, id_b long")
    star = {r.n: r.lbl for r in
            connected_components_star(df, "id_a", "id_b").collect()}
    prop = {r.n: r.lbl for r in
            connected_components(df, "id_a", "id_b").collect()}
    assert star == prop

    # a 30-edge chain: diameter exceeds label propagation's iteration
    # budget -> it must FAIL LOUDLY (it used to return silently-wrong
    # labels); the star variant collapses it to root 0 in O(log n)
    # rounds. max_iter=6 exercises the identical non-convergence path
    # as the default 25 without paying 19 extra Spark rounds of wall.
    chain = spark.createDataFrame([(i, i + 1) for i in range(30)],
                                  "id_a long, id_b long")
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="connected_components_star"):
        connected_components(chain, "id_a", "id_b", max_iter=6)
    cstar = {r.n: r.lbl for r in
             connected_components_star(chain, "id_a", "id_b").collect()}
    assert set(cstar.values()) == {0} and len(cstar) == 31


def test_decontamination_detects_planted_overlap(spark):
    """A training doc sharing a 3-gram with a benchmark doc is flagged;
    disjoint docs survive; self-overlap (same id on both sides) does not
    count as contamination."""
    from pyspark.sql import functions as F

    from clickhouse_clickhouse_spark.pipeline.decontam import (
        decontaminate, ngram_contamination,
    )

    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps high"),
         (2, "totally unrelated clean words here"),
         (3, "short doc")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(1, "the quick brown fox jumps high"),      # same id: ignored
         (100, "lazy dogs saw the quick brown fox")],
        "doc_id long, text string")

    rep = {r.doc_id: (r.n_gram_hits, r.n_bench_docs)
           for r in ngram_contamination(train, bench, n=3).collect()}
    # doc 1 shares "the quick brown"/"quick brown fox" with bench doc 100
    assert rep == {1: (2, 1)}
    left = {r.doc_id for r in decontaminate(train, bench, n=3).collect()}
    assert left == {2, 3}

    # the benchmark gram set must be broadcast (corpus side never shuffles)
    plan = ngram_contamination(train, bench, n=3)._jdf.queryExecution() \
        .explainString(spark._jvm.org.apache.spark.sql.execution
                       .ExplainMode.fromString("formatted"))
    assert "BroadcastHashJoin" in plan


def test_redact_pii_and_repetition_profile(spark):
    from pyspark.sql import functions as F

    from clickhouse_clickhouse_spark.functions.text import (
        redact_pii, repetition_profile,
    )

    df = spark.createDataFrame(
        [(1, "mail bob.smith+x@corp-mail.co.uk now 192.168.0.1 "
             "call 415-555-0199 pay 4111-1111-1111-1234 end")],
        "doc_id long, text string")
    out = df.select(redact_pii(F.col("text")).alias("r")).first().r
    assert out == "mail <EMAIL> now <IP> call <PHONE> pay <CARD> end"

    # note: a doc needs >10 bigrams before the 0.10 top-bigram default can
    # pass at all — the Gopher thresholds are calibrated for real doc
    # lengths, not toy strings
    clean = " ".join(f"t{i}" for i in range(21))
    rep = spark.createDataFrame(
        [(1, "a a a a b"),              # rep frac 0.6, top bigram 'a a' 3/4
         (2, clean)],                   # 21 distinct tokens, top bigram 1/20
        "doc_id long, text string")
    prof = {r.doc_id: r for r in repetition_profile(rep).collect()}
    assert prof[1].word_rep_frac == 0.6 and prof[1].top_bigram_frac == 0.75
    assert not prof[1].keep
    assert prof[2].word_rep_frac == 0.0 and prof[2].keep


def test_pq_topk_planted_dup_and_recall(spark):
    """PQ ADC search must surface the planted near-duplicate at rank 1
    and keep decent recall@5 vs exact L2; the codebook/encoding shapes
    must be (m*codes rows, m-long code arrays)."""
    from clickhouse_clickhouse_spark.pipeline.similarity import (
        pq_encode, pq_topk, pq_train,
    )

    df = _vectors(spark)                     # 51 vectors, dim 16
    cb = pq_train(df, m=4, codes=8, dim=16)
    assert cb.count() == 4 * 8
    assert all(len(r.codeword) == 4 for r in cb.collect())
    enc = pq_encode(df, cb, m=4, dim=16)
    assert enc.count() == df.count()
    assert all(len(r.codes) == 4 and all(0 <= c < 8 for c in r.codes)
               for r in enc.collect())

    q = df.filter(F.col("vec_id") == 0).withColumnRenamed("vec_id",
                                                          "query_id")
    got = pq_topk(df, q, k=5, m=4, codes=8, dim=16,
                  query_id="query_id").collect()
    assert got and sorted(r.rank for r in got) == [1, 2, 3, 4, 5]
    assert got[0].corpus_id == 100 or any(
        r.corpus_id == 100 and r.rank <= 2 for r in got)

    # recall@5 vs exact squared-L2 (numpy ground truth)
    rows = {r.vec_id: np.array(r.embedding) for r in df.collect()}
    q0 = rows[0]
    exact = sorted((float(np.sum((v - q0) ** 2)), i)
                   for i, v in rows.items() if i != 0)[:5]
    exact_ids = {i for _, i in exact}
    got_ids = {r.corpus_id for r in got}
    assert len(exact_ids & got_ids) >= 3   # recall@5 >= 0.6 on 4x8 PQ


def test_ivf_pq_topk_recovers_planted_dup(spark):
    """IVF-PQ: the planted near-duplicate must survive BOTH the coarse
    pruning and the PQ quantization, and candidates must come only from
    probed lists (result size bounded by the probe set)."""
    from clickhouse_clickhouse_spark.pipeline.similarity import ivf_pq_topk

    df = _vectors(spark)
    q = (df.filter(F.col("vec_id") == 0)
         .withColumnRenamed("vec_id", "query_id"))
    got = ivf_pq_topk(df, q, k=5, n_centroids=4, n_probe=2, m=4, codes=8,
                      dim=16, query_id="query_id").collect()
    assert got and sorted(r.rank for r in got) == [1, 2, 3, 4, 5]
    assert any(r.corpus_id == 100 and r.rank <= 2 for r in got)


def test_pq_rerank_matches_brute_force(spark):
    """normalize+rerank (the round-10 production knobs): exact-cosine
    re-rank of the ADC candidate set must reproduce the brute-force
    cosine top-k exactly when the candidate set is wide enough, with
    the brute-force output schema (query_id, corpus_id, cosine, rk);
    rerank < k refuses."""
    import pytest as _p

    from clickhouse_clickhouse_spark.pipeline.similarity import (
        brute_force_topk, ivf_pq_topk, pq_topk,
    )

    df = _vectors(spark)                     # 51 vectors, dim 16
    q = (df.filter(F.col("vec_id") == 0)
         .withColumnRenamed("vec_id", "query_id"))
    exact = [(r.corpus_id, r.cosine) for r in
             brute_force_topk(df, q, k=5, query_id="query_id")
             .orderBy("rk").collect()]
    # candidate set = whole corpus -> re-rank is exact by construction
    # (for ANY codebook quality — so iterations=1 keeps the test cheap)
    got = pq_topk(df, q, k=5, m=4, codes=8, dim=16, iterations=1,
                  normalize=True, rerank=50, query_id="query_id")
    assert {"query_id", "corpus_id", "cosine", "rk"} <= set(got.columns)
    assert [(r.corpus_id, r.cosine)
            for r in got.orderBy("rk").collect()] == exact
    # ivf-pq rerank path: planted dup (id 100) must be rank 1 with
    # cosine ~1 after the exact re-score
    got2 = (ivf_pq_topk(df, q, k=5, n_centroids=4, n_probe=2, m=4,
                        codes=8, dim=16, iterations=1, normalize=True,
                        rerank=10, query_id="query_id")
            .orderBy("rk").collect())
    assert got2[0].corpus_id == 100 and got2[0].cosine >= 0.99
    with _p.raises(ValueError, match="rerank"):
        pq_topk(df, q, k=5, m=4, codes=8, dim=16, rerank=3,
                query_id="query_id")


def test_pq_degenerates_to_exact_with_full_codebook(spark):
    """Exactness degeneracy: with m=1 subspace and codes >= n vectors,
    every vector becomes its own codeword, so ADC distances are exact
    squared L2 and the PQ ranking equals the brute-force ranking."""
    from clickhouse_clickhouse_spark.pipeline.similarity import pq_topk

    rng = np.random.default_rng(11)
    rows = [(i, rng.normal(size=8).tolist()) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = (df.filter(F.col("vec_id") == 0)
         .withColumnRenamed("vec_id", "query_id"))
    got = [r.corpus_id for r in
           pq_topk(df, q, k=11, m=1, codes=12, dim=8, iterations=1,
                   query_id="query_id").orderBy("rank").collect()]
    v = {i: np.array(e) for i, e in rows}
    exact = [i for _, i in sorted(
        (float(np.sum((v[i] - v[0]) ** 2)), i) for i in v if i != 0)]
    assert got == exact


def test_repeated_span_stats_short_docs_and_cap(spark):
    from clickhouse_clickhouse_spark.pipeline.boilerplate import (
        frequent_ngrams,
        repeated_span_stats,
    )

    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c d e x y"), (3, "a b c d e z w"),
         (4, "tiny doc")],
        ["doc_id", "text"])
    stats = {r.doc_id: r for r in
             repeated_span_stats(df, n=5, min_docs=3).collect()}
    # "a b c d e" appears in 3 docs -> flagged; covers tokens 1..5
    assert stats[1].n_rep_pos == 1 and stats[1].n_cov_tokens == 5
    assert abs(stats[1].rep_fraction - 5 / 7) < 1e-6
    # doc 4 has < 5 tokens: zero gram positions, zero coverage
    assert stats[4].n_gram_pos == 0 and stats[4].rep_fraction == 0.0
    # max_positions bounds the per-doc shingle count (scale lever)
    capped = frequent_ngrams(df, n=2, min_docs=2, max_positions=1)
    assert capped.count() == 1  # only position 1's gram ("a b") survives


def test_repeated_span_stats_hash_mode_identical(spark, sf_dir):
    """hash_grams=True (the shuffle-bytes scale lever) must produce
    byte-identical per-doc stats to the string-keyed mode."""
    from clickhouse_clickhouse_spark.pipeline.boilerplate import (
        repeated_span_stats,
    )
    from clickhouse_clickhouse_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents").limit(120)
    a = sorted(map(tuple, repeated_span_stats(d, n=5, min_docs=3)
                   .collect()))
    b = sorted(map(tuple, repeated_span_stats(d, n=5, min_docs=3,
                                              hash_grams=True).collect()))
    assert a == b


def test_minhash_hot_bucket_cap_star_collapse(spark):
    """Round-5 skew hardening: a pathological boilerplate bucket (30% of
    docs identical) must NOT emit quadratic pairs when max_bucket caps
    it — oversized buckets collapse to a star on the canonical id, and
    the connected components are IDENTICAL to the uncapped all-pairs
    run."""
    import itertools

    from clickhouse_clickhouse_spark.pipeline.dedup import (
        minhash_candidate_pairs,
    )

    hot = 90  # 30% of 300
    rows = [(i, "the same boilerplate header repeated verbatim everywhere")
            for i in range(hot)]
    rows += [(hot + i,
              f"unique document number {i} with words w{i}a w{i * 7}b "
              f"w{i * 13}c w{i * 29}d") for i in range(210)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = minhash_candidate_pairs(df, "doc_id", "text",
                                     max_bucket=25).collect()
    uncapped = minhash_candidate_pairs(df, "doc_id", "text").collect()

    # quadratic suppressed: the hot block alone would be 90*89/2 = 4005
    # all-pairs edges; the star form is 89 — assert the whole output is
    # nowhere near quadratic
    hot_capped = [r for r in capped if r.id_a < hot and r.id_b < hot]
    hot_uncapped = [r for r in uncapped if r.id_a < hot and r.id_b < hot]
    assert len(hot_uncapped) == 4005
    assert len(hot_capped) == 89
    assert len(capped) <= len(uncapped) - 4005 + 89

    # identical connected components (union-find over each edge list)
    def components(pairs):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in pairs:
            ra, rb = find(r.id_a), find(r.id_b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {x: find(x) for x in list(parent)}

    ca, cb = components(capped), components(uncapped)
    groups_a = {frozenset(k for k, v in ca.items() if v == root)
                for root in set(ca.values())}
    groups_b = {frozenset(k for k, v in cb.items() if v == root)
                for root in set(cb.values())}
    assert groups_a == groups_b
    assert frozenset(range(hot)) in groups_a  # the hot block is one group


def test_dsir_weights_favor_target_like_docs(spark):
    """Docs whose tokens match the target subset's vocabulary must score
    strictly above docs drawn from a disjoint vocabulary."""
    from clickhouse_clickhouse_spark.pipeline.dsir import (
        dsir_log_weights, dsir_resample,
    )
    import pyspark.sql.functions as F

    rows = (
        # target-domain docs: vocabulary A
        [(i, "alpha beta gamma delta alpha beta", "en") for i in range(10)]
        # raw-only docs: disjoint vocabulary B
        + [(100 + i, "omega sigma theta lambda omega sigma", "de")
           for i in range(10)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    tgt = docs.filter(F.col("lang") == "en").select("doc_id")
    w = {r.doc_id: r.log_weight
         for r in dsir_log_weights(docs, tgt, dim=64).collect()}
    assert min(w[i] for i in range(10)) > max(w[100 + i] for i in range(10))

    # resampling with k=10 must pick exactly the target-like docs: their
    # weight margin dwarfs the bounded Gumbel noise here
    picked = {r.doc_id for r in dsir_resample(docs, tgt, 10, dim=64).collect()}
    assert picked == set(range(10))


def test_chunk_dedup_rebuild_removes_cross_doc_spans(spark):
    """A boilerplate chunk shared by every doc survives only in the first;
    unique chunks all survive; reassembly preserves chunk order."""
    from clickhouse_clickhouse_spark.pipeline.dedup import chunk_dedup_rebuild

    boiler = "B" * 10
    rows = [(0, boiler + "0123456789"),
            (1, boiler + "abcdefghij"),
            (2, boiler + "qrstuvwxyz")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           chunk_dedup_rebuild(docs, "doc_id", "text",
                               size=10, stride=10, max_chunks=5).collect()}
    assert out[0].clean_text == boiler + "0123456789"
    assert out[0].n_kept == 2 and out[0].n_dropped == 0
    # later docs lose the boilerplate chunk but keep their unique tail
    assert out[1].clean_text == "abcdefghij"
    assert out[1].n_kept == 1 and out[1].n_dropped == 1
    assert out[2].clean_text == "qrstuvwxyz"


def test_corpus_report_whole_and_grouped(spark, sf_dir):
    from clickhouse_clickhouse_spark.pipeline.report import corpus_report
    from clickhouse_clickhouse_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    whole = corpus_report(d, group_by=None).collect()
    assert len(whole) == 1
    r = whole[0]
    assert r.n_docs == d.count()
    assert 0.0 <= r.dup_share <= 1.0 and 0.0 <= r.avg_quality <= 1.0
    assert r.p50_tokens <= r.p95_tokens
    assert sum(r.lang_docs.values()) == r.n_docs
    grouped = corpus_report(d, group_by="source").collect()
    assert sum(g.n_docs for g in grouped) == r.n_docs
    # planted duplicates raise dup_share
    dup = d.limit(50).union(d.limit(50))
    r2 = corpus_report(dup, group_by=None).collect()[0]
    assert r2.dup_share >= 0.5


def test_exact_substring_spans_and_removal(spark):
    from clickhouse_clickhouse_spark.pipeline.boilerplate import (
        exact_substring_spans, remove_repeated_spans,
    )

    docs = spark.createDataFrame([
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "prefix alpha beta gamma delta other tail"),
        (3, "totally unrelated words here now"),
    ], "doc_id int, text string")
    spans = exact_substring_spans(docs, n=3, min_docs=2)
    got = {(r.doc_id): (r.span_start, r.span_end)
           for r in spans.collect()}
    # 'alpha beta gamma delta' (4 tokens) shared: windows at 1,2 in doc1
    # (tokens 1-4) and at 2,3 in doc2 (tokens 2-5) merge per doc
    assert got[1] == (1, 4) and got[2] == (2, 5)
    assert 3 not in got
    out = {r.doc_id: r.text
           for r in remove_repeated_spans(docs, spans).collect()}
    assert out[1] == "epsilon zeta"
    assert out[2] == "prefix other tail"
    assert out[3] == "totally unrelated words here now"
    # spans never cut below the n-window guarantee: every removed span
    # is >= n tokens long
    for s, e in got.values():
        assert e - s + 1 >= 3


def test_corpus_report_null_source_and_lang(spark):
    from clickhouse_clickhouse_spark.pipeline.report import corpus_report

    docs = spark.createDataFrame(
        [(1, "one two three", "en", "web"),
         (2, "vier funf", None, None),        # NULL lang AND source
         (3, "one two three", "en", "web")],
        "doc_id int, text string, lang string, source string")
    rows = {r.source: r for r in
            corpus_report(docs, group_by="source").collect()}
    # the NULL-source group must survive (round-6 review: inner joins
    # dropped it) and NULL lang buckets as 'unknown'
    assert set(rows) == {"web", None}
    assert rows[None].n_docs == 1
    assert rows[None].lang_docs == {"unknown": 1}
    assert rows["web"].n_docs == 2 and rows["web"].dup_share == 0.5
    total = sum(r.n_docs for r in rows.values())
    assert total == 3


def test_bigram_lm_perplexity_orders_quality(spark):
    """In-distribution text must score lower perplexity than
    out-of-vocabulary gibberish under the corpus-trained bigram LM."""
    from pyspark.sql import functions as F

    from clickhouse_clickhouse_spark.pipeline.lm_score import (
        score_perplexity, train_bigram_lm,
    )

    corpus = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog again and "
             "again the quick brown fox returns") for i in range(20)]
        + [(100, "the quick brown fox jumps"),
           (101, "zyx wvut qpo nmlk jihg fedc ba")],
        "doc_id long, text string")
    uni, bi, stats = train_bigram_lm(corpus, "doc_id", "text")
    out = {r.doc_id: r.perplexity
           for r in score_perplexity(corpus, "doc_id", "text",
                                     uni, bi, stats).collect()}
    assert out[100] < out[101]
    # a 1-token doc has no bigram -> no row, not a fake score
    one = spark.createDataFrame([(7, "single")], "doc_id long, text string")
    assert score_perplexity(one, "doc_id", "text",
                            uni, bi, stats).count() == 0


def test_bm25_ranking_and_determinism(spark):
    from clickhouse_clickhouse_spark.pipeline.bm25 import bm25_topk

    docs = spark.createDataFrame(
        [(1, "vector search with vector index and vector math"),
         (2, "vector mentioned once here"),
         (3, "nothing relevant at all"),
         (4, "hash join hash table hash map")],
        "doc_id long, text string")
    top = bm25_topk(docs, "doc_id", "text", ["vector", "hash"], k=3) \
        .collect()
    ids = [r.doc_id for r in top]
    assert ids[0] in (1, 4) and 3 not in ids
    # doc 1 (3x vector) must outrank doc 2 (1x vector)
    rank = {r.doc_id: i for i, r in enumerate(top)}
    assert rank[1] < rank.get(2, 99)
    # replayable: same result twice
    again = bm25_topk(docs, "doc_id", "text", ["vector", "hash"],
                      k=3).collect()
    assert [tuple(r) for r in top] == [tuple(r) for r in again]


def test_minhash_mega_bucket_never_materializes(spark):
    """Round-8 verdict watch item: an over-cap bucket must stream
    member rows (star on min id) WITHOUT collect_list ever seeing it —
    the old SIZE branch built the full member array first, which dies
    on the 2 GB array-row limit for a boilerplate mega-bucket at
    100 TB. Pins: (a) one mega-bucket (every doc identical) produces
    exactly n-1 star pairs; (b) the executed plan has exactly ONE
    collect_list aggregate (the under-cap path) and reuses the banded
    exchange for the size-routing join."""
    from clickhouse_clickhouse_spark.pipeline.dedup import (
        minhash_candidate_pairs,
    )

    n = 4000
    df = spark.range(n).selectExpr(
        "id AS doc_id",
        "'the exact same boilerplate text in every document' AS text")
    out = minhash_candidate_pairs(df, "doc_id", "text", max_bucket=10)
    rows = out.collect()
    assert len(rows) == n - 1
    assert all(r.id_a == 0 and r.id_b >= 1 for r in rows)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one logical collect aggregate = partial + final plan nodes; the
    # star path must not add a third
    n_agg = sum(1 for ln in plan.splitlines()
                if "collect_list" in ln.lower()
                and "Aggregate" in ln)
    assert n_agg <= 2, plan
    # the size-routing join either broadcasts the tiny (count, min)
    # aggregate (AQE at test scale) or reuses the banded exchange
    # (shuffle-join regime at real scale) — both are shuffle-free for
    # the probe side
    assert "ReusedExchange" in plan or "BroadcastExchange" in plan, plan

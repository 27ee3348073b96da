"""Regenerate RECALL.md — the ANN recall trend record (round-9 verdict
item 6): recall@k per ANN variant at a fixed seed/parameter set, against
the exact brute-force baseline, at the given scale factor.

The registry's ann_* queries are planted-duplicate INVARIANT forms (the
correctness gate); this tool measures the raw RETRIEVAL quality of the
same parameterizations so a recall regression is as visible across
rounds as a perf regression in BENCH_r{N}.json.

Usage: python tools/gen_recall.py [sf_dir ...]   (default sf0.001 sf0.01)
"""

from __future__ import annotations

import datetime
import os
import subprocess
import sys

REPO = "/root/repo"
sys.path.insert(0, REPO)

K = 5
N_QUERIES = 3

# (variant, builder kwargs, unit-test gate description)
VARIANTS = [
    ("brute_force", {}, "1.0 by definition (baseline)"),
    ("lsh bits=6 multiprobe=1", {"kind": "lsh"},
     "planted-dup recovery (registry oracle); recall informational"),
    ("ivf lists=8 probe=2", {"kind": "ivf"},
     "planted-dup recovery (registry oracle); recall informational"),
    ("pq m=8 codes=16", {"kind": "pq"},
     "recall@5 >= 0.6 vs exact L2 on the 4x8 fixture (test_pipeline)"),
    ("ivf-pq lists=8 probe=3 m=8 codes=16", {"kind": "ivfpq"},
     "planted-dup recovery (registry oracle + test_pipeline)"),
    ("pq TUNED m=16 codes=256 norm rerank=20", {"kind": "pq_tuned"},
     "recall@5 >= 0.9 hash-checked per round (ann_tuned_recall_gate); "
     "planted dup must be rank 1 (ann_pq_tuned_topk)"),
    ("ivf-pq TUNED lists=8 probe=4 m=16 codes=64 norm rerank=40",
     {"kind": "ivfpq_tuned"},
     "recall@5 >= 0.9 hash-checked per round (ann_tuned_recall_gate)"),
]


def _topk_sets(df):
    out: dict[int, set] = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["corpus_id"])
    return out


def measure(spark, sf_dir: str) -> dict[str, float]:
    from pyspark.sql import functions as F

    from clickhouse_clickhouse_spark.pipeline.similarity import (
        brute_force_topk, ivf_pq_topk, ivf_topk, lsh_bucketed_topk,
        pq_topk,
    )
    from clickhouse_clickhouse_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings").select("vec_id",
                                                       "embedding")
    q = (e.filter(F.col("vec_id") < N_QUERIES)
         .select(F.col("vec_id").alias("query_id"), "embedding"))
    exact = _topk_sets(brute_force_topk(e, q, k=K, query_id="query_id"))
    got = {
        "lsh": _topk_sets(lsh_bucketed_topk(
            e, q, k=K, bits=6, multiprobe=1, query_id="query_id")),
        "ivf": _topk_sets(ivf_topk(
            e, q, k=K, n_centroids=8, n_probe=2, query_id="query_id")),
        "pq": _topk_sets(pq_topk(
            e, q, k=K, m=8, codes=16, dim=64, query_id="query_id")),
        "ivfpq": _topk_sets(ivf_pq_topk(
            e, q, k=K, n_centroids=8, n_probe=3, m=8, codes=16, dim=64,
            query_id="query_id")),
        "pq_tuned": _topk_sets(pq_topk(
            e, q, k=K, m=16, codes=256, dim=64, iterations=2,
            normalize=True, rerank=20, query_id="query_id")),
        "ivfpq_tuned": _topk_sets(ivf_pq_topk(
            e, q, k=K, n_centroids=8, n_probe=4, m=16, codes=64, dim=64,
            iterations=3, normalize=True, rerank=40,
            query_id="query_id")),
    }
    rec = {"brute_force": 1.0}
    for kind, sets in got.items():
        hits = sum(len(exact[qid] & sets.get(qid, set())) for qid in exact)
        rec[kind] = round(hits / (len(exact) * K), 3)
    return rec


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.001",
                               "/root/testdata/sf0.01"]
    from clickhouse_clickhouse_spark.session import get_spark

    spark = get_spark("recall")
    per_sf = {d: measure(spark, d) for d in sf_dirs}

    head = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                          capture_output=True, text=True,
                          cwd=REPO).stdout.strip()
    lines = [
        "# RECALL.md — ANN recall trend record",
        "",
        f"Regenerated at HEAD {head} on "
        f"{datetime.date.today().isoformat()} "
        f"(k={K}, {N_QUERIES} fixed queries, deterministic seeds — "
        "identical code gives identical recall; any change is a real "
        "algorithm/parameter change).",
        "",
        "The registry ann_* queries hash-check the planted-duplicate "
        "recovery INVARIANT; this table tracks raw recall@k of the same "
        "parameterizations so retrieval-quality regressions are visible "
        "per round. The demo rows keep deliberately coarse parameters "
        "(16 PQ codes over 64 dims, 6-bit LSH) for contrast; the TUNED "
        "rows are the ship-quality configurations (round 10: "
        "unit-normalized inputs so L2 codebooks rank by cosine + "
        "exact-cosine re-rank of the ADC candidate set, the FAISS-refine "
        "/ upstream vector-index rescore step) and are hash-gated at "
        ">= 0.9 every round by ann_tuned_recall_gate.",
        "",
        "| variant | " + " | ".join(
            f"recall@{K} {os.path.basename(d)}" for d in sf_dirs) +
        " | correctness gate |",
        "|---|" + "---|" * (len(sf_dirs) + 1),
    ]
    for label, kw, gate in VARIANTS:
        kind = kw.get("kind", "brute_force")
        cells = " | ".join(f"{per_sf[d][kind]:.3f}" for d in sf_dirs)
        lines.append(f"| {label} | {cells} | {gate} |")
    lines += [
        "",
        "The TUNED rows keep their sf0.01 parameterization FIXED across "
        "columns by design, so the sf0.1 column shows the expected "
        "fixed-knob degradation (round-11 measurement: PQ rerank=20 "
        "falls from 1.000 to 0.800 recall@5 when the corpus grows 10x) "
        "— the production contract is the corpus-scaled knobs "
        "(rerank ~ n/1500, lists ~ sqrt(n)/16, probe ~ 3/8 lists) "
        "validated by tools/scale_ann.py, which holds recall@5 at "
        "1.000 (PQ) / 0.933 (IVF-PQ) at a 10x-sf0.1 (600k-vector) "
        "corpus; see SCALE.md round-11 section.",
        "",
    ]
    with open(os.path.join(REPO, "RECALL.md"), "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()

"""ANN 10x soak (round-11 verdict item 3): wall-clock scaling and
recall-holding of the TUNED ANN parameterizations at a 10x corpus.

The generic tools/scale_bench.py replication shifts KEY columns only,
which would leave every embedding with 10 IDENTICAL copies — exact
top-k then tie-breaks among copies and recall@k becomes meaningless.
Here each replica ROTATES the embedding array by `rep` positions
instead: distinct vectors, same coordinate distribution, same norms,
so brute-force truth is unambiguous and the recall measurement is
real.

Prints a SCALE.md-ready table: wall at sf0.1 vs 10x (ratio) for the
tuned PQ and IVF-PQ paths, plus recall@5 vs in-job brute force at BOTH
scales (gate: >= 0.9 at 10x, same bar as ann_tuned_recall_gate).

Usage: python tools/scale_ann.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from clickhouse_clickhouse_spark.session import get_spark  # noqa: E402
from clickhouse_clickhouse_spark.tables import load_table  # noqa: E402

REPS = 10
SHIFT = 10**8
K = 5
N_QUERIES = 3


def build(spark, src_sf: str, out_dir: str) -> str:
    dst = os.path.join(out_dir, "embeddings.parquet")
    if os.path.exists(dst):
        return out_dir
    base = load_table(spark, src_sf, "embeddings")
    dim = len(base.select("embedding").first()[0])
    parts = []
    for rep in range(REPS):
        d = base.withColumn("vec_id",
                            (F.col("vec_id") + rep * SHIFT).cast("long"))
        if rep:
            d = d.withColumn(
                "embedding",
                F.concat(F.slice("embedding", rep + 1, dim - rep),
                         F.slice("embedding", 1, rep)))
        parts.append(d)
    u = parts[0]
    for d in parts[1:]:
        u = u.unionByName(d)
    u.repartition(16).write.mode("overwrite").parquet(dst)
    print(f"built {dst}", flush=True)
    return out_dir


def _topk_sets(df):
    out: dict[int, set] = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["corpus_id"])
    return out


def knobs(n: int) -> dict:
    """Production knob scaling — single source of truth lives in
    pipeline/similarity.production_knobs (shared with the per-round
    ann_scaled_recall_gate so the soak and the gate check the same
    contract)."""
    from clickhouse_clickhouse_spark.pipeline.similarity import (
        production_knobs,
    )
    return production_knobs(n)


def measure(spark, sf_dir: str):
    from clickhouse_clickhouse_spark.pipeline.similarity import (
        brute_force_topk,
        ivf_pq_topk,
        pq_topk,
    )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id",
                                                       "embedding")
    q = (e.filter(F.col("vec_id") < N_QUERIES)
         .select(F.col("vec_id").alias("query_id"), "embedding"))
    kb = knobs(e.count())
    print(f"# {sf_dir}: knobs {kb}", flush=True)

    def timed(fn):
        best, sets = float("inf"), None
        for _ in range(2):
            t0 = time.perf_counter()
            sets = _topk_sets(fn())
            best = min(best, time.perf_counter() - t0)
        return best, sets

    t_bf, exact = timed(lambda: brute_force_topk(
        e, q, k=K, query_id="query_id"))
    t_pq, pq = timed(lambda: pq_topk(
        e, q, k=K, m=16, codes=256, dim=64, iterations=2,
        normalize=True, rerank=kb["rerank_pq"], query_id="query_id"))
    t_ivfpq, ivfpq = timed(lambda: ivf_pq_topk(
        e, q, k=K, n_centroids=kb["lists"], n_probe=kb["probe"], m=16,
        codes=64, dim=64, iterations=3, normalize=True,
        rerank=kb["rerank_ivfpq"], query_id="query_id"))

    def recall(sets):
        hits = sum(len(exact[qid] & sets.get(qid, set()))
                   for qid in exact)
        return hits / (len(exact) * K)

    return {
        "brute_force": (t_bf, 1.0),
        "pq_tuned": (t_pq, recall(pq)),
        "ivfpq_tuned": (t_ivfpq, recall(ivfpq)),
    }


def main() -> None:
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    big = os.environ.get("SPARK_GRAFT_ANN_DIR", "/tmp/scale10_ann")
    os.makedirs(big, exist_ok=True)
    spark = get_spark("scale-ann")
    build(spark, src, big)
    one = measure(spark, src)
    ten = measure(spark, big)
    print("| variant | sf0.1 wall | 10x wall | ratio | "
          "recall@5 sf0.1 | recall@5 10x |")
    print("|---|---|---|---|---|---|")
    ok = True
    for kind in ("brute_force", "pq_tuned", "ivfpq_tuned"):
        t1, r1 = one[kind]
        t10, r10 = ten[kind]
        print(f"| {kind} | {t1:.2f}s | {t10:.2f}s | {t10 / t1:.1f}x "
              f"| {r1:.3f} | {r10:.3f} |", flush=True)
        if kind != "brute_force" and r10 < 0.9:
            ok = False
    print(f"gate(recall@5 >= 0.9 at 10x): {'PASS' if ok else 'FAIL'}")
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()

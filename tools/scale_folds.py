"""Group-size soak for the dialect collect-fold statistical aggregates
(round-10 verdict item 3): the round-9 additions (entropy, cramersV,
theilsU, mannWhitneyUTest, kolmogorovSmirnovTest, welchTTest,
analysisOfVariance, weighted quantiles) are O(n log n) per-group folds
over ONE COLLECT_LIST per aggregate — reasoned linear in SCALE.md, here
MEASURED at 100x group sizes.

Fixture: 32 groups x 2,000 rows (base) vs 32 groups x 200,000 rows
(100x), deterministic hash-derived columns (no RNG — reproducible).
One Spark action per scale runs the whole family; prints wall times and
the 100x/base ratio (at-most-linear means ratio <= ~100, sort overhead
included). Also verifies the rankCorr O(n^2) guard RAISES at the big
group size instead of running quadratic.

Usage: python tools/scale_folds.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_clickhouse_spark.ch_sql import ch_sql  # noqa: E402
from clickhouse_clickhouse_spark.session import get_spark  # noqa: E402

GROUPS = 32
BASE_ROWS = 2_000
SCALE = 100

FOLD_SQL = """
SELECT g,
       welchTTest(v, b) AS wt,
       sparkbar(8)(k4, v) AS sb,
       largestTriangleThreeBuckets(20)(t, v) AS lt
FROM folds_src GROUP BY g
"""

# round 14 (verdict ask #6): maxIntersections left the collect
# envelope — the dialect form now resolves to the distributed interval
# sweep (explode + running window + group join, ch_sql._mxi_rewrite_
# select), same shape the operator layer always used. Soaked as its
# own batch: the join + explode double the exchanges, state per group
# is constant.
MXI_SQL = """
SELECT g,
       maxIntersections(v, v + 3.0) AS mi,
       maxIntersectionsPosition(v, v + 3.0) AS mip
FROM folds_src GROUP BY g
"""

# round 13: entropy + the contingency family + the RANK-based tests
# (mannWhitney, KS, rankCorr, ANOVA) left the collect-fold envelope
# (per-row contributions over injected window counts/ranks — see
# ch_sql._contingency_tpl/_mann_whitney_tpl/_rank_corr_tpl). They soak
# as their OWN batch measuring the window path; mixing window sort
# buffers with collect arrays overflowed the fixture heap (the same
# reason EMA_SQL is separate).
CNT_SQL = """
SELECT g,
       entropy(CAST(v * 100 AS INT) % 10) AS ent,
       cramersV(ca, cb) AS cv,
       theilsU(ca, cb) AS tu,
       contingency(ca, cb) AS cont,
       mannWhitneyUTest(v, b) AS mw,
       kolmogorovSmirnovTest(v, b) AS ks,
       rankCorr(v, v + b) AS rc,
       analysisOfVariance(v, k4) AS av,
       quantileExactWeighted(0.5)(v, w) AS qew,
       quantilesExactWeighted(0.25, 0.75)(v, w) AS qsew,
       quantileExactLow(0.5)(v) AS qlo,
       histogram(4)(v) AS hist,
       deltaSumTimestamp(v, t) AS dst
FROM folds_src GROUP BY g
"""

# round-12 addition, soaked as its OWN batch. Round 13: EMA/decayed
# left the collect-fold envelope entirely — the group-max anchor is a
# window MAX in an injected subquery and the aggregate is a plain SUM,
# so per-group state is CONSTANT at any skew (the soak now measures
# the two-phase path: one extra window exchange, no arrays).
EMA_SQL = """
SELECT g, exponentialMovingAverage(500)(v, t) AS ema,
       exponentialTimeDecayedAvg(500)(v, t) AS eda
FROM folds_src GROUP BY g
"""


def make_src(spark, rows_per_group: int, view: str) -> None:
    n = GROUPS * rows_per_group
    spark.sql(f"""
        SELECT id % {GROUPS} AS g,
               (PMOD(XXHASH64(id), 10000)) / 1000.0 AS v,
               CAST(PMOD(XXHASH64(id + 1), 2) AS INT) AS b,
               CAST(PMOD(XXHASH64(id + 2), 4) AS INT) AS k4,
               CHAR(97 + PMOD(XXHASH64(id + 3), 3)) AS ca,
               CHAR(120 + PMOD(XXHASH64(id + 4), 2)) AS cb,
               CAST(PMOD(XXHASH64(id + 5), 4) + 1 AS INT) AS w,
               id * 1.0 AS t
        FROM RANGE({n})
    """).createOrReplaceTempView(view)


def time_folds(spark, view: str, template: str = FOLD_SQL) -> float:
    best = float("inf")
    sql = template.replace("folds_src", view)
    for _ in range(2):
        t0 = time.perf_counter()
        # noop sink forces FULL evaluation of every aggregate column —
        # a bare .count() lets Catalyst prune the fold expressions out
        # of the Aggregate and measures nothing
        ch_sql(spark, sql).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = get_spark("scale-folds")
    spark.sparkContext.setLogLevel("ERROR")
    make_src(spark, BASE_ROWS, "folds_base")
    make_src(spark, BASE_ROWS * SCALE, "folds_big")
    t_base = time_folds(spark, "folds_base")
    t_big = time_folds(spark, "folds_big")
    print(f"| fold family batch | {GROUPS}x{BASE_ROWS} | "
          f"{GROUPS}x{BASE_ROWS * SCALE} | ratio |")
    print("|---|---|---|---|")
    print(f"| welch+sparkbar+LTTB (remaining collects) "
          f"| {t_base:.2f}s | {t_big:.2f}s | {t_big / t_base:.1f}x |",
          flush=True)
    m_base = time_folds(spark, "folds_base", MXI_SQL)
    m_big = time_folds(spark, "folds_big", MXI_SQL)
    print(f"| maxIntersections[Position] distributed sweep (r14) "
          f"| {m_base:.2f}s | {m_big:.2f}s | {m_big / m_base:.1f}x |",
          flush=True)
    c_base = time_folds(spark, "folds_base", CNT_SQL)
    c_big = time_folds(spark, "folds_big", CNT_SQL)
    print(f"| 13-stat window-path batch (r13) "
          f"| {c_base:.2f}s | {c_big:.2f}s | {c_big / c_base:.1f}x |",
          flush=True)
    e_base = time_folds(spark, "folds_base", EMA_SQL)
    e_big = time_folds(spark, "folds_big", EMA_SQL)
    print(f"| exponentialMovingAverage + TimeDecayedAvg (r12) "
          f"| {e_base:.2f}s | {e_big:.2f}s | {e_big / e_base:.1f}x |",
          flush=True)
    # rankCorr's former O(n^2) fold + 2000-row guard are GONE
    # (round 13: window-rank two-phase) — the 200k-row groups that used
    # to refuse now COMPUTE; time them
    t0 = time.perf_counter()
    ch_sql(spark, "SELECT g, rankCorr(v, v + b) AS rc "
                  "FROM folds_big GROUP BY g") \
        .write.format("noop").mode("overwrite").save()
    print(f"rankCorr at 200k-row groups (former refusal): "
          f"{time.perf_counter() - t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()

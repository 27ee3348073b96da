"""Grouped differential battery for the round-13 window-path
aggregates.

The whole-table brute-force (test_ch_sql) exercises the OVER ()
degenerate form of every injected window; this battery runs the same
migrated aggregates UNDER GROUP BY — the PARTITION BY path each marker
actually takes at scale — and checks every group against independent
python formulations on seeded data with planted ties."""

import collections
import math
import random

import pytest


def _avg_ranks(xs):
    return [(sum(1 for z in xs if z < x)
             + sum(1 for z in xs if z <= x) + 1) / 2 for x in xs]


@pytest.mark.parametrize("seed", [21, 22])
def test_grouped_window_stats_vs_python(spark, seed):
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    rng = random.Random(seed)
    rows = []
    for i in range(420):
        g = i % 4
        v = round(rng.uniform(0, 10), 1)   # 1 dp -> plenty of ties
        rows.append((i, g, v, rng.randint(0, 1), rng.randint(0, 2),
                     rng.randint(1, 4), float(i)))
    vals = ", ".join(f"({i}, {g}, {v}, {b}, {k}, {w}, {t})"
                     for i, g, v, b, k, w, t in rows)
    spark.sql(f"SELECT * FROM VALUES {vals} AS t(id, g, v, b, k, w, t)"
              ).createOrReplaceTempView(f"gw13_{seed}")
    out = {r.g: r for r in ch_sql(spark, f"""
        SELECT g,
               entropy(k) AS ent,
               cramersV(k, b) AS cv,
               theilsU(k, b) AS tu,
               mannWhitneyUTest(v, b) AS mw,
               kolmogorovSmirnovTest(v, b) AS ks,
               rankCorr(v, CAST(id AS Float64)) AS rc,
               analysisOfVariance(v, k) AS av,
               quantileExactWeighted(0.5)(v, w) AS qew,
               quantileExactLow(0.5)(v) AS qlo,
               deltaSumTimestamp(v, t) AS dst
        FROM gw13_{seed} GROUP BY g""").collect()}

    by_g = collections.defaultdict(list)
    for r in rows:
        by_g[r[1]].append(r)
    for g, grp in by_g.items():
        o = out[g]
        vs = [r[2] for r in grp]
        bs = [r[3] for r in grp]
        ks_ = [r[4] for r in grp]
        n = len(grp)

        cnt = collections.Counter(ks_)
        ent = -sum(c / n * math.log2(c / n) for c in cnt.values())
        assert abs(o.ent - ent) < 1e-9, (g, "entropy")

        oab = collections.Counter(zip(ks_, bs))
        oa = collections.Counter(ks_)
        ob = collections.Counter(bs)
        chi2 = sum((c - oa[a] * ob[b] / n) ** 2 / (oa[a] * ob[b] / n)
                   for (a, b), c in oab.items())
        cv = math.sqrt(chi2 / (n * min(len(oa) - 1, len(ob) - 1)))
        assert abs(o.cv - cv) < 1e-9, (g, "cramersV")
        ha = -sum(c / n * math.log2(c / n) for c in oa.values())
        hab = sum(c / n * math.log2(ob[b] / c)
                  for (a, b), c in oab.items())
        assert abs(o.tu - (ha - hab) / ha) < 1e-9, (g, "theilsU")

        ar = _avg_ranks(vs)
        n0 = sum(1 for b in bs if b == 0)
        n1 = n - n0
        s = sum(a for a, b in zip(ar, bs) if b == 0)
        u = s - n0 * (n0 + 1) / 2
        assert abs(o.mw.u_stat - u) < 1e-9, (g, "mw u")

        pts = sorted(set(vs))
        d = max(abs(sum(1 for v2, b in zip(vs, bs)
                        if b == 0 and v2 <= x) / n0
                    - sum(1 for v2, b in zip(vs, bs)
                          if b == 1 and v2 <= x) / n1) for x in pts)
        assert abs(o.ks.d_stat - d) < 1e-9, (g, "ks d")

        ids = [float(r[0]) for r in grp]
        rx, ry = _avg_ranks(vs), _avg_ranks(ids)
        mx, my = sum(rx) / n, sum(ry) / n
        cov = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
        rc = cov / math.sqrt(sum((a - mx) ** 2 for a in rx)
                             * sum((b - my) ** 2 for b in ry))
        assert abs(o.rc - rc) < 1e-9, (g, "rankCorr")

        gs = collections.defaultdict(list)
        for r in grp:
            gs[r[4]].append(r[2])
        kk = len(gs)
        tot = sum(vs)
        ss = sum(v2 * v2 for v2 in vs)
        ssb = sum(sum(x) ** 2 / len(x) for x in gs.values()) \
            - tot * tot / n
        sst = ss - tot * tot / n
        f = (ssb / (kk - 1)) / ((sst - ssb) / (n - kk))
        assert abs(o.av - f) < 1e-7, (g, "anova")

        pairs = sorted((r[2], r[5]) for r in grp)
        tw = sum(w for _, w in pairs)
        cum, ans = 0, None
        for v2, w in pairs:
            cum += w
            if ans is None and cum >= 0.5 * tw:
                ans = v2
        assert o.qew == ans, (g, "qew")

        sv = sorted(vs)
        assert o.qlo == sv[int(math.floor(0.5 * (n - 1)))], (g, "qlo")

        seq = sorted((r[6], r[2]) for r in grp)
        dst = sum(max(b2 - a2, 0)
                  for (_, a2), (_, b2) in zip(seq, seq[1:]))
        assert abs(o.dst - dst) < 1e-9, (g, "deltaSumTimestamp")


@pytest.mark.parametrize("seed", [31, 32])
def test_grouped_window_stats_skip_nulls(spark, seed):
    """Round-14 (ADVICE r13): the window-path rank/cumulative stats
    must SKIP rows with a NULL in either argument like upstream — the
    round-13 forms let window RANK/RANGE frames order NULLs first and
    hand them numeric ranks/cumulative weight. Plants ~15% NULLs per
    column independently and checks every group against python
    formulations computed over the valid rows only."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    rng = random.Random(seed)
    rows = []
    for i in range(360):
        g = i % 3

        def null_or(v):
            return None if rng.random() < 0.15 else v

        rows.append((i, g, null_or(round(rng.uniform(0, 10), 1)),
                     null_or(rng.randint(0, 1)),
                     null_or(rng.randint(0, 2)),
                     null_or(float(i))))
    vals = ", ".join(
        "({}, {}, {}, {}, {}, {})".format(
            *(("NULL" if v is None else v) for v in r)) for r in rows)
    spark.sql(
        f"SELECT id, g, CAST(v AS DOUBLE) AS v, CAST(b AS INT) AS b, "
        f"CAST(k AS INT) AS k, CAST(t AS DOUBLE) AS t "
        f"FROM VALUES {vals} AS t(id, g, v, b, k, t)"
    ).createOrReplaceTempView(f"gwn14_{seed}")
    out = {r.g: r for r in ch_sql(spark, f"""
        SELECT g,
               mannWhitneyUTest(v, b) AS mw,
               kolmogorovSmirnovTest(v, b) AS ks,
               rankCorr(v, t) AS rc,
               analysisOfVariance(v, k) AS av
        FROM gwn14_{seed} GROUP BY g""").collect()}

    by_g = collections.defaultdict(list)
    for r in rows:
        by_g[r[1]].append(r)
    for g, grp in by_g.items():
        o = out[g]

        vb = [(r[2], r[3]) for r in grp
              if r[2] is not None and r[3] is not None]
        vs = [v for v, _ in vb]
        bs = [b for _, b in vb]
        ar = _avg_ranks(vs)
        n0 = sum(1 for b in bs if b == 0)
        n1 = len(vb) - n0
        s = sum(a for a, b in zip(ar, bs) if b == 0)
        u = s - n0 * (n0 + 1) / 2
        assert abs(o.mw.u_stat - u) < 1e-9, (g, "mw u, nulls skipped")

        d = max(abs(sum(1 for v2, b in vb if b == 0 and v2 <= x) / n0
                    - sum(1 for v2, b in vb if b == 1 and v2 <= x) / n1)
                for x in sorted(set(vs)))
        assert abs(o.ks.d_stat - d) < 1e-9, (g, "ks d, nulls skipped")

        vt = [(r[2], r[5]) for r in grp
              if r[2] is not None and r[5] is not None]
        rx = _avg_ranks([v for v, _ in vt])
        ry = _avg_ranks([t for _, t in vt])
        n = len(vt)
        mx, my = sum(rx) / n, sum(ry) / n
        cov = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
        rc = cov / math.sqrt(sum((a - mx) ** 2 for a in rx)
                             * sum((b - my) ** 2 for b in ry))
        assert abs(o.rc - rc) < 1e-9, (g, "rankCorr, nulls skipped")

        gs = collections.defaultdict(list)
        for r in grp:
            if r[2] is not None and r[4] is not None:
                gs[r[4]].append(r[2])
        av_vs = [v for xs in gs.values() for v in xs]
        n = len(av_vs)
        kk = len(gs)
        tot = sum(av_vs)
        ss = sum(v2 * v2 for v2 in av_vs)
        ssb = sum(sum(x) ** 2 / len(x) for x in gs.values()) \
            - tot * tot / n
        sst = ss - tot * tot / n
        f = (ssb / (kk - 1)) / ((sst - ssb) / (n - kk))
        assert abs(o.av - f) < 1e-7, (g, "anova, nulls skipped")


@pytest.mark.parametrize("seed", [71])
def test_categorical_iv_vs_python(spark, seed):
    """categoricalInformationValue (round-14 refusal conversion):
    per-group IV vs an independent python formulation, with planted
    NULL category and NULL tag rows that must be skipped."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    rng = random.Random(seed)
    rows = [(i, i % 3, rng.randint(0, 2), rng.randint(0, 1))
            for i in range(240)]
    rows += [(900, 0, None, 1), (901, 1, 2, None), (902, 2, None, None)]
    vals = ", ".join(
        "({}, {}, {}, {})".format(
            *(("NULL" if v is None else v) for v in r)) for r in rows)
    spark.sql(
        f"SELECT id, g, CAST(c AS INT) AS c, CAST(t AS INT) AS t "
        f"FROM VALUES {vals} AS t(id, g, c, t)"
    ).createOrReplaceTempView(f"civ14_{seed}")
    out = {r.g: r.iv[0] for r in ch_sql(spark, f"""
        SELECT g, categoricalInformationValue(c, t) AS iv
        FROM civ14_{seed} GROUP BY g""").collect()}

    by_g = collections.defaultdict(list)
    for _, g, c, t in rows:
        if c is not None and t is not None:
            by_g[g].append((c, t))
    for g, pairs in by_g.items():
        yy = sum(t for _, t in pairs)
        nn = len(pairs) - yy
        cats = collections.defaultdict(lambda: [0, 0])
        for c, t in pairs:
            cats[c][t] += 1
        exp = sum((n1 / yy - n0 / nn) * math.log((n1 / yy) / (n0 / nn))
                  for n0, n1 in cats.values())
        assert abs(out[g] - exp) < 1e-9, (g, out[g], exp)

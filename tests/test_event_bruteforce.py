"""Adversarial brute-force differentials for the round-8 event folds.

The sequenceMatch time-guard DP fold and the windowFunnel re-arm fold
are the subtlest SQL in the dialect; this suite checks them against
EXHAUSTIVE python enumeration on seeded random event histories (ties,
overlapping conditions, boundary gaps included). All cases per battery
execute as ONE Spark action: each case is a group key in a single
query, so 150+ cases cost one job.
"""

from __future__ import annotations

import random

SEED = 8008


def _gen_cases(n_cases: int, rnd: random.Random):
    """(case_id, [(t_seconds, bitmask), ...]) with 2 conditions,
    timestamps in [0, 100] with deliberate ties and duplicate rows."""
    cases = []
    for cid in range(n_cases):
        n = rnd.randint(0, 8)
        evs = []
        for _ in range(n):
            t = rnd.choice([0, 1, 5, 10, 11, 50, 99, 100])
            bm = rnd.randint(0, 3)      # both conditions can co-fire
            evs.append((t, bm))
        cases.append((cid, evs))
    return cases


# --- brute-force linear-pattern matcher (independent formulation) -----

def _match_assignments(evs, steps):
    """Yield tuples of event indices (one per step) satisfying the
    pattern: monotone positions, adjacency = consecutive position in
    the CONDITION-event list, (?t op N) guards on adjacent steps."""
    order = sorted(range(len(evs)), key=lambda j: (evs[j][0], evs[j][1]))
    seq = [(evs[j][0], evs[j][1]) for j in order if evs[j][1] != 0]

    def ok_guard(g, gap):
        if g is None:
            return True
        op, n = g
        return {"<": gap < n, "<=": gap <= n,
                ">": gap > n, ">=": gap >= n}[op]

    def rec(si, prev_pos, acc):
        if si == len(steps):
            yield tuple(acc)
            return
        st = steps[si]
        if st["sep"] == "adj" and si > 0:
            rng = [prev_pos + 1] if prev_pos + 1 < len(seq) else []
        else:
            rng = range(prev_pos + 1, len(seq))
        for j in rng:
            t, bm = seq[j]
            if not (bm >> (st["n"] - 1)) & 1:
                continue
            if si > 0 and not ok_guard(st["guard"], t - seq[prev_pos][0]):
                continue
            yield from rec(si + 1, j, acc + [j])

    yield from rec(0, -1, [])


def _brute_seq_match(evs, steps):
    return next(iter(_match_assignments(evs, steps)), None) is not None


def _brute_seq_count(evs, steps):
    """Non-overlapping earliest-completion counting: repeatedly take
    the match with the smallest end position, drop everything up to
    that end, recurse — the reference's scan-and-restart discipline."""
    order = sorted(range(len(evs)), key=lambda j: (evs[j][0], evs[j][1]))
    seq = [(evs[j][0], evs[j][1]) for j in order if evs[j][1] != 0]
    cnt, start = 0, 0
    while True:
        best_end = None
        sub = seq[start:]
        for asg in _match_assignments(
                [(t, bm) for t, bm in sub], steps):
            end = asg[-1]
            if best_end is None or end < best_end:
                best_end = end
        if best_end is None:
            return cnt
        cnt += 1
        start += best_end + 1


def _brute_funnel_level(evs, k_steps, win, strict_increase=False):
    """The upstream single-slot per-level algorithm, directly (the
    fold's independence is in the SQL expression, not the algorithm;
    default-mode equivalence to exists-subsequence is asserted
    separately below)."""
    order = sorted(evs, key=lambda e: (e[0], e[1]))
    starts = [None] * k_steps
    lasts = [None] * k_steps
    for t, i in order:
        if i == 1:
            starts[0] = t
            lasts[0] = t
        elif starts[i - 2] is not None and t <= starts[i - 2] + win \
                and (not strict_increase or t > lasts[i - 2]):
            starts[i - 1] = starts[i - 2]
            lasts[i - 1] = t
    lvl = 0
    for s in starts:
        if s is None:
            break
        lvl += 1
    return lvl


def _brute_funnel_exists(evs, k_steps, win):
    """Default-mode independent formulation: max L with a monotone (by
    (t, step) sort order) subsequence step1..stepL whose last event is
    within win of its first."""
    order = sorted(evs, key=lambda e: (e[0], e[1]))

    def reach(level):
        def rec(si, prev_pos, first_t):
            if si == level:
                return True
            for j in range(prev_pos + 1, len(order)):
                t, i = order[j]
                if i != si + 1:
                    continue
                if si > 0 and t > first_t + win:
                    continue
                if rec(si + 1, j, t if si == 0 else first_t):
                    return True
            return False

        return rec(0, -1, None)

    lvl = 0
    for level in range(1, k_steps + 1):
        if reach(level):
            lvl = level
    return lvl


_PATTERNS = [
    ("(?1)(?2)", "p_adj"),
    ("(?1).*(?2)", "p_star"),
    ("(?1)(?t<=10)(?2)", "p_adj_le10"),
    ("(?1)(?t>40)(?2)", "p_adj_gt40"),
    ("(?1).*(?t>=50)(?2)", "p_star_ge50"),
    ("(?1).*(?t<5)(?2)", "p_star_lt5"),
    ("(?2)(?t<50)(?1)", "p_rev_lt50"),
    ("(?1)(?t<=10)(?2).*(?t>=1)(?1)", "p_three"),
]


def _parse(pattern):
    from clickhouse_clickhouse_spark.ch_sql import (
        _parse_sequence_pattern,
    )

    steps, _ = _parse_sequence_pattern(pattern, 2)
    return steps


def test_sequence_time_fold_vs_bruteforce(spark):
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    rnd = random.Random(SEED)
    cases = _gen_cases(150, rnd)
    rows = [(cid, t, bool(bm & 1), bool(bm & 2))
            for cid, evs in cases for t, bm in evs]
    if not rows:
        rows = [(0, 0, False, False)]
    spark.createDataFrame(
        [(c, float(t), a, b) for c, t, a, b in rows],
        "cid int, tsec double, a boolean, b boolean") \
        .selectExpr("cid", "timestamp_seconds(tsec) AS ts", "a", "b") \
        .createOrReplaceTempView("bf_seq")
    cols = []
    for pat, alias in _PATTERNS:
        cols.append(f"sequenceMatch('{pat}')(ts, a, b) AS m_{alias}")
        cols.append(f"sequenceCount('{pat}')(ts, a, b) AS c_{alias}")
    got = {r.cid: r for r in ch_sql(
        spark, f"SELECT cid, {', '.join(cols)} FROM bf_seq "
               "GROUP BY cid").collect()}
    bad = []
    for cid, evs in cases:
        if cid not in got:       # empty case emitted no rows
            continue
        for pat, alias in _PATTERNS:
            steps = _parse(pat)
            em = _brute_seq_match(evs, steps)
            ec = _brute_seq_count(evs, steps)
            gm = got[cid][f"m_{alias}"]
            gc = got[cid][f"c_{alias}"]
            if bool(gm) != em or gc != ec:
                bad.append((cid, pat, evs, (gm, gc), (em, ec)))
    assert not bad, f"{len(bad)} mismatches; first 3: {bad[:3]}"


def test_funnel_fold_vs_bruteforce(spark):
    """The dialect windowFunnel fold vs (a) the upstream single-slot
    algorithm in python and (b), for default mode, the independent
    exists-subsequence formulation — validating the re-arm dominance
    argument on adversarial tie/boundary histories."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    rnd = random.Random(SEED + 1)
    cases = []
    for cid in range(150):
        n = rnd.randint(0, 8)
        evs = [(rnd.choice([0, 1, 5, 10, 11, 50, 99, 100]),
                rnd.randint(1, 3)) for _ in range(n)]
        cases.append((cid, evs))
    rows = [(cid, float(t), i) for cid, evs in cases for t, i in evs]
    if not rows:
        rows = [(0, 0.0, 1)]
    spark.createDataFrame(rows, "cid int, tsec double, i int") \
        .selectExpr("cid", "timestamp_seconds(tsec) AS ts", "i") \
        .createOrReplaceTempView("bf_fun")
    got = {r.cid: (r.d, r.si) for r in ch_sql(spark, """
        SELECT cid,
               windowFunnel(20)(ts, i = 1, i = 2, i = 3) AS d,
               windowFunnel(20, 'strict_increase')(ts, i = 1, i = 2,
                                                   i = 3) AS si
        FROM bf_fun GROUP BY cid""").collect()}
    bad = []
    for cid, evs in cases:
        if cid not in got:
            continue
        ed = _brute_funnel_level(evs, 3, 20)
        ei = _brute_funnel_level(evs, 3, 20, strict_increase=True)
        ex = _brute_funnel_exists(evs, 3, 20)
        gd, gi = got[cid]
        if gd != ed or gi != ei or gd != ex:
            bad.append((cid, evs, (gd, gi), (ed, ei, ex)))
    assert not bad, f"{len(bad)} mismatches; first 3: {bad[:3]}"


_PATTERNS_12 = [
    ("(?1)(?12)", "hi_adj"),
    ("(?5).*(?11)", "hi_star"),
    ("(?9)(?10)(?11)(?12)", "hi_chain"),
    ("(?12)(?t<=10)(?3)", "hi_guard_le"),
    ("(?2).*(?t>=50)(?10)", "hi_guard_ge"),
]


def test_sequence_12cond_vs_bruteforce(spark):
    """Round 9: the widened token alphabet's HIGH bits (conditions
    9-12, beyond the old 8-condition cap) verified against the same
    independent brute-force enumerations on seeded random histories
    with 12 co-firing conditions. One Spark action for all cases."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    K = 12
    rnd = random.Random(SEED + 9)
    cases = []
    for cid in range(60):
        n = rnd.randint(0, 10)
        evs = [(rnd.choice([0, 1, 5, 10, 11, 50, 99, 100]),
                rnd.randint(0, (1 << K) - 1)) for _ in range(n)]
        cases.append((cid, evs))
    rows = [(cid, float(t), *(bool(bm >> i & 1) for i in range(K)))
            for cid, evs in cases for t, bm in evs]
    if not rows:
        rows = [(0, 0.0, *([False] * K))]
    schema = "cid int, tsec double, " + \
        ", ".join(f"c{i} boolean" for i in range(K))
    spark.createDataFrame(rows, schema) \
        .selectExpr("cid", "timestamp_seconds(tsec) AS ts",
                    *[f"c{i}" for i in range(K)]) \
        .createOrReplaceTempView("bf_seq12")
    conds = ", ".join(f"c{i}" for i in range(K))
    cols = []
    for pat, alias in _PATTERNS_12:
        cols.append(f"sequenceMatch('{pat}')(ts, {conds}) AS m_{alias}")
        cols.append(f"sequenceCount('{pat}')(ts, {conds}) AS c_{alias}")
    got = {r.cid: r for r in ch_sql(
        spark, f"SELECT cid, {', '.join(cols)} FROM bf_seq12 "
               "GROUP BY cid").collect()}
    from clickhouse_clickhouse_spark.ch_sql import (
        _parse_sequence_pattern,
    )
    bad = []
    for cid, evs in cases:
        if cid not in got:
            continue
        for pat, alias in _PATTERNS_12:
            steps, _ = _parse_sequence_pattern(pat, K)
            em = _brute_seq_match(evs, steps)
            ec = _brute_seq_count(evs, steps)
            gm, gc = got[cid][f"m_{alias}"], got[cid][f"c_{alias}"]
            if bool(gm) != em or gc != ec:
                bad.append((cid, pat, evs, (gm, gc), (em, ec)))
    assert not bad, f"{len(bad)} mismatches; first 3: {bad[:3]}"


_PATTERNS_28 = [
    ("(?1)(?28)", "lo_hi"),
    ("(?17).*(?25)", "hi_star"),
    ("(?26)(?27)(?28)", "top_chain"),
    ("(?28)(?t<=10)(?20)", "hi_guard_le"),
    ("(?18).*(?t>=50)(?24)", "hi_guard_ge"),
]


def test_sequence_28cond_vs_bruteforce(spark):
    """Round 9: hex-oct tokens lift the cap to 32 (upstream parity).
    Conditions 17-28 — beyond the previous 16-condition cap — verified
    against the same independent brute-force enumerations on seeded
    random histories with 28 co-firing conditions. One Spark action."""
    from clickhouse_clickhouse_spark.ch_sql import (
        _parse_sequence_pattern,
        ch_sql,
    )

    K = 28
    rnd = random.Random(SEED + 28)
    cases = []
    for cid in range(40):
        n = rnd.randint(0, 10)
        evs = [(rnd.choice([0, 1, 5, 10, 11, 50, 99, 100]),
                rnd.randint(0, (1 << K) - 1)) for _ in range(n)]
        cases.append((cid, evs))
    rows = [(cid, float(t), *(bool(bm >> i & 1) for i in range(K)))
            for cid, evs in cases for t, bm in evs]
    schema = "cid int, tsec double, " + \
        ", ".join(f"c{i} boolean" for i in range(K))
    spark.createDataFrame(rows, schema) \
        .selectExpr("cid", "timestamp_seconds(tsec) AS ts",
                    *[f"c{i}" for i in range(K)]) \
        .createOrReplaceTempView("bf_seq28")
    conds = ", ".join(f"c{i}" for i in range(K))
    cols = []
    for pat, alias in _PATTERNS_28:
        cols.append(f"sequenceMatch('{pat}')(ts, {conds}) AS m_{alias}")
        cols.append(f"sequenceCount('{pat}')(ts, {conds}) AS c_{alias}")
    got = {r.cid: r for r in ch_sql(
        spark, f"SELECT cid, {', '.join(cols)} FROM bf_seq28 "
               "GROUP BY cid").collect()}
    bad = []
    for cid, evs in cases:
        if cid not in got:
            continue
        for pat, alias in _PATTERNS_28:
            steps, _ = _parse_sequence_pattern(pat, K)
            em = _brute_seq_match(evs, steps)
            ec = _brute_seq_count(evs, steps)
            gm, gc = got[cid][f"m_{alias}"], got[cid][f"c_{alias}"]
            if bool(gm) != em or gc != ec:
                bad.append((cid, pat, evs, (gm, gc), (em, ec)))
    assert not bad, f"{len(bad)} mismatches; first 3: {bad[:3]}"

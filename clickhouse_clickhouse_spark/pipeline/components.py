"""Connected components over a candidate-pair graph — the step that turns
near-duplicate PAIRS (MinHash/LSH/embedding buckets) into duplicate
CLUSTERS so a pipeline can keep one canonical document per cluster.

Min-label propagation: every node starts labeled with its own id; each
iteration replaces a node's label with the minimum label in its
neighborhood (one hash-shuffle join + one aggregate per iteration — no
driver-side graph). Converges in O(component diameter) iterations;
near-dup clusters are dense and shallow, so a handful of rounds closes
them. The per-iteration driver traffic is ONE scalar (did-anything-change
count with an early-exit limit), and lineage is truncated with
localCheckpoint every few rounds so 100-iteration worst cases don't build
mile-long plans.

This mirrors what the reference-ecosystem dedup jobs do after LSH
banding; Spark-side it is the classic iterative-algorithm shape (compare
GraphX CC, re-expressed in plain DataFrame ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str, dst: str,
                         max_iter: int = 25) -> DataFrame:
    """Labels every node that appears in ``edges`` with the minimum node
    id reachable from it. Returns (node, component). Node ids must be
    orderable (the min id becomes the cluster's canonical id).

    The symmetrized edge list is materialized ONCE up front — edges
    usually arrive as a lazily-defined LSH/banding join, and without it
    every iteration would re-execute that join from scratch. It is
    PERSISTED (not localCheckpoint'ed) pre-partitioned and pre-sorted on
    the per-iteration join key: InMemoryRelation keeps the child's
    outputPartitioning/ordering, so every propagation round's edge-side
    Exchange AND Sort vanish from the plan, while PySpark's
    localCheckpoint scan reports UnknownPartitioning and re-shuffles the
    whole edge list every round (plan-verified, optimization round 14;
    persist is also eviction-safe where a localCheckpoint block is not
    recomputable). Each iteration's RESULT stays localCheckpoint'ed —
    that one must cut the growing lineage, and the convergence probe
    and the next iteration share its materialization (on a real cluster
    swap it for a reliable checkpoint dir; the pattern is identical)."""
    sym = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .unionByName(edges.select(F.col(dst).alias("a"),
                                     F.col(src).alias("b")))
           .distinct()
           .repartition("b")
           .sortWithinPartitions("b")
           .persist())
    lbl = (sym.select(F.col("a").alias("n")).distinct()
           .withColumn("lbl", F.col("n")))
    for _ in range(max_iter):
        nbr = (sym.join(lbl.select(F.col("n").alias("b"),
                                   F.col("lbl").alias("lbl_b")), "b")
               .groupBy("a").agg(F.min("lbl_b").alias("nbr_min")))
        # LAZY localCheckpoint + a full-scan probe count: the ONE probe
        # job computes every partition, which materializes the local
        # checkpoint as a side effect (localCheckpoint is persist-based;
        # lineage is truncated once all partitions are cached at job
        # end). The former eager=True + limit(1).count() pair was 2 jobs
        # per round for the same bytes (optimization round 15, guide §7
        # — job-submission latency; the r14 report's open item 5).
        stepped = (lbl.join(nbr, lbl["n"] == nbr["a"], "left")
                   .select(lbl["n"],
                           lbl["lbl"].alias("old"),
                           F.least(lbl["lbl"],
                                   F.coalesce(F.col("nbr_min"),
                                              lbl["lbl"])).alias("lbl"))
                   .localCheckpoint(eager=False))
        # one bounded scalar per iteration: is any label still shrinking?
        if stepped.filter(F.col("lbl") < F.col("old")).count() == 0:
            sym.unpersist()   # round-15 advice: don't leak the edge cache
            return stepped.select("n", "lbl")
        lbl = stepped.select("n", "lbl")
    sym.unpersist()
    raise RuntimeError(
        f"label propagation did not converge in {max_iter} iterations — "
        f"the graph has a component with diameter > {max_iter} (e.g. a "
        f"long chain). Use connected_components_star (O(log n) rounds, "
        f"diameter-independent) for such topologies.")


def dedup_keep_canonical(df: DataFrame, id_col: str,
                         pairs: DataFrame, pair_src: str,
                         pair_dst: str) -> DataFrame:
    """End-to-end near-dup removal: cluster the candidate pairs, then keep
    only rows that are their cluster's canonical (minimum) id — rows not
    in any pair survive untouched (left join, label null)."""
    comp = connected_components(pairs, pair_src, pair_dst)
    return (df.join(comp, df[id_col] == comp["n"], "left")
            .filter(F.col("lbl").isNull() | (df[id_col] == F.col("lbl")))
            .drop("n", "lbl"))


def connected_components_star(edges: DataFrame, src: str, dst: str,
                              max_iter: int = 40) -> DataFrame:
    """Connected components by alternating Large-Star / Small-Star
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    converges in O(log n) rounds regardless of component DIAMETER, where
    plain min-label propagation needs O(diameter) rounds (a long chain
    graph defeats it). Use this for adversarial topologies; the
    label-propagation variant stays the default for shallow near-dup
    clusters (fewer shuffles per round).

    Large-Star: every node u links its larger neighbors to
    m = min(N(u) ∪ {u}). Small-Star: links its smaller-or-self closure to
    the local min. The edge set contracts to a star per component whose
    center is the component minimum. Returns (n, lbl) for every node.
    """
    E = (edges.select(F.col(src).cast("long").alias("u"),
                      F.col(dst).cast("long").alias("v"))
         .filter(F.col("u") != F.col("v")).distinct()
         .localCheckpoint(eager=True))
    isolated = None  # all input nodes appear in E (self-loops dropped)
    for _ in range(max_iter):
        # ---- large star
        sym = E.unionByName(E.select(F.col("v").alias("u"),
                                     F.col("u").alias("v")))
        mins = (sym.groupBy("u").agg(F.min("v").alias("mn"))
                .select("u", F.least("mn", "u").alias("m")))
        e1 = (sym.join(mins, "u").filter(F.col("v") > F.col("u"))
              .select(F.col("v").alias("u"), F.col("m").alias("v"))
              .filter(F.col("u") != F.col("v")).distinct())
        # ---- small star
        sym1 = e1.unionByName(e1.select(F.col("v").alias("u"),
                                        F.col("u").alias("v")))
        lt = sym1.filter(F.col("v") < F.col("u"))
        mins2 = lt.groupBy("u").agg(F.min("v").alias("m"))
        e2 = (lt.join(mins2, "u")
              .select(F.col("v").alias("u"), F.col("m").alias("v"))
              .unionByName(mins2.select("u", F.col("m").alias("v")))
              .filter(F.col("u") != F.col("v")).distinct()
              .localCheckpoint(eager=True))
        same = (e2.count() == E.count()
                and e2.exceptAll(E).limit(1).count() == 0)
        E = e2
        if same:
            break
    else:
        # round-14 review: falling through silently returned a possibly
        # multi-labeled edge set (a node under several 'canonicals');
        # the sibling connected_components raises on non-convergence —
        # match it
        raise RuntimeError(
            f"connected_components_star: no fixpoint after {max_iter} "
            f"rounds — raise max_iter")
    roots = E.select(F.col("v").alias("n")).distinct() \
             .withColumn("lbl", F.col("n"))
    members = E.select(F.col("u").alias("n"), F.col("v").alias("lbl"))
    return members.unionByName(roots).distinct()

"""Graph centrality over relationship pairs — PageRank ([EXT];
Brin & Page, "The Anatomy of a Large-Scale Hypertextual Web Search
Engine", WWW 1998 — public algorithm).

Training-data pipelines use link-derived centrality as a quality
signal (crawl frontiers weight pages by rank; near-dup graphs use it
to pick the canonical representative of a connected cluster). The
repo's pair-producing operators (MinHash/SimHash/SRP candidates,
winnowing passage overlap, `ngram_jaccard_pairs`) all emit exactly the
edge shape this consumes, and `duplicate_clusters` already walks the
same graphs for components — PageRank adds the "which node matters
most" ordering within them.

Spark-first shape (100 TB posture): per iteration ONE equi-join of
edges against current ranks (shuffles 8-byte ids + one double, never
payloads) and one groupBy(dst) sum with map-side combine; the dangling
mass is a 1-row aggregate broadcast back (never an unpartitioned
window). Lineage is cut each round with `localCheckpoint` exactly like
`duplicate_clusters`, so the plan does not grow with iterations.
Undirected inputs: pass both orientations (as `duplicate_clusters`
does) — the math is plain directed PageRank either way.

Determinism: pure arithmetic on a fixed edge set — reproducible to
float-summation order; contract outputs round to 6 places (the repo's
standard float-stability discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    n_iter: int = 10,
) -> DataFrame:
    """Ranks over the directed edge list: returns (id, rank).

    Standard damped PageRank with dangling-mass redistribution: nodes
    without out-edges donate their rank uniformly, so Σ rank == 1 every
    iteration (asserted cheaply in tests, not at runtime).
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0,1), got {damping}")
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # out-degree joins into the node table ONCE and rides along in every
    # round's checkpointed state: the old loop re-aggregated out_deg and
    # re-joined it twice per round (once for the dangling mass, once for
    # the contributions) — 4 joins + 2 aggregates per round become 2
    # joins, and the dangling mass is a map-only filter over the
    # checkpointed state (guide §2.4: establish a keying once). 0 marks
    # a dangling node (no out-edges), exactly the rows the old left-join
    # left NULL.
    deg = (
        nodes.join(out_deg, nodes.id == out_deg.src, "left")
        .select(
            "id", F.coalesce(F.col("out_deg"), F.lit(0)).alias("out_deg")
        )
        .localCheckpoint(eager=True)
    )
    ranks = deg.select("id", F.lit(1.0 / n).alias("rank"), "out_deg")
    for _ in range(n_iter):
        # dangling mass: ranks of nodes with no out-edges (1-row aggregate)
        dangling = ranks.filter(F.col("out_deg") == 0).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dang")
        )
        contribs = (
            e.join(ranks, e.src == ranks.id)
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            deg.join(contribs, "id", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.col("dang") / F.lit(float(n)))
                ).alias("rank"),
                "out_deg",
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("id", "rank")


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-vertex triangle participation + local clustering coefficient.

    Compact-forward / degree-ordering triangle enumeration (Latapy,
    TCS 2008; the MapReduce formulation is Suri & Vassilvitskii,
    WWW 2011 — public algorithms): orient every canonical edge from its
    lower-(degree, id) endpoint to the higher one, enumerate wedges at
    each vertex's out-neighborhood, and close them with one equi-join
    against the directed edge set. Each triangle is found exactly once
    (at its lowest-rank vertex).

    Scale shape (100 TB posture): three keyed shuffles — the degree
    aggregate, the wedge self-join on the owning vertex, and the closing
    (t2, t3) equi-join. Degree-ordering is the load-balancing move: a
    vertex only enumerates pairs among HIGHER-rank neighbors, so wedge
    fan-out per vertex is bounded by O(sqrt(m)) on any graph (the
    classic O(m^1.5) total-work bound) — without it one celebrity vertex
    would enumerate deg² wedges. The per-vertex counts are
    ordering-invariant, so an oracle may verify with the simple
    u < v < w id-ordered join.

    Returns (id, degree, n_triangles, clustering) where clustering =
    2·T / (deg·(deg−1)) — both operands exact integers, so the double is
    bit-identical in any engine — and NULL for degree < 2.
    """
    # e is referenced by deg + ed, deg by ed + the output join, d by both
    # wedge sides + the closing join — without lineage cuts Spark would
    # recompute the (possibly expensive) edge-producing upstream for
    # EVERY reference (~7x: measured 97 exchanges on the dup-graph
    # contract). localCheckpoint materializes the id-sized edge/degree
    # tables once, the same pattern pagerank and duplicate_clusters use.
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("u").alias("id"))
        .unionAll(e.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
        .localCheckpoint(eager=True)
    )
    ed = e.join(
        deg.select(F.col("id").alias("u"), F.col("degree").alias("du")), "u"
    ).join(deg.select(F.col("id").alias("v"), F.col("degree").alias("dv")), "v")
    lower_u = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    d = ed.select(
        F.when(lower_u, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lower_u, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(lower_u, F.col("dv")).otherwise(F.col("du")).alias("db"),
    ).localCheckpoint(eager=True)
    x, y = d.alias("x"), d.alias("y")
    rank_lt = (F.col("x.db") < F.col("y.db")) | (
        (F.col("x.db") == F.col("y.db")) & (F.col("x.b") < F.col("y.b"))
    )
    wedges = x.join(y, (F.col("x.a") == F.col("y.a")) & rank_lt).select(
        F.col("x.a").alias("t1"),
        F.col("x.b").alias("t2"),
        F.col("y.b").alias("t3"),
    )
    tri = wedges.join(
        d.select(F.col("a").alias("t2"), F.col("b").alias("t3")), ["t2", "t3"]
    )
    tcounts = (
        tri.select(F.col("t1").alias("id"))
        .unionAll(tri.select(F.col("t2").alias("id")))
        .unionAll(tri.select(F.col("t3").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    out = deg.join(tcounts, "id", "left")
    t = F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long")
    return out.select(
        "id",
        "degree",
        t.alias("n_triangles"),
        F.when(
            F.col("degree") >= 2,
            (2.0 * t) / (F.col("degree") * (F.col("degree") - F.lit(1))),
        ).alias("clustering"),
    )


def label_propagation(
    edges: DataFrame,
    n_iter: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan,
    Albert & Kumara 2007, public): labels start as node ids; each round
    every node adopts the label most frequent among its in-neighbors,
    ties broken by the SMALLEST label. The synchronous schedule plus the
    deterministic tie-break make the fixed-round result reproducible
    (async LPA's randomized order is what this trades away), so the
    DuckDB oracle can unroll the identical rounds.

    Differs from connected components (``dedup.duplicate_clusters``'s
    min-label propagation): LPA splits a component into densely-linked
    communities — on a near-dup graph, template FAMILIES rather than
    reachability blobs.

    Scale shape: per round ONE edges⋈labels equi-join + a
    (node, label)-keyed count + a per-node argmax window (partitioned by
    node — no global window); labels checkpoint each round so the plan
    stays round-count-independent. Returns (id, label).
    """
    from pyspark.sql import Window

    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = nodes.select("id", F.col("id").alias("label"))
    for _ in range(n_iter):
        nbr = (
            e.join(labels, e.src == labels.id)
            .select(F.col("dst").alias("id"), "label")
            .groupBy("id", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.partitionBy("id").orderBy(F.col("c").desc(), F.col("label").asc())
        new = (
            nbr.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select("id", "label")
        )
        # isolated nodes (none in an undirected pair graph) keep their label
        labels = (
            nodes.join(new.withColumnRenamed("label", "_nl"), "id", "left")
            .select("id", F.coalesce(F.col("_nl"), F.col("id")).alias("label"))
            .localCheckpoint(eager=True)
        )
    return labels

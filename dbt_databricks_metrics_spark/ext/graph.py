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
    ranks = nodes.select("id", F.lit(1.0 / n).alias("rank")).localCheckpoint(
        eager=True
    )
    for _ in range(n_iter):
        with_deg = ranks.join(out_deg, ranks.id == out_deg.src, "left")
        # dangling mass: ranks of nodes with no out-edges (1-row aggregate)
        dangling = with_deg.filter(F.col("out_deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dang")
        )
        contribs = (
            e.join(ranks, e.src == ranks.id)
            .join(out_deg, "src")
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.join(contribs, "id", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.col("dang") / F.lit(float(n)))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks

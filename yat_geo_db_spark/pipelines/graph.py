"""Graph centrality for source/domain authority scoring.

RefinedWeb/FineWeb-style pipelines use link-graph centrality as a
quality prior for URL/source filtering; this module provides a
deterministic distributed PageRank whose every arithmetic step is
engine-portable (fixed-point sums, per-row IEEE ops), so a DuckDB
oracle replays it bit-for-bit.

Scale shape per iteration: ONE equi-join of the rank vector against the
edge list on src + ONE groupBy(dst) aggregation — both shuffles keyed on
node id, AQE-splittable on power-law hubs — plus a one-row dangling-mass
aggregate broadcast back. Nothing is O(V²); the only driver sync is the
per-iteration lineage checkpoint (same pattern as kmeans / connected
components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from yat_geo_db_spark.relational.queries import dsum

#: fixed-point scale for rank-mass sums. 10^12 keeps ~1e-12 resolution;
#: dsum accumulates as DECIMAL(38,0) (HUGEINT in the DuckDB mirror), and
#: per-row scaled values are bounded by rank ≤ 1 → ≤ 10^12, so the sum
#: only nears the accumulator limit beyond ~10^26 rows — no practical
#: overflow at any graph size.
PAGERANK_SCALE = 12


def pagerank(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    n_iter: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    scale: int = PAGERANK_SCALE,
    checkpoint: bool = True,
) -> DataFrame:
    """Deterministic PageRank: rank_{k+1}(v) = (1-d)/N + d·(Σ_{u→v}
    rank_k(u)/outdeg(u) + dangling_mass_k/N). Returns (node, rank) after
    `n_iter` rounds from the uniform start.

    Engine-portable by construction: the two mass sums (per-dst
    contributions, dangling mass) go through `dsum` fixed-point
    accumulation (partition-order-independent), and every remaining op
    is a per-row IEEE double op both engines execute identically — the
    DuckDB oracle unrolls the same iterations and matches bit-for-bit.

    `nodes` (one column named `node_col`) fixes the node universe;
    defaults to distinct src ∪ dst of the edge list. Dangling nodes
    (no out-edges) redistribute their mass uniformly — the standard
    correction, exercised whenever `nodes` includes sinks.

    `checkpoint=False` skips the per-iteration lineage cut — results are
    identical; used by the plan-shape test to make the FULL iteration
    lineage inspectable (the checkpoint truncates the visible plan to a
    scan) and reasonable for small graphs where re-execution on failure
    is cheaper than checkpoint I/O."""
    e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
    if nodes is None:
        nodes = (
            e.select(F.col("_src").alias(node_col))
            .union(e.select(F.col("_dst").alias(node_col)))
            .distinct()
        )
    nd = nodes.select(F.col(node_col).alias("_node"))
    n_frame = F.broadcast(nd.agg(F.count(F.lit(1)).alias("_n")))
    outdeg = e.groupBy("_src").agg(F.count(F.lit(1)).alias("_deg"))
    # the dangling SET is static — resolve it once into a carried flag
    # (one anti-join total) so each round's dangling mass is a plain
    # filter + aggregate instead of a fresh anti-join of V against E
    ranks = (
        nd.join(outdeg, nd["_node"] == outdeg["_src"], "left")
        .crossJoin(n_frame)
        .select(
            "_node",
            "_n",
            F.col("_deg").isNull().alias("_dangling"),
            (F.lit(1.0) / F.col("_n").cast("double")).alias("_r"),
        )
    )

    for _ in range(n_iter):
        contrib = (
            e.join(ranks.select("_node", "_r"), e["_src"] == F.col("_node"))
            .join(outdeg, "_src")
            .groupBy("_dst")
            .agg(dsum(F.col("_r") / F.col("_deg").cast("double"), scale)
                 .alias("_c"))
        )
        dangling = F.broadcast(
            ranks.filter(F.col("_dangling"))
            .agg(F.coalesce(dsum(F.col("_r"), scale), F.lit(0.0)).alias("_dm"))
        )
        ranks = (
            ranks.select("_node", "_n", "_dangling")
            .join(contrib, ranks["_node"] == contrib["_dst"], "left")
            .crossJoin(dangling)
            .select(
                "_node",
                "_n",
                "_dangling",
                (
                    F.lit(1.0 - damping) / F.col("_n").cast("double")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("_c"), F.lit(0.0))
                        + F.col("_dm") / F.col("_n").cast("double")
                    )
                ).alias("_r"),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select(
        F.col("_node").alias(node_col), F.col("_r").alias("rank")
    )

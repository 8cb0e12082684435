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
    # the edge⋈outdeg frame is static across rounds — resolve it once
    # (lazily checkpointed) instead of re-scanning the edges and
    # re-aggregating/joining the degree table inside every round: a
    # round becomes ONE equi-join + one groupBy(dst), with the same
    # per-row _r/_deg division through the same dsum (bit-identical)
    e_deg = e.join(outdeg, "_src")
    if checkpoint:
        # EAGER: a lazily-checkpointed join materializing inside the
        # first round's job measured 6-12x slower in a cold JVM
        # (bench isolated re-measure) than paying one explicit
        # materialization job here; eager is also the repo-wide default
        e_deg = e_deg.localCheckpoint()
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
            e_deg.join(
                ranks.select("_node", "_r"),
                F.col("_src") == F.col("_node"),
            )
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


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst",
    persist: bool = True,
) -> DataFrame:
    """Per-node triangle participation counts (node, n_tri) over an
    undirected view of the edge list — the clustering-structure signal
    link-graph quality scoring uses next to PageRank (spam farms are
    triangle-poor; organic communities triangle-rich).

    Degree-oriented wedge join (the MapReduce-classic answer to 'the
    curse of the last reducer'): canonicalize to undirected (a<b)
    edges, orient every edge from its lower-(degree, id) endpoint to
    the higher, generate wedges only at each node's oriented
    out-neighbors, and close them against the canonical edge set. Each
    triangle is found EXACTLY once (at its minimum-(degree, id) apex).
    Orientation bounds oriented out-degree by O(sqrt(m)), so the wedge
    self-join is O(m^1.5) total work spread evenly across keys — a
    power-law hub with degree d contributes O(d) oriented wedges, not
    O(d^2), which is what makes this survive a web-scale graph where
    the naive neighbor-pair join dies on the top hub. Every step is an
    equi-join or hash aggregate; integer-only arithmetic → the DuckDB
    oracle matches exactly.

    With ``persist=True`` (default) the canonical and oriented edge
    lists stay pinned in executor storage AFTER the result is consumed
    (Spark offers no consume-then-unpersist hook on a lazy frame) —
    long-lived sessions calling this repeatedly should
    ``spark.catalog.clearCache()`` between calls (bench.py does), or
    pass ``persist=False`` and accept the recomputation.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    if persist:
        # und feeds the degree count, the orientation join, AND the
        # wedge-closure probe; oriented feeds BOTH sides of the wedge
        # self-join. Aliased sides defeat ReusedExchange (the band-table
        # lesson from dedup), so without pinning, the canonicalize+
        # distinct shuffle re-runs ~4× and the orientation join twice.
        # Pass persist=False where a visible plan matters (plan tests).
        und = und.persist()
        und.count()
    deg = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("db"))
    # a < b, so on a degree tie the id order keeps orientation acyclic
    low_first = F.col("da") <= F.col("db")
    oriented = (
        und.join(da, "a").join(db, "b")
        .select(
            F.when(low_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(low_first, F.col("b")).otherwise(F.col("a")).alias("w"),
        )
    )
    if persist:
        oriented = oriented.persist()
        oriented.count()
    o1 = oriented.select(F.col("u"), F.col("w").alias("v1"))
    o2 = oriented.select(F.col("u"), F.col("w").alias("v2"))
    wedges = o1.join(o2, "u").filter(F.col("v1") < F.col("v2"))
    tris = wedges.join(
        und,
        (wedges["v1"] == und["a"]) & (wedges["v2"] == und["b"]),
    ).select("u", "v1", "v2")
    members = (
        tris.select(F.col("u").alias("node"))
        .unionAll(tris.select(F.col("v1").alias("node")))
        .unionAll(tris.select(F.col("v2").alias("node")))
    )
    return members.groupBy("node").agg(F.count(F.lit(1)).alias("n_tri"))


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    nodes: DataFrame | None = None,
    n_iter: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    scale: int = PAGERANK_SCALE,
    checkpoint: bool = True,
) -> DataFrame:
    """Personalized (topic-sensitive) PageRank: the teleport lands on
    the SEED set instead of uniformly — rank_{k+1}(v) = (1−d)·p(v) +
    d·(Σ_{u→v} rank_k(u)/outdeg(u) + dangling_mass_k·p(v)), with
    p(v) = 1/|S| for seeds, 0 otherwise, starting from p. The
    authority-relative-to-a-trusted-set scorer (TrustRank-style seed
    quality propagation: score every source by its link proximity to a
    hand-vetted allowlist).

    Same per-iteration scale shape as pagerank (one equi-join + one
    groupBy(dst) dsum + a broadcast 1-row dangling mass); the seed flag
    and p(v) are resolved ONCE into carried columns (one broadcast
    semi-join total). Deterministic and engine-portable for the same
    reasons — every p(v) use is a multiplication by the same carried
    double, mirrored in the unrolled-CTE oracle. Mass conserves:
    teleport + dangling both re-inject through p, so seed-relative
    scores sum to 1 (up to fixed-point resolution)."""
    e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
    if nodes is None:
        nodes = (
            e.select(F.col("_src").alias(node_col))
            .union(e.select(F.col("_dst").alias(node_col)))
            .distinct()
        )
    nd = nodes.select(F.col(node_col).alias("_node"))
    # Restrict seeds to the node universe BEFORE counting |S|: a seed id
    # absent from the graph would otherwise inflate the 1/|S| divisor
    # while its teleport share is never assigned to any node, deflating
    # Σrank below 1. Broadcast the (tiny) seed set into a streamed pass
    # over the universe — no shuffle of nd.
    sd = seeds.select(F.col(node_col).alias("_seed")).distinct()
    sd = (
        nd.join(F.broadcast(sd), nd["_node"] == sd["_seed"], "inner")
        .select("_seed")
        .distinct()
    )
    s_frame = F.broadcast(sd.agg(F.count(F.lit(1)).alias("_ns")))
    outdeg = e.groupBy("_src").agg(F.count(F.lit(1)).alias("_deg"))
    # static edge⋈outdeg frame, resolved once per call (see pagerank;
    # eager for the same cold-JVM reason)
    e_deg = e.join(outdeg, "_src")
    if checkpoint:
        e_deg = e_deg.localCheckpoint()
    ranks = (
        nd.join(outdeg, nd["_node"] == outdeg["_src"], "left")
        .join(
            F.broadcast(sd.withColumn("_is_seed", F.lit(True))),
            nd["_node"] == sd["_seed"],
            "left",
        )
        .crossJoin(s_frame)
        .select(
            "_node",
            F.col("_deg").isNull().alias("_dangling"),
            F.when(
                F.coalesce(F.col("_is_seed"), F.lit(False)),
                F.lit(1.0) / F.col("_ns").cast("double"),
            ).otherwise(F.lit(0.0)).alias("_p"),
        )
        .withColumn("_r", F.col("_p"))
    )

    for _ in range(n_iter):
        contrib = (
            e_deg.join(
                ranks.select("_node", "_r"),
                F.col("_src") == F.col("_node"),
            )
            .groupBy("_dst")
            .agg(dsum(F.col("_r") / F.col("_deg").cast("double"), scale)
                 .alias("_c"))
        )
        dangling = F.broadcast(
            ranks.filter(F.col("_dangling"))
            .agg(F.coalesce(dsum(F.col("_r"), scale), F.lit(0.0)).alias("_dm"))
        )
        ranks = (
            ranks.select("_node", "_dangling", "_p")
            .join(contrib, ranks["_node"] == contrib["_dst"], "left")
            .crossJoin(dangling)
            .select(
                "_node",
                "_dangling",
                "_p",
                (
                    F.lit(1.0 - damping) * F.col("_p")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("_c"), F.lit(0.0))
                        + F.col("_dm") * F.col("_p")
                    )
                ).alias("_r"),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select(
        F.col("_node").alias(node_col), F.col("_r").alias("rank")
    )


def k_core(
    edges: DataFrame,
    k: int = 2,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 8,
) -> DataFrame:
    """The k-core of the undirected graph: the maximal subgraph where
    every node keeps degree ≥ k — the degeneracy peel that separates a
    link graph's dense communities from its tendrils (spam chains and
    scraped-nav link tails peel away; organically-linked cores stay).
    Returns (node, deg) with each survivor's degree INSIDE the core.

    Iterative peel: each round computes degrees in the remaining
    subgraph (one explode + map-side-combinable count), drops nodes
    under k, and keeps only edges with both endpoints alive (two
    semi-joins). Early-stops at the fixpoint (a one-count driver probe
    per round, same cadence as pagerank's checkpoint); `max_rounds`
    bounds pathological peel cascades (a path graph peels one layer
    per round) and is part of the result's CONTRACT — the oracle
    unrolls exactly max_rounds, and post-fixpoint rounds are no-ops,
    so early-stopped and fully-unrolled agree whenever the peel
    converges within the bound."""
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    alive = und
    n_edges = alive.count()
    for _ in range(max_rounds):
        deg = (
            alive.select(F.col("a").alias("v"))
            .unionAll(alive.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("v").localCheckpoint()
        alive = (
            alive.join(keep, alive["a"] == keep["v"], "left_semi")
            .join(keep, alive["b"] == keep["v"], "left_semi")
            .localCheckpoint()
        )
        n_now = alive.count()
        if n_now == n_edges:
            break
        n_edges = n_now
    return (
        alive.select(F.col("a").alias("v"))
        .unionAll(alive.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
        .filter(F.col("deg") >= k)
        .select(F.col("v").alias("node"), "deg")
    )


def label_propagation(
    edges: DataFrame,
    n_iter: int = 4,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """Deterministic synchronous label propagation (Raghavan et al. '07)
    over the undirected edge set: every node starts labeled with its own
    id; each round it adopts the label most frequent among its
    neighbors, ties broken by MIN label — no RNG, no asynchronous visit
    order, so the community assignment is replayable and
    oracle-unrollable. Densely-linked groups converge onto one label in
    a few rounds; the synchronous variant can oscillate on bipartite
    structures (the classic LPA caveat), which bounded n_iter turns
    into a deterministic fixed cost rather than a hang.

    Scale shape per round: one equi-join of the O(m) adjacency against
    the O(n) label frame, a map-side-combinable (node, label) count,
    and an argmax via ONE max(struct(cnt, -label)) aggregate — never a
    per-node sort. localCheckpoint per round cuts the iterative
    lineage. Self-loops are dropped; isolated nodes never appear in
    the adjacency and keep no row (community of one — join them back
    from your node universe if you need them listed)."""
    numeric = ("int", "bigint", "smallint", "tinyint", "long", "double", "float")
    dtypes = dict(edges.dtypes)
    for c in (src, dst):
        if not dtypes[c].startswith(numeric):
            raise ValueError(
                f"label_propagation needs NUMERIC node ids (the min-label "
                f"tie-break uses arithmetic negation inside max(struct)); "
                f"column {c!r} is {dtypes[c]!r} — dictionary-encode string "
                f"ids first (e.g. via a row_number index)"
            )
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).where(
        F.col(src) != F.col(dst)
    )
    adj = (
        und.select(F.col("a").alias("v"), F.col("b").alias("u"))
        .union(und.select(F.col("b").alias("v"), F.col("a").alias("u")))
        .distinct()
    )
    if checkpoint:
        # the adjacency is static across rounds — cut its lineage once
        # so each round reads the materialized table instead of
        # re-running the union+distinct shuffles (2 exchanges/round on
        # a frame the rounds never change); labels init shares it.
        # EAGER (repo default): lazy materialization inside the first
        # round's job measured 6-12x slower in a cold JVM
        adj = adj.localCheckpoint()
    labels = adj.select("v").distinct().select(
        "v", F.col("v").alias("lbl")
    )
    for _ in range(n_iter):
        nbr = adj.join(
            labels.withColumnRenamed("v", "u"), "u"
        ).select("v", "lbl")
        counts = nbr.groupBy("v", "lbl").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        labels = counts.groupBy("v").agg(
            F.max(
                F.struct(
                    F.col("cnt").alias("cnt"),
                    (-F.col("lbl")).alias("neg"),
                )
            ).alias("m")
        ).select("v", (-F.col("m.neg")).alias("lbl"))
        if checkpoint:
            labels = labels.localCheckpoint(eager=False)
    return labels.select(
        F.col("v").alias("node"), F.col("lbl").alias("label")
    )

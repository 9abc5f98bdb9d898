"""Distributed connected components for duplicate-cluster assignment.

Near-dup pair generation (MinHash-LSH / n-gram Jaccard / SimHash, see
llm/dedup.py) emits *edges*; deduplication needs *clusters* — every doc
labeled with a canonical component id so one representative per component
survives. This is the step the reference pipeline has no analogue for (its
dedup is key-equality only, e.g. aci-mailchimp-sync upsert keys in
db/src/user.rs); it is required the moment "duplicate" is a similarity
relation, which is not transitive — A~B and B~C does not imply A~C, so
groupBy on any single key under-merges and only a graph closure is correct.

Algorithm: iterative min-label propagation ("hash-to-min" family,
Rastogi et al., "Finding Connected Components in Map-Reduce in Logarithmic
Rounds"). Every node starts labeled with its own id; each round every node
takes the min of its label and its neighbors' labels; fixed point = every
node carries the min id of its component, which is the component id.

Scale design (the 100 TB contract):
- each round is ONE shuffle-join (edges ⋈ labels on dst) + ONE groupBy —
  both partition by node id, and AQE coalesces/skew-splits them;
- labels are `localCheckpoint()`-ed per round: iterative DataFrame loops
  otherwise re-derive the whole lineage each round (plan grows O(rounds²))
  — truncation is what GraphFrames/GraphX do between Pregel supersteps;
- rounds needed = graph diameter. Near-dup clusters are small and dense
  (diameter ≤ a few hops), so propagation converges in single-digit rounds;
  for adversarial long-path graphs the large-star/small-star variant
  converges in O(log n) rounds at the cost of re-keying edges every round —
  not worth it for dedup graphs, documented here as the escape hatch;
- convergence detection exploits monotonicity: labels only ever DECREASE,
  so the label sum strictly decreases every round until the fixed point —
  one scalar aggregation per round (which also materializes that round's
  checkpoint), instead of a join-and-count of changed rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    node_col: str | None = None,
    max_iter: int = 25,
) -> DataFrame:
    """Label every node with its component id (the MIN node id reachable).

    `edges` is an undirected pair list (each pair listed once is enough).
    `nodes` (optional, column `node_col`) adds isolated nodes — docs with no
    duplicate edge — which come back labeled with themselves, so the result
    is a total (node → cluster) assignment over the corpus.

    Returns a DataFrame (node, component), one row per node.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # symmetrize once so each round's neighbor-min sees both directions;
    # pre-partition on the join key BEFORE the checkpoint: LogicalRDD
    # preserves the hash partitioning, so when labels outgrow the broadcast
    # threshold the per-round join shuffles only the label table — the edge
    # table (the big side at scale) never moves again
    sym = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .repartition(F.col("b"))
        .localCheckpoint()
    )
    # Iterate ONLY over edge-endpoint nodes. On a deduplicated corpus the
    # edge graph is a small fraction of the node set (most docs have no
    # near-dup), so folding isolated nodes in before the loop would make
    # every propagation round shuffle a corpus-sized label table for
    # nothing — at 100 TB that is billions of rows per round vs the edge
    # graph's millions. Isolated nodes join in ONCE at the end, labeled
    # with themselves.
    lab = sym.select(F.col("a").alias("node")).distinct()
    labels = lab.select("node", F.col("node").alias("component")).localCheckpoint()
    prev_sum = None

    for _ in range(max_iter):
        # one round = ONE join + ONE aggregate: neighbor labels and own
        # labels union before a single min-groupBy, instead of a
        # neighbor-min groupBy followed by a second own-label join
        neigh = sym.join(labels.withColumnRenamed("node", "b"), on="b").select(
            F.col("a").alias("node"), "component"
        )
        new_labels = (
            neigh.union(labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=False)
        )
        # labels only decrease, so an unchanged sum IS the fixed point; the
        # agg action doubles as the (lazy) checkpoint materializer — one
        # Spark job per round, not an eager-checkpoint job plus the agg
        cur_sum = new_labels.agg(F.sum("component")).collect()[0][0]
        labels = new_labels
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    if nodes is not None:
        nc = node_col or src
        all_nodes = nodes.select(F.col(nc).alias("node")).distinct()
        labels = all_nodes.join(labels, on="node", how="left").select(
            "node", F.coalesce("component", "node").alias("component")
        )
    return labels


def canonical_per_component(
    df: DataFrame,
    components: DataFrame,
    id_col: str,
    order_by: list,
) -> DataFrame:
    """Keep ONE representative row per component: join the component
    assignment back to the corpus and take the window argmin under
    `order_by` (e.g. quality-descending with id tie-break). Adds
    `cluster_size` so downstream stages can weight/inspect collapsed mass.
    One shuffle (window by component); the join is on the corpus key."""
    from pyspark.sql import Window

    with_comp = df.join(
        components.withColumnRenamed("node", id_col), on=id_col
    )
    w = Window.partitionBy("component").orderBy(*order_by)
    ws = Window.partitionBy("component")
    return (
        with_comp.withColumn("__rn", F.row_number().over(w))
        .withColumn("cluster_size", F.count(F.lit(1)).over(ws))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def triangle_counts(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node triangle counts over an undirected graph — the clustering /
    community-density primitive next to :func:`connected_components`.

    Uses the standard oriented-edge trick: edges are canonicalized to
    (lo < hi), so each triangle {a<b<c} is materialized exactly once as the
    path a→b→c closed by a→c — two equi-joins, no permutation blowup, no
    post-hoc division by 6. At scale the join keys are node ids; skew
    follows degree (a celebrity node fans out), which is the documented
    reason production triangle counting pre-sorts by degree — the
    lowest-degree endpoint orientation drops worst-case join volume from
    O(Σd²) on hot nodes to O(m^1.5). Here the id orientation keeps the
    oracle trivially replayable; swap the orientation key for the degree
    rank when the graph has power-law hubs.

    Returns (node, triangles) for every node that appears in ≥1 edge
    (nodes in no triangle report 0).
    """
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("lo"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
        # three consumers (two wedge sides + the closing probe) — persist
        # the canonicalized edge set once
        .persist()
    )
    wedge = (
        e.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
        .join(
            e.select(F.col("lo").alias("b"), F.col("hi").alias("c")),
            on="b",
        )
    )
    tri = wedge.join(
        e.select(F.col("lo").alias("a"), F.col("hi").alias("c")),
        on=["a", "c"],
    )
    per_corner = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    nodes = e.select(F.col("lo").alias("node")).union(
        e.select(F.col("hi").alias("node"))
    ).distinct()
    return nodes.join(per_corner, on="node", how="left").select(
        "node", F.coalesce("triangles", F.lit(0)).alias("triangles")
    )


PAGERANK_SCALE = 1_000_000_000


def pagerank_fixed_point(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 10,
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """PageRank with FIXED-POINT integer arithmetic — every rank is an
    integer in units of 1/PAGERANK_SCALE, updates use only integer
    multiply/divide, so ranks are bit-identical across engines and runs
    (float PageRank sums in partition order and never replays exactly).
    Damping is the rational `damping_num/damping_den`; a fixed iteration
    count keeps the driver loop free of convergence collects.

    Undirected interpretation: each edge contributes both directions.
    Per round: one groupBy(dst) of the contribution stream joined back to
    the node table — the labels are `localCheckpoint`ed per round like
    :func:`connected_components`, so plan depth stays constant in the
    iteration count. Dangling mass (nodes with no outgoing edges) cannot
    occur in the undirected view; integer-division remainders are dropped
    deterministically (both the distributed and the reference
    implementation lose the same ulps).
    """
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    directed = e.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
        e.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    ).persist()
    nodes = directed.select(F.col("src").alias("node")).distinct().persist()
    n_nodes = nodes.count()
    deg = directed.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))

    base = PAGERANK_SCALE * (damping_den - damping_num) // (damping_den * n_nodes)
    init = PAGERANK_SCALE // n_nodes
    ranks = nodes.select("node", F.lit(init).cast("long").alias("rank"))
    out_edges = directed.join(deg, on="src").persist()

    for _ in range(iterations):
        contrib = (
            out_edges.join(ranks.withColumnRenamed("node", "src"), on="src")
            .select(
                F.col("dst").alias("node"),
                # share = damping * rank / deg — `div`, NOT `/`: float
                # division of 10-digit ints can land 1 ulp off the exact
                # integer quotient and break bit-replayability
                F.expr(
                    f"(rank * {damping_num}) div ({damping_den} * __deg)"
                ).alias("__share"),
            )
        )
        summed = contrib.groupBy("node").agg(F.sum("__share").alias("__in"))
        ranks = (
            nodes.join(summed, on="node", how="left")
            .select(
                "node",
                (F.lit(base) + F.coalesce("__in", F.lit(0))).cast("long").alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks

"""Distributed connected components for duplicate-cluster assignment.

Near-dup pair generation (MinHash-LSH / n-gram Jaccard / SimHash, see
llm/dedup.py) emits *edges*; deduplication needs *clusters* — every doc
labeled with a canonical component id so one representative per component
survives. This is the step the reference pipeline has no analogue for (its
dedup is key-equality only, e.g. aci-mailchimp-sync upsert keys in
db/src/user.rs); it is required the moment "duplicate" is a similarity
relation, which is not transitive — A~B and B~C does not imply A~C, so
groupBy on any single key under-merges and only a graph closure is correct.

Algorithm: alternating LARGE-STAR / SMALL-STAR contraction (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014 — the published
MapReduce CC used at web scale). Each large-star step hangs every node's
larger neighbors off the minimum of its neighborhood; each small-star step
hangs the node and its smaller neighbors off that minimum. Both steps
preserve connectivity, and their joint fixed point is exactly a forest of
stars rooted at each component's minimum id — which IS the component
labeling. Convergence is O(log² n) rounds REGARDLESS of graph shape.

Plain min-label propagation (the textbook alternative) needs diameter
rounds, and a low-threshold similarity graph chains into sprawling
components whose diameter grows with corpus size — measured: the SemDeDup
pair graph at sf0.1 exceeds 25 propagation hops, so a diameter-bound loop
either truncates (silently wrong labels) or runs unboundedly long. The
star algorithm's round count is scale-safe by construction, and the edge
list *shrinks* toward the star forest as it converges, so later rounds get
cheaper rather than replaying the full graph.

Scale design (the 100 TB contract):
- each star step is one groupBy(center).min + one equi-join back on the
  center — both partition by node id, and AQE coalesces/skew-splits them;
  no step ever materializes anything larger than the current edge list;
- the edge list is `localCheckpoint()`-ed per round: iterative DataFrame
  loops otherwise re-derive the whole lineage each round (plan grows
  O(rounds²)) — truncation is what GraphFrames/GraphX do between Pregel
  supersteps;
- convergence detection: the round function is deterministic, so an
  unchanged edge multiset IS the fixed point — checked with an
  order-independent signature (count + sum of a 64-bit pair hash), one
  scalar aggregation per round that doubles as the checkpoint
  materializer. Non-convergence within max_iter raises instead of
  returning silently-wrong labels (25 rounds covers graphs far beyond any
  physical corpus: rounds grow with log², not diameter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from aci_export_spark.artifacts import persist_tracked


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    node_col: str | None = None,
    max_iter: int = 25,
    bounded_edges: int = 200_000,
) -> DataFrame:
    """Label every node with its component id (the MIN node id reachable).

    `edges` is an undirected pair list (each pair listed once is enough).
    `nodes` (optional, column `node_col`) adds isolated nodes — docs with no
    duplicate edge — which come back labeled with themselves, so the result
    is a total (node → cluster) assignment over the corpus.

    Returns a DataFrame (node, component), one row per node.

    SIZE-CONDITIONED single-task fast path (``bounded_edges``, the
    pagerank/kcore ``bounded`` discipline made runtime-adaptive): the
    first checkpoint already observes the exact deduped edge count, and
    when it is at most ``bounded_edges`` (default 200k pairs — a few MB
    in one task, far below any executor's memory) the labeling runs as
    ONE union-find pass in a single Arrow task instead of O(log² n)
    star-contraction rounds, each of which costs a full job barrier
    (checkpoint + shuffle) — pure scheduling overhead on a small edge
    list, ~10× the single-task wall at bench scale. Both paths compute
    the identical function — every node labeled with the minimum node id
    reachable from it (star contraction converges to min-rooted stars;
    union-find labels each set with its minimum member) — asserted
    equal on randomized graphs by tests/test_graph_cc.py. Above the
    gate, the distributed contraction proceeds unchanged, so corpus-scale
    similarity graphs never serialize through one task.
    """
    # checkpointed (with its signature) by the observed-checkpoint below
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )

    def _neighborhood(cur: DataFrame) -> DataFrame:
        # (center u, neighbor v) over both orientations — each star step
        # reads every edge from both endpoints' perspective
        return cur.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
            cur.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )

    from pyspark.sql import Window

    # m(u) is computed as a window min over the neighborhood partitioned by
    # the center — ONE shuffle per star step (the window's partitioning)
    # instead of a groupBy + join-back pair; the filter/select above the
    # window stays in the same stage. Dedup happens once per round (in
    # small-star), not per step: duplicate edges inflate one step's rows at
    # most 2× and min() is duplicate-invariant.
    _w = Window.partitionBy("u")

    def _large_star(cur: DataFrame) -> DataFrame:
        # hang every LARGER neighbor of u off m(u) = min(N(u) ∪ {u})
        nbrs = _neighborhood(cur)
        return (
            nbrs.withColumn("__m", F.least(F.min("v").over(_w), F.col("u")))
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("__m").alias("b"))
            .filter(F.col("a") != F.col("b"))
        )

    def _small_star(cur: DataFrame) -> DataFrame:
        # orient each edge toward its larger endpoint, then hang u and all
        # its SMALLER neighbors off m(u) = min of those neighbors
        sm = (
            _neighborhood(cur)
            .filter(F.col("v") < F.col("u"))
            .withColumn("__m", F.min("v").over(_w))
        )
        attach_nbrs = sm.select(F.col("v").alias("a"), F.col("__m").alias("b"))
        attach_self = sm.select(F.col("u").alias("a"), F.col("__m").alias("b"))
        return (
            attach_nbrs.union(attach_self)
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    # order-independent edge-multiset signature: the round function is
    # deterministic, so signature equality across a round certifies the
    # fixed point (star forest) without a sorted compare. The signature is
    # attached via observe() so the per-round eager checkpoint is ALSO the
    # metric collection — one Spark job per round, no separate agg scan.
    # decimal(38,0) sum: ANSI mode throws on long overflow, and a sum of
    # 64-bit hashes overflows almost surely at any real edge count.
    from pyspark.sql import Observation

    def _observed_checkpoint(cur: DataFrame):
        obs = Observation()
        ckpt = cur.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")).alias("h"),
        ).localCheckpoint(eager=True)
        sig = obs.get
        return ckpt, (sig["n"], sig["h"])

    e, prev_sig = _observed_checkpoint(e)
    if 0 < prev_sig[0] <= bounded_edges:
        labels = _cc_labels_single_task(e)
        if nodes is not None:
            nc = node_col or src
            all_nodes = nodes.select(F.col(nc).alias("node")).distinct()
            labels = all_nodes.join(labels, on="node", how="left").select(
                "node", F.coalesce("component", "node").alias("component")
            )
        return labels
    converged = prev_sig[0] == 0
    for _ in range(max_iter):
        if converged:
            break
        e, sig = _observed_checkpoint(_small_star(_large_star(e)))
        if sig == prev_sig:
            converged = True
        prev_sig = sig
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds — "
            "silently truncated labels would be wrong; raise max_iter"
        )

    # the fixed point is a star forest: every non-root node carries exactly
    # the edge (node, root); roots and isolated nodes label themselves
    labels = e.select(F.col("a").alias("node"), F.col("b").alias("component"))
    roots = e.select(F.col("b").alias("node")).distinct().join(
        labels.select("node"), on="node", how="left_anti"
    ).select("node", F.col("node").alias("component"))
    labels = labels.unionByName(roots)
    if nodes is not None:
        nc = node_col or src
        all_nodes = nodes.select(F.col(nc).alias("node")).distinct()
        labels = all_nodes.join(labels, on="node", how="left").select(
            "node", F.coalesce("component", "node").alias("component")
        )
    return labels


def _cc_labels_single_task(e: DataFrame) -> DataFrame:
    """(node, component=min reachable id) for every edge-touched node, as
    ONE union-find pass over a size-gated edge list (columns a, b) in a
    single Arrow task — the bounded fast path of
    :func:`connected_components`. Path-halving find; after all unions the
    component label is the minimum member of each set, which is exactly
    the star-contraction fixed point's labeling. Output column types
    mirror the edge columns so both paths are schema-identical."""
    dt = e.schema["a"].dataType.simpleString()

    def uf(batches):
        import pandas as pd

        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for pdf in batches:
            for a, b in zip(pdf["a"], pdf["b"]):
                if a not in parent:
                    parent[a] = a
                if b not in parent:
                    parent[b] = b
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[ra] = rb
        comp_min: dict = {}
        for v in parent:
            r = find(v)
            m = comp_min.get(r)
            if m is None or v < m:
                comp_min[r] = v
        nodes = list(parent)
        yield pd.DataFrame(
            {"node": nodes, "component": [comp_min[find(v)] for v in nodes]}
        )

    return e.coalesce(1).mapInPandas(uf, schema=f"node {dt}, component {dt}")


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
    e = persist_tracked(
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("lo"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
        # three consumers (two wedge sides + the closing probe) — persist
        # the canonicalized edge set once (tracked: released at the next
        # registered-query boundary)
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


def partitioned_components(
    edges: DataFrame,
    part_col: str,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Connected components for a graph whose edges PROVABLY never cross
    ``part_col`` groups — e.g. SemDeDup cosine pairs, which exist only
    within one quantizer cell by construction. Under that precondition the
    global component structure decomposes exactly into per-group
    structure, so no iterative star rounds are needed at all: one shuffle
    partitions edges by group, and a single union-find pass per group
    labels every touched node with its component minimum — the same
    min-id labels :func:`connected_components` converges to.

    Scale shape: groups are bounded (a quantizer cell holds ~constant
    vectors because cell COUNT grows with the corpus, never cell size),
    so per-group work is O(edges·α) with bounded edges; group count grows
    with the data and Spark spreads groups across executors. This is the
    cheapest correct plan whenever the precondition holds — the iterative
    operator remains for graphs with cross-bucket edges (MinHash bands,
    FastSS neighborhoods).

    Returns (node, component) for every node incident to an edge; nodes
    with no edges are absent (callers left-join and coalesce to own id,
    as with :func:`connected_components`'s ``nodes`` argument).
    """
    node_type = dict(edges.dtypes)[src]

    def run(pdf):
        import pandas as pd

        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(pdf[src], pdf[dst]):
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by VALUE: larger root attaches under smaller, so
                # every root IS its component's minimum id — matching the
                # star algorithm's fixed-point labels exactly
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        nodes = list(parent)
        return pd.DataFrame(
            {"node": nodes, "component": [find(v) for v in nodes]}
        )

    return edges.groupBy(part_col).applyInPandas(
        run, schema=f"node {node_type}, component {node_type}"
    )


PAGERANK_SCALE = 1_000_000_000


def pagerank_fixed_point(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 10,
    damping_num: int = 85,
    damping_den: int = 100,
    bounded: bool = False,
) -> DataFrame:
    """PageRank with FIXED-POINT integer arithmetic — every rank is an
    integer in units of 1/PAGERANK_SCALE, updates use only integer
    multiply/divide, so ranks are bit-identical across engines and runs
    (float PageRank sums in partition order and never replays exactly).
    Damping is the rational `damping_num/damping_den`; a fixed iteration
    count keeps the driver loop free of convergence collects.

    `bounded=True` declares the edge list BOUNDED BY CONSTRUCTION (e.g. a
    top-k co-occurrence graph, where k caps edges at any corpus scale):
    the distributed upstream aggregation still reduces the corpus, but the
    iteration itself runs as ONE executor task over the whole (tiny) edge
    set — 10 rounds of 3-stage shuffles on a ≤k-edge graph is pure
    scheduling waste at every scale, the same bounded-work discipline as
    the driver-side kmeans quantizer fit. The arithmetic is the identical
    integer recurrence, so `bounded` never changes a single output bit
    (asserted by the equivalence pytest). Default False = the distributed
    loop, for graphs that grow with the data.

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
    if bounded:
        return _pagerank_single_task(e, iterations, damping_num, damping_den)
    directed = persist_tracked(
        e.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
            e.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )
    )
    nodes = persist_tracked(
        directed.select(F.col("src").alias("node")).distinct()
    )
    n_nodes = nodes.count()
    deg = directed.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))

    base = PAGERANK_SCALE * (damping_den - damping_num) // (damping_den * n_nodes)
    init = PAGERANK_SCALE // n_nodes
    ranks = nodes.select("node", F.lit(init).cast("long").alias("rank"))
    out_edges = persist_tracked(directed.join(deg, on="src"))

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
        # LAZY checkpoint: with a fixed iteration count there is no per-round
        # collect, so the whole chain materializes in ONE action at the end —
        # each round's checkpoint still truncates lineage as it computes, but
        # the driver pays one job instead of `iterations` scheduling round
        # trips (measured ~2x on the bench's 14-node brand graph, where the
        # per-round data is trivial and scheduling dominates)
        ranks = (
            nodes.join(summed, on="node", how="left")
            .select(
                "node",
                (F.lit(base) + F.coalesce("__in", F.lit(0))).cast("long").alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def _pagerank_single_task(
    e: DataFrame, iterations: int, damping_num: int, damping_den: int
) -> DataFrame:
    """One-task PageRank for bounded graphs: the deduped undirected edge
    list `e(a, b)` is gathered into a single group and the integer
    recurrence runs in plain Python over it — bit-identical to the
    distributed loop (and to the golden-oracle replay) because both
    execute the same `(rank * d_num) // (d_den * deg)` updates in the
    same exact arithmetic."""
    node_type = dict(e.dtypes)["a"]

    def run(pdf):
        import pandas as pd

        directed: dict = {}
        for a, b in zip(pdf["a"], pdf["b"]):
            directed.setdefault(a, []).append(b)
            directed.setdefault(b, []).append(a)
        nodes = sorted(directed)
        n = len(nodes)
        if n == 0:
            return pd.DataFrame({"node": [], "rank": []})
        base = PAGERANK_SCALE * (damping_den - damping_num) // (damping_den * n)
        rank = {v: PAGERANK_SCALE // n for v in nodes}
        for _ in range(iterations):
            incoming = {v: 0 for v in nodes}
            for s, dsts in directed.items():
                share = (rank[s] * damping_num) // (damping_den * len(dsts))
                for d in dsts:
                    incoming[d] += share
            rank = {v: base + incoming[v] for v in nodes}
        return pd.DataFrame({"node": nodes, "rank": [rank[v] for v in nodes]})

    return (
        e.groupBy(F.lit(1).alias("__g"))
        .applyInPandas(run, schema=f"node {node_type}, rank long")
    )


def kcore_decomposition(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    bounded: bool = False,
    max_rounds: int = 100,
) -> DataFrame:
    """Coreness (k-core number) per node — the standard graph-density
    measure for community cores, spam subgraphs, and influence seeds
    (Seidman 1983).  Node v's coreness is the largest k such that v
    belongs to a subgraph where every node has degree >= k.

    Distributed algorithm: the H-INDEX FIXED POINT (Lü, Zhou, Zhang &
    Stanley, Nature Communications 2016) — init c(v) = degree(v), then
    iterate c(v) <- H(c of neighbors) (the largest h such that >= h
    neighbors have c >= h) until no value changes; the fixed point IS the
    coreness, exactly.  Every update is integer, order-free (the h-index
    of a multiset ignores order), so results are bit-identical across
    engines and partitionings — no tie-break subtleties, unlike
    float-scored iterations.  Each round is one co-partitioned join
    (neighbor values) + one groupBy with the h-index computed as
    `size(filter(1..n, i -> sorted_desc[i] >= i))` — a whole-stage-codegen
    array fold, no UDF.  Values only ever DECREASE and are bounded by
    degree, so rounds converge in practice in O(graph diameter)-ish steps;
    `max_rounds` is a loud backstop (raises rather than returning an
    unconverged table).  Per-round state is localCheckpointed
    (:func:`connected_components` discipline) and the convergence check is
    one count() per round.

    `bounded=True` declares the edge list bounded by construction (the
    top-k co-occurrence graph): coreness then computes in ONE executor
    task via Batagelj-Zaveršnik peeling — the same bounded-work discipline
    as :func:`pagerank_fixed_point`, with the equivalence asserted by
    pytest (peeling and the h-index fixed point are provably the same
    function).

    Returns (node, core).
    """
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    if bounded:
        return _kcore_single_task(e)
    directed = persist_tracked(
        e.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
            e.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )
    )
    core = directed.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("core")
    ).localCheckpoint()
    h_expr = F.expr(
        "cast(size(filter(sequence(1, size(__nb)), i -> element_at(__nb, i) >= i)) as long)"
    )
    for _ in range(max_rounds):
        nb = directed.join(
            core.select(F.col("node").alias("src"), F.col("core").alias("__c")),
            on="src",
        )
        new = (
            nb.groupBy(F.col("dst").alias("node"))
            .agg(F.sort_array(F.collect_list("__c"), asc=False).alias("__nb"))
            .select("node", h_expr.alias("core"))
            .localCheckpoint()
        )
        changed = (
            new.join(core.withColumnRenamed("core", "__old"), on="node")
            .filter(F.col("core") != F.col("__old"))
            .count()
        )
        core = new
        if changed == 0:
            return core
    raise ValueError(
        f"kcore_decomposition: h-index iteration did not converge within "
        f"{max_rounds} rounds — raise max_rounds (coreness values are "
        "monotone non-increasing, so convergence is guaranteed eventually)"
    )


def _kcore_single_task(e: DataFrame) -> DataFrame:
    """One-task coreness for bounded graphs: Batagelj-Zaveršnik min-degree
    peeling (a DIFFERENT algorithm from the distributed h-index loop —
    their agreement is a theorem, asserted by the equivalence pytest)."""
    node_type = dict(e.dtypes)["a"]

    def run(pdf):
        import heapq

        import pandas as pd

        adj: dict = {}
        for a, b in zip(pdf["a"], pdf["b"]):
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        deg = {v: len(ns) for v, ns in adj.items()}
        heap = [(d, v) for v, d in deg.items()]
        heapq.heapify(heap)
        removed: set = set()
        core: dict = {}
        k = 0
        while heap:
            d, v = heapq.heappop(heap)
            if v in removed or d != deg[v]:
                continue  # stale heap entry
            k = max(k, d)
            core[v] = k
            removed.add(v)
            for u in adj[v]:
                if u not in removed:
                    deg[u] -= 1
                    heapq.heappush(heap, (deg[u], u))
        nodes = sorted(core)
        return pd.DataFrame({"node": nodes, "core": [core[v] for v in nodes]})

    return (
        e.groupBy(F.lit(1).alias("__g"))
        .applyInPandas(run, schema=f"node {node_type}, core long")
    )

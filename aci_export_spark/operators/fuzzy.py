"""Fuzzy string matching for entity resolution: edit-distance-k pairs via
deletion-neighborhood blocking (FastSS, Bocek et al. 2007; k=1 and k=2)
and PassJoin partition-based blocking (Li, Deng, Feng, VLDB 2012; k≥2).

Every string generates its deletion neighborhood — the string itself plus
each ≤k-character-deletion variant. Two strings within edit distance k
ALWAYS share a neighborhood member, so joining on the variant gives
guaranteed recall; an exact `levenshtein` verify removes the false
positives (anagram-style variant collisions). PassJoin instead splits each
string into k+1 segments and probes partner substrings at position-bounded
offsets — linear neighborhood, the right trade for long strings.

Scale shape: candidate volume is n·(len+1) variant rows — linear in the
corpus for bounded key length — and block sizes are governed by variant
entropy, not corpus size (deleting one char of a high-entropy key leaves a
high-entropy key). Compare the pigeonhole SimHash blocks
(`llm/dedup.simhash_near_dup_pairs_blocked`) and the AllPairs Jaccard
prefix filter (`llm/dedup.jaccard_pairs_prefix`): same
block-join-then-verify discipline, third string metric. The verify is one
`levenshtein` call per candidate — a JVM codegen expression, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pair_expansion_join(
    probe: DataFrame,
    build: DataFrame,
    on: "Column | list[str]",
    probe_keys: list[str],
    build_keys: list[str],
) -> DataFrame:
    """Blocked pair-expansion join (output quadratic in block size, input
    bytes tiny) with a SIZE-CONDITIONED build-side broadcast — never a bare
    hint on a side that grows with the corpus (r9 verdict finding #1).

    Two traps pull in opposite directions here:

    - AQE's one-task trap: partition coalescing sizes partitions by INPUT
      shuffle bytes and is blind to the quadratic pair output, so a plain
      shuffle join over a small scan collapses to one task and serializes
      the expansion + comparators (bench caught 15 s wall for a 0.7 s
      plan).
    - The broadcast trap: an unconditional `broadcast(build)` fixes the
      above but OOMs driver/executors once the corpus-projection build
      side outgrows memory — a hint is forever, data isn't.

    Resolution: broadcast ONLY when scan file metadata PROVES the build
    side fits `spark.sql.autoBroadcastJoinThreshold`
    (:func:`~aci_export_spark.llm.dedup.scan_input_bytes`; unknown size =
    unbounded = no broadcast), spreading the probe side so the expansion
    parallelizes over its splits with zero exchanges. Otherwise
    co-partition BOTH sides on the block key with an explicit keyed
    repartition at default parallelism — AQE never coalesces an explicit
    repartition, so the bytes-tiny/compute-huge join keeps N tasks (the
    `jaccard_pairs_prefix` pair-stage discipline, `llm/dedup.py`); the
    keys match the join's equi-columns so no extra exchange is introduced.
    A skewed block then salts exactly like any skewed join key.
    """
    from aci_export_spark.llm.dedup import (
        _parse_bytes,
        scan_input_bytes,
        spread_for_explode,
    )

    thresh = _parse_bytes(
        probe.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold", "10m")
    )
    size = scan_input_bytes(build)
    if size is not None and 0 <= size <= thresh:
        return spread_for_explode(probe).join(F.broadcast(build), on)
    n = probe.sparkSession.sparkContext.defaultParallelism
    return probe.repartition(n, *probe_keys).join(
        build.repartition(n, *build_keys), on
    )


def deletion_variants(name_col: str) -> "F.Column":
    """array<string>: the string plus every single-deletion variant, as one
    column expression (sequence → transform → concat of the two halves);
    array_union also dedups repeated variants from runs of equal chars."""
    name = F.col(name_col)
    return F.array_union(
        F.array(name),
        F.transform(
            F.sequence(F.lit(1), F.length(name)),
            lambda i: F.concat(
                name.substr(F.lit(1), i - 1),
                name.substr(i + 1, F.length(name) - i),
            ),
        ),
    )


def deletion_variants_k2(name_col: str) -> "F.Column":
    """array<string>: the string, every 1-deletion variant, and every
    2-deletion variant (positions i<j), deduplicated.

    Recall argument (the FastSS theorem specialized to k=2): an edit script
    of ≤2 ops transforms s→t; deleting each substituted position from BOTH
    strings, each s-deleted char from s, and each t-inserted char from t
    yields a COMMON string reachable by ≤2 deletions from each side — so
    any pair within edit distance 2 shares a neighborhood member.
    Neighborhood size is 1 + L + C(L,2) — quadratic in string length, the
    right trade for bounded-length keys (names, codes); use PassJoin
    (:func:`passjoin_pairs`) for long or unbounded strings."""
    name = F.col(name_col)
    one = deletion_variants(name_col)
    # delete positions i<j: halves [1..i-1], [i+1..j-1], [j+1..L]
    two = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(name) - 1, F.lit(0))),
            lambda i: F.transform(
                F.sequence(i + 1, F.greatest(F.length(name), i + 1)),
                lambda j: F.concat(
                    name.substr(F.lit(1), i - 1),
                    name.substr(i + 1, j - i - 1),
                    name.substr(j + 1, F.length(name) - j),
                ),
            ),
        )
    )
    return F.when(F.length(name) < 2, one).otherwise(
        F.array_union(one, F.array_distinct(two))
    )


def _passjoin_segments(l: "F.Column", m: int) -> list[tuple["F.Column", "F.Column"]]:
    """Even-partition spec shared by index and probe sides: for a source
    string of length `l` split into `m` segments, returns [(start, len)]
    per segment index (1-based starts) — first m−r segments of length
    ⌊l/m⌋, the last r of length ⌈l/m⌉ (r = l mod m)."""
    q = F.floor(l / m).cast("int")
    r = (l % m).cast("int")
    out = []
    for i in range(m):
        seg_len = q + F.when(F.lit(i) >= (F.lit(m) - r), F.lit(1)).otherwise(F.lit(0))
        start = F.lit(1) + F.lit(i) * q + F.greatest(F.lit(0), F.lit(i) - (F.lit(m) - r))
        out.append((start, seg_len))
    return out


def passjoin_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    k: int = 2,
) -> DataFrame:
    """(id_a, id_b, distance) within `k` edits via PassJoin partition-based
    blocking (Li, Deng, Feng, VLDB 2012): split every string into k+1
    segments (pigeonhole: ≤k edits leave at least one segment unedited and
    contiguous in the partner), index segments by (segment#, source length,
    content), probe each string's substrings at the paper's multi-match-
    aware positions, verify candidates with one exact JVM `levenshtein`.

    Probe fan-out is bounded: (2k+1) source lengths × (k+1) segments ×
    ≤(2k+1) start positions per string — candidate volume is linear in the
    corpus for diverse content, governed by segment-block entropy. A
    CAVEAT that decided the registered k=2 query: a corpus-wide constant
    prefix (the fixture's 'Customer#') makes the prefix-covering segment's
    block equal THE WHOLE CORPUS — quadratic candidates no partition
    choice can avoid (any full-coverage partition has a segment inside the
    constant region). For such keys the 2-deletion FastSS neighborhood
    (:func:`deletion_variants_k2`) keeps L−2 discriminative chars per
    block and stays output-bound; both strategies verify exactly, so they
    return identical pairs (differential-tested).

    Strings shorter than k+1 chars can't form non-empty segments; any two
    of them are trivially within k edits (ed ≤ max length ≤ k), so the
    short bucket is emitted directly from a definitionally-tiny broadcast
    self-join.
    """
    m = k + 1
    name = F.col(name_col)
    l = F.length(name)

    long_side = df.filter(l >= m)
    # ---- index: one row per segment, key = hash(segment#, source len, content)
    seg_structs = [
        F.struct(F.lit(i).alias("i"), s.alias("p"), ln.alias("ln"))
        for i, (s, ln) in enumerate(_passjoin_segments(l, m))
    ]
    idx = long_side.select(
        F.col(id_col).alias("id_a"),
        F.explode(F.array(*seg_structs)).alias("g"),
        l.alias("__l"),
        name.alias("__n"),
    ).select(
        "id_a",
        F.xxhash64(
            F.col("g.i"), F.col("__l"), F.expr("substring(__n, g.p, g.ln)")
        ).alias("__bk"),
    )

    # ---- probe: multi-match-aware substring selection (paper Lemma 2):
    # for segment i of source length l' and Δ = |t| − l', candidate starts
    # span [max(1, pᵢ−i, pᵢ+Δ−(k−i)) .. min(|t|−Lᵢ+1, pᵢ+i, pᵢ+Δ+(k−i))] —
    # validated against brute force by the property fuzz in
    # tests/test_operator_properties.py before being trusted here.
    def probe_keys_for_len(src_l: "F.Column") -> "F.Column":
        lt = F.length(name)
        delta = lt - src_l
        per_seg = []
        for i, (p_i, l_i) in enumerate(_passjoin_segments(src_l, m)):
            lo = F.greatest(F.lit(1), p_i - F.lit(i), p_i + delta - F.lit(k - i))
            hi = F.least(lt - l_i + 1, p_i + F.lit(i), p_i + delta + F.lit(k - i))
            seq = F.when(hi >= lo, F.sequence(lo, hi)).otherwise(
                F.array().cast("array<int>")
            )
            def _key_at(i: int, l_i: "F.Column", src_l: "F.Column"):
                # closure factory: PySpark introspects lambda arity, so the
                # loop variables can't ride as default args
                return lambda p: F.xxhash64(F.lit(i), src_l, name.substr(p, l_i))

            per_seg.append(F.transform(seq, _key_at(i, l_i, src_l)))
        return F.flatten(F.array(*per_seg))

    lengths = F.sequence(F.greatest(l - k, F.lit(m)), l + k)
    probe = df.filter(l + k >= m).select(
        F.col(id_col).alias("id_b"),
        F.explode(
            F.array_distinct(F.flatten(F.transform(lengths, probe_keys_for_len)))
        ).alias("__bk"),
    )

    cand = (
        idx.join(probe, on="__bk")
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .distinct()
    )

    # ---- short bucket: both strings shorter than k+1 — every pair is
    # within k edits by construction; definitionally-tiny all-pairs side
    # (broadcast both: at most a handful of sub-(k+1)-char keys exist)
    shorts = df.filter(l < m).select(F.col(id_col), F.col(name_col))
    sa = shorts.select(F.col(id_col).alias("id_a"))
    sb = shorts.select(F.col(id_col).alias("id_b"))
    short_pairs = (
        sa.join(F.broadcast(sb), sa["id_a"] < sb["id_b"]).select("id_a", "id_b")
    )
    cand = cand.unionByName(short_pairs)
    return _verify_pairs(cand, df, id_col, name_col, k)


def _verify_pairs(
    cand: DataFrame, df: DataFrame, id_col: str, name_col: str, k: int
) -> DataFrame:
    """Join names back AFTER candidate dedup (name-table-sized joins,
    broadcast when small) and keep pairs with exact levenshtein ≤ k."""
    names = df.select(F.col(id_col), F.col(name_col))
    cand = cand.join(
        names.select(F.col(id_col).alias("id_a"), F.col(name_col).alias("__na")),
        on="id_a",
    ).join(
        names.select(F.col(id_col).alias("id_b"), F.col(name_col).alias("__nb")),
        on="id_b",
    )
    # threshold levenshtein: O(k·L) banded DP instead of O(L²), returns −1
    # above the bound — the verify is the per-candidate hot loop
    dist = F.levenshtein(F.col("__na"), F.col("__nb"), int(k))
    return (
        cand.withColumn("distance", dist)
        .filter(F.col("distance") >= 0)
        .select("id_a", "id_b", "distance")
    )


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_distance: int = 1,
    strategy: str = "auto",
) -> DataFrame:
    """(id_a, id_b, distance) for every pair within `max_distance` edits,
    id_a < id_b — guaranteed recall (block-join-then-verify), exact
    distances.

    Strategies: k=1 always uses the 1-deletion FastSS neighborhood; k=2
    defaults to the 2-deletion neighborhood (right for bounded-length keys
    — blocks keep L−2 discriminative chars, so corpus-constant prefixes
    don't degenerate) with ``strategy='passjoin'`` selecting PassJoin
    partition blocking (linear neighborhood, right for long strings with
    diverse content). k≥3 is PassJoin-only (the deletion neighborhood
    grows as L^k).

    ``strategy`` must be one of ``'auto' | 'fastss' | 'passjoin'`` — a typo
    must fail loudly rather than silently fall through to the PassJoin
    branch (which is quadratic-degenerate on constant-prefix keys)."""
    if strategy not in ("auto", "fastss", "passjoin"):
        raise ValueError(
            f"unknown strategy {strategy!r}: expected 'auto', 'fastss', or "
            "'passjoin'"
        )
    if max_distance == 1:
        variants = deletion_variants(name_col)
    elif max_distance == 2 and strategy in ("auto", "fastss"):
        variants = deletion_variants_k2(name_col)
    elif max_distance >= 2:
        return passjoin_pairs(df, id_col, name_col, k=max_distance)
    else:
        raise ValueError(f"max_distance must be >= 1, got {max_distance}")
    # variants join on their 64-bit hash, not the string: the block join and
    # the candidate-dedup shuffle then carry fixed 8-byte keys instead of
    # ~name-length strings. A hash collision can only ADD a false candidate,
    # which the exact levenshtein verify below removes — recall is untouched.
    v = df.select(
        F.col(id_col),
        F.explode(F.transform(variants, lambda s: F.xxhash64(s))).alias("__vh"),
    )
    a = v.select(F.col(id_col).alias("id_a"), "__vh")
    b = v.select(F.col(id_col).alias("id_b"), "__vh")
    cand = (
        a.join(b, on="__vh")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()  # dedup BEFORE the verify: one levenshtein per pair
    )
    return _verify_pairs(cand, df, id_col, name_col, max_distance)


def fs_agreement_patterns(
    df: DataFrame,
    id_col: str,
    block_cols: list[str],
    agree_exprs: dict[str, "F.Column"],
) -> DataFrame:
    """Fellegi-Sunter agreement-pattern frequencies (Fellegi & Sunter,
    JASA 1969): for every blocked candidate pair, evaluate the comparison
    vector γ (one boolean per field comparator) and count pairs per
    pattern — the sufficient statistic the FS model's m/u estimation (EM
    or labeled counts) consumes. The pattern table is the E-step input;
    emitting it exactly (BIGINT counts, one row per observed pattern)
    keeps the whole linkage front-end engine-checkable.

    `agree_exprs` maps output column name -> boolean Column over the pair
    (reference the two sides' fields as ``a_<field>`` / ``b_<field>``).

    Scale shape: the self-join goes through :func:`pair_expansion_join` —
    build side broadcast only when scan metadata proves it small, else
    co-partitioned on the blocking key with the pair stage pinned at
    default parallelism; per-block volume is quadratic in BLOCK size —
    the standard linkage discipline is picking blocks that bound it, and
    a skewed block salts exactly like any skewed join key; comparators
    (levenshtein etc.) are JVM codegen expressions, no UDF; the pattern
    groupBy has at most 2^|γ| groups, map-side combined to nothing.
    """

    def _side(side: str) -> DataFrame:
        return df.select(
            *[F.col(c).alias(f"{side}_{c}") for c in df.columns]
        )

    cond = F.expr(
        " AND ".join(
            [f"a_{c} = b_{c}" for c in block_cols] + [f"a_{id_col} < b_{id_col}"]
        )
    )
    pairs = pair_expansion_join(
        _side("a"),
        _side("b"),
        cond,
        probe_keys=[f"a_{c}" for c in block_cols],
        build_keys=[f"b_{c}" for c in block_cols],
    )
    gammas = [expr.alias(name) for name, expr in agree_exprs.items()]
    return (
        pairs.select(*gammas)
        .groupBy(*agree_exprs.keys())
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


def blocking_audit(
    df: DataFrame, id_col: str, name_col: str, block_col: str
) -> DataFrame:
    """Blocking-quality report for the FastSS k=1 pipeline, scoped to
    production-style blocks: per block the exact pair-space size, the
    candidate count the deletion-neighborhood join produces, the true
    edit-distance-1 pair count (within-block brute force — the bounded
    truth side), the candidates that verify, and the misses. The FastSS
    recall theorem says n_missed == 0; this query emits that claim AS
    DATA, next to the reduction ratio's exact numerator/denominator
    (n_candidates vs n_scoped_pairs) — the audit a linkage deployment
    runs before trusting a blocking scheme (cf. lsh_recall_audit for the
    MinHash family).

    Scale shape: the truth side is block-bounded brute force (quadratic
    in BLOCK size, the same discipline as the pair space itself — audits
    pay the exact path on purpose) through :func:`pair_expansion_join`
    (size-conditioned broadcast, co-partitioned block-key fallback);
    candidates come from the linear variant join through the same helper;
    every count is a map-combined aggregate on the block key.
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(name_col).alias("name"),
        F.col(block_col).alias("block"),
    )
    members = base.groupBy("block").agg(F.count(F.lit(1)).alias("n_members"))
    scoped = members.withColumn(
        "n_scoped_pairs",
        F.expr("(n_members * (n_members - 1)) div 2").cast("long"),
    )
    # truth: within-block brute force with exact verify
    a = base.select(
        F.col("id").alias("id_a"), F.col("name").alias("name_a"), "block"
    )
    b = base.select(
        F.col("id").alias("id_b"), F.col("name").alias("name_b"), "block"
    )
    # AQE's size estimate sees only the INPUT of this join and is blind to
    # its quadratic pair output: a plain shuffle join got coalesced to ONE
    # task (caught by the bench at 15s wall for a 0.7s plan), while a bare
    # broadcast hint OOMs once the corpus projection outgrows memory —
    # pair_expansion_join picks per the build side's PROVEN size.
    truth = (
        pair_expansion_join(a, b, "block", probe_keys=["block"], build_keys=["block"])
        .filter(F.col("id_a") < F.col("id_b"))
        # thresholded levenshtein (banded O(k·L), -1 above bound): the
        # block-quadratic truth pass is THE audit hot loop
        .withColumn(
            "__match", F.levenshtein(F.col("name_a"), F.col("name_b"), 1) >= 0
        )
    )
    n_true = truth.filter("__match").groupBy("block").agg(
        F.count(F.lit(1)).alias("n_true")
    )
    # candidates: the deletion-neighborhood join, block-scoped, pre-verify
    var = base.select(
        "id", "name", "block", F.explode(deletion_variants("name")).alias("v")
    )
    va = var.select(
        F.col("id").alias("id_a"), F.col("name").alias("name_a"), "block", "v"
    )
    vb = var.select(
        F.col("id").alias("id_b"), F.col("name").alias("name_b"), "block", "v"
    )
    cand = (
        pair_expansion_join(
            va, vb, ["block", "v"],
            probe_keys=["block", "v"], build_keys=["block", "v"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("block", "id_a", "id_b", "name_a", "name_b")
        .distinct()
    )
    n_cand = cand.groupBy("block").agg(F.count(F.lit(1)).alias("n_candidates"))
    n_found = (
        cand.filter(F.levenshtein(F.col("name_a"), F.col("name_b"), 1) >= 0)
        .groupBy("block")
        .agg(F.count(F.lit(1)).alias("n_found"))
    )
    return (
        scoped.join(n_true, on="block", how="left")
        .join(n_cand, on="block", how="left")
        .join(n_found, on="block", how="left")
        .select(
            F.col("block"),
            F.col("n_members").cast("long").alias("n_members"),
            "n_scoped_pairs",
            F.coalesce("n_candidates", F.lit(0)).cast("long").alias("n_candidates"),
            F.coalesce("n_true", F.lit(0)).cast("long").alias("n_true"),
            F.coalesce("n_found", F.lit(0)).cast("long").alias("n_found"),
            (F.coalesce("n_true", F.lit(0)) - F.coalesce("n_found", F.lit(0)))
            .cast("long")
            .alias("n_missed"),
        )
    )

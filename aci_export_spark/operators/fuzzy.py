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
from aci_export_spark.localrows import local_rows_df


def pair_expansion_join(
    probe: DataFrame,
    build: DataFrame,
    on: "Column | list[str]",
    probe_keys: list[str],
    build_keys: list[str],
    build_amplification: int = 1,
    spread_probe: bool = True,
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

    ``build_amplification`` is the caller's worst-case row fan-out between
    the scanned files and the build relation actually broadcast (e.g. a
    deletion-variants explode emits ≤ max_name_len+1 rows per input row):
    the gate proves FILE bytes, so an amplified build side must clear the
    threshold at size × amplification or the "metadata PROVES it fits"
    claim is false exactly where it matters. The threshold conf is parsed
    STRICTLY — an unparseable autoBroadcastJoinThreshold disables the
    broadcast (a fallback default here would approve broadcasts the user
    never allowed; contrast _parse_bytes' wide-scan guard, where a
    default errs safe).
    """
    from aci_export_spark.llm.dedup import (
        _BYTE_SUFFIX,
        scan_input_bytes,
        spread_for_explode,
    )

    raw = str(
        probe.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold", "10m")
    ).strip().lower()
    digits = raw.rstrip("kmgbtp")
    try:
        thresh = int(float(digits) * _BYTE_SUFFIX[raw[len(digits):]])
    except (KeyError, ValueError):
        thresh = -1  # unknown threshold = no broadcast
    size = scan_input_bytes(build)
    if size is not None and 0 <= size * max(1, build_amplification) <= thresh:
        # spread_probe=False: the caller already spread BELOW its generator
        # (the right place — this helper only sees the post-explode frame,
        # and a second repartition here would move the amplified rows)
        spread = spread_for_explode(probe) if spread_probe else probe
        return spread.join(F.broadcast(build), on)
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
    # candidates: the deletion-neighborhood join, block-scoped, pre-verify.
    # Spread the NARROW base before the variant explode (the generator
    # amplifies ~len+1x; a one-split scan would serialize generation —
    # spread_for_explode's own contract), and tell the join helper the
    # fan-out bound so its broadcast gate prices the EXPLODED build side,
    # not the scanned file bytes (review r10: metadata proves file bytes
    # only; an amplified side must clear threshold at size x amplification)
    from aci_export_spark.llm.dedup import spread_for_explode

    amp_row = base.agg(F.max(F.length("name")).alias("m")).collect()[0]
    amplification = int(amp_row["m"] or 0) + 1
    var = spread_for_explode(base).select(
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
            build_amplification=amplification, spread_probe=False,
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


# ---------------------------------------------------------------------------
# Fellegi-Sunter m/u estimation: EM over the agreement-pattern table
# ---------------------------------------------------------------------------

#: fixed-point quantum for the EM parameters: every parameter is kept as an
#: exact multiple of 2^-40 between iterations, so the whole recursion is
#: rational arithmetic with BOUNDED term size (big-int growth is cut at each
#: M-step) and any independent implementation of the same spec reproduces
#: the trajectory bit-for-bit — the float-free-oracle discipline of
#: llm/unigram.py applied to an iterative float algorithm. 2^-40 is ~1e-12,
#: far below EM's statistical resolution; the final numerator < 2^40 < 2^53,
#: so the parameter -> DOUBLE conversion at the edge is EXACT.
FS_EM_SCALE = 1 << 40

FS_EM_ITERS = 25
#: hard cap on the comparison-vector width K: the EM sufficient statistic
#: is 2^K pattern rows collected to the driver — loud-guarded, not assumed
FS_MAX_FIELDS = 20


def _fs_quantize(x) -> "object":
    """Round a Fraction to the nearest multiple of 2^-FS_EM_SCALE (half-up),
    clamped inside the open unit interval — the one lossy step of each EM
    round, applied identically by the Spark side and the reference."""
    from fractions import Fraction

    n = (x.numerator * FS_EM_SCALE * 2 + x.denominator) // (x.denominator * 2)
    n = max(1, min(FS_EM_SCALE - 1, n))
    return Fraction(n, FS_EM_SCALE)


def fs_em_fixed_point(
    patterns: list[tuple[tuple[bool, ...], int]],
    n_fields: int,
    iters: int = FS_EM_ITERS,
) -> tuple["object", list["object"], list["object"]]:
    """Fit the Fellegi-Sunter two-class latent model (Winkler 1988's EM
    formulation) on an agreement-pattern frequency table: returns
    (lambda, m[k], u[k]) as exact 2^-40-grid Fractions.

    E-step: P(match | gamma) per PATTERN (not per pair) — the pattern table
    is the model's sufficient statistic, so the loop is O(iters * 2^K)
    regardless of corpus size. M-step: frequency-weighted re-estimates,
    then fixed-point quantization (see FS_EM_SCALE).
    """
    from fractions import Fraction

    if not patterns or sum(n for _, n in patterns) == 0:
        raise ValueError(
            "fs_em_fixed_point: empty agreement-pattern table — the "
            "blocking produced no candidate pairs, so the model is unfit"
        )
    # canonical textbook init (match prevalence 10%, informative
    # comparators) — deterministic and strictly inside (0, 1), so the
    # first E-step never divides by zero
    lam = Fraction(1, 10)
    m = [Fraction(9, 10)] * n_fields
    u = [Fraction(1, 10)] * n_fields
    total = sum(n for _, n in patterns)
    for _ in range(iters):
        sw = Fraction(0)
        swg = [Fraction(0)] * n_fields
        sv = Fraction(0)
        svg = [Fraction(0)] * n_fields
        for gamma, n in patterns:
            pm = lam
            pu = 1 - lam
            for k in range(n_fields):
                pm *= m[k] if gamma[k] else 1 - m[k]
                pu *= u[k] if gamma[k] else 1 - u[k]
            w = pm / (pm + pu)
            sw += n * w
            sv += n * (1 - w)
            for k in range(n_fields):
                if gamma[k]:
                    swg[k] += n * w
                    svg[k] += n * (1 - w)
        lam = _fs_quantize(sw / total)
        m = [_fs_quantize(swg[k] / sw) for k in range(n_fields)]
        u = [_fs_quantize(svg[k] / sv) for k in range(n_fields)]
    return lam, m, u


def fs_em_weights(
    df: "DataFrame",
    id_col: str,
    block_cols: list[str],
    agree_exprs: dict[str, "F.Column"],
    iters: int = FS_EM_ITERS,
) -> "DataFrame":
    """Fellegi-Sunter match/unmatch probabilities and match weights per
    comparator field, fitted by EM over the blocked agreement-pattern
    frequencies (:func:`fs_agreement_patterns` is the E-step input).

    Returns one row per field: (field, m, u, agree_weight = m/u,
    disagree_weight = (1-m)/(1-u), lambda_match) — the likelihood-ratio
    weights record linkage scores pairs with (Fellegi & Sunter 1969 §3;
    log is monotone, so the raw ratios rank identically and stay
    engine-exact). m/u/lambda are EXACT doubles (2^-40 grid, below the
    53-bit mantissa); the two weight divisions are the only IEEE ops.

    Scale shape: the distributed work is the pattern aggregation (blocked
    pair expansion + 2^K-group map-side-combined count); EM consumes that
    sufficient statistic on the driver — O(iters * 2^K) exact-rational
    ops, data-size-independent, the bounded-collect discipline of the
    kmeans quantizer fit. The collect is <= 2^K rows by construction, and
    K itself is capped loudly (FS_MAX_FIELDS): a caller wiring in an
    unexpectedly wide comparator vector gets a named error, not a driver
    OOM at 2^K patterns (r10 verdict #3, the PMI/POS_SPACE discipline).
    """
    fields = list(agree_exprs.keys())
    if len(fields) > FS_MAX_FIELDS:
        raise ValueError(
            f"fs_em_weights: {len(fields)} comparator fields exceed "
            f"FS_MAX_FIELDS={FS_MAX_FIELDS} — the 2^K pattern statistic "
            "would no longer be driver-bounded; reduce the comparison "
            "vector or raise the cap deliberately"
        )
    pat = fs_agreement_patterns(df, id_col, block_cols, agree_exprs)
    rows = pat.collect()
    patterns = [
        (tuple(bool(r[f]) for f in fields), int(r["n_pairs"])) for r in rows
    ]
    patterns.sort()
    lam, m, u = fs_em_fixed_point(patterns, len(fields), iters)
    out = [
        (
            f,
            float(m[k]),
            float(u[k]),
            float(m[k]) / float(u[k]),
            float(1 - m[k]) / float(1 - u[k]),
            float(lam),
        )
        for k, f in enumerate(fields)
    ]
    return local_rows_df(
        df.sparkSession,
        out,
        schema="field string, m double, u double, agree_weight double, "
        "disagree_weight double, lambda_match double",
    )


def fs_em_reference_python(
    parquet_path: str, iters: int = FS_EM_ITERS
) -> list[tuple[str, int, int, int]]:
    """Single-process reference for :func:`fs_em_weights` over the customer
    table with the er_fs_pattern_counts comparator vector: DuckDB computes
    the blocked agreement-pattern frequencies independently, and the EM
    recursion below is a from-the-spec reimplementation (dict-keyed
    accumulators, inline integer quantization — shares no code with
    ``fs_em_fixed_point``). Exactness comes from the spec, not the code:
    every parameter is an exact multiple of 2^-40, so both implementations
    follow the identical rational trajectory. Returns (field, m_num, u_num,
    lam_num) — the 2^-40-grid NUMERATORS, not floats: a >15-digit float
    literal would be parsed as DECIMAL by DuckDB and double-rounded, so the
    golden oracle ships exact integers and replays the grid divisions in
    SQL. Backs the golden-VALUES oracle of ``er_fs_em_weights``."""
    from fractions import Fraction

    import duckdb

    fields = ["g_name_fuzzy", "g_balance_band", "g_name_suffix"]
    rows = duckdb.sql(
        f"""
        WITH pairs AS (
            SELECT levenshtein(a.c_name, b.c_name) <= 2 AS g_name_fuzzy,
                   floor(a.c_acctbal / 1000.0) = floor(b.c_acctbal / 1000.0)
                       AS g_balance_band,
                   right(a.c_name, 2) = right(b.c_name, 2) AS g_name_suffix
            FROM '{parquet_path}' a JOIN '{parquet_path}' b
              ON a.c_nationkey = b.c_nationkey
             AND a.c_mktsegment = b.c_mktsegment
             AND a.c_custkey < b.c_custkey
        )
        SELECT g_name_fuzzy, g_balance_band, g_name_suffix, COUNT(*) AS n
        FROM pairs GROUP BY 1, 2, 3
        """
    ).fetchall()
    counts = {(bool(r[0]), bool(r[1]), bool(r[2])): int(r[3]) for r in rows}
    total = sum(counts.values())

    def q40(x: Fraction) -> Fraction:
        num = (x.numerator * (1 << 40) * 2 + x.denominator) // (x.denominator * 2)
        return Fraction(min(max(num, 1), (1 << 40) - 1), 1 << 40)

    params = {
        "lam": Fraction(1, 10),
        **{("m", f): Fraction(9, 10) for f in fields},
        **{("u", f): Fraction(1, 10) for f in fields},
    }
    for _ in range(iters):
        acc: dict = {"w": Fraction(0), "v": Fraction(0)}
        for f in fields:
            acc[("wg", f)] = Fraction(0)
            acc[("vg", f)] = Fraction(0)
        for gamma, n in counts.items():
            like_m = params["lam"]
            like_u = 1 - params["lam"]
            for f, g in zip(fields, gamma):
                like_m *= params[("m", f)] if g else 1 - params[("m", f)]
                like_u *= params[("u", f)] if g else 1 - params[("u", f)]
            w = like_m / (like_m + like_u)
            acc["w"] += n * w
            acc["v"] += n * (1 - w)
            for f, g in zip(fields, gamma):
                if g:
                    acc[("wg", f)] += n * w
                    acc[("vg", f)] += n * (1 - w)
        params["lam"] = q40(acc["w"] / total)
        for f in fields:
            params[("m", f)] = q40(acc[("wg", f)] / acc["w"])
            params[("u", f)] = q40(acc[("vg", f)] / acc["v"])
    def num40(x: Fraction) -> int:
        return x.numerator * ((1 << 40) // x.denominator)

    return [
        (f, num40(params[("m", f)]), num40(params[("u", f)]), num40(params["lam"]))
        for f in fields
    ]


# ---------------------------------------------------------------------------
# Jaro-Winkler comparator: the record-linkage string similarity
# ---------------------------------------------------------------------------

#: emission grid for Jaro-Winkler: floor(jw * 1e6) computed in EXACT
#: integer arithmetic (the similarity is rational once transposition
#: halves are cleared: jaro = (2m²|b| + 2m²|a| + (2m−k)|a||b|) / 6|a||b|m
#: with k = mismatched aligned positions, and the Winkler bonus p=1/10 is
#: rational too) — no float ever enters, so engines and the reference
#: agree bit-for-bit.
JW_PPM_SCALE = 1_000_000


def jw_ppm(a: str, b: str) -> int:
    """Jaro-Winkler similarity (Jaro 1989; Winkler 1990) on the exact
    parts-per-million integer grid: standard windowed greedy matching
    (window = max(|a|,|b|)/2 − 1), transpositions as mismatched aligned
    positions k (jaro's t = k/2 cleared into the rational), Winkler
    prefix bonus l ≤ 4 at p = 1/10.  Identical strings → 1_000_000;
    either empty → 0."""
    if a == b:
        return JW_PPM_SCALE if a else 0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    a_match = [False] * la
    b_match = [False] * lb
    m = 0
    for i in range(la):
        lo = i - window if i - window > 0 else 0
        hi = i + window + 1 if i + window + 1 < lb else lb
        for j in range(lo, hi):
            if not b_match[j] and b[j] == a[i]:
                a_match[i] = True
                b_match[j] = True
                m += 1
                break
    if m == 0:
        return 0
    k = 0
    j = 0
    for i in range(la):
        if a_match[i]:
            while not b_match[j]:
                j += 1
            if a[i] != b[j]:
                k += 1
            j += 1
    jaro_num = 2 * m * m * lb + 2 * m * m * la + (2 * m - k) * la * lb
    jaro_den = 6 * la * lb * m
    l = 0
    for x, y in zip(a[:4], b[:4]):
        if x != y:
            break
        l += 1
    jw_num = 10 * jaro_num + l * (jaro_den - jaro_num)
    jw_den = 10 * jaro_den
    return JW_PPM_SCALE * jw_num // jw_den


def jaro_winkler_pairs(
    df: DataFrame,
    id_col: str,
    field: str,
    block_cols: list[str],
    threshold_ppm: int,
    neighborhood: int | None = None,
) -> DataFrame:
    """Blocked Jaro-Winkler candidate pairs — THE record-linkage string
    comparator (Winkler's Census work; the default scorer in every
    production linkage stack): pairs within a block whose field similarity
    clears `threshold_ppm` on the exact integer grid, emitted as
    (id_a, id_b, jw_ppm) with id_a < id_b.

    Plan: the block self-join goes through :func:`pair_expansion_join`
    (size-conditioned broadcast / co-partitioned fallback, the
    fs_agreement_patterns discipline) over a projection carrying ONLY the
    id, the compared field, the block keys, and a per-row CHARACTER
    HISTOGRAM; the comparator runs as an Arrow-batched stage over the
    joined pairs (a character-windowed greedy match has no SQL expression
    — this is the documented Pandas-UDF slow path, applied after blocking
    bounds the pair volume).  The threshold filter is integer-exact, so
    the emitted pair set is bit-stable.

    EXACT histogram prefilter (the filter-verify discipline): Jaro
    matches m are bounded by the character-multiset intersection
    I = Σ_c min(n_a(c), n_b(c)), and jw = j + l·p·(1−j) with l ≤ 4,
    p = 1/10 gives jw ≤ 0.4 + 0.6·j with j ≤ (m/|a| + m/|b| + 1)/3 — so
    jw ≥ T forces

        I · (|a|+|b|) · 10^6  ≥  (5·T_ppm − 3·10^6) · |a| · |b|

    a pure-integer NECESSARY condition (no false negatives — fuzz-tested
    against jw_ppm) over 26 letter classes + one other-chars class (whose
    min is still a valid bound on cross-class matches).  On the brand-
    blocked part corpus it passes ~5% of pairs, cutting the greedy
    comparator's work ~19×.  It runs INSIDE THE ARROW STAGE, ONCE PER
    DISTINCT NAME PAIR (prefilter + comparator results memoized per
    worker — name-PAIR cardinality, never row cardinality; each row batch
    is factorized to pair codes and gathers its scores with one int64
    indexing op — the part corpus carries 2.3M candidate rows over only
    872 distinct name pairs, so anything per-row is ~2600× redundant),
    NOT as a join condition: a first cut emitted it as 27 scalar
    ``least`` columns in the join's codegen and measured 320 CPU-s cold
    vs 21 warm — the giant generated method loses its codegen-cache slot
    between interleaved bench reps and re-runs interpreted over all 8M
    pairs; the memoized Arrow form does per-distinct-pair work plus one
    gather.  Disabled when the threshold makes the bound vacuous
    (T ≤ 0.6 → rhs ≤ 0).

    LENGTH BAND (exact, in the join condition): the same bound with
    I ≤ min(|a|,|b|) collapses to ``min·10^6 ≥ (5·T_ppm − 4·10^6)·max`` —
    one integer comparison per candidate (no codegen-cache hazard), a
    pure necessary condition that drops grossly length-mismatched pairs
    BEFORE they reach the Arrow stage.  Vacuous (skipped) at T ≤ 0.8.

    SECONDARY BLOCKING DIAL — ``neighborhood`` (r10 verdict: brand-level
    blocks are too coarse at 100×; per-block pair volume must be capped):
    when set to a window W, candidates come from TWO-PASS SORTED
    NEIGHBORHOOD blocking (Hernández & Stolfo, SIGMOD 1995) instead of
    the exhaustive block self-join — pass 1 sorts each block by the field
    (prefix-similar names adjacent), pass 2 by its REVERSE (suffix-
    similar names adjacent), and each pass pairs rows within W positions
    via a bucket-keyed equi-join (rank div W; the higher-rank side probes
    its own and the previous bucket), capping candidate volume at
    2·n·W — LINEAR in the corpus — instead of Σ(block²).  This is a
    definitional blocking choice (the estimand is "pairs surfaced by the
    W-window passes"), replayed exactly by the golden reference; measured
    on the part corpus at sf0.1 the two passes at W=64 surface
    164109/164112 = 99.998% of the exhaustive ≥0.90 pairs (the fwd pass
    alone: 81% — mid-string edits sort far apart; the reversed pass
    recovers them).  Ranks are total-ordered by (field, id), so both
    engines mint identical windows, and pass 2 EXCLUDES pairs already
    within the forward window, so the union is disjoint by construction
    (no dedup shuffle over the candidate volume).  Identical-string pairs
    score 10^6 JVM-side and never enter the Arrow stage.

    Arrow batch bound: the pair stage caps
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` stays at the SESSION
    default (10k rows — the Arrow writer already chunks the join output,
    so no multi-M-row batch can materialize); a first cut pinned it to
    4096 with a GLOBAL ``conf.set``, which leaked into every Arrow query
    that ran after this one in the same session and showed up as a
    30-query CPU "regression" in the interleaved bench (mp4/sessionize/
    Bradley-Terry all pay per-batch overhead 2.4x). Per-operator bounds
    must live INSIDE the operator (the score stage slices its own numpy
    work), never in session state.
    """
    import numpy as _np
    import pandas as _pd
    from typing import Iterator as _Iterator

    from pyspark.sql import Window

    c_ppm = 5 * threshold_ppm - 3_000_000
    band_ppm = 5 * threshold_ppm - 4_000_000

    proj = df.select(F.col(id_col), F.col(field), *[F.col(c) for c in block_cols])
    band = (
        [
            f"least(length(a_{field}), length(b_{field})) * 1000000 >= "
            f"{band_ppm} * greatest(length(a_{field}), length(b_{field}))"
        ]
        if band_ppm > 0
        else []
    )

    def _side(side: str, frame: DataFrame) -> DataFrame:
        return frame.select(
            *[F.col(c).alias(f"{side}_{c}") for c in frame.columns]
        )

    if neighborhood is None:
        cond = F.expr(
            " AND ".join(
                [f"a_{c} = b_{c}" for c in block_cols]
                + [f"a_{id_col} < b_{id_col}"]
                + band
            )
        )
        pairs = pair_expansion_join(
            _side("a", proj),
            _side("b", proj),
            cond,
            probe_keys=[f"a_{c}" for c in block_cols],
            build_keys=[f"b_{c}" for c in block_cols],
        ).select(
            F.col(f"a_{id_col}").alias("id_a"),
            F.col(f"b_{id_col}").alias("id_b"),
            F.col(f"a_{field}").alias("__fa"),
            F.col(f"b_{field}").alias("__fb"),
        )
    else:
        W = int(neighborhood)
        # both pass ranks minted on ONE frame (one block-keyed exchange,
        # two sorts) so pass 2 can EXCLUDE pairs pass 1 already surfaced —
        # the union is disjoint by construction and needs no
        # dropDuplicates shuffle over the candidate volume
        wf = Window.partitionBy(*block_cols).orderBy(
            F.col(field).asc(), F.col(id_col).asc()
        )
        wr = Window.partitionBy(*block_cols).orderBy(
            F.reverse(F.col(field)).asc(), F.col(id_col).asc()
        )
        ranked = proj.withColumn(
            "__rkf", F.row_number().over(wf)
        ).withColumn("__rkr", F.row_number().over(wr))

        def _pass(rk: str, extra: list[str]) -> DataFrame:
            a = _side("a", ranked.withColumn(
                "__bk", F.expr(f"({rk} - 1) div {W}")
            ))
            # the higher-rank side probes its own and the previous bucket:
            # any pair with 1 ≤ Δrank ≤ W spans adjacent buckets at most
            b = _side("b", ranked.withColumn(
                "__bk",
                F.explode(F.array(
                    F.expr(f"({rk} - 1) div {W} - 1"),
                    F.expr(f"({rk} - 1) div {W}"),
                )),
            ))
            cond = F.expr(
                " AND ".join(
                    [f"a_{c} = b_{c}" for c in block_cols]
                    + ["a___bk = b___bk",
                       f"b_{rk} - a_{rk} BETWEEN 1 AND {W}"]
                    + extra
                    + band
                )
            )
            return pair_expansion_join(
                a,
                b,
                cond,
                probe_keys=[f"a_{c}" for c in block_cols] + ["a___bk"],
                build_keys=[f"b_{c}" for c in block_cols] + ["b___bk"],
                build_amplification=2,
            )

        passes = _pass("__rkf", []).unionByName(
            _pass("__rkr", [f"abs(b___rkf - a___rkf) > {W}"])
        )
        # canonicalize on id order (fields follow their ids)
        lo_is_a = F.col(f"a_{id_col}") < F.col(f"b_{id_col}")
        pairs = passes.select(
            F.when(lo_is_a, F.col(f"a_{id_col}"))
            .otherwise(F.col(f"b_{id_col}"))
            .alias("id_a"),
            F.when(lo_is_a, F.col(f"b_{id_col}"))
            .otherwise(F.col(f"a_{id_col}"))
            .alias("id_b"),
            F.when(lo_is_a, F.col(f"a_{field}"))
            .otherwise(F.col(f"b_{field}"))
            .alias("__fa"),
            F.when(lo_is_a, F.col(f"b_{field}"))
            .otherwise(F.col(f"a_{field}"))
            .alias("__fb"),
        )

    def score(batches: _Iterator[_pd.DataFrame]) -> _Iterator[_pd.DataFrame]:
        # Score once per DISTINCT NAME PAIR, gather per row: candidate
        # volume is window-quadratic but the distinct-name universe is
        # corpus-bounded (the part corpus at sf0.1: 2.3M candidate pairs
        # over 64 distinct names → 872 distinct pairs, so the comparator
        # and the histogram prefilter were each being re-run ~2600× per
        # row batch). The memo holds per Python worker for the task's
        # lifetime — name-pair cardinality, never pair cardinality. A pair
        # failing the (necessary) histogram bound memoizes as 0: it
        # provably sits below the threshold, and the stage only emits
        # rows >= threshold_ppm, so the placeholder never leaves the
        # worker. Identical non-empty strings score 10^6 without a
        # comparator call (jw_ppm's own fast path; the JVM filter already
        # keeps most of them out of this stage entirely).
        hist_cache: dict[str, "_np.ndarray"] = {}
        pair_cache: dict[tuple[str, str], int] = {}

        def hist27(s: str) -> "_np.ndarray":
            h = hist_cache.get(s)
            if h is None:
                h = _np.zeros(27, dtype=_np.int32)
                for ch in s:
                    o = ord(ch)
                    h[o - 97 if 97 <= o <= 122 else 26] += 1
                hist_cache[s] = h
            return h

        def pair_score(a: str, b: str) -> int:
            s = pair_cache.get((a, b))
            if s is None:
                if c_ppm > 0:
                    ha, hb = hist27(a), hist27(b)
                    isect = int(_np.minimum(ha, hb).sum())
                    la, lb = len(a), len(b)
                    if isect * (la + lb) * 1_000_000 < c_ppm * la * lb:
                        pair_cache[(a, b)] = 0
                        return 0
                s = jw_ppm(a, b)
                pair_cache[(a, b)] = s
            return s

        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            ca, ua = _pd.factorize(pdf["__fa"])
            cb, ub = _pd.factorize(pdf["__fb"])
            code = ca.astype(_np.int64) * len(ub) + cb
            uniq, inv = _np.unique(code, return_inverse=True)
            uscores = _np.fromiter(
                (
                    pair_score(str(ua[c // len(ub)]), str(ub[c % len(ub)]))
                    for c in uniq
                ),
                dtype=_np.int64,
                count=len(uniq),
            )
            ppm = uscores[inv]
            keep = ppm >= threshold_ppm
            yield _pd.DataFrame(
                {
                    "id_a": pdf["id_a"].to_numpy()[keep],
                    "id_b": pdf["id_b"].to_numpy()[keep],
                    "jw_ppm": ppm[keep],
                }
            )

    # identical-string pairs (the dominant survivors on duplicate-heavy
    # corpora) score exactly 10^6 — a JVM column fact, so they never cross
    # the Arrow boundary at all; only genuinely-unequal pairs pay Python
    eq = (
        F.col("__fa").eqNullSafe(F.col("__fb"))
        & F.col("__fa").isNotNull()
        & (F.col("__fa") != "")
    )
    scored_ne = pairs.filter(~eq).mapInPandas(
        score, schema="id_a long, id_b long, jw_ppm long"
    )
    if threshold_ppm > JW_PPM_SCALE:
        return scored_ne
    scored_eq = pairs.filter(eq).select(
        "id_a", "id_b", F.lit(JW_PPM_SCALE).cast("long").alias("jw_ppm")
    )
    return scored_eq.unionByName(scored_ne)


def jw_reference_python(
    parquet_path: str,
    threshold_ppm: int,
    neighborhood: int | None = None,
) -> list[tuple[int, int, int]]:
    """Single-process reference for :func:`jaro_winkler_pairs` over the
    part table blocked by brand: DuckDB generates the blocked pairs
    independently, and the comparator below is a from-the-spec
    reimplementation structured differently from :func:`jw_ppm` (per-char
    position queues instead of a b-side availability scan; transposition
    count from the paired match lists) — exactness comes from the spec's
    integer arithmetic, not shared code.  Returns (id_a, id_b, jw_ppm)
    rows at or above the threshold, backing the golden-VALUES oracle of
    ``er_jaro_winkler_pairs``."""
    from collections import deque

    import duckdb

    def ref_jw(a: str, b: str) -> int:
        if a == b:
            return 1_000_000 if a else 0
        la, lb = len(a), len(b)
        if not la or not lb:
            return 0
        w = max(max(la, lb) // 2 - 1, 0)
        pos: dict[str, deque] = {}
        for j, ch in enumerate(b):
            pos.setdefault(ch, deque()).append(j)
        a_hits: list[int] = []   # matched a-positions in order
        b_hits: list[int] = []   # their matched b-positions
        for i, ch in enumerate(a):
            q = pos.get(ch)
            if not q:
                continue
            while q and q[0] < i - w:
                q.popleft()
            if q and q[0] <= i + w:
                b_hits.append(q.popleft())
                a_hits.append(i)
        m = len(a_hits)
        if m == 0:
            return 0
        k = sum(
            1
            for i, j in zip(a_hits, sorted(b_hits))
            if a[i] != b[j]
        )
        jn = 2 * m * m * lb + 2 * m * m * la + (2 * m - k) * la * lb
        jd = 6 * la * lb * m
        l = 0
        for x, y in zip(a[:4], b[:4]):
            if x != y:
                break
            l += 1
        return 1_000_000 * (10 * jn + l * (jd - jn)) // (10 * jd)

    if neighborhood is None:
        rows = duckdb.sql(
            f"""
            SELECT a.p_partkey, b.p_partkey, a.p_name, b.p_name
            FROM '{parquet_path}' a JOIN '{parquet_path}' b
              ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
            """
        ).fetchall()
    else:
        # replay the engine's two-pass sorted-neighborhood blocking
        # EXACTLY: total-ordered ranks by (field, id) forward and by
        # (reverse(field), id), candidates = pairs within W positions in
        # EITHER pass (the union estimand), canonicalized on id order
        rows = duckdb.sql(
            f"""
            WITH r AS (
                SELECT p_partkey, p_name, p_brand,
                       ROW_NUMBER() OVER (PARTITION BY p_brand
                           ORDER BY p_name, p_partkey) AS rkf,
                       ROW_NUMBER() OVER (PARTITION BY p_brand
                           ORDER BY reverse(p_name), p_partkey) AS rkr
                FROM '{parquet_path}'
            )
            SELECT LEAST(a.p_partkey, b.p_partkey),
                   GREATEST(a.p_partkey, b.p_partkey),
                   a.p_name, b.p_name
            FROM r a JOIN r b
              ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
             AND (abs(a.rkf - b.rkf) <= {int(neighborhood)}
                  OR abs(a.rkr - b.rkr) <= {int(neighborhood)})
            """
        ).fetchall()
    out = []
    for ia, ib, na, nb in rows:
        s = ref_jw(na, nb)
        if s >= threshold_ppm:
            out.append((int(ia), int(ib), s))
    out.sort()
    return out

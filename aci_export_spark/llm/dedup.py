"""Corpus deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (the part that matters at 100 TB):
- nothing compares all pairs: candidates come from hash buckets (exact key,
  LSH band, SimHash prefix), so the shuffle volume is O(n · bands), not O(n²);
- bucket keys are uniform hashes → no skew;
- verification (exact Jaccard) runs only inside candidate buckets.

All hashing is md5-derived (see `hashing.py`) so results are engine-portable
and oracle-checkable.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aci_export_spark.functions.text import normalize_text
from aci_export_spark.llm.hashing import hash64


def word_tokens(text: Column) -> Column:
    """Whitespace tokens of normalized text (portable: same split in DuckDB
    via string_split_regex(lower(..), '\\s+'))."""
    return F.split(normalize_text(text), r"\s+")


_BYTE_SUFFIX = {"": 1, "b": 1, "k": 1 << 10, "kb": 1 << 10, "m": 1 << 20,
                "mb": 1 << 20, "g": 1 << 30, "gb": 1 << 30,
                "t": 1 << 40, "tb": 1 << 40, "p": 1 << 50, "pb": 1 << 50}


def _parse_bytes(v: str) -> int:
    """Spark byte-size conf string ('134217728b', '128m', '1g') → bytes.

    Covers every suffix Spark's ByteUnit accepts (b/k/m/g/t/p, with or
    without a trailing 'b') plus fractional magnitudes ('0.5g'). An
    unparseable string returns a conservative 128 MiB default rather than
    raising: the sole caller uses the value to decide whether a scan is
    already wide, and raising here used to be swallowed by the caller's
    blanket except — silently disabling the wide-scan guard entirely
    (round-6 ADVICE)."""
    s = str(v).strip().lower()
    digits = s.rstrip("kmgbtp")
    try:
        return int(float(digits) * _BYTE_SUFFIX[s[len(digits):]])
    except (KeyError, ValueError):
        return 128 << 20


def scan_input_bytes(df: DataFrame) -> int | None:
    """Total on-disk bytes of `df`'s file-source scans, from catalog
    metadata only (`inputFiles()` + filesystem sizes — no job, no `.rdd`
    analysis pass). Returns None when the size is UNKNOWABLE this way:
    a file-less source (in-memory frame, checkpoint scan) or an
    unreadable path. Callers gating a broadcast on this value must treat
    None as "unbounded" — the whole point is to never broadcast a side
    whose size nothing proves."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for f in files:
        path = f
        if path.startswith("file:"):
            path = path[5:]
            while path.startswith("//"):
                path = path[1:]
        try:
            total += os.path.getsize(path)
        except OSError:
            return None
    return total


def spread_for_explode(df: DataFrame, width: int | None = None) -> DataFrame:
    """Round-robin repartition a narrow input up to the cluster's default
    parallelism BEFORE a generator amplifies it ~100-1000×.

    `width` caps the spread below default parallelism — the right setting
    when the consumer is a PYTHON (Arrow) stage rather than JVM codegen:
    every mapInPandas partition pays a fixed worker/Arrow-IPC overhead
    PER STAGE, so full width multiplies CPU-seconds without buying wall
    (measured on the mp4 chain at sf0.1: 1/4/8/32 partitions → warm wall
    2.9/1.6/1.25/1.6 s at 4.4/8.0/11.5/36.5 CPU-s — 32-way costs 8× the
    CPU of serial for a wall WORSE than 8-way). JVM-side consumers keep
    the default full width.

    A scan with few input splits (the extreme: one small parquet file, the
    local-bench shape) would otherwise serialize the whole explode and the
    partial aggregation above it through that many cores, regardless of
    cluster size — the shuffle that matters is the one that *doesn't happen*
    after the explosion. Moving the pre-explosion rows is negligible next to
    the generator output. Guarded: a scan that is already wide — either ≥
    parallelism input files, or few files whose total bytes split into ≥
    parallelism partitions under `spark.sql.files.maxPartitionBytes` (a few
    large splittable parquet files is the common warehouse layout) — is left
    alone: it never reduces partitioning. The guard reads `inputFiles()` +
    filesystem sizes (pure catalog/metadata lookups) rather than
    `df.rdd.getNumPartitions()`: touching `.rdd` forces an extra analysis +
    RDD conversion pass on the query path in PySpark 4. Non-file sources
    (in-memory test frames) report no files and take the repartition, which
    is the narrow-input case the helper exists for.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if width is not None:
        target = min(target, width)
    try:
        files = df.inputFiles()
        if len(files) >= target:
            return df
        if files:
            max_split = _parse_bytes(
                df.sparkSession.conf.get(
                    "spark.sql.files.maxPartitionBytes", "128m"
                )
            )
            # shared path-normalization + size walk (None = size unknowable
            # -> fall through to the repartition, the conservative side
            # HERE, opposite of a broadcast gate)
            total = scan_input_bytes(df)
            if total is not None and total // max_split >= target:
                return df
        else:
            # no files: an in-memory frame OR an already-materialized
            # artifact (localCheckpoint scan). The latter is typically
            # pre-repartitioned — honor its width instead of paying a
            # second shuffle. `.rdd` costs an extra analysis pass, but only
            # this file-less branch pays it (checkpointed inputs resolve
            # instantly; test frames are tiny).
            if df.rdd.getNumPartitions() >= target:
                return df
    except Exception:
        pass
    return df.repartition(target)


def pin_join_parallelism(df: DataFrame, *cols: str) -> DataFrame:
    """Explicit keyed repartition to default parallelism before a join whose
    PER-ROW cost is large (e.g. each joined row triggers an intersect over
    multi-KB arrays).

    AQE's partition coalescing sizes partitions by SHUFFLE BYTES; a candidate
    -pair table is bytes-tiny but compute-huge, so AQE would coalesce the
    join to 1-2 tasks and serialize the array work. An explicit
    repartition(N, keys) is never coalesced by AQE, pinning the join at N
    tasks. The keys match the join keys so no extra exchange is introduced.
    """
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism, *cols)


def exact_dedup_by_key(df: DataFrame, key: Column, id_col: str) -> DataFrame:
    """Exact dedup: hash-groupBy a content key, keep the smallest id.

    The key should be a digest (md5 of normalized content) — grouping on a
    fixed-width hash instead of raw text keeps shuffle rows small and uniform.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    token_col: str,
    bucket_col: str,
    threshold: float,
) -> DataFrame:
    """Exact token-set Jaccard over candidate pairs within a bucket.

    `bucket_col` bounds the comparison set (language, LSH band, IVF cell…);
    the self-join is an equi-join on the bucket so Spark shuffles each bucket
    once. Emits (id_a < id_b, jaccard) for pairs ≥ threshold.

    Empty token sets are excluded up front (same contract as the prefix
    plan): Jaccard of two empty sets is 0/0 — undefined, and a crash under
    ANSI division — and an empty set can never reach a positive threshold
    against anything else. (Caught by the prefix≡naive hypothesis
    differential on a two-empty-doc corpus.)
    """
    sets = df.select(
        F.col(id_col), F.col(bucket_col).alias("__bucket"),
        F.array_distinct(F.col(token_col)).alias("__set"),
    ).filter(F.size("__set") > 0)
    a = sets.select(
        F.col("__bucket"),
        F.col(id_col).alias("id_a"), F.col("__set").alias("set_a"),
    )
    b = sets.select(
        F.col("__bucket"),
        F.col(id_col).alias("id_b"), F.col("__set").alias("set_b"),
    )
    pairs = a.join(b, on="__bucket").filter(F.col("id_a") < F.col("id_b"))
    # |A∪B| = |A|+|B|−|A∩B| (both sides array_distinct'ed above): size
    # arithmetic instead of materializing the union array per pair — the
    # same exact integers divide, so the jaccard double is bit-identical
    inter_n = F.size(F.array_intersect("set_a", "set_b"))
    inter = inter_n.cast("double")
    union = (F.size("set_a") + F.size("set_b") - inter_n).cast("double")
    jac = (inter / union).alias("jaccard")
    return (
        pairs.select("id_a", "id_b", jac)
        .filter(F.col("jaccard") >= threshold)
    )


def jaccard_pairs_prefix(
    df: DataFrame,
    id_col: str,
    token_col: str,
    bucket_col: str,
    threshold: float,
    probe: DataFrame | None = None,
) -> DataFrame:
    """Exact-threshold Jaccard pairs via prefix filtering (AllPairs/PPJoin).

    Same results as :func:`jaccard_pairs` — different physical plan. Instead
    of the O(bucket²) self-join, each document indexes only its *prefix*:
    the |d| - ⌈t·|d|⌉ + 1 globally-rarest tokens under a (frequency, token)
    total order. Two documents with Jaccard ≥ t provably share a prefix
    token, so the candidate join runs on exploded prefixes — at high t the
    prefix is ~(1-t)·|d| tokens, shrinking the join input by ~10× and the
    candidate pairs by orders of magnitude. Survives corpus scale where the
    quadratic bucket join cannot.

    Exact verification (array_intersect Jaccard) then makes the output
    identical to the naive plan.

    `probe` (optional): a DataFrame of ids (`id_col`) forming the delta side
    of an incremental run. When given, candidates are generated only from
    probe-side prefixes against the full index, so candidate volume is
    O(|probe| · prefix) instead of O(corpus · prefix) — the daily-ingest
    contract where the delta is a small fraction of the corpus. Emitted
    pairs are exactly those involving ≥1 probe doc (normalized id_a < id_b,
    each pair once); corpus-only pairs are never generated.
    """
    sets = spread_for_explode(df).select(
        F.col(id_col),
        F.col(bucket_col).alias("__bucket"),
        F.array_distinct(F.col(token_col)).alias("__set"),
    ).filter(F.size("__set") > 0)

    # ONE hashed-set table feeds both the prefix index and the verify join:
    # tokens hashed to 8-byte longs (array_intersect sizes — hence jaccard
    # values — identical up to in-pair xxhash64 collisions, ~1e-15/pair).
    # Lazily persisted so the corpus scan + normalize + explode subtree runs
    # once and is reused by freq, ranked, and both verify sides — without an
    # eager checkpoint barrier.
    # array_distinct AFTER hashing (r13): __set is already token-distinct,
    # so this only collapses in-set xxhash64 collisions (~1e-15/doc) — it
    # makes |A|+|B|−|A∩B| PROVABLY equal to |A∪B| for the verify-join
    # arithmetic below, at one linear pass per doc instead of one
    # array_union allocation per candidate pair.
    hsets = sets.select(
        F.col(id_col),
        F.col("__bucket"),
        F.array_sort(
            F.array_distinct(F.transform("__set", lambda x: F.xxhash64(x)))
        ).alias("__hs"),
    ).persist()

    tok = hsets.select(
        F.col(id_col), F.col("__bucket"), F.explode("__hs").alias("__tok")
    )
    freq = tok.groupBy("__bucket", "__tok").agg(F.count(F.lit(1)).alias("__f"))
    # per-doc tokens ordered rarest-first under the global (freq, token)
    # order — any total order satisfies the prefix-filter theorem, so
    # ordering hashed longs (cheaper than strings) preserves exactness
    ranked = (
        tok.join(freq, on=["__bucket", "__tok"])
        .groupBy(id_col, "__bucket")
        .agg(F.array_sort(F.collect_list(F.struct("__f", "__tok"))).alias("__st"))
    )
    # ⌈t'·|d|⌉ in pure int64 over a FLOOR-rounded rational t' =
    # floor(t·10⁶)/10⁶ ≤ t.  Two float traps hide here: a float product
    # like 0.9·10 → 9.0000…1 would ceil to 10 and shrink the prefix, and
    # a HALF-UP rounding of t (the old decimal(9,6) cast) rounds 2/3 to
    # 0.666667 > t — a STRICTER threshold whose shorter prefix provably
    # missed boundary pairs with t ≤ jaccard < t' (caught by the
    # jaccard_pairs_prefix ≡ naive hypothesis property).  A lower bound
    # t' ≤ t keeps both the prefix theorem and the PPJoin prunes necessary
    # conditions for jaccard ≥ t: the prefix only lengthens and the prunes
    # only loosen — exactness preserved, at most a few extra candidates
    # for the verify join to reject.
    import math as _math

    from fractions import Fraction

    frac = Fraction(int(_math.floor(threshold * 10**6)), 10**6)
    sz = F.size("__st")
    prefix_len = F.expr(
        f"cast(size(__st) - (({frac.numerator} * cast(size(__st) as bigint)"
        f" + {frac.denominator - 1}) div {frac.denominator}) + 1 as int)"
    )
    # small (≈(1-t)·tokens rows); lazily persisted — NOT localCheckpoint:
    # the self-join's two sides are identical subplans, so Spark reuses one
    # exchange (ReusedExchange) and the subtree runs once inside the same
    # job either way, while an eager checkpoint would add a full job barrier
    # (~3 s of serialize+schedule at bench scale, pure overhead at any
    # scale). persist() covers the case where AQE re-plans the sides
    # differently. Carries the 0-based prefix POSITION and the set SIZE for
    # PPJoin-style pruning.
    pref = ranked.select(
        F.col(id_col),
        F.col("__bucket"),
        sz.alias("__sz"),
        F.posexplode(
            F.slice(F.transform("__st", lambda x: x["__tok"]), F.lit(1), prefix_len)
        ).alias("__pos", "__ptok"),
    ).persist()
    # PPJoin candidate pruning, applied BEFORE the pair-dedup shuffle:
    # - size filter: jaccard ≥ t ⇒ min(|A|,|B|) ≥ t·max(|A|,|B|)
    # - position filter: a prefix token matched at 0-based positions
    #   (pa, pb) bounds the overlap by ub = 1 + min(|A|-1-pa, |B|-1-pb)
    #   (the matched token plus whatever follows it on each side), and
    #   jaccard ≥ t ⇔ overlap·(1+t) ≥ t·(|A|+|B|).
    # Both compare in pure int64: t is materialized as the exact rational
    # num/den of the FLOOR-rounded rational t' ≤ t (the same one the
    # prefix length used above — a half-up rounding here once dropped the
    # exact-boundary pair), so `x ≥ t'·y` becomes `x·den ≥ num·y` — no
    # float rounding can drop a boundary pair, and the predicate stays in
    # whole-stage codegen instead of per-row BigDecimal (measurably faster
    # on millions of candidate rows).
    # Both filters are necessary conditions for jaccard ≥ t' (hence for
    # jaccard ≥ t ≥ t'), so pruning with them keeps the output exactly
    # equal to the naive all-pairs plan; on a template-heavy corpus they
    # cut candidates severalfold right where the plan is most expensive
    # (the distinct + verify shuffles).
    num, den = F.lit(frac.numerator), F.lit(frac.denominator)
    ub = F.lit(1) + F.least(
        F.col("__sza") - 1 - F.col("__pa"), F.col("__szb") - 1 - F.col("__pb")
    )
    # probe side: the whole prefix table (symmetric self-join) or only the
    # delta docs' prefix rows (incremental — semi-join keeps the index
    # intact while the probe stream shrinks to the delta)
    probe_pref = (
        pref
        if probe is None
        else pref.join(
            probe.select(F.col(id_col)).distinct(), on=id_col, how="left_semi"
        )
    )
    cand = probe_pref.select(
        F.col(id_col).alias("__ida"), "__bucket", "__ptok",
        F.col("__sz").alias("__sza"), F.col("__pos").alias("__pa"),
    ).join(
        pref.select(
            F.col(id_col).alias("__idb"), "__bucket", "__ptok",
            F.col("__sz").alias("__szb"), F.col("__pos").alias("__pb"),
        ),
        on=["__bucket", "__ptok"],
    )
    if probe is None:
        cand = cand.filter(F.col("__ida") < F.col("__idb"))
    else:
        # both orientations are generated for probe-probe pairs; the
        # least/greatest normalization below + distinct collapses them
        cand = cand.filter(F.col("__ida") != F.col("__idb"))
    # both prune filters are symmetric in the (a, b) roles, so they hold
    # regardless of which side probed
    cand = (
        cand.filter(
            F.least("__sza", "__szb") * den >= num * F.greatest("__sza", "__szb")
        )
        .filter(ub * (den + num) >= num * (F.col("__sza") + F.col("__szb")))
        .select(
            F.least("__ida", "__idb").alias("id_a"),
            F.greatest("__ida", "__idb").alias("id_b"),
        )
        # pin the pair-dedup shuffle at default parallelism: the explicit
        # keyed repartition satisfies distinct's distribution requirement (no
        # second exchange) and AQE never coalesces it — so the bytes-tiny but
        # compute-heavy verify below keeps N tasks instead of collapsing to 1
        .repartition(
            df.sparkSession.sparkContext.defaultParallelism, "id_a", "id_b"
        )
        .distinct()
    )
    a = hsets.select(F.col(id_col).alias("id_a"), F.col("__hs").alias("set_a"))
    b = hsets.select(F.col(id_col).alias("id_b"), F.col("__hs").alias("set_b"))
    # |A∪B| = |A|+|B|−|A∩B| (both arrays duplicate-free by construction
    # above): the r12 verify materialized a fresh array_union array per
    # candidate pair just to take its size — HALF the per-pair array work
    # in the hottest stage of the prefix plan (guide §1.2 step 2). The
    # division inputs are the same exact integers, so the jaccard double
    # is bit-identical.
    inter_n = F.size(F.array_intersect("set_a", "set_b"))
    inter = inter_n.cast("double")
    union = (F.size("set_a") + F.size("set_b") - inter_n).cast("double")
    verified = (
        cand.join(a, on="id_a")
        .join(b, on="id_b")
        .select("id_a", "id_b", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    # Materialize the (small) verified-pairs output, then RELEASE the two
    # persisted intermediates. Spark SQL's CacheManager holds persisted
    # plans until explicit unpersist or session end — a long-lived session
    # running many dedup calls (the driver's 80-query correctness sweep,
    # bench) would otherwise accumulate dead cache blocks and degrade
    # run-wide (measured 2-3× on the full bench). The eager checkpoint is
    # the per-call cost of self-contained lifecycle: one extra write of the
    # near-dup pairs table — tiny relative to the corpus, and exactly what
    # a production pipeline checkpoints before fanning the pairs out to
    # clustering anyway.
    import os

    if os.environ.get("SPARK_GRAFT_PLAN_CAPTURE"):
        # plan-audit escape hatch (scripts/gen_plans.py): return the lazy
        # DataFrame so `.explain` shows the computation, not the checkpoint
        # scan the materialized path leaves behind. The two persisted
        # intermediates stay registered — unpersisting them here would make
        # the captured plan re-derive the shared subtree per consumer,
        # misrepresenting the shipped operator (which holds them through its
        # materialization). Audit sessions are one-shot, so the handful of
        # leaked cache entries is bounded and dies with the session.
        return verified
    out = verified.localCheckpoint(eager=True)
    hsets.unpersist()
    pref.unpersist()
    return out


def shingle_rows(
    df: DataFrame, id_col: str, text_col: str, n: int = 5
) -> DataFrame:
    """(id, shingle) rows: character n-grams of the normalized text, one per
    row.

    Row-exploded on purpose: the array-expression form (`char_ngrams`)
    captures the normalized string inside a lambda, which projection collapse
    re-evaluates per element — O(len²) per document. Here normalize runs once
    per document, the generator emits positions, and the substr above the
    Generate reads a bound attribute — O(len) total, and the downstream
    MinHash becomes a plain aggregation.

    Duplicate shingles are NOT removed: min() is duplicate-invariant, and
    set-consumers dedup themselves (collect_set).
    """
    norm = spread_for_explode(
        df.select(F.col(id_col), normalize_text(F.col(text_col)).alias("__norm"))
    )
    positions = norm.select(
        F.col(id_col),
        F.col("__norm"),
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length("__norm") - (n - 1), F.lit(1)))
        ).alias("__pos"),
    )
    return positions.select(
        F.col(id_col), F.col("__norm").substr(F.col("__pos"), F.lit(n)).alias("shingle")
    )


def _perm_min(i: int) -> Column:
    """One MinHash signature function: re-mix the base shingle hash with the
    function index via xxhash64. A multiply-add permutation family would be
    arithmetically cheaper, but Spark 4 runs ANSI mode where long overflow
    throws — xxhash64 stays in codegen, wraps internally, and costs ~the
    same once the shingle string itself is hashed only once."""
    return F.min(F.xxhash64(F.lit(i), F.col("__h"))).alias(f"__mh{i}")


def minhash_signatures(
    shingles: DataFrame, id_col: str, shingle_col: str = "shingle", num_hashes: int = 16
) -> DataFrame:
    """(id, __mh0..__mhk) MinHash signature as ONE aggregation.

    Each shingle row is hashed once (xxhash64) and re-mixed per function
    with a literal index; `min` is a partial aggregate, so the map side
    collapses every document's shingles to `num_hashes` longs before the
    single shuffle on doc id. This is the formulation that survives a
    100 TB corpus: shuffle volume is O(docs · num_hashes), never
    O(shingles).
    """
    hashed = hashed_shingle_rows(shingles, id_col, shingle_col)
    return hashed.groupBy(id_col).agg(*[_perm_min(i) for i in range(num_hashes)])


def hashed_shingle_rows(
    shingles: DataFrame, id_col: str, shingle_col: str = "shingle"
) -> DataFrame:
    """(id, __h) rows: each shingle string hashed ONCE to a 64-bit long.

    Downstream consumers (signature mins, verify sets) then work on fixed
    8-byte values — the per-function re-mixes hash a long, not the string,
    and verify-set shuffles carry longs, not 5-char strings. Project under
    Aggregate is not collapsed, so __h really is computed once per row.
    """
    return shingles.select(F.col(id_col), F.xxhash64(F.col(shingle_col)).alias("__h"))


def lsh_band_rows(
    sig: DataFrame,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """The LSH *index* itself: one (id, band_id, band_key) row per band of
    a MinHash signature table.  This is the table a 100 TB pipeline
    persists and maintains incrementally — new documents append their
    `bands` rows (signature computed from the delta's shingles only),
    deleted documents anti-join out by id; the corpus is never re-shingled
    (see :mod:`aci_export_spark.operators.ivm` for the same argument on
    aggregates)."""
    rows_per_band = num_hashes // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("band_id"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"__mh{i * rows_per_band + j}").cast("string")
                            for j in range(rows_per_band)
                        ],
                    )
                ).alias("band_key"),
            )
            for i in range(bands)
        ]
    )
    return sig.select(F.col(id_col), F.explode(band_structs).alias("__b")).select(
        F.col(id_col), F.col("__b.band_id"), F.col("__b.band_key")
    )


def minhash_lsh_candidates(
    sig: DataFrame,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Banded LSH candidate pairs from a signature table
    (:func:`minhash_signatures` output).

    Signature → `bands` bands of num_hashes/bands values → one row per
    (doc, band) keyed by md5(band values) → self-join per (band_id,
    band_key). Each doc contributes exactly `bands` shuffle rows regardless
    of size; candidate generation is linear in n. Returns distinct
    (id_a < id_b) pairs.
    """
    banded = lsh_band_rows(sig, id_col, num_hashes=num_hashes, bands=bands)
    a = banded.select(F.col(id_col).alias("id_a"), "band_id", "band_key")
    b = banded.select(F.col(id_col).alias("id_b"), "band_id", "band_key")
    return (
        a.join(b, on=["band_id", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_signatures_portable(
    shingles: DataFrame,
    id_col: str,
    shingle_col: str = "shingle",
    num_hashes: int = 16,
    set_col: str | None = None,
) -> DataFrame:
    """Engine-portable MinHash signature table: unlike
    :func:`minhash_signatures` (xxhash64 remix — fastest, Spark-only),
    every value here is replayable bit-for-bit by any engine with md5.

    Kirsch-Mitzenmacher construction: ONE md5 per shingle split into two
    independent halves — h1 = first 15 hex chars (60 bits), h2 = chars
    17-30 (56 bits) — and hash function i is ``(h1 + i·h2) & (2⁶⁰−1)``.
    h2's 56-bit bound keeps ``i·h2`` ≤ 15·2⁵⁶ < 2⁶⁰, so the sum stays
    under 2⁶¹ and never trips Spark's ANSI-mode overflow; the mask is a
    plain bitwise AND both engines share. Same shuffle shape as the fast
    path: min() collapses map-side, O(docs·num_hashes) rows move.

    ``set_col`` (r13): additionally collect the distinct shingle set into
    that column in the SAME aggregation — a consumer that needs both the
    signature and the exact set (the recall audit's truth side) then pays
    ONE pass over the shingle rows and one shuffle instead of two
    (guide §1.2 step 1: don't recompute what one aggregation can carry).
    """
    md5c = F.md5(F.col(shingle_col))
    carry = [F.col(shingle_col)] if set_col else []
    hashed = shingles.select(
        F.col(id_col),
        *carry,
        F.conv(F.substring(md5c, 1, 15), 16, 10).cast("long").alias("__h1"),
        F.conv(F.substring(md5c, 17, 14), 16, 10).cast("long").alias("__h2"),
    )
    mask = F.lit((1 << 60) - 1)
    aggs = [
        F.min(
            (F.col("__h1") + F.lit(i) * F.col("__h2")).bitwiseAND(mask)
        ).alias(f"__mh{i}")
        for i in range(num_hashes)
    ]
    if set_col:
        aggs.append(F.collect_set(shingle_col).alias(set_col))
    return hashed.groupBy(id_col).agg(*aggs)


def lsh_recall_audit(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.9,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Measured LSH quality, as a first-class query: confusion counts of
    the banded-LSH candidate set against exact ground truth (all pairs
    with word-token-set Jaccard ≥ threshold, via the prefix-filter plan).

    One row: n_true (exact pairs), n_candidates (LSH bucket collisions),
    n_found (true ∧ candidate), n_missed (true pairs LSH never bucketed
    together — the S-curve miss mass the banding scheme accepts),
    n_pruned (candidates the exact verify would reject). recall =
    n_found/n_true and the verify workload factor n_pruned/n_found fall
    out as exact integer ratios — "measure, don't guess" for the dedup
    pipeline's accuracy/cost dial (more bands → fewer misses, more
    pruned candidates).

    Deterministic end to end: signatures use the PORTABLE md5 hash family
    (:func:`minhash_signatures_portable`), so an external engine replays
    the identical buckets and the identical counts — no "recall ≈ 1 -
    (1-j^r)^b" modeling assumption anywhere. The similarity is 3-WORD-GRAM
    set Jaccard: exact truth must push every set element through the
    prefix plan, so the gram universe picks the cost — 5-char shingles
    make sets ~10× larger than the token count (6.8 s truth at sf0.1),
    bare tokens make the relation dense on template-heavy corpora (9 k
    true pairs at sf0.01 — candidate volume explodes), while 3-gram sets
    are token-count-sized AND distinctive (sparse truth). Documents under
    3 words have no grams and are out of scope on both engines. Scale
    shape: every stage is the linear LSH/prefix plan; the audit's cost is
    ~one dedup run plus one exact-pairs run, which is exactly what it
    measures.
    """
    from aci_export_spark import artifacts
    from aci_export_spark.llm.text import word_ngram_rows

    sh = word_ngram_rows(
        spread_for_explode(df), id_col, text_col, n=3, distinct=True
    ).withColumnRenamed("gram", "shingle")
    # ONE pass builds both per-doc facts (r13, guide §1.2): the portable
    # signature mins AND the exact gram set come out of a single
    # aggregation over the shingle rows — the r12 shape tokenized,
    # gram-built and shuffled the corpus TWICE (once per consumer).
    # persist_tracked: two downstream subtrees (candidates, truth) read
    # it; released at the next registered-query boundary.
    per_doc = artifacts.persist_tracked(
        minhash_signatures_portable(
            sh, id_col, num_hashes=num_hashes, set_col="__sset"
        )
    )
    sig = per_doc.select(
        F.col(id_col), *[F.col(f"__mh{i}") for i in range(num_hashes)]
    )
    cand = minhash_lsh_candidates(sig, id_col, num_hashes=num_hashes, bands=bands)
    sets = per_doc.select(F.col(id_col), "__sset").withColumn("__one", F.lit(0))
    truth = jaccard_pairs_prefix(sets, id_col, "__sset", "__one", threshold).select(
        "id_a", "id_b"
    )
    t = truth.withColumn("__t", F.lit(True))
    c = cand.withColumn("__c", F.lit(True))
    full = t.join(c, on=["id_a", "id_b"], how="full")
    is_t, is_c = F.col("__t").isNotNull(), F.col("__c").isNotNull()

    def cnt(cond):
        return F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0)).cast(
            "long"
        )

    return full.agg(
        cnt(is_t).alias("n_true"),
        cnt(is_c).alias("n_candidates"),
        cnt(is_t & is_c).alias("n_found"),
        cnt(is_t & ~is_c).alias("n_missed"),
        cnt(is_c & ~is_t).alias("n_pruned"),
    )


def minhash_lsh_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_size: int = 5,
) -> DataFrame:
    """Full near-dup pipeline: shingle rows → MinHash aggregation → LSH
    band buckets → exact-Jaccard verify on candidates only. Returns
    (id_a, id_b, jaccard ≥ threshold).

    Verification compares HASHED shingle sets (64-bit xxhash): exact up to
    in-pair hash collisions (~10⁻¹⁵ per pair — negligible and
    deterministic), and the verify shuffle carries 8-byte longs instead of
    shingle strings.
    """
    sh = shingle_rows(df, id_col, text_col, n=shingle_size)
    hashed = hashed_shingle_rows(sh, id_col, "shingle")
    # checkpointed EAGERLY: the signature table is reused by (a) band
    # bucketing and (b) the signature-agreement prefilter below — without it
    # Spark would re-read and re-shingle the corpus per consumer (the 100 TB
    # scale-killer). localCheckpoint() beats lazy persist() here: the
    # consumers sit in stage branches that AQE schedules concurrently, and a
    # lazy cache lets both branches race-compute the whole shingle subtree
    # (measured 2× slower than the barrier).
    sig = (
        hashed.groupBy(id_col)
        .agg(*[_perm_min(i) for i in range(num_hashes)])
        .localCheckpoint()
    )
    cand = minhash_lsh_candidates(sig, id_col, num_hashes, bands)

    # signature-agreement prefilter: the fraction of agreeing MinHash
    # components is an unbiased estimate of Jaccard, and both signatures are
    # ALREADY computed — so prune candidates whose estimate sits well below
    # threshold before any shingle array is built or shuffled. Banding at
    # r=rows/band is deliberately permissive (recall), so on template-heavy
    # corpora the candidate set is dominated by mid-similarity pairs: this
    # filter drops them for the cost of a broadcast join against the tiny
    # signature table. Margin 0.2 keeps a j=threshold pair with P≈0.96
    # (Binomial(16, t) tail); the pairs LSH exists to find (j≳0.8) pass with
    # P≈1. The exact-Jaccard verify then restores exact precision.
    sig_a = sig.select(
        F.col(id_col).alias("id_a"), *[F.col(f"__mh{i}").alias(f"__a{i}") for i in range(num_hashes)]
    )
    sig_b = sig.select(
        F.col(id_col).alias("id_b"), *[F.col(f"__mh{i}").alias(f"__b{i}") for i in range(num_hashes)]
    )
    agree = sum(
        F.when(F.col(f"__a{i}") == F.col(f"__b{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    )
    cand = (
        cand.join(sig_a, on="id_a")
        .join(sig_b, on="id_b")
        .filter(agree >= F.ceil(F.lit(max(0.0, threshold - 0.2)) * num_hashes))
        .select("id_a", "id_b")
        .localCheckpoint()
    )

    # verify candidates with exact Jaccard on hashed-shingle sets — built
    # ONLY for documents that appear in a candidate pair (semi-join before
    # the heavy collect_set; AQE picks broadcast when the candidate set is
    # small)
    cand_ids = (
        cand.select(F.col("id_a").alias(id_col))
        .unionByName(cand.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    # semi-join the DOCS (not the shingle rows) first, then re-shingle: a
    # join cannot be pushed below the shingle generator, so filtering the
    # exploded `hashed` would still shingle the whole corpus a second time.
    # This way the verify branch explodes candidate documents only.
    cand_docs = df.join(cand_ids, on=id_col, how="left_semi")
    cand_hashed = hashed_shingle_rows(
        shingle_rows(cand_docs, id_col, text_col, n=shingle_size), id_col, "shingle"
    )
    # consumed three times (size table + both verify sides) — checkpointed
    # so candidate docs are re-shingled once, not per consumer
    sets = (
        cand_hashed.groupBy(id_col)
        .agg(F.collect_set("__h").alias("__set"))
        .localCheckpoint()
    )

    # size-ratio prefilter: jaccard ≥ t ⇒ |A∩B| ≤ min(|A|,|B|) and
    # |A∪B| ≥ max(|A|,|B|) ⇒ min/max ≥ t. Joining the (tiny) size table
    # first drops length-mismatched candidates before their (large) shingle
    # arrays are ever shuffled.
    sizes = sets.select(F.col(id_col), F.size("__set").alias("__sz"))
    cand = (
        cand.join(sizes.select(F.col(id_col).alias("id_a"), F.col("__sz").alias("__sza")), on="id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("__sz").alias("__szb")), on="id_b")
        .filter(
            F.least("__sza", "__szb").cast("double")
            / F.greatest("__sza", "__szb").cast("double")
            >= F.lit(threshold)
        )
        .select("id_a", "id_b")
    )

    sh_a = sets.select(F.col(id_col).alias("id_a"), F.col("__set").alias("set_a"))
    sh_b = sets.select(F.col(id_col).alias("id_b"), F.col("__set").alias("set_b"))
    # |A∪B| = |A|+|B|−|A∩B| (collect_set output is duplicate-free): skip
    # materializing an array_union array per pair just for its size — half
    # the per-pair array work in the verify stage (guide §1.2 step 2).
    # Same exact integers divide, so the jaccard double is bit-identical.
    inter_n = F.size(F.array_intersect("set_a", "set_b"))
    verified = (
        pin_join_parallelism(cand, "id_a").join(sh_a, on="id_a").join(sh_b, on="id_b")
        .select(
            "id_a",
            "id_b",
            (
                inter_n.cast("double")
                / (F.size("set_a") + F.size("set_b") - inter_n).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified


SIMHASH_BITS = 32


def simhash_table(
    df: DataFrame, id_col: str, text_col: str, bits: int = SIMHASH_BITS
) -> DataFrame:
    """(id, simhash) — `bits`-wide SimHash of each document's distinct token
    set (≤ 60: the md5-derived token hash carries 60 usable bits).

    Classic bit-voting, shaped for Spark: explode tokens → one md5-derived
    hash per (doc, token) row → groupBy(doc) with `bits` conditional sums
    (one per bit) → assemble the output integer from vote signs. One
    shuffle on doc id (uniform, high-cardinality); everything else is
    codegen.

    Hamming distance between SimHashes approximates similarity of the token
    sets. Distinct tokens (set semantics) keep it length-invariant.
    """
    from aci_export_spark.llm.hashing import _hash64_lambda

    if not 1 <= bits <= 60:
        raise ValueError("bits must be in [1, 60] (md5-derived hash width)")
    tok = spread_for_explode(df).select(
        F.col(id_col),
        F.explode(F.array_distinct(word_tokens(F.col(text_col)))).alias("__t"),
    ).withColumn("__h", _hash64_lambda(F.col("__t"), "simhash:"))
    # ones-count formulation: the classic ±1 vote v_b = 2·ones_b − n, so
    # "v_b > 0" ⇔ "2·ones_b > n" — same sign, same tie handling (v_b = 0 ⇔
    # 2·ones_b = n ⇒ bit 0), but each aggregate is a bare shift+and+sum
    # instead of a conditional (measured ~2.5× faster over the token table
    # than `bits` SUM(CASE) aggregates)
    ones = [
        F.sum(F.shiftright(F.col("__h"), b).bitwiseAND(F.lit(1))).alias(f"__o{b}")
        for b in range(bits)
    ]
    voted = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n"), *ones)
    out = F.lit(0).cast("long")
    for b in range(bits):
        out = out + F.when(
            F.col(f"__o{b}") * 2 > F.col("__n"), F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return voted.select(F.col(id_col), out.alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 8, prefix_bits: int = 8
) -> DataFrame:
    """SimHash near-dup: bucket by the top `prefix_bits` of the simhash, then
    verify Hamming distance inside buckets only.

    The prefix bucket bounds the join (near-identical docs share high bits
    with high probability); for guaranteed recall at scale, run with several
    bit-rotations — this single-probe version is the harness embodiment.
    """
    sh = simhash_table(df, id_col, text_col).withColumnRenamed("simhash", "__simhash")
    sh = sh.withColumn("__bucket", F.shiftright("__simhash", SIMHASH_BITS - prefix_bits))
    a = sh.select(F.col(id_col).alias("id_a"), F.col("__simhash").alias("h_a"), "__bucket")
    b = sh.select(F.col(id_col).alias("id_b"), F.col("__simhash").alias("h_b"), "__bucket")
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        a.join(b, on="__bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_near_dup_pairs_blocked(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 8,
    n_blocks: int | None = None, bits: int = SIMHASH_BITS,
) -> DataFrame:
    """SimHash near-dup with GUARANTEED recall: pigeonhole block partition.

    The `SIMHASH_BITS` bits are split into `n_blocks` disjoint blocks
    (default `max_hamming + 1`). Two hashes within Hamming distance
    `max_hamming` differ in at most `max_hamming` blocks, so they agree
    *exactly* on at least one whole block — bucketing each doc once per
    (block_id, block value) therefore surfaces every qualifying pair, and
    the exact `bit_count(xor)` verify makes the output precisely
    {pairs : hamming ≤ max_hamming}. Unlike the prefix/rotation probe
    variant, this is exhaustive, hence oracle-checkable by a brute-force SQL
    self-join.

    Shuffle volume is `n_blocks` rows per doc (linear); comparisons are
    per-bucket, with block width bits/n_blocks. Block VALUE cardinality is
    what keeps the bucket join linear in the corpus: 2^(bits/n_blocks) must
    outgrow the doc count, or bucket sizes — and candidate pairs, which are
    per-bucket quadratic — grow with it (the 10× stress run measured
    exactly that for 8-bit blocks at 50k docs). At corpus scale use a wide
    hash with a small radius (60 bits, d=3 → 4 blocks of 15 bits → 32k
    bucket values); 32 bits is the demo shape for tiny corpora.
    """
    # one row per doc, consumed by both join sides — checkpoint so the
    # tokenize+vote subtree runs once
    sh = (
        simhash_table(df, id_col, text_col, bits=bits)
        .withColumnRenamed("simhash", "__simhash")
        .localCheckpoint()
    )
    return hamming_pairs_blocked(
        sh, id_col, "__simhash", max_hamming=max_hamming,
        n_blocks=n_blocks, bits=bits,
    )


def hamming_pairs_blocked(
    hashes: DataFrame, id_col: str, hash_col: str, max_hamming: int,
    bits: int, n_blocks: int | None = None,
) -> DataFrame:
    """Generic pigeonhole-blocked Hamming pair join over a precomputed
    (id, hash) table — the metric-agnostic core behind
    :func:`simhash_near_dup_pairs_blocked` (text) and the perceptual-hash
    image dedup (`multimodal.phash_pairs`). The hash table is consumed by
    both join sides; callers whose table is derived from an expensive
    subtree should checkpoint it first. Returns (id_a, id_b, hamming)."""
    if n_blocks is None:
        n_blocks = max_hamming + 1
    if n_blocks <= max_hamming:
        raise ValueError("n_blocks must exceed max_hamming for guaranteed recall")
    if n_blocks > bits:
        raise ValueError("n_blocks cannot exceed the hash width")
    bounds, start = [], 0
    for i in range(n_blocks):
        width = bits // n_blocks + (1 if i < bits % n_blocks else 0)
        bounds.append((start, width))
        start += width
    blocks = F.array(
        *[
            F.struct(
                F.lit(i).alias("block_id"),
                F.shiftright(hash_col, s).bitwiseAND(F.lit((1 << w) - 1)).alias("block_val"),
            )
            for i, (s, w) in enumerate(bounds)
        ]
    )
    banded = hashes.select(
        F.col(id_col), F.col(hash_col).alias("__h"), F.explode(blocks).alias("__b")
    ).select(F.col(id_col), F.col("__h"), F.col("__b.block_id"), F.col("__b.block_val"))
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("__h").alias("h_a"), "block_id", "block_val"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("__h").alias("h_b"), "block_id", "block_val"
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).cast("int")
    return (
        a.join(b, on=["block_id", "block_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# Exact duplicated-substring detection (r8) — the "deduplicating training
# data makes language models better" primitive (Lee et al., ACL 2022):
# find exact word n-grams shared across documents and score each document's
# duplicated-span exposure. Cross-document near-dup (MinHash above) misses
# templated spans inside otherwise-distinct documents; this catches them.
# ---------------------------------------------------------------------------


def duplicated_gram_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """(gram, n_docs, n_occurrences) for every exact word n-gram appearing
    in ≥ ``min_docs`` distinct documents — every occurrence counted, not
    per-doc distinct (frequency is the curation signal).

    100 TB shape: the candidate pass groups on the n-gram's 64-bit hash
    (fixed 8-byte shuffle keys, map-side combine absorbs the per-doc
    repetition executor-side); only CANDIDATE rows — the duplicated tail,
    a small fraction of any real corpus — carry the gram STRING into the
    verify group-by, which removes hash collisions by grouping on the
    actual text. The gram explode is localCheckpointed so the corpus is
    scanned once, matching the MinHash pipeline's discipline."""
    from aci_export_spark.llm.text import word_ngram_rows

    g = (
        word_ngram_rows(df, id_col, text_col, n=n, distinct=False)
        .withColumn("__h", F.xxhash64("gram"))
        .localCheckpoint(eager=True)
    )
    return _dup_grams_from_exploded(g, id_col, min_docs)


def _dup_grams_from_exploded(
    g: DataFrame, id_col: str, min_docs: int
) -> DataFrame:
    """The candidate→verify passes of :func:`duplicated_gram_table` over an
    already-exploded (and checkpointed) (id, gram) frame — factored out so
    :func:`dup_gram_position_stats` can share ONE corpus explode between
    the dup-table construction and its per-doc aggregations. Checkpoint
    the frame WITH ``__h`` already attached: computing it after the
    checkpoint would re-run xxhash64 over the corpus-sized explode in
    both the candidate group-by and the verify join (r9 review)."""
    if "__h" not in g.columns:
        g = g.withColumn("__h", F.xxhash64("gram"))
    cand = (
        g.groupBy("__h")
        .agg(F.count_distinct(F.col(id_col)).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("__h")
    )
    return (
        g.join(cand, on="__h")
        .groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct(F.col(id_col)).alias("n_docs"),
        )
        .filter(F.col("n_docs") >= min_docs)  # verify: collisions drop here
        .select("gram", "n_docs", "n_occurrences")
    )


def dup_gram_position_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
    dup_table: DataFrame | None = None,
) -> DataFrame:
    """Per-document duplicated-span exposure: (id, n_grams, n_dup_grams)
    where n_dup_grams counts the document's n-gram positions whose exact
    gram also appears in ≥ ``min_docs`` documents. n_dup_grams / n_grams is
    the Lee-et-al-style "fraction of the document inside a duplicated
    span" curation signal, kept as exact integers (the division belongs to
    the caller; overlapping spans are counted per position, which is the
    deterministic choice an exact oracle can replay). Documents shorter
    than n words come back with (0, 0) — a total assignment.

    ``dup_table`` lets a pipeline reuse an already-built
    :func:`duplicated_gram_table` (built once per corpus snapshot) instead
    of re-deriving it — it must have been built with the same (n,
    min_docs) over the same corpus. Without one, the corpus is exploded
    ONCE (localCheckpoint) and that frame feeds both the dup-table
    construction and the per-doc aggregations — the module's scan-once
    discipline holds for direct callers too (ADVICE r8)."""
    from aci_export_spark.llm.text import word_ngram_rows

    g = word_ngram_rows(df, id_col, text_col, n=n, distinct=False)
    if dup_table is not None:
        dup = dup_table
    else:
        g = g.withColumn("__h", F.xxhash64("gram")).localCheckpoint(
            eager=True
        )
        dup = _dup_grams_from_exploded(g, id_col, min_docs)
    flagged = (
        g.join(dup.select("gram"), on="gram", how="left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_dup_grams"))
    )
    totals = g.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    return (
        df.select(id_col)
        .distinct()
        .join(totals, on=id_col, how="left")
        .join(flagged, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_dup_grams", F.lit(0)).alias("n_dup_grams"),
        )
    )


def gram_stats_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Full per-gram statistics (gram, n_docs, n_occurrences) over EVERY
    word n-gram — the maintained INDEX for incremental exact-substring
    dedup (the duplicated-gram table is this filtered to n_docs ≥ 2, but
    singleton grams must be kept: a singleton plus one delta occurrence
    becomes a duplicate). Production keeps this table bucketed by gram
    (or its hash), so the incremental merge below is a co-partitioned
    sum with no corpus-wide exchange."""
    from aci_export_spark.llm.text import word_ngram_rows

    g = word_ngram_rows(df, id_col, text_col, n=n, distinct=False)
    return g.groupBy("gram").agg(
        F.count_distinct(F.col(id_col)).alias("n_docs"),
        F.count(F.lit(1)).alias("n_occurrences"),
    )


def _dup_span_table(hits: DataFrame, id_col: str) -> DataFrame:
    """Collapse flagged [pos, end] intervals into maximal spans
    (id, __s, __e) — the gaps-and-islands window shared by
    :func:`dup_span_coverage` (measures the union) and
    :func:`remove_dup_spans` (deletes it): one doc-key shuffle, island
    boundaries from the running max of interval ends."""
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("pos")
    prev_max_end = F.max("end").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        hits.withColumn(
            "__new",
            F.when(
                prev_max_end.isNull() | (F.col("pos") > prev_max_end), 1
            ).otherwise(0),
        )
        .withColumn(
            "__island",
            F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy(id_col, "__island")
        .agg(F.min("pos").alias("__s"), F.max("end").alias("__e"))
    )


def dup_span_coverage(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
    dup_table: DataFrame | None = None,
) -> DataFrame:
    """Maximal duplicated SPANS per document: collapse the duplicated
    n-gram START positions of :func:`dup_gram_position_stats` into their
    interval union — each flagged position covers tokens [pos, pos+n-1],
    overlapping/adjacent intervals merge — and report
    (id, n_tokens, covered_tokens, n_spans) as exact integers.
    covered_tokens / n_tokens is the true Lee-et-al duplicated-text mass
    (gram COUNTS over-weight long runs: k consecutive duplicated grams are
    k counts but only n+k−1 tokens); n_spans is the cut count a span
    REMOVAL pass would make. Total assignment — clean and sub-n-token
    docs come back (n_tokens, 0, 0).

    100 TB shape: the interval union is the classic gaps-and-islands
    window — one shuffle on the doc key, per-partition state bounded by a
    document's flagged positions; no self-join, no explode beyond the
    shared gram pass. ``dup_table`` reuses an already-built
    :func:`duplicated_gram_table` (same (n, min_docs), same corpus)."""
    from aci_export_spark.llm.text import n_tokens, word_ngram_pos_rows

    g = word_ngram_pos_rows(df, id_col, text_col, n=n)
    if dup_table is not None:
        dup = dup_table
    else:
        g = g.withColumn("__h", F.xxhash64("gram")).localCheckpoint(
            eager=True
        )
        dup = _dup_grams_from_exploded(g, id_col, min_docs)
    hits = g.join(dup.select("gram"), on="gram", how="left_semi").select(
        id_col, "pos", (F.col("pos") + (n - 1)).alias("end")
    )
    spans = _dup_span_table(hits, id_col)
    per = spans.groupBy(id_col).agg(
        F.sum(F.col("__e") - F.col("__s") + 1).alias("covered_tokens"),
        F.count(F.lit(1)).alias("n_spans"),
    )
    return (
        df.select(F.col(id_col), n_tokens(F.col(text_col)).alias("n_tokens"))
        .join(per, on=id_col, how="left")
        .select(
            id_col,
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("covered_tokens", F.lit(0)).alias("covered_tokens"),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        )
    )


def remove_dup_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
    dup_table: DataFrame | None = None,
) -> DataFrame:
    """APPLY the exact-substring dedup (the removal step of Lee et al.
    ACL'22): delete every token position covered by a duplicated-span
    interval of :func:`dup_span_coverage` and reassemble the survivors in
    order. Returns (id, n_tokens, n_kept_tokens, cleaned_text) — cleaned
    text is over the NORMALIZED token stream (lowercased, whitespace
    collapsed), the same space the grams were detected in; a fully
    duplicated document comes back with an empty string, and clean docs
    round-trip their normalized text unchanged (total assignment).

    100 TB shape: spans explode to their covered positions (bounded by
    document length — linear, never quadratic), one anti-join on the
    (doc, position) key, and a per-doc ordered reassembly whose state is
    one document's tokens. Everything shuffles on the doc key only."""
    from aci_export_spark.llm.text import word_ngram_pos_rows, word_tokens

    g = word_ngram_pos_rows(df, id_col, text_col, n=n)
    if dup_table is not None:
        dup = dup_table
    else:
        g = g.withColumn("__h", F.xxhash64("gram")).localCheckpoint(
            eager=True
        )
        dup = _dup_grams_from_exploded(g, id_col, min_docs)
    hits = g.join(dup.select("gram"), on="gram", how="left_semi").select(
        id_col, "pos", (F.col("pos") + (n - 1)).alias("end")
    )
    covered = _dup_span_table(hits, id_col).select(
        F.col(id_col),
        F.explode(F.sequence(F.col("__s"), F.col("__e"))).alias("pos"),
    )
    tok_rows = df.select(
        F.col(id_col), F.posexplode(word_tokens(F.col(text_col))).alias(
            "__p0", "tok"
        )
    ).select(F.col(id_col), (F.col("__p0") + 1).alias("pos"), "tok")
    kept = (
        tok_rows.join(covered, on=[id_col, "pos"], how="left_anti")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_kept_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda x: x["tok"],
                ),
                " ",
            ).alias("cleaned_text"),
        )
    )
    from aci_export_spark.llm.text import n_tokens

    return (
        df.select(F.col(id_col), n_tokens(F.col(text_col)).alias("n_tokens"))
        .join(kept, on=id_col, how="left")
        .select(
            id_col,
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("n_kept_tokens", F.lit(0)).alias("n_kept_tokens"),
            F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
        )
    )


def incremental_span_exposure(
    delta: DataFrame,
    base_index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Duplicated-span exposure for DELTA documents against the
    POST-INGEST corpus (base ∪ delta), computed from the maintained
    gram-stats index plus the delta text only — base-corpus text is never
    re-shingled. A delta position's gram is duplicated after ingest when
    index.n_docs + delta-distinct-docs ≥ ``min_docs`` (doc sets are
    disjoint by the ingest contract, so the counts add exactly; the
    full-corpus recompute is the oracle). Output matches
    :func:`dup_gram_position_stats` restricted to the delta ids.

    100 TB shape: one delta shingle (checkpointed), a delta-proportional
    join of the delta's distinct grams against the index (bucket-stored on
    the gram key → exchange-free on the big side), and two per-doc
    aggregations over the checkpointed delta grams. Cost scales with the
    delta, not the corpus."""
    from aci_export_spark.llm.text import word_ngram_rows

    g = word_ngram_rows(
        delta, id_col, text_col, n=n, distinct=False
    ).localCheckpoint(eager=True)
    delta_stats = g.groupBy("gram").agg(
        F.count_distinct(F.col(id_col)).alias("__delta_docs")
    )
    dup = (
        delta_stats.join(
            base_index.select("gram", "n_docs"), on="gram", how="left"
        )
        .filter(
            F.coalesce(F.col("n_docs"), F.lit(0)) + F.col("__delta_docs")
            >= min_docs
        )
        .select("gram")
    )
    flagged = (
        g.join(dup, on="gram", how="left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_dup_grams"))
    )
    totals = g.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    return (
        delta.select(id_col)
        .distinct()
        .join(totals, on=id_col, how="left")
        .join(flagged, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_dup_grams", F.lit(0)).alias("n_dup_grams"),
        )
    )


def merge_gram_stats(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Merge two gram-stats tables whose underlying DOC SETS ARE DISJOINT
    (the ingest contract: delta documents are new ids), so distinct-doc
    counts add exactly. One union + sum aggregation; with both sides
    bucket-stored on the gram key this is exchange-free and
    delta-proportional."""
    return (
        base.unionByName(delta)
        .groupBy("gram")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_occurrences").alias("n_occurrences"),
        )
    )


def weighted_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bucket_col: str,
    threshold_ppm: int,
    df_cap: int = 50,
) -> DataFrame:
    """tf-weighted (multiset) Jaccard near-dup pairs — the weighted
    generalization plain set-Jaccard misses: J_w(A,B) =
    Σ_t min(tf_A(t), tf_B(t)) / Σ_t max(tf_A(t), tf_B(t)), the measure
    weighted-MinHash sketches (Ioffe's CWS) approximate; here computed
    EXACTLY in integer arithmetic over a declared feature space.

    Feature space: word tokens whose in-bucket document frequency is
    ≤ `df_cap` — the winnowing stop-gram cull applied to weighted
    similarity: ubiquitous tokens ('the', boilerplate) carry no duplicate
    signal but dominate both tf mass and candidate fan-out.  The cap is
    part of the operator's spec (the oracle replays it), and it bounds
    candidate volume: Σ_t df(t)² ≤ df_cap · Σ_t df(t) — LINEAR in corpus
    size, where the uncapped token join is quadratic on stop words.

    Using Σ max = |A| + |B| − Σ min (totals over the feature space), the
    emission predicate `1e6·Σmin ≥ threshold_ppm·(|A|+|B|−Σmin)` and the
    emitted `wjacc_ppm` are pure int64 — no float at the boundary.

    Plan: one tokenize+tf aggregate on the (id, token) key, a document-
    frequency aggregate on the token key reused as both the cull and the
    candidate equi-join (tokens with df ≥ 2), the pair aggregate
    map-combined on the (id_a, id_b) key, and two totals joins on the id
    key.  All shuffles key-hashed and linear under the cap.
    """
    toks = df.select(
        F.col(id_col),
        F.col(bucket_col).alias("__bkt"),
        F.explode(word_tokens(F.col(text_col))).alias("__t"),
    )
    tf = toks.groupBy(id_col, "__bkt", "__t").agg(
        F.count(F.lit(1)).cast("long").alias("__tf")
    )
    dfreq = tf.groupBy("__bkt", "__t").agg(
        F.count(F.lit(1)).cast("long").alias("__df")
    )
    feat = tf.join(dfreq, on=["__bkt", "__t"]).filter(F.col("__df") <= df_cap)
    tot = feat.groupBy(F.col(id_col), F.col("__bkt")).agg(
        F.sum("__tf").alias("__tot")
    )
    cand = feat.filter(F.col("__df") >= 2)
    a = cand.select(
        F.col("__bkt"), F.col("__t"),
        F.col(id_col).alias("id_a"), F.col("__tf").alias("__tfa"),
    )
    b = cand.select(
        F.col("__bkt"), F.col("__t"),
        F.col(id_col).alias("id_b"), F.col("__tf").alias("__tfb"),
    )
    smin = (
        a.join(b, on=["__bkt", "__t"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("__bkt", "id_a", "id_b")
        .agg(F.sum(F.least("__tfa", "__tfb")).alias("__smin"))
    )
    ta = tot.select(
        F.col("__bkt"), F.col(id_col).alias("id_a"), F.col("__tot").alias("__ta")
    )
    tb = tot.select(
        F.col("__bkt"), F.col(id_col).alias("id_b"), F.col("__tot").alias("__tb")
    )
    scored = smin.join(ta, on=["__bkt", "id_a"]).join(tb, on=["__bkt", "id_b"])
    union_w = F.col("__ta") + F.col("__tb") - F.col("__smin")
    return (
        scored.filter(
            F.lit(1_000_000) * F.col("__smin") >= F.lit(threshold_ppm) * union_w
        )
        .select(
            "id_a",
            "id_b",
            F.expr(f"(1000000 * __smin) div (__ta + __tb - __smin)").alias(
                "wjacc_ppm"
            ),
        )
    )

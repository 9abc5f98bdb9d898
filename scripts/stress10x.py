"""10× stress run: synthesize a 10-copy key-shifted corpus from sf0.1,
re-run headline queries unmodified, and print a sf0.1-vs-10× timing table
(markdown) for SCALE.md.

Each copy is a self-contained shard: fact keys shift by copy stride while
the shared dimensions (region, nation) stay fixed, so every join/predicate
keeps its selectivity and the data volume grows 10×. Document texts get
five distinct copy-marker tokens appended so inter-copy Jaccard ~0.8 stays
below the 0.9 near-dup threshold — duplicate cliques scale with volume
instead of exploding quadratically across copies (which would measure dup
density, not scale).

Run: python scripts/stress10x.py      (env STRESS_COPIES to override)

CONSTANT-DENSITY mode (``python scripts/stress10x.py cd``): the classic
mode duplicates everything verbatim, so dedup-family growth is dominated
by quadratic duplicate mass (round-6 measured ×910 true pairs at 10×) and
every >3× wall row needs a density decomposition. This mode holds
duplicate DENSITY constant while volume grows 10×, using per-copy
transforms that preserve intra-copy similarity structure EXACTLY while
decorrelating copies:

- documents: a per-copy PERMUTATION OF THE ALPHABET (`translate`) — the
  dedup features are character n-gram shingles, and a bijection on chars
  is a bijection on shingles, so within-copy shingle-set Jaccard is
  EXACTLY the base corpus' while cross-copy shingles collide only by
  26^-n chance. (A first cut used per-token tag prefixes: injective on
  TOKENS but not shingle-preserving — the constant tag concentrated
  char-5-gram mass and inflated within-copy similarity past the 0.9
  threshold, 254 → 2.28M pairs per copy. Feature-space matters.);
- embeddings: a per-copy seeded ORTHOGONAL rotation — within-copy cosines
  are exactly preserved (rotation invariance), cross-copy cosines collapse
  to ~N(0, 1/dim) noise;
- customer names: a per-copy 3-char suffix — within-copy edit distances
  unchanged, cross-copy distance ≥ 3 > k.

So true pairs grow exactly 10× (linear in corpus) and the wall-clock table
demonstrates plan-bound linearity directly instead of via a density
argument. Pair counts are printed beside timings as the density check.
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("STRESS_OUT", "/tmp/stress10x")
COPIES = int(os.environ.get("STRESS_COPIES", "10"))

#: STRESS_ONLY=name1,name2 restricts either sweep to the named queries —
#: the per-wave iteration loop (full sweeps re-run everything)
_ONLY = {n for n in os.environ.get("STRESS_ONLY", "").split(",") if n}


def _only(names: list[str]) -> list[str]:
    return [n for n in names if not _ONLY or n in _ONLY]

QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q18_large_volume_customers",
    "q7_nation_volume_shipping",
    "q16_supplier_cnt_by_part",
    "flagship_scoped_members",
    "events_hourly_agg",
    "events_sessionization",
    "llm_dedup_exact",
    "llm_dedup_ngram_jaccard",
    "llm_dedup_minhash_lsh",
    "llm_dedup_simhash_pairs",
    "llm_dedup_incremental",
    "llm_dedup_embedding_cosine",
    "llm_sim_ivf_kmeans_topk",
    "llm_dedup_clusters",
    "llm_dedup_cluster_canonical",
    "llm_quality_gopher",
    "llm_boilerplate_spans",
    "llm_decontaminate_overlap",
    "llm_pack_sequences",
    "llm_pii_scrub",
    "q6_forecast_revenue",
    "q9_product_profit",
    "q11_important_stock",
    "q17_small_quantity_revenue",
    "q21_waiting_suppliers",
    "llm_dedup_semantic",
    "llm_repetition_signals",
    "llm_domain_quota",
    "llm_quality_unigram_lm",
    "llm_sim_rplsh_topk",
    "llm_bloom_membership",
    "llm_compression_ratio",
    "llm_doc_keywords",
    "basket_brand_pairs",
    "events_retention_cohorts",
    "events_funnel_steps",
    # batch-3 warehouse/maintenance operators
    "ivm_orders_maintained_agg",
    "llm_lsh_index_upsert",
    "rec_item_item_cosine",
    "orders_pareto_frontier",
    "parts_price_band_pairs",
    "docs_bm25_topk",
    "events_linear_attribution",
    "events_trending_topk",
    "events_cohort_ltv",
    "sync_snapshot_diff",
    "j_bloom_prefilter_join",
    # round-5 additions
    "llm_hard_negatives",
    "llm_substring_anchor_dup",
    "llm_dedup_lsh_recall_audit",
    "graph_brand_pagerank",
    # round-5 session-3 additions
    "llm_sim_ivf_pq_topk",
    "llm_sim_mmr_rerank",
    "llm_bpe_train",
    "docs_hybrid_rrf_topk",
    "llm_vector_index_upsert",
    "llm_dedup_method_agreement",
    # round-6: the full driver-window rotation batch (never-stressed names)
    "llm_pack_efficiency",
    "streaming_session_window",
    "events_type_trigrams_topk",
    "events_ctr_wilson",
    "events_value_histogram",
    "events_value_trend_slope",
    "events_chi2_cells",
    "llm_quality_percentile",
    "docs_inverted_index",
    "events_cumulative_unique_users",
    "events_value_variance_by_type",
    "events_user_type_diversity",
    "orders_interarrival_stats",
    "events_bitemporal_state",
    "events_sketch_intersection",
    "streaming_trending_topk",
    "docs_source_similarity",
    "events_changepoint_cusum",
    "llm_weighted_sample",
    "dq_join_key_skew",
    "events_position_attribution",
    "dq_value_drift_cells",
    "er_fuzzy_entities",
    "events_ohlc_hourly",
    "orders_abc_classification",
    "events_stickiness_ratio",
    "streaming_funnel_native",
    "mm_av_metadata",
    "llm_bpe_encode_stats",
    "llm_bpe_fertility_by_lang",
    # round-7 additions
    "llm_bpe_train_batched",
    "llm_bpe_encode_stats_batched",
    "er_fuzzy_name_pairs_k2",
    # round-10 second-wave: daily-grid resample over the 10x event stream
    # (grid rows grow with users x span, fill window linear per key)
    "events_gapfill_locf",
    # round-10 third-wave: survival life table (user-key agg linear, life
    # table calendar-bounded), one-pass Poisson bootstrap (32 replicate
    # columns fold map-side — the scan grows 10x, replicate table doesn't),
    # Bradley-Terry (pair sufficient statistic vocabulary-bounded; order-key
    # self-join linear), compaction planner (catalog-sized window cumsum),
    # and the two asset->rows parsers (per-row decode, linear fan-out)
    "events_survival_km",
    "events_bootstrap_ci",
    "pref_bradley_terry_brands",
    "maint_compaction_plan",
    "mm_srt_cues",
    "mm_id3_tags",
    # round-10 fourth-wave: Jaro-Winkler pairs (verbatim copies multiply
    # brand-block sizes 10x so pair volume is honestly block-quadratic —
    # the er_fs/blocking_audit documented pattern; the linkage discipline
    # is picking blocks that bound it) and bounded k-core (edge list
    # top-k-capped, the pagerank bounded-work shape)
    "er_jaro_winkler_pairs",
    "graph_brand_kcore",
    # round-10 fifth-wave: the HLL sketch (register state constant, the
    # scan is the only 10x term) and the bisection quantiles (rounds
    # bounded by the value range, each a counting scan)
    "events_hll_user_days",
    "orders_exact_quantiles",
    # round-11: calendar-bounded trend/changepoint statistics (daily grid
    # fixed while the scan grows 10x — the pair/window stages are constant
    # work), dimension-bounded HHI shares, and the grid-bounded isotonic
    # sufficient statistic (dollar grid fixed, one aggregate scan linear)
    "events_mann_kendall",
    "events_theil_sen",
    "events_pettitt",
    "events_isotonic_calibration",
    "orders_hhi_concentration",
    # KS gap grid is distinct-value-bounded; CA band grid is 5 rows —
    # both scans linear, both statistics dimension-sized
    "events_ks_two_sample",
    "events_cochran_armitage",
    "events_runs_test",
]


#: constant-density sweep: the dedup/ER family whose classic-mode growth was
#: density-dominated (VERDICT r6 #5), plus the shared-pair-artifact producers
#: the agreement audit consumes
CD_QUERIES = [
    "llm_dedup_minhash_lsh",
    "llm_dedup_simhash_pairs",
    "llm_dedup_ngram_jaccard",
    "llm_dedup_clusters",
    "llm_dedup_cluster_canonical",
    "llm_dedup_method_agreement",
    "llm_dedup_semantic",
    "llm_dedup_embedding_cosine",
    "er_fuzzy_name_pairs",
    "er_fuzzy_name_pairs_k2",
    "er_fuzzy_entities",
    # r9 additions: winnowing (char-gram selection + pair join), chunk-level
    # dedup, bigram-LM fit, SQ8 ADC scan — the alphabet-permuted copies keep
    # each family's candidate density constant (disjoint gram/chunk/token
    # spaces per copy; rotated embeddings per copy for the ADC scan)
    "llm_winnow_fingerprints",
    "llm_winnow_overlap_pairs",
    "llm_chunk_dedup",
    "llm_quality_bigram_lm",
    "llm_sim_sq8_topk",
    # r10 additions: unigram-LM tokenizer (word-type table grows ~10× under
    # alphabet-permuted copies — E-step linearity is exactly the claim),
    # EXIF walk (per-row decode, linear), IVF-PQ incremental maintenance
    # (delta assign+encode linear, rotated copies), the re-planned ER
    # audits (size-conditioned pair_expansion_join), and the sort-limit
    # PMI rank
    "llm_unigram_tokenizer_train",
    "llm_unigram_fertility_by_lang",
    "mm_exif_tags",
    "llm_ivfpq_index_upsert",
    "er_fs_pattern_counts",
    "er_blocking_audit",
    "llm_pmi_collocations",
    # r10 second-wave: FS-EM (same block-quadratic pattern pass as the
    # er_fs audits + data-independent driver EM), WordPiece trainer
    # (word-type table grows ~10× under alphabet permutation — round-loop
    # linearity is the claim), PCA whitening (moment pass linear in rows,
    # d²-bounded collect; rotated copies change the covariance, not the
    # cost)
    "er_fs_em_weights",
    "llm_wordpiece_train",
    "llm_embedding_pca",
    # r10 third-wave: KN bigram LM (bigram TYPE table grows ~10x under
    # alphabet-permuted copies — the Heaps-law fit claim), binary-Hamming
    # ANN (fixed 20-query set; the packed-code scan is the linear term,
    # rotated copies decorrelate the codes)
    "llm_quality_kn_bigram",
    "llm_sim_binary_hamming_topk",
    # r10 fourth-wave: weighted Jaccard — alphabet-permuted copies keep
    # per-copy tf/df structure exact while cross-copy tokens stay disjoint,
    # so candidates grow linearly (the df_cap bound at work)
    "llm_dedup_weighted_jaccard",
    # r10 fifth-wave: eval metrics (one pair per doc — pair volume and the
    # (pair, gram) join grow linearly; the LCS stage is truncation-bounded
    # per pair), chi-square terms (term TYPE table grows ~10x under
    # alphabet permutation — the Heaps-law claim; domains fixed), URL
    # canonicalization (one projection + canonical-key groupBy, linear),
    # HTML extraction (per-row state machine, linear), WebVTT parse
    # (per-row decode, linear fan-out)
    "llm_eval_ngram_overlap",
    "llm_eval_rouge_lcs",
    "llm_chisq_terms",
    "llm_url_canonical_dedup",
    "llm_html_extract",
    "mm_webvtt_cues",
    # r10 sixth-wave: exact AUC (query set fixed at 8 — the quantized
    # distance scan is the linear term, the rank window partitions per
    # query over 10x rows) and the streaming HLL index (register state
    # constant; per-batch delta pass linear in batch tokens)
    "llm_retrieval_auc",
    "streaming_hll_index",
    # r10 seventh-wave: the two container parsers (per-row / per-source
    # decode, linear) and the robots filter (rules-bounded nested loop +
    # per-URL window, linear)
    "mm_warc_records",
    "mm_avro_blocks",
    "llm_robots_url_filter",
    # r11: four container parsers (per-row decode, linear fan-out), the
    # Aho-Corasick scan (automaton fixed, single pass linear in bytes),
    # KN-trigram (trigram TYPE table grows ~10x under alphabet permutation
    # — the Heaps-law claim again), and Fisher+BH (term TYPE table grows
    # ~10x; per-term big-int support loop bounded by min(margins))
    "mm_webp_info",
    "mm_ogg_pages",
    "mm_pdf_pages",
    "mm_mkv_tracks",
    "mm_tar_entries",
    "mm_gzip_members",
    "llm_blocklist_match",
    "llm_quality_kn_trigram",
    # llm_fisher_terms_fdr is deliberately ABSENT: the CD-10x corpus
    # (N=50k docs) exceeds FISHER_MAX_N=20k and the query raises its
    # named cap (measured 72.9 s pre-cap — the SCALE.md r11 row; exact
    # Fisher is a bounded-table statistic, chisq is the scale dial)
]

OUT_CD = os.environ.get("STRESS_CD_OUT", "/tmp/stress10x_cd")


def synthesize_cd(spark) -> None:
    """Constant-density 10× corpus: only the tables the CD queries read
    (documents, embeddings, customer + the fixed dimensions)."""
    from pyspark.sql import functions as F

    from aci_export_spark.sources import read_table

    for t in ["region", "nation"]:
        read_table(spark, SF_DIR, t).write.mode("overwrite").parquet(
            f"{OUT_CD}/{t}.parquet"
        )

    import random as _random

    docs = read_table(spark, SF_DIR, "documents")
    doc_stride = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    perms = []
    for i in range(COPIES):
        if i == 0:
            perms.append(alphabet)
            continue
        p = list(alphabet)
        _random.Random(123 + i).shuffle(p)
        perms.append("".join(p))
    assert len(set(perms)) == COPIES
    parts = []
    for i in range(COPIES):
        parts.append(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * doc_stride))
            .withColumn("text", F.translate(F.col("text"), alphabet, perms[i]))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{OUT_CD}/documents.parquet")

    cust = read_table(spark, SF_DIR, "customer")
    cust_stride = cust.agg(F.max("c_custkey")).collect()[0][0] + 1
    parts = []
    for i in range(COPIES):
        parts.append(
            cust.withColumn("c_custkey", F.col("c_custkey") + F.lit(i * cust_stride))
            .withColumn("c_name", F.concat(F.col("c_name"), F.lit(str(i) * 3)))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{OUT_CD}/customer.parquet")

    emb = read_table(spark, SF_DIR, "embeddings")
    vec_stride = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    label_stride = emb.agg(F.max("label")).collect()[0][0] + 1

    def rotator(copy: int):
        import numpy as np

        def fn(batches):
            q = None
            for pdf in batches:
                if len(pdf) == 0:
                    yield pdf
                    continue
                vecs = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
                if q is None:
                    rng = np.random.RandomState(10_000 + copy)
                    q, _ = np.linalg.qr(rng.standard_normal((vecs.shape[1],) * 2))
                rot = (vecs @ q.T).astype(np.float32)
                pdf = pdf.copy()
                pdf["embedding"] = [row for row in rot]
                yield pdf

        return fn

    parts = []
    for i in range(COPIES):
        shifted = emb.withColumn(
            "vec_id", F.col("vec_id") + F.lit(i * vec_stride)
        ).withColumn("label", (F.col("label") + F.lit(i * label_stride)).cast("int"))
        parts.append(shifted.mapInPandas(rotator(i), schema=shifted.schema))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{OUT_CD}/embeddings.parquet")
    print(f"synthesized constant-density {COPIES}x corpus at {OUT_CD}")


def run_counting(
    spark, sf_dir: str, names: list[str]
) -> dict[str, tuple[float, float, int]]:
    """Like run() — the TIMED action is the noop write (full plan, every
    output column, exactly what bench.py measures) — plus a separate
    untimed count() per query for the density check (rows ≈ 10× base).
    The r10 lesson behind the split: count() lets Catalyst ELIMINATE
    left joins whose build side is unique on the join key (legal — row
    count is unchanged — which is also why the untimed count stays a
    valid density check), so timing count() under-measured
    er_blocking_audit by the entire block-quadratic truth pass (0.5 s
    printed for what executes in ~24 s at 10×). Records process-tree
    CPU-seconds beside wall (r8 verdict #7), and — the r9 lesson — takes
    the MEDIAN of interleaved repetitions (rep 1 pays JVM/codegen
    warmup; one inflated sample becomes the row when each cell runs
    once)."""
    from statistics import median

    from bench import _tree_cpu_seconds

    from aci_export_spark import artifacts, harness, harness_llm

    harness._ensure_all_registered()
    reps = max(1, int(os.environ.get("STRESS_REPS", "3")))
    samples: dict[str, list[tuple[float, float]]] = {n: [] for n in names}
    counts: dict[str, int] = {}

    def _clear_caches() -> None:
        artifacts._CACHE.clear()
        harness_llm._KMEANS_MODEL_CACHE.clear()
        harness_llm._PQ_CODEBOOK_CACHE.clear()
        harness_llm._FIT_SAMPLE_CACHE.clear()

    for rep in range(reps):
        for name in names:
            _clear_caches()
            c0 = _tree_cpu_seconds()
            t0 = time.perf_counter()
            harness.REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples[name].append(
                (time.perf_counter() - t0, max(0.0, _tree_cpu_seconds() - c0))
            )
            if rep == 0:
                _clear_caches()
                counts[name] = harness.REGISTRY[name].fn(spark, sf_dir).count()
    return {
        name: (
            median(s[0] for s in v),
            median(s[1] for s in v),
            counts[name],
        )
        for name, v in samples.items()
    }


def bpe_round_check(spark) -> None:
    """The batched-BPE scale demonstration (r7 verdict #8): train at base
    and 10×-CD scale and print wall + DRIVER ROUND TRIPS. The claim under
    test: rounds depend on n_merges / batch-yield (merge-compatibility
    structure), NOT corpus size — so 10× data must leave the round count
    ~flat while wall grows ≤ ~2× (the pair-count scans are map-combined
    aggregations over 10× word-type rows; everything else is per-round
    fixed cost)."""
    import time as _time

    from bench import _tree_cpu_seconds

    from aci_export_spark.llm.bpe import bpe_train_batched_with_encoded
    from aci_export_spark.sources import read_table

    print("\n| corpus | wall | cpu | merges | driver rounds |")
    print("|---|---|---|---|---|")
    for label, d in (("sf0.1", SF_DIR), (f"{COPIES}x CD", OUT_CD)):
        docs = read_table(spark, d, "documents")
        c0 = _tree_cpu_seconds()
        t0 = _time.perf_counter()
        merge_df, _words, rounds = bpe_train_batched_with_encoded(
            docs, n_merges=256, batch_cap=32
        )
        n = merge_df.count()
        print(
            f"| {label} | {_time.perf_counter() - t0:.1f} s "
            f"| {max(0.0, _tree_cpu_seconds() - c0):.0f} | {n} | {rounds} |",
            flush=True,
        )


def main_cd(bpe_only: bool = False) -> None:
    from aci_export_spark.session import get_spark

    spark = get_spark("stress10x-cd")
    spark.sparkContext.setLogLevel("ERROR")
    synthesize_cd(spark)
    if bpe_only:
        spark.range(1).toPandas()
        bpe_round_check(spark)
        spark.stop()
        return
    spark.range(0, 64, 1, 64).mapInPandas(lambda it: it, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()
    spark.range(1).toPandas()
    names = _only(CD_QUERIES)
    base = run_counting(spark, SF_DIR, names)
    big = run_counting(spark, OUT_CD, names)
    print(
        f"\n| query | sf0.1 wall | cpu | rows | {COPIES}× CD wall | cpu | rows "
        "| wall growth | cpu growth | row growth |"
    )
    print("|---|---|---|---|---|---|---|---|---|---|")
    for name in names:
        bt, bc, bn = base[name]
        gt, gc, gn = big[name]
        wg = gt / bt if bt else float("nan")
        cg = gc / bc if bc else float("nan")
        rg = gn / bn if bn else float("nan")
        print(
            f"| {name} | {bt:.1f} s | {bc:.0f} | {bn} | {gt:.1f} s | {gc:.0f} "
            f"| {gn} | {wg:.1f}× | {cg:.1f}× | {rg:.1f}× |"
        )
    spark.stop()


def synthesize(spark) -> None:
    from pyspark.sql import functions as F

    from aci_export_spark.sources import read_table

    def read(t):
        # read_table normalizes the events table's nanosecond timestamps;
        # the synthesized copy round-trips as plain TIMESTAMP_NTZ, which
        # read_table passes through untouched on the stress-dir read
        return read_table(spark, SF_DIR, t)

    strides = {}
    for t, k in [
        ("customer", "c_custkey"), ("orders", "o_orderkey"),
        ("supplier", "s_suppkey"), ("part", "p_partkey"),
        ("events", "event_id"), ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ]:
        strides[t] = read(t).agg(F.max(k)).collect()[0][0] + 1
    user_stride = read("events").agg(F.max("user_id")).collect()[0][0] + 1
    label_stride = read("embeddings").agg(F.max("label")).collect()[0][0] + 1

    shifts = {
        "customer": {"c_custkey": strides["customer"]},
        "orders": {"o_orderkey": strides["orders"], "o_custkey": strides["customer"]},
        "lineitem": {
            "l_orderkey": strides["orders"],
            "l_partkey": strides["part"],
            "l_suppkey": strides["supplier"],
        },
        "supplier": {"s_suppkey": strides["supplier"]},
        "part": {"p_partkey": strides["part"]},
        "events": {"event_id": strides["events"], "user_id": user_stride},
        "documents": {"doc_id": strides["documents"]},
        # label shifts per copy too: copies carry IDENTICAL vectors, so
        # sharing cells would make every cross-copy comparison a perfect
        # match — cell sizes (and near-dup cliques) must stay constant while
        # cell COUNT grows with the corpus, which is how a real IVF/bucketed
        # layout scales (more data → more cells, not fatter cells)
        "embeddings": {"vec_id": strides["embeddings"], "label": label_stride},
    }
    for t in ["region", "nation"]:
        read(t).write.mode("overwrite").parquet(f"{OUT}/{t}.parquet")
    for t, cols in shifts.items():
        base = read(t)
        parts = []
        for i in range(COPIES):
            c = base
            for col, stride in cols.items():
                c = c.withColumn(col, F.col(col) + F.lit(i * stride))
            if t == "documents":
                marker = " ".join(f"z{ch}{i}" for ch in "abcde")
                c = c.withColumn("text", F.concat(F.col("text"), F.lit(" " + marker)))
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{OUT}/{t}.parquet")
    print(f"synthesized {COPIES}x corpus at {OUT}")


def run(spark, sf_dir: str) -> dict[str, float]:
    from aci_export_spark import harness

    harness._ensure_all_registered()
    # fresh per-sf caches measure the build honestly at each scale
    from aci_export_spark import harness_llm

    timings = {}
    from aci_export_spark import artifacts

    for name in QUERIES:
        # every query pays its own artifact builds (near-dup pairs, CC
        # components, kmeans centroids) — intra-list reuse would
        # misattribute the build cost
        artifacts._CACHE.clear()
        harness_llm._KMEANS_MODEL_CACHE.clear()
        harness_llm._PQ_CODEBOOK_CACHE.clear()
        harness_llm._FIT_SAMPLE_CACHE.clear()
        t0 = time.perf_counter()
        harness.REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        timings[name] = time.perf_counter() - t0
    return timings


def main() -> None:
    from aci_export_spark.session import get_spark

    spark = get_spark("stress10x")
    spark.sparkContext.setLogLevel("ERROR")
    synthesize(spark)
    # warm
    spark.range(0, 64, 1, 64).mapInPandas(lambda it: it, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()
    spark.range(1).toPandas()
    names = _only(QUERIES)
    if _ONLY:
        # targeted wave runs use the counting runner (CPU + rows columns,
        # the CD-table format SCALE.md now standardizes on)
        base = run_counting(spark, SF_DIR, names)
        big = run_counting(spark, OUT, names)
        print(
            f"\n| query | sf0.1 wall | cpu | rows | {COPIES}× wall | cpu | rows "
            "| wall growth | cpu growth | row growth |"
        )
        print("|---|---|---|---|---|---|---|---|---|---|")
        for name in names:
            bt, bc, bn = base[name]
            gt, gc, gn = big[name]
            wg = gt / bt if bt else float("nan")
            cg = gc / bc if bc else float("nan")
            rg = gn / bn if bn else float("nan")
            print(
                f"| {name} | {bt:.1f} s | {bc:.0f} | {bn} | {gt:.1f} s | {gc:.0f} "
                f"| {gn} | {wg:.1f}× | {cg:.1f}× | {rg:.1f}× |"
            )
        spark.stop()
        return
    base = run(spark, SF_DIR)
    big = run(spark, OUT)
    print(f"\n| query | sf0.1 | {COPIES}× | growth |")
    print("|---|---|---|---|")
    for name in QUERIES:
        g = big[name] / base[name] if base[name] else float("nan")
        print(f"| {name} | {base[name]:.1f} s | {big[name]:.1f} s | {g:.1f}× |")
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "cd":
        main_cd()
    elif len(sys.argv) > 1 and sys.argv[1] == "cd-bpe":
        main_cd(bpe_only=True)
    else:
        main()

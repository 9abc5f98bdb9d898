"""Beyond-reference operators for large-scale training-data pipelines.

The reference (an ETL conduit) has none of these; they're the operators a
100 TB document/embedding corpus needs, built Spark-first:

    dedup       exact, MinHash+LSH, SimHash, n-gram Jaccard
    similarity  brute-force cosine top-k; IVF/label-bucketed scale path
    text        language-id heuristic, quality metrics, token counting,
                document fingerprinting
    multimodal  opaque-binary column plumbing (decode stubbed; schema,
                partitioning, Arrow batch shape real)

Design rules: hashing is md5-derived (portable: identical in Spark and the
DuckDB oracle); everything pairwise is bucketed before comparison (LSH bands,
IVF cells) so nothing is O(n²) at corpus scale.
"""

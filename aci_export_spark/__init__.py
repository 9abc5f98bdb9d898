"""aci_export_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of madninja/aci-export, rebuilt Spark-first.

The reference (see /root/repo/SURVEY.md) is a Rust batch-ETL: a library of
~40 parameterized relational queries over a Drupal EAV MySQL schema plus two
mirror-sync pipelines (Postgres upsert+retain, Mailchimp REST). This package
re-expresses that surface — and the large-scale training-data-pipeline
operators beyond it (dedup, similarity search, text analysis, multimodal
plumbing) — as declarative DataFrame plans that Catalyst/Tungsten can
optimize, partition, and scale to 100 TB.

Layout:
    session      SparkSession factory with scale-tuned defaults
    sources      parquet/JDBC table readers, scope-DF builders
    functions/   scalar column-expression library (ids, dates, text)
    operators/   reusable relational operators (dedup, joins, mirror, topk)
    queries/     the ACI-domain query library (== reference `ddb` crate)
    sync/        mirror-sync pipelines (== reference sync-app / sync-mail)
    llm/         beyond-reference pipeline ops (minhash, simhash, ANN, text)
    streaming/   Structured Streaming surface over event streams
"""

__version__ = "0.1.0"

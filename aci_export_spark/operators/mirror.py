"""Mirror-sync operators: upsert + retain (reference S8/S9; SURVEY.md §2.1).

The reference mirrors Drupal → Postgres with chunked
`INSERT … ON CONFLICT DO UPDATE` (`db/src/user.rs:59-99`) and a
temp-table-anti-join `DELETE` for rows that vanished from the source
("retain", `db/src/lib.rs:16-76`). Re-running a sync converges — idempotence
by construction.

Spark-first equivalents, as pure DataFrame algebra so they work on any sink:

    upsert(target, source, keys)  = source ∪ (target ⟕̸ source)      (anti-join)
    retain(target, keep, keys)    = target ⋉ keep                    (semi-join)
    mirror_sync                   = upsert ∘ retain, with SyncStats

On a transactional table format (Delta/Iceberg) the same semantics are a
single `MERGE INTO … WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT / WHEN NOT
MATCHED BY SOURCE DELETE`; these functions compute the post-state and the
stats, and `write_mirror` materializes it (overwrite-diff mode for plain
parquet). At 100 TB the anti/semi joins shuffle on the mirror key — the same
key the table should be bucketed by, making them co-located joins.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class SyncStats:
    """Per-entity mirror stats (reference `sync-app/src/sync.rs:11-28`:
    {upserted, deleted, duration})."""

    upserted: int
    deleted: int
    duration_s: float = 0.0

    def as_dict(self) -> dict:
        return {"upserted": self.upserted, "deleted": self.deleted, "duration_s": round(self.duration_s, 3)}


def upsert(target: DataFrame, source: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Post-state of upserting `source` into `target` on `keys`.

    Source rows win on key collision (reference `ON CONFLICT DO UPDATE`,
    `db/src/user.rs:69-98`). Anti-join keeps target rows whose key is absent
    from source; union appends every source row. Column sets must match.
    """
    kept = target.join(source.select(*keys).distinct(), on=list(keys), how="left_anti")
    return kept.unionByName(source)


def retain(target: DataFrame, keep_keys: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Delete-missing: keep only target rows whose key appears in `keep_keys`.

    Reference S9 (`db/src/lib.rs:16-76`): temp table of keys + `DELETE …
    WHERE key NOT IN (…)` in one txn. Here: a semi-join (MERGE … WHEN NOT
    MATCHED BY SOURCE THEN DELETE on Delta).
    """
    return target.join(keep_keys.select(*keys).distinct(), on=list(keys), how="left_semi")


def mirror_sync(target: DataFrame, source: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Full mirror semantics: after this, target ≡ source keyset with source
    values (upsert + retain composed; reference §3.2 steps 5-6)."""
    return retain(upsert(target, source, keys), source, keys)


def mirror_stats(target: DataFrame, source: DataFrame, keys: Sequence[str]) -> SyncStats:
    """Counts the reference logs per entity (`sync-app/src/sync.rs:621-637`):
    upserted = |source| (every source row is written), deleted = target keys
    absent from source. Computed as one aggregate each — no collect loops.
    """
    upserted = source.count()
    deleted = (
        target.select(*keys).distinct()
        .join(source.select(*keys).distinct(), on=list(keys), how="left_anti")
        .count()
    )
    return SyncStats(upserted=upserted, deleted=deleted)


def write_mirror(df: DataFrame, path: str, keys: Sequence[str], num_buckets: int | None = None) -> None:
    """Materialize the mirror post-state (plain-parquet overwrite-diff mode).

    On Delta this would be `MERGE INTO`; for plain files, overwrite. For the
    bucketed layout that makes subsequent syncs' anti/semi joins co-located,
    use :func:`write_bucketed_mirror` (bucketBy needs a table catalog entry,
    so it takes a table name rather than a bare path).
    """
    writer = df.write.mode("overwrite")
    writer.parquet(path)


def write_bucketed_mirror(
    df: DataFrame,
    table_name: str,
    keys: Sequence[str],
    num_buckets: int = 32,
    path: str | None = None,
) -> None:
    """Materialize a mirror table hash-bucketed (and sorted) by its key.

    This is the 100 TB layout: when both sides of the next sync's
    upsert/retain join are bucketed by the same key with the same bucket
    count, Spark plans a co-located sort-merge join with NO Exchange — the
    mirror side (the big one) is never shuffled again. Verified by
    `TestBucketedMirror` (asserts zero Exchange operators in the join plan).
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *keys)
        .sortBy(*keys)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def delta_available() -> bool:
    """True when the delta-spark package is importable. The sandbox does not
    ship it (``pip install delta-spark`` re-attempted 2026-08-16 in rounds
    7, 8, 9, 10 and 11: DNS resolution fails against every index — no network
    route), so the Delta paths are gated rather than assumed."""
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def delta_mirror_sync(spark, source: DataFrame, target_path: str, keys: Sequence[str]):
    """S8/S9 on a transactional table: ONE ``MERGE INTO`` with
    ``WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT / WHEN NOT MATCHED BY
    SOURCE DELETE`` — the idiomatic Delta statement of exactly the
    upsert+retain algebra :func:`mirror_sync` computes (SURVEY §2 names this
    as the preferred target, with plain-parquet overwrite-diff as the
    sanctioned fallback). Readers never observe a half-synced mirror: the
    merge is a single atomic commit, the property the reference gets from
    its one-transaction Postgres merge (`db/src/lib.rs:16-76`).

    Requires delta-spark (gate with :func:`delta_available`); bootstrap
    writes the initial snapshot when `target_path` is not yet a Delta table.
    At 100 TB the merge shuffles on the mirror key like the DataFrame
    algebra — co-locate with a key-partitioned layout and enable deletion
    vectors so the delete half is metadata-only.
    """
    from delta.tables import DeltaTable  # ImportError = env lacks delta-spark

    if not DeltaTable.isDeltaTable(spark, target_path):
        source.write.format("delta").save(target_path)
        return
    cond = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    (
        DeltaTable.forPath(spark, target_path)
        .alias("t")
        .merge(source.alias("s"), cond)
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .whenNotMatchedBySourceDelete()
        .execute()
    )


def jdbc_merge_sql(
    target_table: str,
    staging_table: str,
    columns: Sequence[str],
    keys: Sequence[str],
) -> list[str]:
    """The transactional upsert+retain statements the reference runs against
    Postgres (S2: `db/src/user.rs:59-99` chunked `INSERT … ON CONFLICT DO
    UPDATE`; `db/src/lib.rs:16-76` temp-table anti-join `DELETE`), expressed
    against a staging table the cluster has already bulk-loaded.

    The heavy lifting (shipping 100 TB of rows) happens in the distributed
    staging write; these statements are constant-size SQL the database
    executes set-wise in one transaction. Dialect is Postgres; DuckDB accepts
    the same syntax (exercised end-to-end in tests).
    """
    keys = list(keys)
    cols = ", ".join(columns)
    key_list = ", ".join(keys)
    updates = ", ".join(f"{c} = excluded.{c}" for c in columns if c not in keys)
    upsert = (
        f"INSERT INTO {target_table} ({cols}) "
        f"SELECT {cols} FROM {staging_table} "
        f"ON CONFLICT ({key_list}) DO UPDATE SET {updates}"
    )
    key_tuple = f"({key_list})" if len(keys) > 1 else keys[0]
    key_sel = ", ".join(keys)
    retain_sql = (
        f"DELETE FROM {target_table} "
        f"WHERE {key_tuple} NOT IN (SELECT {key_sel} FROM {staging_table})"
    )
    return ["BEGIN", upsert, retain_sql, "COMMIT", f"DROP TABLE {staging_table}"]


class JdbcMirror:
    """S2 executable external write path: mirror a DataFrame into a SQL
    database with the reference's upsert/retain semantics
    (`db/src/user.rs:59-99`, `db/src/lib.rs:16-76`).

    Two-phase, the shape that scales:

    1. **Distributed staging load** — every executor writes its partitions
       over JDBC into `<target>__staging` (`df.write.jdbc`, one transaction
       per partition, `batchsize` rows per round trip). This is the only
       data-volume-bound step and it is fully parallel.
    2. **Set-wise merge on the database** — constant-size
       `INSERT … ON CONFLICT DO UPDATE` + `DELETE … NOT IN (staging)` in one
       transaction (:func:`jdbc_merge_sql`), so readers never observe a
       half-synced mirror; then the staging table is dropped.

    Both phases are injectable: `staging_writer(df, table)` defaults to the
    Spark JDBC writer (needs a driver jar on the classpath — not shipped in
    this sandbox), `executor(sql)` runs driver-side statements on a DBAPI
    connection. Tests inject DuckDB for both and run the path end to end.
    """

    def __init__(
        self,
        url: str | None = None,
        properties: dict | None = None,
        staging_writer=None,
        executor=None,
        batchsize: int = 5000,
    ):
        if staging_writer is None and url is None:
            raise ValueError("need a JDBC url (or an injected staging_writer)")
        if executor is None:
            raise ValueError("need an executor(sql) bound to the target database")
        self.url = url
        self.properties = dict(properties or {})
        self.batchsize = batchsize
        self._staging_writer = staging_writer or self._jdbc_staging_writer
        self._executor = executor

    def _jdbc_staging_writer(self, df: DataFrame, table: str) -> None:
        (
            df.write.mode("overwrite")
            .format("jdbc")
            .option("url", self.url)
            .option("dbtable", table)
            .option("batchsize", str(self.batchsize))
            .options(**self.properties)
            .save()
        )

    def sync(self, source: DataFrame, target_table: str, keys: Sequence[str]) -> list[str]:
        """Mirror `source` into `target_table`; returns the merge statements
        executed (for journaling/audit, the reference logs the same)."""
        staging = f"{target_table}__staging"
        self._staging_writer(source, staging)
        statements = jdbc_merge_sql(target_table, staging, source.columns, keys)
        for sql in statements:
            self._executor(sql)
        return statements


def mirror_sync_observed(
    target: DataFrame, source: DataFrame, keys: Sequence[str]
) -> tuple[DataFrame, "Observation"]:
    """mirror_sync with stats attached via ``Observation`` — the counts the
    reference logs (A9) come FREE with the materializing action instead of
    two extra count() jobs over the same inputs.

    The post-state = deleted-target-rows ∪ source, tagged; observe() sums
    the tags during whatever action materializes the frame (the mirror
    write), then the tag column is dropped. Usage::

        post, obs = mirror_sync_observed(target, source, keys)
        post.write.parquet(...)           # one job
        stats = obs.get                   # {'upserted': …, 'deleted': …}
    """
    from pyspark.sql import Observation

    # mirror post-state ≡ source; deleted = target keys absent from source.
    # The deleted rows ride along tagged so the observation counts both
    # classes in the single output pass, then they are filtered back out.
    deleted_count_src = target.select(*keys).distinct().join(
        source.select(*keys).distinct(), on=list(keys), how="left_anti"
    )
    tagged = source.withColumn("__is_upsert", F.lit(1)).unionByName(
        deleted_count_src.join(target, on=list(keys))  # deleted rows, full width
        .select(*source.columns)
        .withColumn("__is_upsert", F.lit(0))
    )
    obs = Observation("mirror_stats")
    observed = tagged.observe(
        obs,
        F.sum("__is_upsert").alias("upserted"),
        F.sum(1 - F.col("__is_upsert")).alias("deleted"),
    )
    # post-state excludes the deleted rows again — they were only carried so
    # the observation sees them in the same pass
    post = observed.filter(F.col("__is_upsert") == 1).drop("__is_upsert")
    return post, obs

"""S14 migrations runner + F13 name sanitize (reference
`sync-app/src/cmd/migrate.rs:30-117`).

The reference embeds versioned `.sql` files and replays the pending ones
against Postgres, tracking applied versions in `_sqlx_migrations`. The
Spark-first equivalent: DDL runs through `spark.sql` against the session
catalog (a warehouse of managed tables), and the applied-set is itself a
small parquet table — so `run` / `info` / `new` have the same contract
(idempotent replay, version order, applied/pending status) without a
side-channel database.

Migration files are named `{version}_{description}.sql` with a numeric
version prefix, exactly the reference's layout (`db/migrations/`).
"""

from __future__ import annotations

import os
import re
from datetime import datetime, timezone

from pyspark.sql import SparkSession

TRACKING_TABLE = "_migrations"


def sanitize_migration_name(description: str) -> str:
    """F13 (sync-app/src/cmd/migrate.rs:98-104): spaces → '_', keep only
    alphanumerics and '_', lowercase."""
    kept = (c for c in description.replace(" ", "_") if c.isalnum() or c == "_")
    return "".join(kept).lower()


def new_migration(
    migrations_dir: str, description: str, timestamp: str | None = None
) -> str:
    """Create an empty `{YYYYmmddHHMMSS}_{sanitized}.sql` file
    (sync-app/src/cmd/migrate.rs:95-112); returns its path."""
    ts = timestamp or datetime.now(timezone.utc).strftime("%Y%m%d%H%M%S")
    name = f"{ts}_{sanitize_migration_name(description)}.sql"
    os.makedirs(migrations_dir, exist_ok=True)
    path = os.path.join(migrations_dir, name)
    with open(path, "w"):
        pass
    return path


def _available(migrations_dir: str) -> list[tuple[int, str, str]]:
    """(version, description, path) sorted by version — reference layout
    `{version}_{description}.sql`."""
    out = []
    if not os.path.isdir(migrations_dir):
        return out
    for fname in os.listdir(migrations_dir):
        m = re.match(r"^(\d+)_(.+)\.sql$", fname)
        if m:
            out.append((int(m.group(1)), m.group(2), os.path.join(migrations_dir, fname)))
    return sorted(out)


def _applied_versions(spark: SparkSession, tracking_path: str) -> dict[int, str]:
    if not os.path.exists(tracking_path):
        return {}
    return {
        int(r["version"]): r["description"]
        for r in spark.read.parquet(tracking_path).collect()
    }


def run_migrations(
    spark: SparkSession, migrations_dir: str, tracking_path: str
) -> list[int]:
    """Replay pending migrations in version order
    (sync-app/src/cmd/migrate.rs:30-45 / sqlx::migrate!().run).

    Each `.sql` file may hold several `;`-separated statements, executed via
    `spark.sql`. Applied versions append to the parquet tracking table, so a
    re-run is a no-op (the reference's idempotence contract). Returns the
    versions applied this call.
    """
    applied = _applied_versions(spark, tracking_path)
    ran: list[int] = []
    for version, description, path in _available(migrations_dir):
        if version in applied:
            continue
        with open(path) as f:
            text = f.read()
        for stmt in (s.strip() for s in text.split(";")):
            if stmt:
                spark.sql(stmt)
        spark.createDataFrame(
            [(version, description, datetime.now(timezone.utc).isoformat())],
            "version long, description string, applied_at string",
        ).write.mode("append").parquet(tracking_path)
        ran.append(version)
    return ran


def migration_info(
    spark: SparkSession, migrations_dir: str, tracking_path: str
) -> dict[str, list[tuple[int, str]]]:
    """Applied + pending listing (sync-app/src/cmd/migrate.rs:50-87)."""
    applied = _applied_versions(spark, tracking_path)
    available = _available(migrations_dir)
    return {
        "applied": sorted(applied.items()),
        "pending": [(v, d) for v, d, _ in available if v not in applied],
    }

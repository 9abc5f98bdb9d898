"""Right-censored survival analysis: the Kaplan-Meier / Nelson-Aalen life
table over per-entity lifetimes, in exact integer (parts-per-million)
arithmetic so both engines agree bit-for-bit.

The churn/retention question product analytics actually asks — "what
fraction of users survive past day t, given many are still active
(right-censored)?" — needs the life-table estimators, not a naive
histogram: users still active at the observation edge must count as AT
RISK up to their censoring time and never as deaths (Kaplan & Meier JASA
1958; Nelson 1972 / Aalen 1978 for the cumulative-hazard form).

Float discipline: every emitted quantity is an integer.  The per-time
hazard d/n and KM factor (n-d)/n are quantized to parts-per-million with
one floor division each (exact, engine-identical); the cumulative hazard
is a window SUM of those integers.  The KM survival CURVE is the running
PRODUCT of the factors — a per-step-quantized recursion no window
aggregate expresses — so this operator emits the per-step factors and the
caller folds the product (one pass over the tiny life table); the
additive Nelson-Aalen estimator, which IS window-expressible, ships
cumulative.  exp(-cum_hazard) approximates KM survival (the standard
identity), keeping every cross-engine-compared value integer.

Reference parity note: the reference engine (madninja/aci-export) has no
survival estimator; this extends the beyond-reference analytics surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: integer quantum for hazard / KM-factor emission: floor(x * 1e6)
PPM = 1_000_000


def user_lifetimes(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    censor_window_days: int = 7,
) -> DataFrame:
    """Per-entity lifetime with deterministic right-censoring: duration =
    whole days between the entity's first and last event; an entity whose
    last event falls within `censor_window_days` days of the corpus's
    latest DAY is censored (still alive at the observation edge — its true
    lifetime is only known to be >= the observed one).

    One user-key aggregate (the only corpus-scale shuffle) + a 1-row
    broadcast of the corpus max day.
    """
    per_user = events.groupBy(entity_col).agg(
        F.min(F.to_date(ts_col)).alias("__first_day"),
        F.max(F.to_date(ts_col)).alias("__last_day"),
    )
    horizon = events.agg(F.max(F.to_date(ts_col)).alias("__max_day"))
    return per_user.join(F.broadcast(horizon)).select(
        F.col(entity_col),
        F.datediff("__last_day", "__first_day").cast("long").alias("duration_days"),
        (
            F.datediff("__max_day", "__last_day") < censor_window_days
        ).alias("censored"),
    )


def km_life_table(lifetimes: DataFrame, duration_col: str = "duration_days",
                  censored_col: str = "censored",
                  out_col: str | None = None) -> DataFrame:
    """Kaplan-Meier / Nelson-Aalen life table from (duration, censored)
    rows: one row per distinct duration WITH at least one death, carrying

    - ``n_risk``   — entities with duration >= t (censored ones included:
      they were observably alive through t)
    - ``n_deaths`` / ``n_censored`` at exactly t
    - ``hazard_ppm``      = floor(1e6 * d / n)        (Nelson-Aalen term)
    - ``cum_hazard_ppm``  = running sum of hazard terms (Nelson-Aalen)
    - ``km_factor_ppm``   = floor(1e6 * (n - d) / n)  (the KM product term)

    Plan: the input is already entity-level (corpus-size-independent after
    :func:`user_lifetimes`); the per-duration aggregate is
    distinct-duration-sized, and the two unpartitioned windows (risk-set
    suffix sum, hazard prefix sum) run on THAT tiny table — the
    orders_rfm_segments single-task-on-the-aggregate shape, exact and fine
    to ~10^6 distinct durations (durations are DAYS, so the table is
    calendar-bounded regardless of corpus size).
    """
    per_t = lifetimes.groupBy(F.col(duration_col).alias("t")).agg(
        F.sum(F.when(~F.col(censored_col), 1).otherwise(0)).cast("long").alias("n_deaths"),
        F.sum(F.when(F.col(censored_col), 1).otherwise(0)).cast("long").alias("n_censored"),
    )
    w_at_risk = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risked = per_t.withColumn(
        "n_risk", F.sum(F.col("n_deaths") + F.col("n_censored")).over(w_at_risk)
    )
    events_only = risked.filter(F.col("n_deaths") > 0).withColumn(
        "hazard_ppm", F.expr(f"(n_deaths * {PPM}) div n_risk")
    )
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events_only.select(
        F.col("t").alias(out_col or duration_col),
        "n_risk",
        "n_deaths",
        "n_censored",
        "hazard_ppm",
        F.sum("hazard_ppm").over(w_cum).cast("long").alias("cum_hazard_ppm"),
        F.expr(f"((n_risk - n_deaths) * {PPM}) div n_risk").alias("km_factor_ppm"),
    )


def user_lifetimes_hours(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    censor_window_hours: int = 24,
) -> DataFrame:
    """Hour-granular sibling of :func:`user_lifetimes` for event streams
    whose whole span is days, not months (every duration in whole DAYS
    collapses the life table to a handful of rows — or, when every entity
    stays active to the observation edge, to NONE).

    Cross-engine caution: hour differences are computed as EPOCH-HOUR
    FLOOR differences (``epoch_us div 3600e6``) — boundary-crossing
    counts, identical in Spark and DuckDB — NOT ``timestampdiff(HOUR)``,
    whose full-elapsed-unit semantics differ from DuckDB's
    ``date_diff('hour', …)`` boundary counting and would flip rows near
    hour edges."""
    hours = F.expr(f"unix_micros(cast({ts_col} as timestamp)) div 3600000000")
    per_user = events.groupBy(entity_col).agg(
        F.min(hours).alias("__first_h"),
        F.max(hours).alias("__last_h"),
    )
    horizon = events.agg(F.max(hours).alias("__max_h"))
    return per_user.join(F.broadcast(horizon)).select(
        F.col(entity_col),
        (F.col("__last_h") - F.col("__first_h")).cast("long").alias(
            "duration_hours"
        ),
        (
            F.col("__max_h") - F.col("__last_h") < censor_window_hours
        ).alias("censored"),
    )

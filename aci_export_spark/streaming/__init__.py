from aci_export_spark.streaming.core import (
    read_events_stream,
    hourly_agg_stream,
    sessionize_stream,
    reconcile_session_snapshots,
    run_stream_to_table,
    interval_join_stream,
    distinct_users_stream,
    stream_into_mirror,
    dq_monitor_stream,
    funnel_stream,
    reconcile_funnel_snapshots,
)

__all__ = [
    "read_events_stream",
    "hourly_agg_stream",
    "sessionize_stream",
    "reconcile_session_snapshots",
    "run_stream_to_table",
    "interval_join_stream",
    "distinct_users_stream",
    "stream_into_mirror",
    "dq_monitor_stream",
    "funnel_stream",
    "reconcile_funnel_snapshots",
]

"""events_mad_outliers: hand-computed lower-median / MAD / outlier counts
via the registered query on a synthetic parquet dir."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from aci_export_spark.harness import REGISTRY


@pytest.fixture()
def tiny_events_dir(tmp_path, spark):
    # type 'a': values 1..7 plus one wild outlier 1000
    #   sorted: [1,2,3,4,5,6,7,1000], n=8 -> lower median = rank 4 -> 4
    #   |v-4|:  [3,2,1,0,1,2,3,996] sorted [0,1,1,2,2,3,3,996] -> MAD = rank 4 -> 2
    #   outliers: |v-4| > 6 -> only 1000 -> 1
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 1000.0]
    df = pd.DataFrame(
        {
            "event_id": range(len(vals)),
            "ts": pd.Timestamp("2024-01-01"),
            "user_id": 1,
            "event_type": "a",
            "value": vals,
            "props": "{}",
        }
    )
    df.to_parquet(os.path.join(tmp_path, "events.parquet"))
    return str(tmp_path)


def test_hand_computed_mad(spark, tiny_events_dir):
    import aci_export_spark.harness_analytics  # noqa: F401  (registers)

    fn = REGISTRY["events_mad_outliers"].fn
    rows = {r["event_type"]: r for r in fn(spark, tiny_events_dir).collect()}
    a = rows["a"]
    assert a["n_events"] == 8
    assert a["median_value"] == 4.0
    assert a["mad"] == 2.0
    assert a["n_outliers"] == 1

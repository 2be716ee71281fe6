"""Volume-spike anomaly detection.

Batch analog of the reference's stateful DoFn
(analysis-dataflow-pipeline/pipeline.py:19-41, DetectVolumeSpike):
per ticker, keep the last 10 one-minute volumes; a window is a spike
when its volume exceeds 2x the average of that history and the
history is non-empty.

Beam's "last 10 seen" is processing-order state; the deterministic
batch equivalent orders by window time, i.e. a ROWS frame
[10 PRECEDING, 1 PRECEDING] per ticker. The average is computed as
exact integer sum / count (double division of exact operands) so the
oracle matches bit-for-bit. The streaming twin
(streaming/state.py) reproduces the stateful formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def with_volume_spike(agg_1m: DataFrame,
                      history: int = 10,
                      factor: float = 2.0) -> DataFrame:
    """Add avg_volume_10m + is_volume_spike per (ticker, window)."""
    hist = (
        Window.partitionBy("ticker")
        .orderBy("window_start")
        .rowsBetween(-history, -1)
    )
    s = F.sum("total_volume_1m").over(hist)
    c = F.count("total_volume_1m").over(hist)
    avg = s.cast("double") / c
    return (
        agg_1m
        .withColumn("avg_volume_10m", F.coalesce(avg, F.lit(0.0)))
        .withColumn(
            "is_volume_spike",
            F.when(
                (F.col("avg_volume_10m") > 0)
                & (F.col("total_volume_1m")
                   > F.lit(factor) * F.col("avg_volume_10m")),
                F.lit(True),
            ).otherwise(F.lit(False)),
        )
    )

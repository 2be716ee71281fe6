"""Custom Python DataSource (SURVEY.md §2 E13) — the engine's
connector extension point.

The reference ingests ticks through a Cloud Function generator
(stock-ingestion-function/main.py:30-68: fetch/synthesize per-minute
ticker/price/volume rows, publish as messages). Here that generator
IS a Spark data source: `spark.read.format("synthetic_ticks")`
yields the same shaped rows, planned and parallelized by Spark —
each partition produces a deterministic, seed-stable shard, so two
reads (or a retried task) always regenerate identical data. This is
the Spark 4 Python DataSource API, the path for adding connectors
(internal services, queues, bespoke formats) without JVM code; the
same class can grow a DataSourceStreamReader for the streaming twin.

Determinism contract: row i (0-based, global) maps to
  ticker  = TICKER_<i mod n_tickers>
  ts      = start + (i div n_tickers) minutes
  price   = 100 + ((i * 2654435761) mod 10007) / 100      (fixed-point)
  volume  = 1 + ((i * 40503) mod 997)
Integer arithmetic only — no float accumulation, so every engine,
retry, and partitioning reproduces bit-identical values.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource, DataSourceReader, DataSourceStreamReader, InputPartition)

_KNUTH = 2654435761  # Knuth multiplicative-hash constant (public domain)


class SyntheticTickDataSource(DataSource):
    """Register with ``spark.dataSource.register(SyntheticTickDataSource)``
    then ``spark.read.format("synthetic_ticks").option(...).load()``.

    Options: n_rows (default 1000), n_tickers (5), num_partitions (8),
    start_epoch_s (2024-01-01 00:00:00 UTC).
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_ticks"

    def schema(self) -> str:
        return ("tick_id bigint, ticker string, ts timestamp, "
                "price double, volume bigint")

    def reader(self, schema) -> "SyntheticTickReader":
        return SyntheticTickReader(self.options)

    def streamReader(self, schema) -> "SyntheticTickStreamReader":
        return SyntheticTickStreamReader(self.options)


class SyntheticTickReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_tickers = int(options.get("n_tickers", 5))
        self.num_partitions = int(options.get("num_partitions", 8))
        self.start_epoch_s = int(options.get("start_epoch_s", 1704067200))

    def partitions(self):
        # contiguous row-range shards: partition p owns [lo, hi)
        per = -(-self.n_rows // self.num_partitions)  # ceil
        return [InputPartition((p * per, min((p + 1) * per, self.n_rows)))
                for p in range(self.num_partitions)]

    def read(self, partition):
        import datetime as dt

        lo, hi = partition.value
        for i in range(lo, hi):
            ticker = f"TICKER_{i % self.n_tickers}"
            ts = dt.datetime.utcfromtimestamp(
                self.start_epoch_s + 60 * (i // self.n_tickers))
            price = 100.0 + ((i * _KNUTH) % 10007) / 100.0
            volume = 1 + (i * 40503) % 997
            yield (i, ticker, ts, price, volume)


class SyntheticTickStreamReader(DataSourceStreamReader):
    """Streaming twin (E13): the same deterministic generator exposed
    as an offset-tracked micro-batch source — the Pub/Sub-analog
    ingestion path, but replayable: offsets are plain row indices, so
    a restarted query re-reads exactly the rows its checkpoint says
    (the property WAL+checkpoint recovery needs from a source).
    Emits up to rows_per_batch rows per micro-batch until n_rows."""

    def __init__(self, options):
        self._b = SyntheticTickReader(options)
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self._latest = 0

    def initialOffset(self):
        return {"i": 0}

    def latestOffset(self):
        self._latest = min(self._latest + self.rows_per_batch,
                           self._b.n_rows)
        return {"i": self._latest}

    def partitions(self, start, end):
        lo, hi = start["i"], end["i"]
        n = self._b.num_partitions
        per = max(1, -(-(hi - lo) // n))
        return [InputPartition((p_lo, min(p_lo + per, hi)))
                for p_lo in range(lo, hi, per)]

    def read(self, partition):
        yield from self._b.read(partition)

    def commit(self, end):
        pass


def register_tick_source(spark) -> None:
    """Idempotent registration — the data source registry is
    JVM-global, so a second register() in the same process raises
    DATA_SOURCE_ALREADY_EXISTS."""
    try:
        spark.dataSource.register(SyntheticTickDataSource)
    except Exception as e:  # AnalysisException: already registered
        if "DATA_SOURCE_ALREADY_EXISTS" not in str(e):
            raise

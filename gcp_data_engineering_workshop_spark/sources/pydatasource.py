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
    DataSource, DataSourceReader, DataSourceStreamReader, InputPartition,
    SimpleDataSourceStreamReader)

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


class BarReplayDataSource(DataSource):
    """E17: file-backed OHLCV minute-bar replay source — the
    reference's live-feed connector (main.py:50-75: multi-ticker
    minute-bar download, then replay of ONE minute per invocation)
    re-expressed on the Spark 4 Python DataSource API with no
    network call: the "feed" is a CSV minute-bar dump on disk, the
    batch reader plans minute-range shards, and the stream reader
    replays minutes_per_batch minutes per micro-batch with plain
    minute-index offsets — so a checkpoint-restarted query resumes
    the replay exactly where it stopped (the property WAL recovery
    needs, and the analog of main.py's deterministic
    (now // 60) %% total_minutes replay cursor).

    Options: path (CSV: ticker,ts,open,high,low,close,volume with a
    header; ts ISO "YYYY-MM-DD HH:MM:SS"), minutes_per_batch (1),
    num_partitions (4, batch reader only).

    Scale note: a bar dump is small by construction (minutes x
    tickers), so whole-file-scan-per-partition is the right
    tradeoff; a blob-scale connector would shard by byte ranges
    instead — the planning surface (partitions()/read()) is the
    same.
    """

    @classmethod
    def name(cls) -> str:
        return "bar_replay"

    def schema(self) -> str:
        return ("ticker string, ts timestamp, open double, high double, "
                "low double, close double, volume bigint")

    def reader(self, schema) -> "BarReplayReader":
        return BarReplayReader(self.options)

    def simpleStreamReader(self, schema) -> "BarReplayStreamReader":
        return BarReplayStreamReader(self.options)


def _read_bars(path: str):
    """Parse the dump once: [(ticker, ts, o, h, l, c, volume)] sorted
    by (ts, ticker) — the deterministic replay order."""
    import csv
    import datetime as dt

    out = []
    with open(path, newline="") as fh:
        for row in csv.DictReader(fh):
            out.append((row["ticker"],
                        dt.datetime.fromisoformat(row["ts"]),
                        float(row["open"]), float(row["high"]),
                        float(row["low"]), float(row["close"]),
                        int(row["volume"])))
    out.sort(key=lambda r: (r[1], r[0]))
    return out


class BarReplayReader(DataSourceReader):
    """Batch reader: the whole dump, planned as minute-range shards."""

    def __init__(self, options):
        self.path = options["path"]
        self.num_partitions = int(options.get("num_partitions", 4))

    def partitions(self):
        minutes = sorted({r[1] for r in _read_bars(self.path)})
        n = max(1, min(self.num_partitions, len(minutes)))
        per = -(-len(minutes) // n)
        return [InputPartition([m.isoformat() for m in
                                minutes[p * per:(p + 1) * per]])
                for p in range(n)]

    def read(self, partition):
        import datetime as dt

        wanted = {dt.datetime.fromisoformat(m) for m in partition.value}
        for r in _read_bars(self.path):
            if r[1] in wanted:
                yield r


class BarReplayStreamReader(SimpleDataSourceStreamReader):
    """Streaming replay: offsets are minute indices into the dump's
    sorted distinct minutes; each micro-batch emits the next
    minutes_per_batch minutes' bars (main.py:70-75's one-minute-per-
    invocation cursor).

    Uses the SIMPLE stream-reader API deliberately: ``read(start)``
    derives the batch's end offset FROM the committed start Spark
    hands back, so the replay cursor is restart-safe by construction
    — a latestOffset()-style reader keeps the cursor in instance
    state, and a checkpoint-recovered query would re-create the
    reader at cursor 0 and re-replay committed minutes (found by the
    restart test). A bar dump is low-throughput by construction
    (minutes x tickers rows), exactly the source class this
    driver-side API is for; ``readBetweenOffsets`` replays a planned
    batch after failure for exactly-once recovery."""

    def __init__(self, options):
        self.path = options["path"]
        self.minutes_per_batch = int(options.get("minutes_per_batch", 1))
        self._minutes = sorted({r[1] for r in _read_bars(self.path)})

    def initialOffset(self):
        return {"m": 0}

    def _rows(self, lo: int, hi: int):
        wanted = set(self._minutes[lo:hi])
        return [r for r in _read_bars(self.path) if r[1] in wanted]

    def read(self, start):
        lo = start["m"]
        hi = min(lo + self.minutes_per_batch, len(self._minutes))
        return iter(self._rows(lo, hi)), {"m": hi}

    def readBetweenOffsets(self, start, end):
        return iter(self._rows(start["m"], end["m"]))

    def commit(self, end):
        pass


def register_bar_replay_source(spark) -> None:
    """Idempotent registration (see register_tick_source)."""
    try:
        spark.dataSource.register(BarReplayDataSource)
    except Exception as e:
        if "DATA_SOURCE_ALREADY_EXISTS" not in str(e):
            raise

"""DuckDB oracle SQL for every oracle-checkable query.

Each string is ANSI SQL the driver runs in DuckDB against the same
parquet tables (pre-registered views). Column names and value
arithmetic are kept bit-identical to the Spark plans: passthrough
doubles, decimal-exact sums cast to double, integer sums cast to
BIGINT (DuckDB's SUM(BIGINT) widens to HUGEINT otherwise).
"""

from __future__ import annotations

# Shared tick-decode CTE (mirrors sources/ticks.py)
TICKS_CTE = """
ticks AS (
  SELECT event_type AS ticker, ts, value AS price,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS volume,
         CAST((event_id * 2654435761) % 2001 - 1000 AS DOUBLE) / 1000.0
           AS ai_sentiment
  FROM events
),
ticks2 AS (
  SELECT ticker, ts, price, volume, ai_sentiment,
         CASE WHEN ai_sentiment > 0.3 THEN 'bullish'
              WHEN ai_sentiment < -0.3 THEN 'bearish'
              ELSE 'neutral' END AS ai_summary
  FROM ticks
)
"""

# Per-minute aggregation CTE (mirrors operators/windows.py tumbling_1m)
AGG_CTE = """
agg AS (
  SELECT ticker,
         date_trunc('minute', ts) AS window_start,
         max_by(price, ts) AS latest_price,
         max(price) AS high_price_1m,
         CAST(sum(volume) AS BIGINT) AS total_volume_1m,
         CAST(sum(CAST(price AS DECIMAL(18,4)) * volume) AS DOUBLE)
           AS total_value_1m,
         max_by(ai_sentiment, ts) AS ai_sentiment,
         max_by(ai_summary, ts) AS ai_summary,
         sum(CAST(price AS DECIMAL(18,4))) AS psum,
         count(*) AS pcnt
  FROM ticks2
  GROUP BY 1, 2
)
"""

# Window-function stage: sliding SMA + spike history (mirrors
# with_sma_5m / with_volume_spike)
WINDOWED_CTE = """
windowed AS (
  SELECT *,
    CAST(sum(psum) OVER w5 AS DOUBLE) / CAST(sum(pcnt) OVER w5 AS DOUBLE)
      AS sma_5m,
    CAST(sum(total_volume_1m) OVER hist AS DOUBLE) AS hsum,
    count(total_volume_1m) OVER hist AS hcnt
  FROM agg
  WINDOW
    w5 AS (PARTITION BY ticker ORDER BY epoch_us(window_start) // 1000000
           RANGE BETWEEN 240 PRECEDING AND CURRENT ROW),
    hist AS (PARTITION BY ticker ORDER BY window_start
             ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
)
"""

_PIPELINE_PREFIX = f"WITH {TICKS_CTE.strip()}, {AGG_CTE.strip()}, {WINDOWED_CTE.strip()}"

FULL_PIPELINE_SQL = f"""
{_PIPELINE_PREFIX}
SELECT ticker,
       window_start + INTERVAL 1 MINUTE AS window_timestamp,
       latest_price, high_price_1m, total_volume_1m, total_value_1m,
       sma_5m,
       CASE WHEN coalesce(hsum / hcnt, 0.0) > 0
                 AND total_volume_1m > 2.0 * (hsum / hcnt)
            THEN true ELSE false END AS is_volume_spike,
       ai_sentiment, ai_summary
FROM windowed
"""

INGEST_PARSE_JSON_SQL = f"""
WITH {TICKS_CTE.strip()}
SELECT ticker, ts, price, volume, ai_sentiment, ai_summary FROM ticks2
"""

AGG_1M_SQL = f"""
WITH {TICKS_CTE.strip()}, {AGG_CTE.strip()}
SELECT ticker, window_start + INTERVAL 1 MINUTE AS window_timestamp,
       latest_price, high_price_1m, total_volume_1m, total_value_1m
FROM agg
"""

SMA_5M_SQL = f"""
{_PIPELINE_PREFIX}
SELECT ticker, window_start + INTERVAL 1 MINUTE AS window_timestamp, sma_5m
FROM windowed
"""

JOIN_METRICS_SQL = f"""
{_PIPELINE_PREFIX}
SELECT ticker, window_start + INTERVAL 1 MINUTE AS window_timestamp,
       latest_price, high_price_1m, total_volume_1m, total_value_1m, sma_5m
FROM windowed
"""

VOLUME_SPIKE_SQL = f"""
{_PIPELINE_PREFIX}
SELECT ticker, window_start + INTERVAL 1 MINUTE AS window_timestamp,
       total_volume_1m,
       coalesce(hsum / hcnt, 0.0) AS avg_volume_10m,
       CASE WHEN coalesce(hsum / hcnt, 0.0) > 0
                 AND total_volume_1m > 2.0 * (hsum / hcnt)
            THEN true ELSE false END AS is_volume_spike
FROM windowed
"""

DASH_OVERVIEW_SQL = f"""
{_PIPELINE_PREFIX}
SELECT window_start + INTERVAL 1 MINUTE AS window_timestamp,
       ticker, latest_price
FROM windowed
ORDER BY window_timestamp DESC, ticker
LIMIT 500
"""

DASH_TICKERS_SQL = f"""
WITH {TICKS_CTE.strip()}
SELECT DISTINCT ticker FROM ticks2
"""

DASH_DETAIL_SQL = f"""
{_PIPELINE_PREFIX}
SELECT window_start + INTERVAL 1 MINUTE AS window_timestamp,
       latest_price, high_price_1m, total_volume_1m, total_value_1m,
       sma_5m,
       CASE WHEN coalesce(hsum / hcnt, 0.0) > 0
                 AND total_volume_1m > 2.0 * (hsum / hcnt)
            THEN true ELSE false END AS is_volume_spike,
       ai_sentiment, ai_summary
FROM windowed
WHERE ticker = 'click'
ORDER BY window_timestamp DESC
LIMIT 100
"""

INGEST_REPLAY_SQL = """
WITH ticks AS (
  SELECT event_type AS ticker, ts, value AS price,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS volume,
         CAST((event_id * 2654435761) % 2001 - 1000 AS DOUBLE) / 1000.0
           AS ai_sentiment
  FROM events
),
ticks2 AS (
  SELECT *, CASE WHEN ai_sentiment > 0.3 THEN 'bullish'
                 WHEN ai_sentiment < -0.3 THEN 'bearish'
                 ELSE 'neutral' END AS ai_summary
  FROM ticks
),
day_ticks AS (
  SELECT * FROM ticks2
  WHERE CAST(ts AS DATE) = (SELECT max(CAST(ts AS DATE)) FROM ticks2)
),
minutes AS (
  SELECT m, row_number() OVER (ORDER BY m) - 1 AS idx,
         count(*) OVER () AS n
  FROM (SELECT DISTINCT date_trunc('minute', ts) AS m FROM day_ticks)
),
target AS (SELECT m FROM minutes WHERE idx = 7 % n)
SELECT ticker, ts, price, volume, ai_sentiment, ai_summary
FROM day_ticks, target
WHERE date_trunc('minute', day_ticks.ts) = target.m
"""

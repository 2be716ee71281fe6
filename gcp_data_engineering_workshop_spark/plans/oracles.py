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

# ---------------------------------------------------------------------------
# B-block: general analytics oracles (plans/analytics.py)
# ---------------------------------------------------------------------------

_REV = ("CAST(l_extendedprice AS DECIMAL(18,4)) * "
        "(CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))")

Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       CAST(CAST(SUM({_REV}) AS VARCHAR) AS DOUBLE)
         AS sum_disc_price,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                     * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))
                     * (CAST(1 AS DECIMAL(6,4)) + CAST(l_tax AS DECIMAL(6,4))))
                 AS VARCHAR) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

Q3_SQL = f"""
SELECT o_orderkey, o_orderdate,
       CAST(SUM({_REV}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""

Q5_SQL = f"""
SELECT n_name,
       CAST(SUM({_REV}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""

TOPK_PER_GROUP_SQL = """
SELECT p_brand, p_partkey, p_name, p_retailprice, rank_in_brand
FROM (
  SELECT p_brand, p_partkey, p_name, p_retailprice,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey)
           AS rank_in_brand
  FROM part
)
WHERE rank_in_brand <= 3
"""

COUNT_DISTINCT_USERS_SQL = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users,
       count(*) AS n_events
FROM events
GROUP BY event_type
"""

ANTI_JOIN_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey
    AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
)
"""

ROLLUP_REVENUE_SQL = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
       o_orderpriority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue,
       count(*) AS n_orders
FROM orders
GROUP BY ROLLUP(order_year, o_orderpriority)
"""

SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 30*60*1000000
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       CAST(SUM(is_start) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM flagged
GROUP BY user_id
"""

EVENT_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, min(ts) AS v_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS c_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.v_ts
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS p_ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
  GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM v) AS n_view,
       (SELECT count(*) FROM c) AS n_view_click,
       (SELECT count(*) FROM p) AS n_view_click_purchase
"""

QUANTITY_PERCENTILES_SQL = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS p25,
       quantile_cont(l_quantity, 0.5)  AS p50,
       quantile_cont(l_quantity, 0.75) AS p75,
       quantile_cont(l_quantity, 0.95) AS p95
FROM lineitem
GROUP BY l_returnflag
"""

# ---------------------------------------------------------------------------
# C-block: training-data-pipeline oracles (plans/textpipeline.py)
# ---------------------------------------------------------------------------

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_WORDS_CTE = f"""
wt AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
)
"""
# distinct 3-word shingles (1-indexed lists)
_SHINGLES_CTE = f"""
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - 1),
                                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
  FROM wt WHERE len(w) >= 3
)
"""

DEDUP_EXACT_SQL = f"""
WITH h AS (SELECT doc_id, md5({_NORM}) AS norm_hash FROM documents)
SELECT doc_id, norm_hash,
       count(*) OVER (PARTITION BY norm_hash) AS group_size,
       doc_id = min(doc_id) OVER (PARTITION BY norm_hash) AS is_canonical
FROM h
"""

# inverted-index candidates (pairs sharing >=1 shingle) instead of an
# O(n^2) cross product — identical result, ~10x faster oracle
_CAND_CTE = """
inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM inv x JOIN inv y ON x.g = y.g
  WHERE x.doc_id < y.doc_id
)
"""

_JACCARD_PAIRS = f"""
WITH {_WORDS_CTE.strip()}, {_SHINGLES_CTE.strip()}, {_CAND_CTE.strip()},
pairs AS (
  SELECT cand.doc_a, cand.doc_b,
         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
           / len(list_distinct(list_concat(a.s, b.s))) AS jaccard_sim
  FROM cand
  JOIN sh a ON cand.doc_a = a.doc_id
  JOIN sh b ON cand.doc_b = b.doc_id
)
SELECT doc_a, doc_b, jaccard_sim FROM pairs WHERE jaccard_sim >= 0.9
"""

NGRAM_JACCARD_SQL = _JACCARD_PAIRS
# LSH-verified output provably equals the exact pair set at tau=0.9
# (miss prob ~1e-23 with 32 bands x 2 rows) — same oracle.
DEDUP_MINHASH_SQL = _JACCARD_PAIRS

_DOT = ("list_sum(list_transform(range(1, len(a.embedding) + 1), "
        "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))")

EMBEDDING_NEARDUP_SQL = f"""
WITH p AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         round({_DOT}, 6) AS dot_sim
  FROM embeddings a, embeddings b
  WHERE a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, dot_sim FROM p WHERE dot_sim >= 0.4
"""

ANN_TOPK_SQL = f"""
WITH s AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         round({_DOT}, 6) AS dot_sim
  FROM embeddings a, embeddings b
  WHERE a.vec_id < 10 AND a.vec_id != b.vec_id
), r AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY dot_sim DESC, neighbor_id) AS INT) AS rank
  FROM s
)
SELECT query_id, neighbor_id, dot_sim, rank FROM r WHERE rank <= 5
"""

_SW = {
    "en": "['the','a','of','and','to','in','is','that','it','for']",
    "es": "['el','la','de','y','que','en','un','una','es','por']",
    "fr": "['le','la','de','et','que','en','un','une','est','pour']",
    "de": "['der','die','das','und','zu','in','ist','ein','eine','nicht']",
}
_RATIOS = ", ".join(
    f"CASE WHEN len(list_distinct(w)) > 0 THEN CAST(len(list_intersect(list_distinct(w), {lst})) AS DOUBLE)/len(list_distinct(w)) ELSE 0.0 END AS r_{lang}"
    for lang, lst in _SW.items())

TEXT_LANG_ID_SQL = f"""
WITH {_WORDS_CTE.strip()},
feats AS (
  SELECT d.doc_id, d.lang AS lang_label,
         len(regexp_extract_all(d.text, '[一-鿿]')) > 0 AS has_cjk,
         {_RATIOS}
  FROM documents d JOIN wt ON d.doc_id = wt.doc_id
)
SELECT doc_id, lang_label,
  CASE WHEN has_cjk THEN 'zh'
       WHEN greatest(r_en, r_es, r_fr, r_de) <= 0 THEN 'und'
       WHEN r_en = greatest(r_en, r_es, r_fr, r_de) THEN 'en'
       WHEN r_es = greatest(r_en, r_es, r_fr, r_de) THEN 'es'
       WHEN r_fr = greatest(r_en, r_es, r_fr, r_de) THEN 'fr'
       ELSE 'de' END AS lang_pred
FROM feats
"""

TEXT_QUALITY_SQL = f"""
WITH {_WORDS_CTE.strip()},
feats AS (
  SELECT d.doc_id,
         len(w) AS n_words,
         length(d.text) AS n_chars,
         CASE WHEN len(w) > 0
              THEN CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE)/len(w)
              ELSE 0.0 END AS awl,
         CASE WHEN length(d.text) > 0
              THEN CAST(len(regexp_extract_all(d.text, '[^\\w\\s]')) AS DOUBLE)/length(d.text)
              ELSE 0.0 END AS pr,
         CASE WHEN length(d.text) > 0
              THEN CAST(len(regexp_extract_all(d.text, '[0-9]')) AS DOUBLE)/length(d.text)
              ELSE 0.0 END AS dr,
         CASE WHEN len(list_distinct(w)) > 0
              THEN CAST(len(list_intersect(list_distinct(w), {_SW['en']})) AS DOUBLE)/len(list_distinct(w))
              ELSE 0.0 END AS sr
  FROM documents d JOIN wt ON d.doc_id = wt.doc_id
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_chars AS BIGINT) AS n_chars,
       round(awl, 6) AS avg_word_len,
       round(pr, 6) AS punct_ratio,
       round(sr, 6) AS stopword_ratio_en,
       round(0.4 * least(CAST(n_words AS DOUBLE)/100.0, 1.0)
           + 0.3 * least(sr * 5.0, 1.0)
           + 0.3 * (1.0 - least(pr * 10.0 + dr * 5.0, 1.0)), 6) AS quality_score
FROM feats
"""

TOKEN_COUNT_SQL = f"""
WITH {_WORDS_CTE.strip()}
SELECT d.doc_id,
       CAST(len(w) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(lower(d.text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS bpe_tokens
FROM documents d JOIN wt ON d.doc_id = wt.doc_id
"""

_KR = "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split({s}, ''), c -> CAST(ascii(c) AS BIGINT))), (h, x) -> (h * 31 + x) % 2147483647)"

DOC_FINGERPRINT_SQL = f"""
WITH {_WORDS_CTE.strip()}, {_SHINGLES_CTE.strip()},
fp AS (
  SELECT d.doc_id,
         {_KR.format(s=_NORM)} AS fp_full
  FROM documents d
),
fpmin AS (
  SELECT doc_id,
         list_min(list_transform(s, g -> {_KR.format(s='g')})) AS fp_min_shingle
  FROM sh
)
SELECT fp.doc_id, fp.fp_full, fpmin.fp_min_shingle
FROM fp LEFT JOIN fpmin ON fp.doc_id = fpmin.doc_id
"""

# ---------------------------------------------------------------------------
# B-block extension oracles (plans/analytics2.py)
# ---------------------------------------------------------------------------

Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
             * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""

Q10_SQL = f"""
SELECT c_custkey, c_name, c_mktsegment, revenue
FROM (
  SELECT o_custkey, CAST(SUM({_REV}) AS DOUBLE) AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
  GROUP BY o_custkey
) r JOIN customer ON r.o_custkey = c_custkey
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

Q14_SQL = f"""
SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV}
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) * 100.0
         / CAST(SUM({_REV}) AS DOUBLE) AS promo_revenue_pct,
       count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-02-01 00:00:00'
"""

Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
) b
JOIN orders ON b.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE total_qty > 150
ORDER BY total_qty DESC, o_orderkey
LIMIT 100
"""

ASOF_JOIN_SQL = """
WITH marked AS (
  SELECT user_id, event_id, event_type, ts,
         last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_view_ts
  FROM events
)
SELECT user_id, event_id AS purchase_event_id, ts AS purchase_ts, last_view_ts
FROM marked WHERE event_type = 'purchase'
"""

RANGE_JOIN_SQL = """
SELECT p.user_id, p.event_id AS purchase_event_id,
       count(e.ts) AS n_errors_5m_before
FROM events p
LEFT JOIN events e
  ON e.user_id = p.user_id AND e.event_type = 'error'
 AND e.ts < p.ts AND e.ts >= p.ts - INTERVAL 5 MINUTE
WHERE p.event_type = 'purchase'
GROUP BY p.user_id, p.event_id
"""

PIVOT_SQL = """
SELECT CAST(ts AS DATE) AS day,
       count(*) FILTER (WHERE event_type = 'click')    AS click,
       count(*) FILTER (WHERE event_type = 'error')    AS error,
       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       count(*) FILTER (WHERE event_type = 'signup')   AS signup,
       count(*) FILTER (WHERE event_type = 'view')     AS view
FROM events
GROUP BY 1
"""

CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue,
       count(*) AS n_orders
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""

SALTED_AGG_SQL = f"""
WITH {TICKS_CTE.strip()}
SELECT ticker,
       CAST(SUM(volume) AS BIGINT) AS total_volume,
       count(*) AS n_ticks
FROM ticks2
GROUP BY ticker
"""

DEDUP_GROUPS_SQL = f"""
WITH RECURSIVE {_WORDS_CTE.strip()}, {_SHINGLES_CTE.strip()}, {_CAND_CTE.strip()},
pairs AS (
  SELECT cand.doc_a, cand.doc_b
  FROM cand
  JOIN sh a ON cand.doc_a = a.doc_id
  JOIN sh b ON cand.doc_b = b.doc_id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / len(list_distinct(list_concat(a.s, b.s))) >= 0.9
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)
SELECT node AS doc_id,
       least(node, min_reach) AS component
FROM (
  SELECT a AS node, min(b) AS min_reach FROM reach GROUP BY a
)
"""

STATS_SUMMARY_SQL = f"""
WITH {TICKS_CTE.strip()},
agg AS (
  SELECT ticker,
         count(*) AS n_ticks,
         CAST(SUM(CAST(price AS DECIMAL(18,4))) AS DOUBLE) AS s,
         CAST(SUM(CAST(price AS DECIMAL(18,4))
                  * CAST(price AS DECIMAL(18,4))) AS DOUBLE) AS s2
  FROM ticks GROUP BY ticker
)
SELECT ticker, n_ticks,
       round(s / n_ticks, 6) AS mean_price,
       round((s2 - s * s / n_ticks) / (n_ticks - 1), 6) AS var_price,
       round(sqrt((s2 - s * s / n_ticks) / (n_ticks - 1)), 6) AS stddev_price
FROM agg
"""

DOC_CHUNKING_SQL = f"""
WITH {_WORDS_CTE.strip()},
starts AS (
  SELECT doc_id, w, unnest(range(0, greatest(len(w) - 1, 0) + 1, 40)) AS s
  FROM wt
)
SELECT doc_id,
       CAST(s / 40 AS INT) AS chunk_idx,
       array_to_string(w[s+1 : s+50], ' ') AS chunk_text,
       CAST(len(w[s+1 : s+50]) AS BIGINT) AS n_tokens
FROM starts
"""

TRAIN_TEST_SPLIT_SQL = f"""
SELECT doc_id,
       {_KR.format(s=_NORM)} % 100 AS bucket,
       CASE WHEN {_KR.format(s=_NORM)} % 100 < 80 THEN 'train'
            ELSE 'test' END AS split
FROM documents
"""

TEXT_SCRUB_SQL = """
SELECT doc_id,
       md5(regexp_replace(text, '[0-9]+', '<NUM>', 'g')) AS scrub_hash,
       CAST(length(regexp_replace(text, '[0-9]+', '<NUM>', 'g')) AS BIGINT) AS scrub_len
FROM documents
"""

VOCAB_TOPK_SQL = f"""
WITH {_WORDS_CTE.strip()},
counts AS (
  SELECT unnest(w) AS token FROM wt
),
freqs AS (
  SELECT token, count(*) AS freq FROM counts GROUP BY token
),
ranked AS (
  SELECT token, freq,
         CAST(row_number() OVER (ORDER BY freq DESC, token) AS INT) AS rank
  FROM freqs
)
SELECT token, freq, rank FROM ranked WHERE rank <= 100
"""

TFIDF_SQL = f"""
WITH {_WORDS_CTE.strip()},
tokens AS (
  SELECT doc_id, unnest(w) AS term FROM wt
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tokens GROUP BY doc_id, term
),
df AS (
  SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM tokens)
  GROUP BY term
),
n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS tfidf
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
                 ORDER BY tfidf DESC, term) AS INT) AS rank
  FROM scored
)
SELECT doc_id, term, tfidf, rank FROM ranked WHERE rank <= 3
"""

SESSION_WINDOW_SQL = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 30*60*1000000
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts,
         sum(is_start) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events
FROM sessions GROUP BY user_id, session_id
"""

Q19_SQL = f"""
SELECT CAST(SUM({_REV}) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""

CORR_SQL = f"""
WITH {TICKS_CTE.strip()},
agg AS (
  SELECT ticker, count(*) AS n_ticks,
         CAST(SUM(CAST(price AS DECIMAL(18,4))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(price AS DECIMAL(18,4)) * CAST(price AS DECIMAL(18,4))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(volume AS DECIMAL(18,4)) * CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(price AS DECIMAL(18,4)) * CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS sxy
  FROM ticks GROUP BY ticker
)
SELECT ticker, n_ticks,
       round((sxy - sx * sy / n_ticks)
             / sqrt((sxx - sx * sx / n_ticks) * (syy - sy * sy / n_ticks)), 6)
         AS corr_price_volume
FROM agg
"""

CLEAN_CORPUS_SQL = f"""
WITH {_WORDS_CTE.strip()},
q AS (
  SELECT d.doc_id,
         round(0.4 * least(CAST(len(w) AS DOUBLE)/100.0, 1.0)
             + 0.3 * least((CASE WHEN len(list_distinct(w)) > 0
                  THEN CAST(len(list_intersect(list_distinct(w), {_SW['en']})) AS DOUBLE)/len(list_distinct(w))
                  ELSE 0.0 END) * 5.0, 1.0)
             + 0.3 * (1.0 - least(
                  (CASE WHEN length(d.text) > 0
                   THEN CAST(len(regexp_extract_all(d.text, '[^\\w\\s]')) AS DOUBLE)/length(d.text)
                   ELSE 0.0 END) * 10.0
                + (CASE WHEN length(d.text) > 0
                   THEN CAST(len(regexp_extract_all(d.text, '[0-9]')) AS DOUBLE)/length(d.text)
                   ELSE 0.0 END) * 5.0, 1.0)), 6) AS quality_score
  FROM documents d JOIN wt ON d.doc_id = wt.doc_id
),
canon AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           doc_id = min(doc_id) OVER (PARTITION BY md5({_NORM})) AS is_canonical
    FROM documents
  ) WHERE is_canonical
),
sp AS (
  SELECT doc_id,
         CASE WHEN {_KR.format(s=_NORM)} % 100 < 80 THEN 'train'
              ELSE 'test' END AS split
  FROM documents
)
SELECT d.doc_id, d.lang, q.quality_score, sp.split
FROM documents d
JOIN q ON d.doc_id = q.doc_id
JOIN canon ON d.doc_id = canon.doc_id
JOIN sp ON d.doc_id = sp.doc_id
WHERE q.quality_score >= 0.5
"""

Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM({_REV}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
"""

Q8_SQL = f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CASE WHEN n2.n_name = 'NATION_3' THEN {_REV}
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
         / CAST(SUM({_REV}) AS DOUBLE) AS mkt_share,
       count(*) AS n_items
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'ECONOMY'
  AND r_name = 'AMERICA'
  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1
"""

MERGE_UPSERT_SQL = """
WITH updates AS (
  SELECT o_orderkey, o_custkey,
         'X' AS o_orderstatus,
         CAST(CAST(o_totalprice AS DECIMAL(18,4))
              * CAST(1.1 AS DECIMAL(18,4)) AS DOUBLE) AS o_totalprice,
         o_orderpriority
  FROM orders WHERE o_orderkey % 97 = 0
  UNION ALL
  SELECT 999999999, 1, 'N', 123.45, '1-URGENT'
)
SELECT coalesce(u.o_orderkey, o.o_orderkey) AS o_orderkey,
       coalesce(u.o_custkey, o.o_custkey) AS o_custkey,
       coalesce(u.o_orderstatus, o.o_orderstatus) AS o_orderstatus,
       coalesce(u.o_totalprice, o.o_totalprice) AS o_totalprice,
       coalesce(u.o_orderpriority, o.o_orderpriority) AS o_orderpriority
FROM orders o FULL OUTER JOIN updates u ON o.o_orderkey = u.o_orderkey
"""

MINUTE_RETURNS_SQL = f"""
WITH {TICKS_CTE.strip()}, {AGG_CTE.strip()}
SELECT ticker,
       window_start + INTERVAL 1 MINUTE AS window_timestamp,
       latest_price,
       lag(latest_price) OVER w AS prev_price,
       CASE WHEN lag(latest_price) OVER w IS NOT NULL
                 AND lag(latest_price) OVER w != 0
            THEN (latest_price - lag(latest_price) OVER w)
                 / lag(latest_price) OVER w
            ELSE NULL END AS minute_return
FROM agg
WINDOW w AS (PARTITION BY ticker ORDER BY window_start)
"""

RUNNING_VOLUME_SQL = f"""
WITH {TICKS_CTE.strip()}, {AGG_CTE.strip()}
SELECT ticker,
       window_start + INTERVAL 1 MINUTE AS window_timestamp,
       total_volume_1m,
       CAST(sum(total_volume_1m) OVER (
            PARTITION BY ticker, CAST(window_start AS DATE)
            ORDER BY window_start
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_volume_day
FROM agg
"""

VOLUME_HISTOGRAM_SQL = f"""
WITH {TICKS_CTE.strip()}, {AGG_CTE.strip()}
SELECT ticker,
       least(total_volume_1m // 20 + 1, 11) AS bucket,
       count(*) AS n_windows
FROM agg
GROUP BY 1, 2
"""


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1995-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

Q21_SQL = """
WITH lines AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 45 DAY AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
),
late AS (SELECT l_orderkey, l_suppkey FROM lines WHERE is_late)
SELECT s_name, count(*) AS numwait
FROM late l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
  AND EXISTS (SELECT 1 FROM lines l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, COALESCE(n, 0) AS c_count
  FROM customer
  LEFT JOIN (
    SELECT o_custkey, count(*) AS n FROM orders
    WHERE o_orderpriority <> '1-URGENT' GROUP BY o_custkey
  ) o ON c_custkey = o_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey, SUM({_REV}) AS r
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE r = (SELECT max(r) FROM rev)
ORDER BY s_suppkey
"""

Q17_SQL = """
WITH avgq AS (
  SELECT l_partkey AS a_partkey, 0.2 * avg(l_quantity) AS threshold
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0
         AS avg_yearly,
       count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN avgq ON l_partkey = a_partkey
WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
  AND l_quantity < threshold
"""

Q22_SQL = """
SELECT c_nationkey, count(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(*)
    FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""

Q2_SQL = """
WITH regional AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
),
offers AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice) AS cost
  FROM lineitem
  WHERE l_suppkey IN (SELECT s_suppkey FROM regional)
  GROUP BY l_partkey, l_suppkey
),
best AS (
  SELECT l_partkey, cost, l_suppkey AS best_suppkey,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY cost, l_suppkey) AS rn
  FROM offers
)
SELECT s_name, n_name, l_partkey AS p_partkey, cost, s_acctbal
FROM best JOIN regional ON best_suppkey = s_suppkey
WHERE rn = 1
ORDER BY s_acctbal DESC, s_name, p_partkey
LIMIT 100
"""


DEDUP_CORPUS_SQL = f"""
WITH RECURSIVE {_WORDS_CTE.strip()}, {_SHINGLES_CTE.strip()}, {_CAND_CTE.strip()},
pairs AS (
  SELECT cand.doc_a, cand.doc_b
  FROM cand
  JOIN sh a ON cand.doc_a = a.doc_id
  JOIN sh b ON cand.doc_b = b.doc_id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / len(list_distinct(list_concat(a.s, b.s))) >= 0.9
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
comp AS (
  SELECT a AS node, least(a, min(b)) AS component FROM reach GROUP BY a
)
SELECT d.doc_id, d.lang
FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM comp
                  WHERE comp.node = d.doc_id AND comp.node <> comp.component)
"""

SAMPLE_CORPUS_SQL = f"""
SELECT doc_id, {_KR.format(s=_NORM)} AS sample_key
FROM documents
ORDER BY sample_key, doc_id
LIMIT 100
"""

BIGRAM_PMI_SQL = f"""
WITH {_WORDS_CTE.strip()},
uc AS (
  SELECT t, count(*) AS c1 FROM (SELECT unnest(w) AS t FROM wt) GROUP BY t
),
n1t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1 FROM uc),
bc AS (
  SELECT b['w1'] AS w1, b['w2'] AS w2, count(*) AS c12
  FROM (
    SELECT unnest(list_transform(range(1, len(w)),
                  i -> struct_pack(w1 := w[i], w2 := w[i + 1]))) AS b
    FROM wt WHERE len(w) >= 2
  )
  GROUP BY 1, 2
),
n2t AS (SELECT CAST(SUM(c12) AS BIGINT) AS n2 FROM bc)
SELECT w1, w2, c12,
       round(ln((CAST(c12 AS DOUBLE) * CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE))
                / (CAST(n2 AS DOUBLE) * CAST(u1.c1 AS DOUBLE)
                   * CAST(u2.c1 AS DOUBLE))), 6) AS pmi
FROM bc
JOIN uc u1 ON bc.w1 = u1.t
JOIN uc u2 ON bc.w2 = u2.t
CROSS JOIN n1t CROSS JOIN n2t
WHERE c12 >= 5
ORDER BY pmi DESC, w1, w2
LIMIT 50
"""

CORPUS_STATS_SQL = f"""
WITH {_WORDS_CTE.strip()},
feats AS (
  SELECT d.doc_id, d.lang,
         CAST(len(w) AS BIGINT) AS n_tok,
         round(0.4 * least(CAST(len(w) AS DOUBLE)/100.0, 1.0)
             + 0.3 * least((CASE WHEN len(list_distinct(w)) > 0
                 THEN CAST(len(list_intersect(list_distinct(w), {_SW['en']})) AS DOUBLE)/len(list_distinct(w))
                 ELSE 0.0 END) * 5.0, 1.0)
             + 0.3 * (1.0 - least(
                 (CASE WHEN length(d.text) > 0
                  THEN CAST(len(regexp_extract_all(d.text, '[^\\w\\s]')) AS DOUBLE)/length(d.text)
                  ELSE 0.0 END) * 10.0
               + (CASE WHEN length(d.text) > 0
                  THEN CAST(len(regexp_extract_all(d.text, '[0-9]')) AS DOUBLE)/length(d.text)
                  ELSE 0.0 END) * 5.0, 1.0)), 6) AS quality_score
  FROM documents d JOIN wt ON d.doc_id = wt.doc_id
)
SELECT lang, count(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       round(CAST(SUM(CAST(quality_score AS DECIMAL(18,6))) AS DOUBLE)
             / count(*), 6) AS mean_quality
FROM feats
GROUP BY lang
ORDER BY lang
"""


KNN_LABEL_SQL = f"""
WITH s AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         round({_DOT}, 6) AS dot_sim
  FROM embeddings a, embeddings b
  WHERE a.vec_id < 50 AND a.vec_id != b.vec_id
), r AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY dot_sim DESC, neighbor_id) AS rank
  FROM s
), votes AS (
  SELECT query_id, d.lang, count(*) AS votes
  FROM r JOIN documents d ON r.neighbor_id = d.doc_id
  WHERE rank <= 5
  GROUP BY query_id, d.lang
), best AS (
  SELECT query_id, lang AS pred_lang, votes,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY votes DESC, lang) AS rn
  FROM votes
)
SELECT query_id, pred_lang, votes FROM best WHERE rn = 1
ORDER BY query_id
"""

STRATIFIED_SPLIT_SQL = f"""
SELECT doc_id, lang,
       {_KR.format(s=_NORM)} % 100 AS bucket,
       CASE WHEN {_KR.format(s=_NORM)} % 100 < 80 THEN 'train'
            ELSE 'test' END AS split
FROM documents
"""


Q9_SQL = f"""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM({_REV} - CAST(p_retailprice AS DECIMAL(18,4))
                         * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
         AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""

Q11_SQL = """
WITH value AS (
  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS v
  FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier
    JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_3')
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, CAST(v AS DOUBLE) AS inv_value
FROM value
WHERE CAST(v AS DOUBLE) >
      (SELECT CAST(SUM(v) AS DOUBLE) FROM value) * 0.001
ORDER BY inv_value DESC, p_partkey
"""

Q12_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
           AND l_shipdate > o_orderdate + INTERVAL 30 DAY
WHERE l_returnflag IN ('A', 'N')
  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

Q16_SQL = """
WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 3, 5, 9)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

Q20_SQL = """
WITH sq AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'blue%'
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey
),
tot AS (SELECT l_partkey AS t_partkey, SUM(qty) AS part_total
        FROM sq GROUP BY l_partkey)
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_2', 'NATION_5', 'NATION_11')
  AND s_suppkey IN (
    SELECT DISTINCT l_suppkey FROM sq
    JOIN tot ON l_partkey = t_partkey
    WHERE qty > part_total * 0.3)
ORDER BY s_suppkey
"""


GOPHER_REPETITION_SQL = f"""
WITH {_WORDS_CTE.strip()},
bg AS (
  SELECT doc_id,
         list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) AS b
  FROM wt WHERE len(w) >= 2
),
feats AS (
  SELECT wt.doc_id, len(w) AS n_words,
         CASE WHEN len(w) > 0
              THEN 1.0 - CAST(len(list_distinct(w)) AS DOUBLE)/len(w)
              ELSE 0.0 END AS dup_f,
         CASE WHEN len(w) > 0
              THEN CAST(list_max(list_transform(list_distinct(w),
                     x -> len(list_filter(w, y -> y = x)))) AS DOUBLE)/len(w)
              ELSE 0.0 END AS topw_f,
         CASE WHEN len(w) >= 2
              THEN CAST(list_max(list_transform(list_distinct(b),
                     x -> len(list_filter(b, y -> y = x)))) AS DOUBLE)/(len(w)-1)
              ELSE 0.0 END AS topb_f
  FROM wt LEFT JOIN bg ON wt.doc_id = bg.doc_id
)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       round(dup_f, 6) AS dup_word_frac,
       round(topw_f, 6) AS top_word_frac,
       round(topb_f, 6) AS top_bigram_frac,
       (n_words >= 20 AND round(dup_f, 6) <= 0.55
        AND round(topw_f, 6) <= 0.15 AND round(topb_f, 6) <= 0.10) AS keep
FROM feats
"""

DECONTAMINATE_SQL = f"""
WITH {_WORDS_CTE.strip()}, {_SHINGLES_CTE.strip()},
ev AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 97 = 0),
tr AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 97 <> 0),
hits AS (
  SELECT tr.doc_id, count(DISTINCT tr.g) AS n
  FROM tr JOIN ev ON tr.g = ev.g
  GROUP BY tr.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(n, 0) AS BIGINT) AS n_shared,
       COALESCE(n, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits ON d.doc_id = hits.doc_id
WHERE d.doc_id % 97 <> 0
ORDER BY d.doc_id
"""


# C89 contamination severity: C30's per-doc n_shared bucketed
CONTAMINATION_REPORT_SQL = f"""
WITH {_WORDS_CTE.strip()}, {_SHINGLES_CTE.strip()},
ev AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 97 = 0),
tr AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 97 <> 0),
hits AS (
  SELECT tr.doc_id, count(DISTINCT tr.g) AS n
  FROM tr JOIN ev ON tr.g = ev.g
  GROUP BY tr.doc_id
),
per_doc AS (
  SELECT COALESCE(n, 0) AS n_shared
  FROM documents d LEFT JOIN hits ON d.doc_id = hits.doc_id
  WHERE d.doc_id % 97 <> 0
),
tot AS (SELECT count(*) AS t FROM per_doc)
SELECT CASE WHEN n_shared = 0 THEN '0'
            WHEN n_shared <= 2 THEN '1-2'
            WHEN n_shared <= 9 THEN '3-9'
            ELSE '10+' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(CAST(count(*) AS DOUBLE) / (SELECT t FROM tot), 6) AS frac
FROM per_doc
GROUP BY 1
ORDER BY 1
"""

# C86 per-source data card: size/word/dup aggregates by source +
# C30's contamination flags rolled up to the source
CORPUS_REPORT_BY_SOURCE_SQL = f"""
WITH {_WORDS_CTE.strip()}, {_SHINGLES_CTE.strip()},
ev AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 97 = 0),
tr AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 97 <> 0),
hits AS (
  SELECT tr.doc_id, count(DISTINCT tr.g) AS n
  FROM tr JOIN ev ON tr.g = ev.g
  GROUP BY tr.doc_id
),
cont AS (
  SELECT d.source, count(*) AS contaminated_docs
  FROM documents d JOIN hits ON d.doc_id = hits.doc_id
  WHERE d.doc_id % 97 <> 0 AND hits.n > 0
  GROUP BY d.source
),
base AS (
  SELECT d.source,
         count(*) AS n_docs,
         CAST(sum(len(w)) AS BIGINT) AS n_words_total,
         CAST(count(*) - count(DISTINCT md5(coalesce({_NORM}, '')))
              AS BIGINT) AS exact_dup_removable
  FROM documents d JOIN wt ON d.doc_id = wt.doc_id
  GROUP BY d.source
)
SELECT base.source, n_docs, n_words_total, exact_dup_removable,
       CAST(COALESCE(cont.contaminated_docs, 0) AS BIGINT)
         AS contaminated_docs
FROM base LEFT JOIN cont ON base.source = cont.source
ORDER BY base.source
"""


PROPS_VARIANT_SQL = """
SELECT event_type,
       count(*) AS n_events,
       CAST(SUM(CAST(props->>'$.k' AS INT)) AS BIGINT) AS k_sum,
       MIN(CAST(props->>'$.k' AS INT)) AS k_min,
       MAX(CAST(props->>'$.k' AS INT)) AS k_max
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# C31 count-min heavy hitters: the d=4 x w=1024 grid is replayed
# cell-for-cell — same KR token hash, same bigint row hashes
# ((h*a+b) % P % w), same min-over-rows estimate, same top-k order.
HEAVY_HITTERS_SQL = f"""
WITH {_WORDS_CTE.strip()},
toks AS (SELECT unnest(w) AS token FROM wt),
th AS (SELECT token, {_KR.format(s='token')} AS h FROM toks),
params(r, a, b) AS (
  VALUES (0, 1103515245, 12345), (1, 69069, 362437),
         (2, 1664525, 1013904223), (3, 214013, 2531011)
),
cells AS (
  SELECT p.r AS r, ((th.h * p.a + p.b) % 2147483647) % 1024 AS bucket,
         count(*) AS cnt
  FROM th CROSS JOIN params p
  GROUP BY 1, 2
),
vocab AS (SELECT token, min(h) AS h FROM th GROUP BY token),
est AS (
  SELECT v.token, min(c.cnt) AS est_count
  FROM vocab v
  CROSS JOIN params p
  JOIN cells c
    ON c.r = p.r AND c.bucket = ((v.h * p.a + p.b) % 2147483647) % 1024
  GROUP BY v.token
)
SELECT token, CAST(est_count AS BIGINT) AS est_count
FROM est ORDER BY est_count DESC, token LIMIT 50
"""

TEMPERATURE_SAMPLE_SQL = f"""
WITH h AS (
  SELECT doc_id, lang, {_KR.format(s=_NORM)} AS hh FROM documents
),
c AS (SELECT lang, count(*) AS n_g FROM documents GROUP BY lang),
m AS (SELECT min(n_g) AS n_min FROM c),
t AS (
  SELECT lang,
         CAST(floor(sqrt(CAST(n_g * n_min AS DOUBLE))) AS BIGINT) AS t_g
  FROM c CROSS JOIN m
),
r AS (
  SELECT doc_id, lang, hh,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hh, doc_id) AS rn
  FROM h
)
SELECT r.doc_id, r.lang, CAST(r.rn AS BIGINT) AS sample_rank
FROM r JOIN t ON r.lang = t.lang
WHERE r.rn <= t.t_g
"""

# the same greedy first-fit fold as pack_sequences, replayed as a
# recursive CTE in deterministic (h, doc_id) order per bucket
PACK_SEQUENCES_SQL = f"""
WITH RECURSIVE base AS (
  SELECT doc_id,
         {_KR.format(s=_NORM)} AS h,
         CAST(len(string_split({_NORM}, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
b AS (
  SELECT doc_id, h, n_tokens, CAST(h % 8 AS INTEGER) AS bucket,
         ROW_NUMBER() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS rn
  FROM base
),
packed AS (
  SELECT bucket, doc_id, n_tokens, rn,
         CAST(0 AS BIGINT) AS pack_id, CAST(0 AS BIGINT) AS slot,
         n_tokens AS acc
  FROM b WHERE rn = 1
  UNION ALL
  SELECT o.bucket, o.doc_id, o.n_tokens, o.rn,
         CASE WHEN p.acc + o.n_tokens > 128
              THEN p.pack_id + 1 ELSE p.pack_id END,
         CASE WHEN p.acc + o.n_tokens > 128
              THEN CAST(0 AS BIGINT) ELSE p.slot + 1 END,
         CASE WHEN p.acc + o.n_tokens > 128
              THEN o.n_tokens ELSE p.acc + o.n_tokens END
  FROM b o JOIN packed p ON o.bucket = p.bucket AND o.rn = p.rn + 1
)
SELECT doc_id, bucket, pack_id, slot, n_tokens FROM packed
"""

ASSIGN_IDS_SQL = f"""
WITH h AS (
  SELECT doc_id, {_KR.format(s=_NORM)} AS hh FROM documents
)
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (ORDER BY hh, doc_id) AS BIGINT) AS global_id,
       CAST((ROW_NUMBER() OVER (ORDER BY hh, doc_id) - 1) % 16 AS INTEGER)
         AS shard
FROM h
"""

DOMAIN_CAP_SQL = f"""
WITH h AS (
  SELECT doc_id, source, {_KR.format(s=_NORM)} AS hh FROM documents
),
t AS (SELECT source, count(*) AS src_total FROM documents GROUP BY source),
r AS (
  SELECT doc_id, source, hh,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY hh, doc_id) AS rn
  FROM h
)
SELECT r.doc_id, r.source, CAST(r.rn AS BIGINT) AS src_rank,
       CAST(t.src_total AS BIGINT) AS src_total,
       t.src_total > 20 AS clipped
FROM r JOIN t ON r.source = t.source
WHERE r.rn <= 20
"""

# ---------------------------------------------------------------------------
# r3 B-block widening (plans/analytics3.py)
# ---------------------------------------------------------------------------

ROLLING_7D_SQL = """
WITH daily AS (
  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS day_rev,
         count(*) AS n_orders
  FROM orders GROUP BY 1, 2
)
SELECT o_orderpriority, day,
       CAST(SUM(day_rev) OVER w AS DOUBLE) AS rev_7d,
       CAST(SUM(n_orders) OVER w AS BIGINT) AS n_orders_7d
FROM daily
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY day - DATE '1970-01-01'
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""

VALUE_DECILES_SQL = """
WITH d AS (
  SELECT event_type, value,
         ntile(10) OVER (PARTITION BY event_type
                         ORDER BY value, event_id) AS decile
  FROM events
)
SELECT event_type, CAST(decile AS INT) AS decile,
       count(*) AS n_events,
       min(value) AS lo, max(value) AS hi,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM d GROUP BY event_type, decile
"""

RETENTION_SET_OPS_SQL = """
WITH wk1 AS (
  SELECT DISTINCT user_id FROM events
  WHERE ts < TIMESTAMP '2024-01-08 00:00:00'
), wkn AS (
  SELECT DISTINCT user_id FROM events
  WHERE ts >= TIMESTAMP '2024-01-24 00:00:00'
)
SELECT 'retained' AS segment, count(*) AS n_users
FROM (SELECT user_id FROM wk1 INTERSECT SELECT user_id FROM wkn)
UNION ALL
SELECT 'churned', count(*)
FROM (SELECT user_id FROM wk1 EXCEPT SELECT user_id FROM wkn)
UNION ALL
SELECT 'new', count(*)
FROM (SELECT user_id FROM wkn EXCEPT SELECT user_id FROM wk1)
"""

GROUPING_SETS_SQL = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
       o_orderstatus,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue,
       count(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((order_year, o_orderstatus), (order_year), ())
"""

SCD2_SQL = """
WITH upd AS (
  SELECT o_custkey,
         CASE WHEN count(*) >= 3 THEN 'UPGRADED-GOLD'
              ELSE 'UPGRADED-STD' END AS new_segment
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
  GROUP BY o_custkey
)
SELECT c.c_custkey, c.c_name, c.c_mktsegment AS segment,
       DATE '1990-01-01' AS valid_from,
       CASE WHEN u.o_custkey IS NULL THEN NULL
            ELSE DATE '2000-01-01' END AS valid_to,
       u.o_custkey IS NULL AS is_current
FROM customer c LEFT JOIN upd u ON c.c_custkey = u.o_custkey
UNION ALL
SELECT c.c_custkey, c.c_name, u.new_segment AS segment,
       DATE '2000-01-01' AS valid_from,
       NULL AS valid_to, true AS is_current
FROM customer c JOIN upd u ON c.c_custkey = u.o_custkey
"""

DEDUP_INCREMENTAL_SQL = f"""
WITH {_WORDS_CTE.strip()}, {_SHINGLES_CTE.strip()},
bh AS (
  SELECT doc_id, lang, md5({_NORM}) AS h FROM documents
  WHERE doc_id % 10 >= 8
),
ch AS (
  SELECT DISTINCT md5({_NORM}) AS h FROM documents WHERE doc_id % 10 < 8
),
surv AS (
  SELECT doc_id, lang FROM bh WHERE h NOT IN (SELECT h FROM ch)
),
shb AS (SELECT sh.* FROM sh JOIN surv USING (doc_id)),
shc AS (SELECT sh.* FROM sh WHERE doc_id % 10 < 8),
inv_b AS (SELECT doc_id, unnest(s) AS g FROM shb),
inv_c AS (SELECT doc_id, unnest(s) AS g FROM shc),
cand AS (
  SELECT DISTINCT b.doc_id AS bid, c.doc_id AS cid
  FROM inv_b b JOIN inv_c c ON b.g = c.g
),
nd AS (
  SELECT DISTINCT cand.bid
  FROM cand
  JOIN shb a ON cand.bid = a.doc_id
  JOIN shc b2 ON cand.cid = b2.doc_id
  WHERE CAST(len(list_intersect(a.s, b2.s)) AS DOUBLE)
          / len(list_distinct(list_concat(a.s, b2.s))) >= 0.9
)
SELECT doc_id, lang FROM surv WHERE doc_id NOT IN (SELECT bid FROM nd)
"""

# C85 bloom ingest admission: the bloom is one-sided pruning state,
# so the oracle is the PLAIN exact anti-join — certifying the bloom
# path admits exactly the unseen-hash docs (same argument as C66).
# NULL semantics mirror Spark's left_anti: a NULL hash (NULL text)
# never matches, so NULL-hash batch docs are admitted, and a NULL
# corpus hash must not poison the NOT IN (hence the IS NOT NULL).
DEDUP_INGEST_BLOOM_SQL = f"""
WITH bh AS (
  SELECT doc_id, lang, md5({_NORM}) AS h FROM documents
  WHERE doc_id % 10 >= 8
),
ch AS (
  SELECT DISTINCT md5({_NORM}) AS h FROM documents
  WHERE doc_id % 10 < 8 AND md5({_NORM}) IS NOT NULL
)
SELECT doc_id, lang FROM bh
WHERE h IS NULL OR h NOT IN (SELECT h FROM ch)
ORDER BY doc_id
"""

LINE_DEDUP_SQL = f"""
WITH wt AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
),
seg AS (
  SELECT doc_id,
         list_transform(range(0, len(w) // 5),
                        i -> array_to_string(w[i*5+1:i*5+5], ' ')) AS segs
  FROM wt
),
s1 AS (
  SELECT doc_id, unnest(segs) AS s, generate_subscripts(segs, 1) AS pos
  FROM seg
),
dfq AS (SELECT s, count(DISTINCT doc_id) AS df FROM s1 GROUP BY s),
k AS (
  SELECT s1.doc_id,
         count(*) AS n_segs,
         sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS n_dropped,
         coalesce(string_agg(CASE WHEN df < 2 THEN s END, ' ' ORDER BY pos),
                  '') AS cleaned_text
  FROM s1 JOIN dfq USING (s)
  GROUP BY s1.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(k.n_segs, 0) AS BIGINT) AS n_segs,
       CAST(coalesce(k.n_dropped, 0) AS BIGINT) AS n_dropped,
       coalesce(k.cleaned_text, '') AS cleaned_text
FROM documents d LEFT JOIN k USING (doc_id)
"""

SPAN_DEDUP_SQL = f"""
WITH {_WORDS_CTE.strip()},
spans AS (
  SELECT doc_id, len(w) AS n_words,
         list_transform(range(0, greatest(len(w) - 9, 0)),
                        i -> array_to_string(w[i+1:i+10], ' ')) AS sps
  FROM wt
),
s1 AS (
  SELECT doc_id, unnest(sps) AS sp, generate_subscripts(sps, 1) - 1 AS pos
  FROM spans
),
occ AS (SELECT sp, count(*) AS occ FROM s1 GROUP BY sp),
dup AS (
  SELECT s1.doc_id, s1.pos FROM s1 JOIN occ USING (sp) WHERE occ.occ >= 2
),
nsp AS (SELECT doc_id, count(*) AS n_spans FROM s1 GROUP BY doc_id),
nds AS (SELECT doc_id, count(*) AS n_dup_spans FROM dup GROUP BY doc_id),
cov AS (
  SELECT doc_id, count(DISTINCT p) AS covered
  FROM (SELECT doc_id, unnest(range(pos, pos + 10)) AS p FROM dup)
  GROUP BY doc_id
)
SELECT spans.doc_id,
       CAST(spans.n_words AS BIGINT) AS n_words,
       CAST(coalesce(nsp.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(nds.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
       CAST(coalesce(cov.covered, 0) AS BIGINT) AS covered_positions,
       coalesce(cov.covered, 0) / spans.n_words AS dup_fraction
FROM spans
LEFT JOIN nsp USING (doc_id)
LEFT JOIN nds USING (doc_id)
LEFT JOIN cov USING (doc_id)
"""

SPAN_DEDUP_APPLY_SQL = f"""
WITH {_WORDS_CTE.strip()},
spans AS (
  SELECT doc_id, len(w) AS n_words,
         list_transform(range(0, greatest(len(w) - 9, 0)),
                        i -> array_to_string(w[i+1:i+10], ' ')) AS sps
  FROM wt
),
s1 AS (
  SELECT doc_id, unnest(sps) AS sp, generate_subscripts(sps, 1) - 1 AS pos
  FROM spans
),
occ AS (SELECT sp, count(*) AS occ FROM s1 GROUP BY sp),
dup AS (
  SELECT s1.doc_id, s1.pos FROM s1 JOIN occ USING (sp) WHERE occ.occ >= 2
),
cov AS (
  SELECT DISTINCT doc_id, p
  FROM (SELECT doc_id, unnest(range(pos, pos + 10)) AS p FROM dup)
),
ints AS (
  SELECT doc_id, count(*) AS n_removed,
         sum(CASE WHEN prev IS NULL OR p != prev + 1 THEN 1 ELSE 0 END)
           AS n_ints
  FROM (SELECT doc_id, p,
               lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev
        FROM cov)
  GROUP BY doc_id
),
toks AS (
  SELECT doc_id, unnest(w) AS word, generate_subscripts(w, 1) - 1 AS pos
  FROM wt
),
kept AS (
  SELECT t.doc_id,
         coalesce(string_agg(CASE WHEN c.p IS NULL THEN t.word END,
                             ' ' ORDER BY t.pos), '') AS cleaned_text
  FROM toks t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.p
  GROUP BY t.doc_id
)
SELECT spans.doc_id,
       CAST(spans.n_words AS BIGINT) AS n_words,
       CAST(coalesce(ints.n_removed, 0) AS BIGINT) AS n_removed_words,
       CAST(coalesce(ints.n_ints, 0) AS BIGINT) AS n_spans_removed,
       coalesce(kept.cleaned_text, '') AS cleaned_text
FROM spans
LEFT JOIN ints USING (doc_id)
LEFT JOIN kept USING (doc_id)
"""

EMBED_DOCS_SQL = f"""
WITH {_WORDS_CTE.strip()},
tok AS (SELECT doc_id, len(w) AS n_tokens, unnest(w) AS tok FROM wt),
hashed AS (
  SELECT doc_id, n_tokens, {_KR.format(s='tok')} AS h FROM tok
),
contrib AS (
  SELECT doc_id, n_tokens, CAST(h % 64 AS INT) AS idx,
         CASE WHEN (h // 64) % 2 = 0 THEN 1 ELSE -1 END AS sgn
  FROM hashed
),
acc AS (
  SELECT doc_id, n_tokens, idx, CAST(sum(sgn) AS DOUBLE) AS v
  FROM contrib GROUP BY doc_id, n_tokens, idx
),
edims AS (SELECT unnest(range(0, 64)) AS i),
dense AS (
  SELECT w.doc_id, w.n_tokens, d.i, coalesce(a.v, 0.0) AS v
  FROM (SELECT DISTINCT doc_id, n_tokens FROM acc) w
  CROSS JOIN edims d
  LEFT JOIN acc a ON a.doc_id = w.doc_id AND a.idx = d.i
),
nrm AS (SELECT doc_id, sqrt(sum(v * v)) AS nv FROM dense GROUP BY doc_id)
-- flat (doc_id, dim_idx, value) rows, matching the Spark entry's
-- posexplode: the gate's pandas canonicalizer cannot hash list
-- cells, so the vector representation stays internal (VERDICT r5 #1)
SELECT dense.doc_id,
       CAST(dense.n_tokens AS BIGINT) AS n_tokens,
       CAST(dense.i AS INT) AS dim_idx,
       round(CASE WHEN nv > 0 THEN v / nv ELSE 0.0 END, 6) AS value
FROM dense JOIN nrm USING (doc_id)
"""

SPAN_DEDUP_KEEP_FIRST_SQL = f"""
WITH {_WORDS_CTE.strip()},
spans AS (
  SELECT doc_id, len(w) AS n_words,
         list_transform(range(0, greatest(len(w) - 9, 0)),
                        i -> array_to_string(w[i+1:i+10], ' ')) AS sps
  FROM wt
),
s1 AS (
  SELECT doc_id, unnest(sps) AS sp, generate_subscripts(sps, 1) - 1 AS pos
  FROM spans
),
ranked AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY sp ORDER BY doc_id, pos) AS rn,
         count(*) OVER (PARTITION BY sp) AS occ
  FROM s1
),
dup AS (SELECT doc_id, pos FROM ranked WHERE occ >= 2 AND rn > 1),
cov AS (
  SELECT DISTINCT doc_id, p
  FROM (SELECT doc_id, unnest(range(pos, pos + 10)) AS p FROM dup)
),
ints AS (
  SELECT doc_id, count(*) AS n_removed,
         sum(CASE WHEN prev IS NULL OR p != prev + 1 THEN 1 ELSE 0 END)
           AS n_ints
  FROM (SELECT doc_id, p,
               lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev
        FROM cov)
  GROUP BY doc_id
),
toks AS (
  SELECT doc_id, unnest(w) AS word, generate_subscripts(w, 1) - 1 AS pos
  FROM wt
),
kept AS (
  SELECT t.doc_id,
         coalesce(string_agg(CASE WHEN c.p IS NULL THEN t.word END,
                             ' ' ORDER BY t.pos), '') AS cleaned_text
  FROM toks t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.p
  GROUP BY t.doc_id
)
SELECT spans.doc_id,
       CAST(spans.n_words AS BIGINT) AS n_words,
       CAST(coalesce(ints.n_removed, 0) AS BIGINT) AS n_removed_words,
       CAST(coalesce(ints.n_ints, 0) AS BIGINT) AS n_spans_removed,
       coalesce(kept.cleaned_text, '') AS cleaned_text
FROM spans
LEFT JOIN ints USING (doc_id)
LEFT JOIN kept USING (doc_id)
"""

NGRAM_NOVELTY_SQL = f"""
WITH {_WORDS_CTE.strip()},
spans AS (
  SELECT doc_id,
         list_transform(range(0, greatest(len(w) - 2, 0)),
                        i -> array_to_string(w[i+1:i+3], ' ')) AS sps
  FROM wt
),
sd AS (
  SELECT DISTINCT doc_id, g
  FROM (SELECT doc_id, unnest(sps) AS g FROM spans)
),
firsts AS (SELECT g, min(doc_id) AS first_doc FROM sd GROUP BY g),
per AS (
  SELECT sd.doc_id,
         count(*) AS n_ngrams,
         sum(CASE WHEN f.first_doc = sd.doc_id THEN 1 ELSE 0 END)
           AS n_novel
  FROM sd JOIN firsts f USING (g)
  GROUP BY sd.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(per.n_ngrams, 0) AS BIGINT) AS n_ngrams,
       CAST(coalesce(per.n_novel, 0) AS BIGINT) AS n_novel,
       round(coalesce(CAST(per.n_novel AS DOUBLE) / per.n_ngrams, 0.0), 6)
         AS novelty_ratio
FROM documents d LEFT JOIN per USING (doc_id)
"""

TOKENIZE_IDS_SQL = f"""
WITH {_WORDS_CTE.strip()},
counts AS (SELECT unnest(w) AS token FROM wt),
freqs AS (SELECT token, count(*) AS freq FROM counts GROUP BY token),
vocab AS (
  SELECT token,
         CAST(row_number() OVER (ORDER BY freq DESC, token) AS INT)
           AS token_id
  FROM freqs ORDER BY freq DESC, token LIMIT 100
),
toks AS (
  SELECT doc_id, unnest(w) AS token,
         generate_subscripts(w, 1) - 1 AS pos
  FROM wt
)
SELECT toks.doc_id, CAST(toks.pos AS INT) AS pos,
       coalesce(vocab.token_id, 0) AS token_id
FROM toks LEFT JOIN vocab USING (token)
"""

MIXTURE_SCHEDULE_SQL = f"""
WITH h AS (
  SELECT doc_id, source, {_KR.format(s=_NORM)} AS hh FROM documents
),
w AS (
  SELECT source, sqrt(CAST(SUM(n_chars) AS DOUBLE)) AS w
  FROM documents GROUP BY source
),
r AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY hh, doc_id)
           AS src_rank
  FROM h
)
SELECT r.doc_id, r.source, CAST(r.src_rank AS BIGINT) AS src_rank,
       (CAST(r.src_rank AS DOUBLE) - 0.5) / w.w AS position
FROM r JOIN w USING (source)
"""

DAILY_OHLC_SQL = f"""
WITH {TICKS_CTE.strip()}
SELECT ticker, CAST(ts AS DATE) AS day,
       first(price ORDER BY ts, price) AS open,
       max(price) AS high,
       min(price) AS low,
       last(price ORDER BY ts, price) AS close,
       CAST(SUM(volume) AS BIGINT) AS day_volume,
       count(*) AS n_ticks
FROM ticks2
GROUP BY ticker, CAST(ts AS DATE)
"""

DAILY_VWAP_SQL = f"""
WITH {TICKS_CTE.strip()}
SELECT ticker, CAST(ts AS DATE) AS day,
       CAST(SUM(CAST(price AS DECIMAL(18,4)) * volume) AS DOUBLE)
         / CAST(SUM(volume) AS DOUBLE) AS vwap,
       CAST(SUM(volume) AS BIGINT) AS day_volume
FROM ticks2
GROUP BY ticker, CAST(ts AS DATE)
"""

VALUE_RANK_DIST_SQL = """
SELECT DISTINCT event_type, value,
       CAST(count(*) OVER (PARTITION BY event_type, value) AS BIGINT)
         AS n_rows,
       percent_rank() OVER (PARTITION BY event_type ORDER BY value)
         AS pct_rank,
       cume_dist() OVER (PARTITION BY event_type ORDER BY value)
         AS cum_dist
FROM events
"""

BIGRAM_LM_SCORE_SQL = f"""
WITH {_WORDS_CTE.strip()},
bg AS (
  SELECT doc_id, unnest(list_transform(range(1, len(w)),
                                       i -> {{'w1': w[i], 'w2': w[i+1]}})) AS b
  FROM wt WHERE len(w) >= 2
),
bgf AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg),
ug AS (SELECT unnest(w) AS w1 FROM wt),
c_bg AS (SELECT w1, w2, count(*) AS c12 FROM bgf GROUP BY w1, w2),
c_ug AS (SELECT w1, count(*) AS c1 FROM ug GROUP BY w1),
v AS (SELECT count(DISTINCT w1) AS v FROM ug),
scored AS (
  SELECT bgf.doc_id,
         count(*) AS n_bigrams,
         round(SUM(ln(CAST(c12 + 1 AS DOUBLE) / (c1 + v.v))) / count(*),
               6) AS avg_logp
  FROM bgf
  JOIN c_bg USING (w1, w2)
  JOIN c_ug USING (w1)
  CROSS JOIN v
  GROUP BY bgf.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       coalesce(s.avg_logp, 0.0) AS avg_logp
FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
"""


_TICKER_PIVOT_COLS = ",\n       ".join(
    f"max(CASE WHEN ticker = '{t}' THEN latest_price END) AS {t}"
    for t in ("click", "error", "purchase", "signup", "view"))

DASH_OVERVIEW_WIDE_SQL = f"""
{_PIPELINE_PREFIX},
ov AS (
  SELECT window_start + INTERVAL 1 MINUTE AS window_timestamp,
         ticker, latest_price
  FROM windowed
  ORDER BY window_timestamp DESC, ticker
  LIMIT 500
)
SELECT window_timestamp,
       {_TICKER_PIVOT_COLS}
FROM ov
GROUP BY window_timestamp
"""

DASH_PRICE_SMA_LONG_SQL = f"""
{_PIPELINE_PREFIX},
det AS (
  SELECT window_start + INTERVAL 1 MINUTE AS window_timestamp,
         latest_price, sma_5m
  FROM windowed
  WHERE ticker = 'click'
)
SELECT window_timestamp, 'price' AS series, latest_price AS value FROM det
UNION ALL
SELECT window_timestamp, 'sma_5m' AS series, sma_5m AS value FROM det
"""

# C45: one k-means E-step against the deterministic seed centroids
# (the 8 lowest-vec_id vectors; cluster_id = rank in vec_id order).
# d2 is rounded to 6 dp BEFORE the argmin and ties break to the
# lowest cluster_id — the same contract the Spark mapInPandas body
# implements, so the assignment is deterministic on both engines.
_D2 = ("round(list_sum(list_transform(range(1, len(e.embedding) + 1), "
       "i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.ce[i] AS DOUBLE)) "
       "* (CAST(e.embedding[i] AS DOUBLE) - CAST(c.ce[i] AS DOUBLE)))), 6)")

_KMEANS_ASSIGN_CTE = f"""
c AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster_id,
         embedding AS ce
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)
),
d AS (
  SELECT e.vec_id, c.cluster_id, {_D2} AS d2
  FROM embeddings e CROSS JOIN c
),
r AS (
  SELECT vec_id, cluster_id, d2,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY d2, cluster_id) AS rn
  FROM d
)"""

KMEANS_ASSIGN_SQL = f"""
WITH {_KMEANS_ASSIGN_CTE}
SELECT vec_id, cluster_id, d2 FROM r WHERE rn = 1
"""

# C46 (trained variant): the FULL distributed Lloyd's fit is
# SQL-replayable because kmeans_fit rounds every M-step centroid to a
# 1e-3 decimal grid — ~9 orders of magnitude coarser than the
# ~1e-12 partial-sum reorder drift between engines — so each round's
# centroids are bit-identical on both sides. The oracle unrolls the
# n_iter E/M rounds as CTE pairs: E-step argmin on UNROUNDED d2 with
# ties to the lowest cluster_id (numpy argmin contract), M-step
# round(avg, 3) per (cluster, dim), empty clusters keeping the
# previous centroid; the final assignment then applies the C45
# round-6 d2 contract against the trained centroids.
_D2T = ("list_sum(list_transform(range(1, len(e.embedding) + 1), "
        "i -> (CAST(e.embedding[i] AS DOUBLE) - c.ce[i]) "
        "* (CAST(e.embedding[i] AS DOUBLE) - c.ce[i])))")


def _kmeans_fit_ctes(k: int | str = 8, n_iter: int = 5,
                     dp: int = 3, src: str = "embeddings") -> str:
    """Unrolled Lloyd's-fit CTE chain over ``src`` (a table or CTE
    name). ``k`` may be an integer or a SQL expression string (e.g.
    the sqrt(n) SemDedup sizing) — the seed selection uses QUALIFY
    so a scalar subquery works as the bound."""
    parts = [f"""c0 AS MATERIALIZED (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
  FROM {src}
  QUALIFY row_number() OVER (ORDER BY vec_id) <= ({k})
),
dims AS (
  SELECT unnest(range(1, (SELECT max(len(embedding)) FROM {src}) + 1))
    AS i
)"""]
    for r in range(n_iter):
        parts.append(f"""a{r} AS MATERIALIZED (
  SELECT vec_id, cluster_id FROM (
    SELECT e.vec_id, c.cluster_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_D2T}, c.cluster_id) AS rn
    FROM {src} e CROSS JOIN c{r} c)
  WHERE rn = 1
),
m{r} AS MATERIALIZED (
  SELECT a.cluster_id, dims.i AS di,
         round(avg(CAST(e.embedding[dims.i] AS DOUBLE)), {dp}) AS v
  FROM a{r} a JOIN {src} e USING (vec_id) CROSS JOIN dims
  GROUP BY a.cluster_id, dims.i
),
c{r + 1} AS MATERIALIZED (
  SELECT cluster_id, list(v ORDER BY di) AS ce FROM m{r} GROUP BY cluster_id
  UNION ALL
  SELECT cluster_id, ce FROM c{r}
  WHERE cluster_id NOT IN (SELECT cluster_id FROM m{r})
)""")
    return ",\n".join(parts)


# C55: the WHOLE SemDedup pipeline is SQL-replayable — dynamic
# k = max(2, round(sqrt(n))) seeds, 5 unrolled fit rounds, the
# trained within-cluster exact pairs, a recursive-CTE component
# closure, and the keep-canonical anti-join. (Python's banker's
# round vs SQL's half-away rounding of sqrt(n) cannot disagree:
# sqrt(integer) is never exactly x.5 — n = x^2 + x + 1/4 has no
# integer solution.)
_DYN_K = ("greatest(2, CAST(round(sqrt((SELECT count(*) "
          "FROM embeddings))) AS INT))")

SEMDEDUP_TRAINED_SQL = f"""
WITH RECURSIVE {_kmeans_fit_ctes(_DYN_K, 5, 3)},
dft AS (
  SELECT e.vec_id, c.cluster_id, round({_D2T}, 6) AS d2
  FROM embeddings e CROSS JOIN c5 c
),
asg AS MATERIALIZED (
  SELECT vec_id, cluster_id FROM (
    SELECT vec_id, cluster_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2, cluster_id) AS rn
    FROM dft) WHERE rn = 1
),
p AS MATERIALIZED (
  SELECT sa.vec_id AS va, sb.vec_id AS vb
  FROM asg sa
  JOIN asg sb ON sa.cluster_id = sb.cluster_id AND sa.vec_id < sb.vec_id
  JOIN embeddings a ON a.vec_id = sa.vec_id
  JOIN embeddings b ON b.vec_id = sb.vec_id
  WHERE round({_DOT}, 6) >= 0.4
),
edges AS (
  SELECT va AS a, vb AS b FROM p UNION SELECT vb, va FROM p
),
reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
comp AS (
  SELECT a AS node, least(a, min(b)) AS component
  FROM reach GROUP BY a
)
SELECT vec_id, cluster_id FROM asg
WHERE vec_id NOT IN (SELECT node FROM comp WHERE node != component)
"""

# C59: distributed logistic regression — same decimal-grid replay
# trick as the k-means fit: weights round to 1e-6 after every GD
# step (partial-gradient reorder/FMA drift is ~1e-13), so DuckDB
# replays the full descent as unrolled CTE rounds. Feature
# expressions are the C9 (text_quality) pair, already proven
# cross-engine. z is evaluated with the same left-assoc order on
# both sides (bias first, then f[i]*w[i] terms).


def _logistic_fit_ctes(n_iter: int = 5, lr: float = 0.5,
                       dp: int = 6) -> str:
    z = ("(wv_arr[5] + f[1]*wv_arr[1] + f[2]*wv_arr[2] "
         "+ f[3]*wv_arr[3] + f[4]*wv_arr[4])")
    parts = [f"""lfeats AS MATERIALIZED (
  SELECT d.doc_id,
         [least(CAST(len(w) AS DOUBLE) / 100.0, 1.0),
          CASE WHEN length(d.text) > 0
               THEN CAST(len(regexp_extract_all(d.text, '[^\\w\\s]'))
                         AS DOUBLE) / length(d.text) ELSE 0.0 END,
          CASE WHEN length(d.text) > 0
               THEN CAST(len(regexp_extract_all(d.text, '[0-9]'))
                         AS DOUBLE) / length(d.text) ELSE 0.0 END,
          CASE WHEN len(list_distinct(w)) > 0
               THEN CAST(len(list_intersect(list_distinct(w), {_SW['en']}))
                         AS DOUBLE) / len(list_distinct(w))
               ELSE 0.0 END] AS f,
         CASE WHEN d.lang = 'en' THEN 1.0 ELSE 0.0 END AS label
  FROM documents d JOIN wt ON d.doc_id = wt.doc_id
),
lw0 AS (SELECT unnest(range(1, 6)) AS di, 0.0 AS wv)"""]
    for r in range(n_iter):
        parts.append(f"""ls{r} AS MATERIALIZED (
  SELECT doc_id, label, f,
         1.0 / (1.0 + exp(-{z})) AS s
  FROM lfeats
  CROSS JOIN (SELECT list(wv ORDER BY di) AS wv_arr FROM lw{r})
),
lg{r} AS (
  SELECT di.di,
         sum((z.s - z.label)
             * CASE WHEN di.di <= 4 THEN z.f[di.di] ELSE 1.0 END) AS val,
         count(*) AS n
  FROM ls{r} z CROSS JOIN (SELECT unnest(range(1, 6)) AS di) di
  GROUP BY di.di
),
lw{r + 1} AS MATERIALIZED (
  SELECT w.di, round(w.wv - {lr} * g.val / g.n, {dp}) AS wv
  FROM lw{r} w JOIN lg{r} g ON w.di = g.di
)""")
    return ",\n".join(parts)


QUALITY_CLASSIFIER_SQL = f"""
WITH {_WORDS_CTE.strip()},
{_logistic_fit_ctes(5, 0.5, 6)}
SELECT f.doc_id,
       round(1.0 / (1.0 + exp(-(wv_arr[5] + f.f[1]*wv_arr[1]
             + f.f[2]*wv_arr[2] + f.f[3]*wv_arr[3]
             + f.f[4]*wv_arr[4]))), 6) AS score,
       round(1.0 / (1.0 + exp(-(wv_arr[5] + f.f[1]*wv_arr[1]
             + f.f[2]*wv_arr[2] + f.f[3]*wv_arr[3]
             + f.f[4]*wv_arr[4]))), 6) >= 0.5 AS predicted
FROM lfeats f
CROSS JOIN (SELECT list(wv ORDER BY di) AS wv_arr FROM lw5)
"""


# C60: incremental SEMANTIC dedup — the C38 daily-ingest shape on
# the embedding modality: centroids fit on the EXISTING corpus only,
# the new batch assigns against them, candidate pairs are
# batch x corpus within the same cluster, survivors are batch
# vectors with no corpus near-dup. Fully SQL-replayable via the
# src-parametrized fit CTEs.
_DYN_KC = ("greatest(2, CAST(round(sqrt((SELECT count(*) "
           "FROM corpus))) AS INT))")

SEMDEDUP_INCREMENTAL_SQL = f"""
WITH corpus AS MATERIALIZED (
  SELECT * FROM embeddings WHERE vec_id % 10 < 8
),
batch AS MATERIALIZED (
  SELECT * FROM embeddings WHERE vec_id % 10 >= 8
),
{_kmeans_fit_ctes(_DYN_KC, 5, 3, src="corpus")},
ac AS MATERIALIZED (
  SELECT vec_id, cluster_id FROM (
    SELECT e.vec_id, c.cluster_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_D2T}, c.cluster_id) AS rn
    FROM corpus e CROSS JOIN c5 c) WHERE rn = 1
),
ab AS MATERIALIZED (
  SELECT vec_id, cluster_id FROM (
    SELECT e.vec_id, c.cluster_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_D2T}, c.cluster_id) AS rn
    FROM batch e CROSS JOIN c5 c) WHERE rn = 1
),
dup AS (
  SELECT DISTINCT sb.vec_id
  FROM ab sb
  JOIN ac sc ON sb.cluster_id = sc.cluster_id
  JOIN embeddings a ON a.vec_id = sb.vec_id
  JOIN embeddings b ON b.vec_id = sc.vec_id
  WHERE round({_DOT}, 6) >= 0.4
)
SELECT vec_id, cluster_id FROM ab
WHERE vec_id NOT IN (SELECT vec_id FROM dup)
"""

# C65: the capstone — SemDedup from RAW TEXT: the C64 embedder CTE
# produces (vec_id, embedding) and the src-parametrized fit chain,
# trained pair search, recursive closure and keep-canonical all run
# on it. Deterministic end to end, so the full composition replays.
_DYN_KD = ("greatest(2, CAST(round(sqrt((SELECT count(*) "
           "FROM demb))) AS INT))")

TEXT_SEMDEDUP_SQL = f"""
WITH RECURSIVE {_WORDS_CTE.strip()},
tok AS (SELECT doc_id, unnest(w) AS tok FROM wt),
hashed AS (SELECT doc_id, {_KR.format(s='tok')} AS h FROM tok),
contrib AS (
  SELECT doc_id, CAST(h % 64 AS INT) AS idx,
         CASE WHEN (h // 64) % 2 = 0 THEN 1 ELSE -1 END AS sgn
  FROM hashed
),
eacc AS (
  SELECT doc_id, idx, CAST(sum(sgn) AS DOUBLE) AS v
  FROM contrib GROUP BY doc_id, idx
),
edims AS (SELECT unnest(range(0, 64)) AS i),
edense AS (
  SELECT w.doc_id, d.i, coalesce(a.v, 0.0) AS v
  FROM (SELECT DISTINCT doc_id FROM eacc) w
  CROSS JOIN edims d
  LEFT JOIN eacc a ON a.doc_id = w.doc_id AND a.idx = d.i
),
enrm AS (SELECT doc_id, sqrt(sum(v * v)) AS nv FROM edense GROUP BY doc_id),
demb AS MATERIALIZED (
  SELECT edense.doc_id AS vec_id,
         list(round(CASE WHEN nv > 0 THEN v / nv ELSE 0.0 END, 6)
              ORDER BY i) AS embedding
  FROM edense JOIN enrm USING (doc_id)
  GROUP BY edense.doc_id, nv
),
{_kmeans_fit_ctes(_DYN_KD, 5, 3, src="demb")},
dft AS (
  SELECT e.vec_id, c.cluster_id, round({_D2T}, 6) AS d2
  FROM demb e CROSS JOIN c5 c
),
asg AS MATERIALIZED (
  SELECT vec_id, cluster_id FROM (
    SELECT vec_id, cluster_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2, cluster_id) AS rn
    FROM dft) WHERE rn = 1
),
p AS MATERIALIZED (
  SELECT sa.vec_id AS va, sb.vec_id AS vb
  FROM asg sa
  JOIN asg sb ON sa.cluster_id = sb.cluster_id AND sa.vec_id < sb.vec_id
  JOIN demb a ON a.vec_id = sa.vec_id
  JOIN demb b ON b.vec_id = sb.vec_id
  WHERE round({_DOT}, 6) >= 0.95
),
edges AS (
  SELECT va AS a, vb AS b FROM p UNION SELECT vb, va FROM p
),
reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
comp AS (
  SELECT a AS node, least(a, min(b)) AS component
  FROM reach GROUP BY a
)
SELECT vec_id, cluster_id FROM asg
WHERE vec_id NOT IN (SELECT node FROM comp WHERE node != component)
"""

KMEANS_ASSIGN_TRAINED_SQL = f"""
WITH {_kmeans_fit_ctes(8, 5, 3)},
df AS (
  SELECT e.vec_id, c.cluster_id, round({_D2T}, 6) AS d2
  FROM embeddings e CROSS JOIN c5 c
),
rf AS (
  SELECT vec_id, cluster_id, d2,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY d2, cluster_id) AS rn
  FROM df
)
SELECT vec_id, cluster_id, d2 FROM rf WHERE rn = 1
"""

# C47: SemDedup — exact dot pairs restricted to same-cluster, using
# the C45 seed-centroid assignment.
SEMDEDUP_SQL = f"""
WITH {_KMEANS_ASSIGN_CTE},
s AS (SELECT vec_id, cluster_id FROM r WHERE rn = 1),
p AS (
  SELECT sa.cluster_id, a.vec_id AS vec_a, b.vec_id AS vec_b,
         round({_DOT}, 6) AS dot_sim
  FROM s sa
  JOIN s sb ON sa.cluster_id = sb.cluster_id AND sa.vec_id < sb.vec_id
  JOIN embeddings a ON a.vec_id = sa.vec_id
  JOIN embeddings b ON b.vec_id = sb.vec_id
)
SELECT cluster_id, vec_a, vec_b, dot_sim FROM p WHERE dot_sim >= 0.4
"""

# C48: corpus snapshot diff by md5 fingerprint (snapshots derived
# deterministically from the documents table).
CORPUS_DIFF_SQL = """
WITH old AS (
  SELECT doc_id, md5(text) AS h_old FROM documents WHERE doc_id % 11 != 3
),
new_v AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 7 = 2 THEN upper(text) ELSE text END) AS h_new
  FROM documents WHERE doc_id % 13 != 5
),
j AS (
  SELECT COALESCE(old.doc_id, new_v.doc_id) AS doc_id,
         CASE WHEN h_old IS NULL THEN 'added'
              WHEN h_new IS NULL THEN 'removed'
              WHEN h_old != h_new THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM old FULL OUTER JOIN new_v ON old.doc_id = new_v.doc_id
)
SELECT doc_id, status FROM j WHERE status != 'unchanged'
"""


def _interleave_sql(va: str, vb: str, bits: int = 16) -> str:
    """Morton-interleave expression over two pre-scaled SQL ints —
    textual twin of sources/layout.py:interleave_bits."""
    terms = [f"(((({va}) >> {i}) & 1) << {2 * i})" for i in range(bits)]
    terms += [f"(((({vb}) >> {i}) & 1) << {2 * i + 1})" for i in range(bits)]
    return " | ".join(terms)


# B49 z-order codes: bounds from a min/max CTE, the same
# floor((x-lo)*65535/span) double arithmetic (exact below 2^53),
# and a 32-term bit interleave — both engines run identical integer
# and IEEE operations, so codes match bit for bit.
ZORDER_KEYS_SQL = f"""
WITH b AS (
  SELECT min(l_partkey) AS lo_a, max(l_partkey) AS hi_a,
         min(l_suppkey) AS lo_b, max(l_suppkey) AS hi_b
  FROM lineitem
),
s AS (
  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         CAST(floor((l_partkey - lo_a) * 65535
                    / greatest(hi_a - lo_a, 1)) AS BIGINT) AS ga,
         CAST(floor((l_suppkey - lo_b) * 65535
                    / greatest(hi_b - lo_b, 1)) AS BIGINT) AS gb
  FROM lineitem, b
)
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       CAST({_interleave_sql('ga', 'gb')} AS BIGINT) AS zcode
FROM s
ORDER BY zcode, l_orderkey, l_linenumber
LIMIT 5000
"""


# B50 salted join: the salt is plan plumbing only — the oracle runs
# the PLAIN join the salted plan must equal bit for bit (decimal
# revenue summed exactly, cast to double at the boundary).
SALTED_JOIN_SQL = """
SELECT o.o_orderpriority,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                * (1 - CAST(l.l_discount AS DECIMAL(18,4))))
            AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""

# B51 pruned scan: the layout + file skipping are plan plumbing only
# — the oracle filters PLAIN lineitem with the identically-derived
# integer box, certifying that footer pruning lost no rows.
ZORDER_PRUNED_SCAN_SQL = """
WITH b AS (
  SELECT min(l_partkey) AS lo_a, max(l_partkey) AS hi_a,
         min(l_suppkey) AS lo_b, max(l_suppkey) AS hi_b
  FROM lineitem
),
box AS (
  SELECT lo_a + (hi_a - lo_a) * 2 // 5 AS alo,
         lo_a + (hi_a - lo_a) * 3 // 5 AS ahi,
         lo_b + (hi_b - lo_b) * 2 // 5 AS blo,
         lo_b + (hi_b - lo_b) * 3 // 5 AS bhi
  FROM b
)
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       CAST(l_quantity AS DOUBLE) AS l_quantity
FROM lineitem, box
WHERE l_partkey BETWEEN alo AND ahi
  AND l_suppkey BETWEEN blo AND bhi
"""

# C67 BM25: tf/df/dl/N exact integers; Lucene idf + saturation are
# identical IEEE doubles; per-(query, doc) sums round to 1e-6 before
# ranking so cross-engine rank order is deterministic (ties by doc_id).
BM25_TOPK_SQL = f"""
WITH {_WORDS_CTE.strip()},
tok AS (SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM wt),
tf AS (
  SELECT doc_id, dl, term, count(*) AS tf
  FROM tok WHERE doc_id % 97 != 0
  GROUP BY doc_id, dl, term
),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
stats AS (
  SELECT count(*) AS n_docs, avg(len(w)) AS avgdl
  FROM wt WHERE doc_id % 97 != 0
),
qterms AS (
  SELECT DISTINCT doc_id AS query_id, term
  FROM tok WHERE doc_id % 97 = 0
),
scored AS (
  SELECT q.query_id, tf.doc_id,
         round(sum(
           ln(1.0 + (stats.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
           * tf.tf * (1.2 + 1)
           / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / stats.avgdl))
         ), 6) AS score
  FROM tf
  JOIN qterms q USING (term)
  JOIN dfq USING (term)
  CROSS JOIN stats
  GROUP BY q.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id) AS rank
  FROM scored
)
SELECT query_id, doc_id, CAST(rank AS INT) AS rank, score
FROM ranked WHERE rank <= 5
"""

# C70 DSIR: hashed-bigram buckets via the span-fingerprint machinery
# (span_keys_sql at span_words=2, replayed exactly); the per-bucket
# log-ratio is scaled*1e6 and rounded to BIGINT once, so per-doc
# scores are exact integer sums (no fp order sensitivity); selection
# rank is a total order on (score DESC, doc_id).
from gcp_data_engineering_workshop_spark.functions.textfns import (  # noqa: E402
    span_keys_sql as _span_keys_sql)

DSIR_SELECT_SQL = f"""
WITH {_WORDS_CTE.strip()},
ds AS (
  SELECT wt.doc_id, d.source IN ('src0', 'src1') AS is_tgt, wt.w
  FROM wt JOIN documents d ON wt.doc_id = d.doc_id
),
f AS (
  SELECT doc_id, is_tgt, k % 4096 AS b
  FROM ds, UNNEST({_span_keys_sql('w', 2)}) AS t(k)
),
cnt AS (
  SELECT b, SUM(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS ct,
         SUM(CASE WHEN NOT is_tgt THEN 1 ELSE 0 END) AS cr
  FROM f GROUP BY b
),
tots AS (SELECT SUM(ct) AS tt, SUM(cr) AS tr FROM cnt),
lr AS (
  SELECT b, CAST(round((ln(ct + 1.0) - ln(tt + 4096.0)
                        - ln(cr + 1.0) + ln(tr + 4096.0)) * 1e6)
                 AS BIGINT) AS lr
  FROM cnt, tots
),
sc AS (
  SELECT f.doc_id, SUM(lr.lr) AS score
  FROM f JOIN lr USING (b) WHERE NOT f.is_tgt
  GROUP BY f.doc_id
),
scored AS (
  SELECT ds.doc_id, COALESCE(sc.score, 0) AS score
  FROM ds LEFT JOIN sc ON ds.doc_id = sc.doc_id
  WHERE NOT ds.is_tgt
),
nk AS (
  SELECT CAST(floor(count(*) * 1.0 / 4.0) AS BIGINT) AS n_keep
  FROM scored
),
ranked AS (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id) AS sel_rank
  FROM scored
)
SELECT doc_id, CAST(score AS BIGINT) AS score,
       CAST(sel_rank AS BIGINT) AS sel_rank
FROM ranked, nk WHERE sel_rank <= n_keep
"""

# C71 perplexity buckets: the C44 LM score feeds an explicit
# NTILE(3)-closed-form tercile on (avg_logp DESC, doc_id) — integer
# arithmetic on the rank, identical in both engines.
PERPLEXITY_BUCKETS_SQL = f"""
WITH base AS ({BIGRAM_LM_SCORE_SQL.strip().rstrip()}),
n AS (SELECT count(*) AS n FROM base),
ranked AS (
  SELECT doc_id, avg_logp,
         row_number() OVER (ORDER BY avg_logp DESC, doc_id) AS ppl_rank
  FROM base
),
parts AS (
  SELECT ranked.*, n.n,
         CAST(floor(n.n / 3.0) AS BIGINT) AS q, n.n % 3 AS rem
  FROM ranked, n
),
bucketed AS (
  SELECT doc_id, avg_logp, ppl_rank,
         CASE WHEN ppl_rank <= rem * (q + 1)
              THEN CAST(floor((ppl_rank - 1) / (q + 1.0)) AS BIGINT) + 1
              ELSE rem + CAST(floor((ppl_rank - 1 - rem * (q + 1)) / (q * 1.0))
                              AS BIGINT) + 1
         END AS b
  FROM parts
)
SELECT doc_id, avg_logp, CAST(ppl_rank AS BIGINT) AS ppl_rank,
       CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
         AS bucket
FROM bucketed
"""

# C72 Efraimidis-Spirakis weighted sample: exact dyadic uniform from
# the KR content hash, one ln + one divide, 1e-9 grid before ranking.
WEIGHTED_SAMPLE_SQL = f"""
WITH {_WORDS_CTE.strip()},
base AS (
  SELECT d.doc_id,
         CAST(len(w) AS BIGINT) AS weight,
         round(ln(({_KR.format(s=_NORM)} + 1) / 2147483648.0)
               / len(w), 9) AS sample_key
  FROM documents d JOIN wt ON d.doc_id = wt.doc_id
  WHERE len(w) > 0
)
SELECT doc_id, weight, sample_key
FROM base ORDER BY sample_key DESC, doc_id LIMIT 100
"""

# C73 shuffle corpus: content-addressed permutation (KR hash, doc_id),
# integer round-robin sharding.
SHUFFLE_CORPUS_SQL = f"""
WITH ranked AS (
  SELECT doc_id,
         row_number() OVER (
           ORDER BY {_KR.format(s=_NORM)}, doc_id) AS pos
  FROM documents
)
SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       CAST((pos - 1) % 8 AS BIGINT) AS shard_id,
       CAST(floor((pos - 1) / 8.0) AS BIGINT) + 1 AS pos_in_shard
FROM ranked
"""


# C74 winnowing: exact integer span-key replay (span_keys_sql at k=4),
# window-min selection, XOR checksum — all list arithmetic.
from gcp_data_engineering_workshop_spark.functions.textfns import (  # noqa: E402,F811
    span_keys_sql as _span_keys_sql)

_WIN_SEL = """CASE
  WHEN len(sp) >= 4 THEN list_distinct(list_transform(
    range(0, len(sp) - 3), i -> list_min(sp[i+1:i+4])))
  WHEN len(sp) > 0 THEN [list_min(sp)]
  ELSE CAST([] AS BIGINT[]) END"""

WINNOW_FINGERPRINTS_SQL = f"""
WITH {_WORDS_CTE.strip()},
sp AS (
  SELECT doc_id, {_span_keys_sql('w', 4)} AS sp FROM wt
),
sel AS (
  SELECT doc_id, len(sp) AS n_kgrams, {_WIN_SEL} AS s FROM sp
)
SELECT doc_id, CAST(n_kgrams AS BIGINT) AS n_kgrams,
       CAST(len(s) AS BIGINT) AS n_selected,
       list_min(s) AS fp_min,
       list_reduce(list_prepend(CAST(0 AS BIGINT), s),
                   (a, x) -> xor(a, x)) AS fp_xor
FROM sel
"""

# C75 longest dup run: C41's dup-position derivation + gaps-and-islands
# (pos - row_number constant on contiguous runs), exact integers.
LONGEST_DUP_SPAN_SQL = f"""
WITH {_WORDS_CTE.strip()},
spans AS (
  SELECT doc_id, len(w) AS n_words,
         list_transform(range(0, greatest(len(w) - 9, 0)),
                        i -> array_to_string(w[i+1:i+10], ' ')) AS sps
  FROM wt
),
s1 AS (
  SELECT doc_id, unnest(sps) AS sp, generate_subscripts(sps, 1) - 1 AS pos
  FROM spans
),
occ AS (SELECT sp, count(*) AS occ FROM s1 GROUP BY sp),
dup AS (
  SELECT s1.doc_id, s1.pos FROM s1 JOIN occ USING (sp) WHERE occ.occ >= 2
),
pos AS (
  SELECT DISTINCT doc_id, p
  FROM (SELECT doc_id, unnest(range(pos, pos + 10)) AS p FROM dup)
),
isl AS (
  SELECT doc_id, p,
         p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
  FROM pos
),
runs AS (
  SELECT doc_id, grp, count(*) AS run FROM isl GROUP BY doc_id, grp
),
longest AS (
  SELECT doc_id, max(run) AS longest_dup_run FROM runs GROUP BY doc_id
)
SELECT spans.doc_id,
       CAST(spans.n_words AS BIGINT) AS n_words,
       CAST(coalesce(longest.longest_dup_run, 0) AS BIGINT)
         AS longest_dup_run
FROM spans LEFT JOIN longest USING (doc_id)
"""

# C76 attributes bundle: the three standalone oracles joined on
# doc_id — certifying the one-pass plan produces identical values.
QUALITY_ATTRIBUTES_SQL = f"""
WITH lang AS ({TEXT_LANG_ID_SQL.strip()}),
q AS ({TEXT_QUALITY_SQL.strip()}),
tok AS ({TOKEN_COUNT_SQL.strip()})
SELECT lang.doc_id, lang.lang_label, lang.lang_pred,
       q.n_words, q.n_chars, q.avg_word_len, q.punct_ratio,
       q.stopword_ratio_en, q.quality_score,
       tok.ws_tokens, tok.bpe_tokens
FROM lang JOIN q ON lang.doc_id = q.doc_id
JOIN tok ON lang.doc_id = tok.doc_id
"""

# C77 span-level decontamination: C52's accounting with dup :=
# "span occurs in the eval slice" (string-keyed — the collision
# check for the fingerprint path).
DECONTAMINATE_SPANS_SQL = f"""
WITH {_WORDS_CTE.strip()},
spans AS (
  SELECT doc_id, len(w) AS n_words,
         list_transform(range(0, greatest(len(w) - 9, 0)),
                        i -> array_to_string(w[i+1:i+10], ' ')) AS sps
  FROM wt
),
s1 AS (
  SELECT doc_id, unnest(sps) AS sp, generate_subscripts(sps, 1) - 1 AS pos
  FROM spans
),
evsp AS (SELECT DISTINCT sp FROM s1 WHERE doc_id % 97 = 0),
dup AS (
  SELECT s1.doc_id, s1.pos FROM s1 JOIN evsp USING (sp)
  WHERE s1.doc_id % 97 != 0
),
cov AS (
  SELECT DISTINCT doc_id, p
  FROM (SELECT doc_id, unnest(range(pos, pos + 10)) AS p FROM dup)
),
ints AS (
  SELECT doc_id, count(*) AS n_removed,
         sum(CASE WHEN prev IS NULL OR p != prev + 1 THEN 1 ELSE 0 END)
           AS n_ints
  FROM (SELECT doc_id, p,
               lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev
        FROM cov)
  GROUP BY doc_id
),
toks AS (
  SELECT doc_id, unnest(w) AS word, generate_subscripts(w, 1) - 1 AS pos
  FROM wt WHERE doc_id % 97 != 0
),
kept AS (
  SELECT t.doc_id,
         coalesce(string_agg(CASE WHEN c.p IS NULL THEN t.word END,
                             ' ' ORDER BY t.pos), '') AS cleaned_text
  FROM toks t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.p
  GROUP BY t.doc_id
)
SELECT spans.doc_id,
       CAST(spans.n_words AS BIGINT) AS n_words,
       CAST(coalesce(ints.n_removed, 0) AS BIGINT) AS n_removed_words,
       CAST(coalesce(ints.n_ints, 0) AS BIGINT) AS n_spans_removed,
       coalesce(kept.cleaned_text, '') AS cleaned_text
FROM spans
LEFT JOIN ints USING (doc_id)
LEFT JOIN kept USING (doc_id)
WHERE spans.doc_id % 97 != 0
"""

# C78 keep-best dedup: the C14 recursive closure + C9 score, winner
# by (score DESC, doc_id), singletons pass through.
DEDUP_KEEP_BEST_SQL = f"""
WITH RECURSIVE {_WORDS_CTE.strip()}, {_SHINGLES_CTE.strip()}, {_CAND_CTE.strip()},
pairs AS (
  SELECT cand.doc_a, cand.doc_b
  FROM cand
  JOIN sh a ON cand.doc_a = a.doc_id
  JOIN sh b ON cand.doc_b = b.doc_id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / len(list_distinct(list_concat(a.s, b.s))) >= 0.9
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
comp AS (
  SELECT node AS doc_id, least(node, min_reach) AS component
  FROM (SELECT a AS node, min(b) AS min_reach FROM reach GROUP BY a)
),
score AS (
  SELECT d.doc_id,
         round(0.4 * least(CAST(len(w) AS DOUBLE)/100.0, 1.0)
             + 0.3 * least((CASE WHEN len(list_distinct(w)) > 0
                 THEN CAST(len(list_intersect(list_distinct(w), {_SW['en']}))
                      AS DOUBLE)/len(list_distinct(w)) ELSE 0.0 END) * 5.0,
                 1.0)
             + 0.3 * (1.0 - least(
                 (CASE WHEN length(d.text) > 0
                  THEN CAST(len(regexp_extract_all(d.text, '[^\\w\\s]'))
                       AS DOUBLE)/length(d.text) ELSE 0.0 END) * 10.0
               + (CASE WHEN length(d.text) > 0
                  THEN CAST(len(regexp_extract_all(d.text, '[0-9]'))
                       AS DOUBLE)/length(d.text) ELSE 0.0 END) * 5.0,
                 1.0)), 6) AS quality_score
  FROM documents d JOIN wt ON d.doc_id = wt.doc_id
),
winners AS (
  SELECT doc_id, component, quality_score
  FROM (
    SELECT c.doc_id, c.component, s.quality_score,
           row_number() OVER (PARTITION BY c.component
                              ORDER BY s.quality_score DESC, c.doc_id)
             AS rn
    FROM comp c JOIN score s USING (doc_id)
  ) WHERE rn = 1
),
singles AS (
  SELECT s.doc_id, s.doc_id AS component, s.quality_score
  FROM score s WHERE s.doc_id NOT IN (SELECT doc_id FROM comp)
)
SELECT * FROM winners UNION ALL SELECT * FROM singles
"""

# C79 corpus report: six terminal aggregates of already-oracled
# pipelines, UNION ALL'd as (metric, value) rows.
CORPUS_REPORT_SQL = f"""
WITH RECURSIVE {_WORDS_CTE.strip()}, {_SHINGLES_CTE.strip()}, {_CAND_CTE.strip()},
pairs AS (
  SELECT cand.doc_a, cand.doc_b
  FROM cand
  JOIN sh a ON cand.doc_a = a.doc_id
  JOIN sh b ON cand.doc_b = b.doc_id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / len(list_distinct(list_concat(a.s, b.s))) >= 0.9
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
comp AS (
  SELECT node AS doc_id, least(node, min_reach) AS component
  FROM (SELECT a AS node, min(b) AS min_reach FROM reach GROUP BY a)
),
eh AS (
  SELECT doc_id, md5(coalesce({_NORM}, '')) AS h FROM documents
),
spans AS (
  SELECT doc_id, len(w) AS n_words,
         list_transform(range(0, greatest(len(w) - 9, 0)),
                        i -> array_to_string(w[i+1:i+10], ' ')) AS sps
  FROM wt
),
s1 AS (
  SELECT doc_id, unnest(sps) AS sp, generate_subscripts(sps, 1) - 1 AS pos
  FROM spans
),
occ AS (SELECT sp, count(*) AS occ FROM s1 GROUP BY sp),
dup AS (
  SELECT s1.doc_id, s1.pos FROM s1 JOIN occ USING (sp) WHERE occ.occ >= 2
),
cov AS (
  SELECT DISTINCT doc_id, p
  FROM (SELECT doc_id, unnest(range(pos, pos + 10)) AS p FROM dup)
),
shex AS (SELECT doc_id, unnest(s) AS g FROM sh),
evg AS (SELECT DISTINCT g FROM shex WHERE doc_id % 97 = 0),
conts AS (
  SELECT DISTINCT doc_id FROM shex
  WHERE doc_id % 97 != 0 AND g IN (SELECT g FROM evg)
)
SELECT 'n_docs' AS metric, CAST(count(*) AS DOUBLE) AS value
FROM documents
UNION ALL
SELECT 'n_words_total', CAST(sum(len(w)) AS DOUBLE) FROM wt
UNION ALL
SELECT 'exact_dup_removable', CAST(count(*) AS DOUBLE)
FROM (SELECT doc_id, h, min(doc_id) OVER (PARTITION BY h) AS mn FROM eh)
WHERE doc_id != mn
UNION ALL
SELECT 'neardup_removable',
       CAST(count(*) - count(DISTINCT component) AS DOUBLE) FROM comp
UNION ALL
SELECT 'span_dup_coverage',
       round(CAST((SELECT count(*) FROM cov) AS DOUBLE)
             / (SELECT sum(n_words) FROM spans), 6)
UNION ALL
SELECT 'contaminated_docs', CAST(count(*) AS DOUBLE) FROM conts
"""

# C80 kNN PageRank: exact kNN edges (every vector a query) + n_iter
# unrolled power-iteration rounds in FIXED-POINT INTEGER arithmetic
# (scale 1e12): pr div k per edge, (17 * mass) // 20 damping,
# (3 * SCALE) // (20 * n) teleport — exact bigint math, zero fp
# rounding inside the iteration.
def _pagerank_knn_sql(k=5, n_iter=5):
    SCALE = 10 ** 12
    rounds = []
    prev = "p0"
    for i in range(1, n_iter + 1):
        rounds.append(f"""
p{i} AS (
  SELECT v.vec_id,
         CAST((3 * {SCALE}) // (20 * (SELECT n FROM nn))
              + (17 * coalesce(m.mass, 0)) // 20 AS BIGINT) AS pr_int
  FROM embeddings v LEFT JOIN (
    SELECT e.neighbor_id AS vec_id,
           CAST(sum({prev}.pr_int // {k}) AS BIGINT) AS mass
    FROM knn e JOIN {prev} ON e.query_id = {prev}.vec_id
    GROUP BY e.neighbor_id
  ) m ON v.vec_id = m.vec_id
)""")
        prev = f"p{i}"
    return f"""
WITH s AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         round({_DOT}, 6) AS dot_sim
  FROM embeddings a, embeddings b
  WHERE a.vec_id != b.vec_id
),
knn AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY dot_sim DESC, neighbor_id) AS rank
    FROM s
  ) WHERE rank <= {k}
),
nn AS (SELECT count(*) AS n FROM embeddings),
p0 AS (
  SELECT vec_id,
         CAST({SCALE} // (SELECT n FROM nn) AS BIGINT) AS pr_int
  FROM embeddings
),{",".join(rounds)}
SELECT vec_id, pr_int / 1000000000000.0 AS pagerank FROM {prev}
"""


PAGERANK_KNN_SQL = _pagerank_knn_sql()

# C81 Kneser-Ney: exact integer count/continuation aggregates; the
# per-bigram probability is the same few IEEE ops on identical
# doubles; per-doc mean rounds at 1e-6 (C44's contract).
KNESER_NEY_SCORE_SQL = f"""
WITH {_WORDS_CTE.strip()},
bg AS (
  SELECT doc_id, unnest(list_transform(range(1, len(w)),
                                       i -> {{'w1': w[i], 'w2': w[i+1]}})) AS b
  FROM wt WHERE len(w) >= 2
),
bgf AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg),
c_bg AS (SELECT w1, w2, count(*) AS c12 FROM bgf GROUP BY w1, w2),
c_w1 AS (
  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1, count(*) AS n1p_fwd
  FROM c_bg GROUP BY w1
),
c_w2 AS (SELECT w2, count(*) AS n1p_bwd FROM c_bg GROUP BY w2),
types AS (SELECT count(*) AS n_types FROM c_bg),
scored AS (
  SELECT bgf.doc_id,
         count(*) AS n_bigrams,
         round(SUM(ln(
           greatest(c12 - 0.75, 0.0) / c1
           + (0.75 * n1p_fwd / c1) * (CAST(n1p_bwd AS DOUBLE) / n_types)
         )) / count(*), 6) AS avg_logp
  FROM bgf
  JOIN c_bg USING (w1, w2)
  JOIN c_w1 USING (w1)
  JOIN c_w2 USING (w2)
  CROSS JOIN types
  GROUP BY bgf.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       coalesce(s.avg_logp, 0.0) AS avg_logp
FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
"""

# B52 cohort retention: integer epoch-day/week arithmetic (micros fit
# in 2^53, so the double division is exact at day boundaries), exact
# distinct counts, ratio on the 1e-6 grid.
COHORT_RETENTION_SQL = """
WITH ev AS (
  SELECT user_id,
         floor(epoch_us(ts) / 86400000000.0) AS day
  FROM events
),
first AS (
  SELECT user_id, min(day) AS first_day FROM ev GROUP BY user_id
),
cohorted AS (
  SELECT ev.user_id,
         floor(first.first_day / 7.0) AS cohort_week,
         floor((ev.day - first.first_day) / 7.0) AS week_offset
  FROM ev JOIN first USING (user_id)
),
sizes AS (
  SELECT cohort_week, count(DISTINCT user_id) AS cohort_size
  FROM cohorted WHERE week_offset = 0 GROUP BY cohort_week
),
active AS (
  SELECT cohort_week, week_offset, count(DISTINCT user_id) AS n_active
  FROM cohorted GROUP BY cohort_week, week_offset
)
SELECT CAST(active.cohort_week AS BIGINT) AS cohort_week,
       CAST(active.week_offset AS BIGINT) AS week_offset,
       CAST(active.n_active AS BIGINT) AS n_active,
       round(CAST(active.n_active AS DOUBLE) / sizes.cohort_size, 6)
         AS retention
FROM active JOIN sizes USING (cohort_week)
"""

# B53 event transitions: lead over the (user_id, ts, event_id) total
# order, exact counts, conditional ratio at 1e-6.
EVENT_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
),
pairs AS (
  SELECT event_type AS from_type, next_type AS to_type,
         count(*) AS n_transitions
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
),
totals AS (
  SELECT from_type, sum(n_transitions) AS n_from
  FROM pairs GROUP BY from_type
)
SELECT pairs.from_type, pairs.to_type,
       CAST(pairs.n_transitions AS BIGINT) AS n_transitions,
       round(CAST(pairs.n_transitions AS DOUBLE) / totals.n_from, 6)
         AS p_next
FROM pairs JOIN totals USING (from_type)
"""

# C82 keep-central SemDedup: C55's fit/pairs/closure with the winner
# chosen by (rounded d2, vec_id) per component.
SEMDEDUP_KEEP_CENTRAL_SQL = f"""
WITH RECURSIVE {_kmeans_fit_ctes(_DYN_K, 5, 3)},
dft AS (
  SELECT e.vec_id, c.cluster_id, round({_D2T}, 6) AS d2
  FROM embeddings e CROSS JOIN c5 c
),
asg AS MATERIALIZED (
  SELECT vec_id, cluster_id, d2 FROM (
    SELECT vec_id, cluster_id, d2,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2, cluster_id) AS rn
    FROM dft) WHERE rn = 1
),
p AS MATERIALIZED (
  SELECT sa.vec_id AS va, sb.vec_id AS vb
  FROM asg sa
  JOIN asg sb ON sa.cluster_id = sb.cluster_id AND sa.vec_id < sb.vec_id
  JOIN embeddings a ON a.vec_id = sa.vec_id
  JOIN embeddings b ON b.vec_id = sb.vec_id
  WHERE round({_DOT}, 6) >= 0.4
),
edges AS (
  SELECT va AS a, vb AS b FROM p UNION SELECT vb, va FROM p
),
reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
comp AS (
  SELECT a AS node, least(a, min(b)) AS component
  FROM reach GROUP BY a
),
winners AS (
  SELECT vec_id, cluster_id FROM (
    SELECT c.node AS vec_id, a.cluster_id,
           row_number() OVER (PARTITION BY c.component
                              ORDER BY a.d2, c.node) AS rn
    FROM comp c JOIN asg a ON c.node = a.vec_id
  ) WHERE rn = 1
)
SELECT vec_id, cluster_id FROM winners
UNION ALL
SELECT vec_id, cluster_id FROM asg
WHERE vec_id NOT IN (SELECT node FROM comp)
"""

# C83 containment: unfiltered shares-a-shingle candidate superset
# (the Spark side prefix-filters; a green row proves completeness),
# exact integer intersection over the src size.
CONTAINMENT_PAIRS_SQL = f"""
WITH {_WORDS_CTE.strip()}, {_SHINGLES_CTE.strip()},
inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_src, y.doc_id AS doc_dst
  FROM inv x JOIN inv y ON x.g = y.g
  WHERE x.doc_id != y.doc_id
)
SELECT doc_src, doc_dst,
       round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / len(a.s), 6) AS containment
FROM cand
JOIN sh a ON cand.doc_src = a.doc_id
JOIN sh b ON cand.doc_dst = b.doc_id
WHERE round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / len(a.s), 6) >= 0.9
"""

"""Oracle SQL prototypes (DuckDB) — the single source of truth these were
developed against before being copied into SparkEntry.oracleSql.
Run: python3 tools/oracles.py [sfdir] to syntax-check and print row counts.
"""
import sys, duckdb

EVENTS_ORDER = "PARTITION BY user_id ORDER BY ts, event_id"

ORACLES = {
 "q_mean": """
SELECT user_id, round(avg(value), 6) AS mean
FROM events GROUP BY user_id HAVING count(*) >= 8 ORDER BY user_id""",

 "q_variance": """
WITH m AS (SELECT user_id, avg(value) AS mu, count(*) AS n FROM events GROUP BY user_id)
SELECT e.user_id, round(sum((value - mu) * (value - mu)) / (any_value(n) - 1), 6) AS variance
FROM events e JOIN m ON e.user_id = m.user_id
GROUP BY e.user_id HAVING any_value(n) >= 8 ORDER BY e.user_id""",

 "q_std": """
WITH m AS (SELECT user_id, avg(value) AS mu, count(*) AS n FROM events GROUP BY user_id)
SELECT e.user_id, round(sqrt(sum((value - mu) * (value - mu)) / (any_value(n) - 1)), 6) AS std
FROM events e JOIN m ON e.user_id = m.user_id
GROUP BY e.user_id HAVING any_value(n) >= 8 ORDER BY e.user_id""",

 "q_rms": """
SELECT user_id, round(sqrt(avg(value * value)), 6) AS rms
FROM events GROUP BY user_id HAVING count(*) >= 8 ORDER BY user_id""",

 "q_ptp_amp": """
SELECT user_id, round(max(value) - min(value), 6) AS ptp_amp
FROM events GROUP BY user_id HAVING count(*) >= 8 ORDER BY user_id""",

 "q_skewness": """
WITH m AS (SELECT user_id, avg(value) AS mu FROM events GROUP BY user_id)
SELECT e.user_id,
  round(avg(pow(value - mu, 3)) / pow(avg(pow(value - mu, 2)), 1.5), 6) AS skewness
FROM events e JOIN m ON e.user_id = m.user_id
GROUP BY e.user_id HAVING count(*) >= 8 ORDER BY e.user_id""",

 "q_kurtosis": """
WITH m AS (SELECT user_id, avg(value) AS mu FROM events GROUP BY user_id)
SELECT e.user_id,
  round(avg(pow(value - mu, 4)) / pow(avg(pow(value - mu, 2)), 2), 6) AS kurtosis
FROM events e JOIN m ON e.user_id = m.user_id
GROUP BY e.user_id HAVING count(*) >= 8 ORDER BY e.user_id""",

 "q_quantile": """
SELECT user_id, round(quantile_cont(value, 0.25), 6) AS q25,
       round(quantile_cont(value, 0.75), 6) AS q75
FROM events GROUP BY user_id HAVING count(*) >= 8 ORDER BY user_id""",

 "q_line_length": """
WITH d AS (SELECT user_id, value - lag(value) OVER ({w}) AS d FROM events)
SELECT user_id, round(avg(abs(d)), 6) AS line_length
FROM d WHERE d IS NOT NULL GROUP BY user_id HAVING count(*) >= 7 ORDER BY user_id""".format(w=EVENTS_ORDER),

 # zero crossings of the first-difference series (clip |d| < eps to 0):
 # count = (first diff sign == 0) + zero-runs entered + strict sign flips
 # — the reference counting rule (univariate.py:1084-1094) on diff(x).
 "q_zero_crossings": """
WITH d AS (
  SELECT user_id, value - lag(value) OVER ({w}) AS d, ts, event_id FROM events),
s AS (
  SELECT user_id, CASE WHEN abs(d) < 2.220446049250313e-16 THEN 0
                       WHEN d > 0 THEN 1 ELSE -1 END AS sg,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM d WHERE d IS NOT NULL),
p AS (
  SELECT user_id, sg, lag(sg) OVER (PARTITION BY user_id ORDER BY rn) AS prev, rn
  FROM s)
SELECT user_id, CAST(
    sum(CASE WHEN rn = 1 AND sg = 0 THEN 1 ELSE 0 END)
  + sum(CASE WHEN prev IS NOT NULL AND sg = 0 AND prev <> 0 THEN 1 ELSE 0 END)
  + sum(CASE WHEN prev IS NOT NULL AND sg * prev < 0 THEN 1 ELSE 0 END)
  AS DOUBLE) AS zero_crossings
FROM p GROUP BY user_id HAVING count(*) >= 7 ORDER BY user_id""".format(w=EVENTS_ORDER),

 "q_hjorth_mobility": """
WITH o AS (
  SELECT user_id, value, lag(value) OVER ({w}) AS p1,
         row_number() OVER ({w}) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events),
a AS (
  SELECT user_id, any_value(n) AS n, sum(value) AS s, sum(value * value) AS q,
    sum(CASE WHEN p1 IS NULL THEN value * value ELSE (value - p1) * (value - p1) END) AS qd,
    max(CASE WHEN rn = n THEN value END) AS lastx
  FROM o GROUP BY user_id HAVING any_value(n) >= 8)
SELECT user_id, round(sqrt(((qd - lastx * lastx / n) / (n - 1))
                         / ((q - s * s / (n + 1)) / n)), 6) AS hjorth_mobility
FROM a ORDER BY user_id""".format(w=EVENTS_ORDER),

 "q_hjorth_complexity": """
WITH o AS (
  SELECT user_id, value, lag(value) OVER ({w}) AS p1, lag(value, 2) OVER ({w}) AS p2,
         row_number() OVER ({w}) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events),
a AS (
  SELECT user_id, any_value(n) AS n, sum(value) AS s, sum(value * value) AS q,
    sum(CASE WHEN rn = 1 THEN value * value ELSE (value - p1) * (value - p1) END) AS qd,
    sum(CASE WHEN rn = 1 THEN value * value
             WHEN rn = 2 THEN (value - 2 * p1) * (value - 2 * p1)
             ELSE (value - 2 * p1 + p2) * (value - 2 * p1 + p2) END) AS qe,
    max(CASE WHEN rn = n THEN value END) AS lastx,
    max(CASE WHEN rn = n THEN value - p1 END) AS lastd
  FROM o GROUP BY user_id HAVING any_value(n) >= 8)
SELECT user_id, round(
  sqrt(((qe - lastd * lastd / n) / (n - 1)) / ((qd - lastx * lastx / (n + 1)) / n))
  / sqrt(((qd - lastx * lastx / n) / (n - 1)) / ((q - s * s / (n + 1)) / n)), 6)
  AS hjorth_complexity
FROM a ORDER BY user_id""".format(w=EVENTS_ORDER),

 "q_katz_fd": """
WITH o AS (
  SELECT user_id, value, lag(value) OVER ({w}) AS p1,
         first_value(value) OVER ({w}) AS x0,
         row_number() OVER ({w}) AS rn
  FROM events),
a AS (
  SELECT user_id, sum(abs(value - p1)) AS ll, avg(abs(value - p1)) AS aa,
    max(CASE WHEN rn >= 2 THEN abs(value - x0) END) AS d
  FROM o WHERE p1 IS NOT NULL GROUP BY user_id HAVING count(*) >= 7)
SELECT user_id, round(log10(ll / aa) / (log10(ll / aa) + log10(d / ll)), 6) AS katz_fd
FROM a ORDER BY user_id""".format(w=EVENTS_ORDER),

 # ---- retention tiers over (event_type, tumbling window) ----------------
 "q_tier_1h": """
SELECT event_type, epoch(date_trunc('hour', ts))::BIGINT AS bucket_s,
  CAST(count(*) AS BIGINT) AS n, round(avg(value), 6) AS mean,
  round(min(value), 6) AS vmin, round(max(value), 6) AS vmax,
  round(sqrt(avg(value * value)), 6) AS rms
FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

 # same result, but the engine computes it by merging 1m-tier partials
 # (two-stage continuous aggregate); oracle is the direct 1h computation
 "q_tier_1h_cascade": """
SELECT event_type, epoch(date_trunc('hour', ts))::BIGINT AS bucket_s,
  CAST(count(*) AS BIGINT) AS n, round(avg(value), 6) AS mean,
  round(sqrt(avg(value * value)), 6) AS rms
FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

 "q_tier_1d": """
WITH o AS (
  SELECT event_type, date_trunc('day', ts) AS b, value,
         lag(value) OVER (PARTITION BY event_type, date_trunc('day', ts)
                          ORDER BY ts, event_id) AS p1
  FROM events),
m AS (SELECT event_type, b, avg(value) AS mu, count(*) AS n FROM o GROUP BY 1, 2)
SELECT o.event_type, epoch(o.b)::BIGINT AS bucket_s,
  round(any_value(mu), 6) AS mean,
  round(sum((value - mu) * (value - mu)) / (any_value(m.n) - 1), 6) AS variance,
  round(sum(abs(value - p1)) / (any_value(m.n) - 1), 6) AS line_length
FROM o JOIN m ON o.event_type = m.event_type AND o.b = m.b
GROUP BY o.event_type, o.b HAVING any_value(m.n) >= 8 ORDER BY 1, 2""",

 # LOCF gap-fill on the dense hourly grid per event_type
 "q_gapfill_1h": """
WITH agg AS (
  SELECT event_type, date_trunc('hour', ts) AS b, avg(value) AS mean
  FROM events GROUP BY 1, 2),
bounds AS (
  SELECT event_type, min(b) AS lo, max(b) AS hi FROM agg GROUP BY 1),
grid AS (
  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS b
  FROM bounds),
joined AS (
  SELECT g.event_type, g.b, a.mean FROM grid g
  LEFT JOIN agg a ON a.event_type = g.event_type AND a.b = g.b)
SELECT event_type, epoch(b)::BIGINT AS bucket_s,
  round(last_value(mean IGNORE NULLS) OVER (
    PARTITION BY event_type ORDER BY b
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS mean_locf,
  CASE WHEN mean IS NULL THEN 1 ELSE 0 END AS filled
FROM joined ORDER BY 1, 2""",

 # ---- training-data pipeline ops over documents / embeddings ------------
 "q_doc_token_count": """
SELECT doc_id, CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_ws_tokens,
  CAST(length(text) AS BIGINT) AS n_chars_m
FROM documents ORDER BY doc_id""",

 "q_doc_quality": """
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars_m,
  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_words,
  round(CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE)
        / length(text), 6) AS punct_ratio,
  round(CAST(length(text) - length(replace(lower(text), ' the ', '#the#'))
        AS DOUBLE), 6) AS _pad,
  round(CAST(length(text) AS DOUBLE)
        / len(regexp_split_to_array(trim(text), '\\s+')), 6) AS chars_per_word
FROM documents ORDER BY doc_id""",

 "q_dedup_exact": """
SELECT md5(text) AS text_hash, CAST(count(*) AS BIGINT) AS dup_count,
       min(doc_id) AS keep_doc_id
FROM documents GROUP BY md5(text) ORDER BY text_hash""",

 "q_ann_cosine_top1": """
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 50 = 0),
sims AS (
  SELECT q.vec_id AS query_id, e.vec_id AS nn_id,
         list_cosine_similarity(q.embedding, e.embedding) AS sim
  FROM q JOIN embeddings e ON e.vec_id <> q.vec_id),
ranked AS (
  SELECT query_id, nn_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, nn_id) AS rk
  FROM sims)
SELECT query_id, nn_id, round(sim, 5) AS cos_sim FROM ranked WHERE rk = 1
ORDER BY query_id""",
}

def main(sfdir):
    con = duckdb.connect()
    for t in ['events', 'documents', 'embeddings', 'lineitem', 'orders']:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    for name, sql in ORACLES.items():
        try:
            rows = con.execute(sql).fetchall()
            cols = [d[0] for d in con.description]
            print(f"{name}: {len(rows)} rows cols={cols} sample={rows[0] if rows else None}")
        except Exception as e:
            print(f"{name}: FAILED {e}")

if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.001')

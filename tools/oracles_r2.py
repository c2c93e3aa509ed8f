"""Round-2 oracle prototypes. Validates each candidate oracle SQL against
the Spark parquet dumps in a Verify output dir, using the driver's compare
semantics (sorted columns, sorted rows, exact values for rounded floats).

Run: python3 tools/oracles_r2.py <sfdir> <verify_outdir> [query ...]
"""
import glob
import math
import sys

import duckdb

M = "18446744073709551616::HUGEINT"  # 2^64
P31 = 2147483647

# staged word-hash pipeline: ws (list of words) -> wh (list of HUGEINT
# mixed hashes in [0, 2^64)). Used as CTE chain fragments.
HASH_STAGES = """
  f1 AS (SELECT doc_id, list_transform(ws, w ->
           list_reduce(list_prepend(14695981039346656037::HUGEINT,
             list_transform(string_split(w, ''), c -> unicode(c)::HUGEINT)),
             (h, c) -> (xor(h, c) * 1099511628211::HUGEINT) % {M})) AS h0
         FROM ws),
  f2 AS (SELECT doc_id, list_transform(h0, h -> xor(h, h >> 33)) AS h1 FROM f1),
  f3 AS (SELECT doc_id, list_transform(h1, h ->
           ((h * 3981806797::HUGEINT) % {M} +
            (((h % 4294967296::HUGEINT) * 4283543511::HUGEINT)
             % 4294967296::HUGEINT) * 4294967296::HUGEINT) % {M}) AS h2
         FROM f2),
  f4 AS (SELECT doc_id, list_transform(h2, h -> xor(h, h >> 33)) AS wh FROM f3)
""".replace("{M}", M)

# words -> 3-gram shingle strings (whole text when < 3 words)
GRAMS = """
  w0 AS (SELECT doc_id, string_split(trim(lower(text)), ' ') AS ws0
         FROM documents),
  ws AS (SELECT doc_id, CASE WHEN len(ws0) < 3
           THEN [array_to_string(ws0, ' ')]
           ELSE list_transform(range(1, len(ws0) - 1),
                i -> ws0[i] || ' ' || ws0[i+1] || ' ' || ws0[i+2]) END AS ws
         FROM w0)
"""

# minhash signatures from shingle hashes (wh from HASH_STAGES over GRAMS):
# signed view mod P31, distinct, then min over (a*h+b) mod P31 per slot j.
def minhash_cte(coef_values):
    return f"""
  hmods AS (SELECT doc_id, list_distinct(list_transform(wh, h ->
              CASE WHEN h >= 9223372036854775808::HUGEINT
                   THEN (((h - {M}) % {P31}) + {P31}) % {P31}
                   ELSE h % {P31} END)) AS hm FROM f4),
  coef(j, ca, cb) AS (VALUES {coef_values}),
  sigj AS (SELECT doc_id, j, min((ca * u.h + cb) % {P31})::BIGINT AS mh
           FROM hmods, coef, unnest(hm) AS u(h) GROUP BY doc_id, j),
  sigs AS (SELECT doc_id, list(mh ORDER BY j) AS sig FROM sigj GROUP BY doc_id),
  banded0 AS (SELECT doc_id, sig, b.b AS band,
               sig[b.b * 4 + 1 : b.b * 4 + 4] AS bucket
             FROM sigs, (SELECT unnest(range(16)) AS b) b),
  -- hot-bucket cap: mirror of DedupOps.MaxBucket (rank within band/bucket
  -- by doc_id, keep <= 256) so the gate stays equivalent even when a
  -- bucket exceeds the cap at larger scale factors
  banded AS (SELECT doc_id, sig, band, bucket FROM (
               SELECT doc_id, sig, band, bucket,
                 row_number() OVER (PARTITION BY band, bucket
                   ORDER BY doc_id) AS rk
               FROM banded0) WHERE rk <= 256),
  cand AS (
    SELECT l.doc_id AS doc_a, r.doc_id AS doc_b, l.sig AS sig_a, r.sig AS sig_b
    FROM banded l JOIN banded r
      ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
    GROUP BY 1, 2, 3, 4),
  est AS (
    SELECT doc_a, doc_b,
      list_sum(list_transform(range(64),
        i -> CASE WHEN sig_a[i+1] = sig_b[i+1] THEN 1 ELSE 0 END)) / 64.0
        AS est_jaccard
    FROM cand)
"""


def splitmix_coefs():
    MASK = (1 << 64) - 1

    def to_signed(u):
        return u - (1 << 64) if u >= (1 << 63) else u

    state = 42
    def next_long():
        nonlocal state
        state = (state + 0x9e3779b97f4a7c15) & MASK
        z = state
        z = ((z ^ (z >> 30)) * 0xbf58476d1ce4e5b9) & MASK
        z = ((z ^ (z >> 27)) * 0x94d049bb133111eb) & MASK
        return to_signed(z ^ (z >> 31))
    a = [abs(next_long()) % (P31 - 1) + 1 for _ in range(64)]
    b = [abs(next_long()) % P31 for _ in range(64)]
    return ", ".join(f"({j}, {a[j]}, {b[j]})" for j in range(64))


def oracles():
    coefs = splitmix_coefs()
    o = {}
    o["q_doc_fingerprint"] = f"""
WITH w0 AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents),
  ws AS (SELECT doc_id, ws FROM w0),
  {HASH_STAGES.strip().lstrip()},
  f5 AS (SELECT doc_id, list_transform(wh, h ->
           CASE WHEN h >= 9223372036854775808::HUGEINT
                THEN (((h - {M}) % 2147483629) + 2147483629) % 2147483629
                ELSE h % 2147483629 END) AS wp FROM f4)
SELECT doc_id, list_reduce(list_prepend(0::HUGEINT, wp),
         (h, x) -> (h * 131 + x) % 2147483629)::BIGINT AS fingerprint
FROM f5 ORDER BY doc_id"""

    o["q_dedup_simhash"] = f"""
WITH ws AS (SELECT doc_id, string_split(trim(lower(text)), ' ') AS ws
            FROM documents),
  {HASH_STAGES.strip().lstrip()},
  toks AS (SELECT doc_id, u.h AS h FROM f4, unnest(wh) AS u(h)),
  bits AS (SELECT doc_id, b.b AS bit,
             sum(CASE WHEN (h >> b.b) % 2 = 1 THEN 1 ELSE -1 END) AS vote
           FROM toks, (SELECT unnest(range(64)) AS b) b
           GROUP BY doc_id, b.b),
  sig AS (SELECT doc_id, sum(CASE WHEN vote > 0
            THEN CASE WHEN bit = 63 THEN -9223372036854775808::HUGEINT
                 ELSE (1::HUGEINT << bit) END ELSE 0::HUGEINT END)::BIGINT
            AS simhash
          FROM bits GROUP BY doc_id)
SELECT doc_id, simhash FROM sig ORDER BY doc_id"""

    o["q_dedup_minhash"] = f"""
WITH {GRAMS.strip().lstrip()},
  {HASH_STAGES.strip().lstrip()},
  {minhash_cte(coefs).strip().lstrip()}
SELECT doc_a, doc_b, est_jaccard FROM est
WHERE est_jaccard >= 0.2 ORDER BY doc_a, doc_b"""

    o["q_dedup_clusters"] = f"""
WITH RECURSIVE {GRAMS.strip().lstrip()},
  {HASH_STAGES.strip().lstrip()},
  {minhash_cte(coefs).strip().lstrip()},
  pairs AS (SELECT doc_a, doc_b FROM est WHERE est_jaccard >= 0.5),
  edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION ALL SELECT doc_b, doc_a FROM pairs),
  nodes AS (SELECT DISTINCT a AS doc_id FROM edges),
  r(doc_id, label) AS (
    SELECT doc_id, doc_id FROM nodes
    UNION
    SELECT e.a, r.label FROM edges e JOIN r ON r.doc_id = e.b)
SELECT doc_id, min(label) AS cluster_id,
  doc_id = min(label) AS keep
FROM r GROUP BY doc_id ORDER BY doc_id"""

    # content-keyed split: full fingerprint pipeline, bucket = fp % 100
    o["q_split_hash"] = f"""
WITH w0 AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents),
  ws AS (SELECT doc_id, ws FROM w0),
  {HASH_STAGES.strip().lstrip()},
  f5 AS (SELECT doc_id, list_transform(wh, h ->
           CASE WHEN h >= 9223372036854775808::HUGEINT
                THEN (((h - {M}) % 2147483629) + 2147483629) % 2147483629
                ELSE h % 2147483629 END) AS wp FROM f4),
  fp AS (SELECT doc_id, list_reduce(list_prepend(0::HUGEINT, wp),
           (h, x) -> (h * 131 + x) % 2147483629)::BIGINT AS fingerprint
         FROM f5)
SELECT doc_id, fingerprint % 100 AS bucket,
  CASE WHEN fingerprint % 100 < 80 THEN 'train'
       WHEN fingerprint % 100 < 90 THEN 'val' ELSE 'test' END AS split
FROM fp ORDER BY doc_id"""

    # decontamination: same shingle-hash pipeline as the dedup gates;
    # held-out set = doc_id % 97 = 0, training docs LEFT-JOIN their
    # distinct shared-shingle counts
    o["q_decontaminate"] = f"""
WITH {GRAMS.strip().lstrip()},
  {HASH_STAGES.strip().lstrip()},
  sh AS (SELECT doc_id, list_distinct(wh) AS sh FROM f4),
  test_sh AS (SELECT DISTINCT u.h AS h
              FROM sh, unnest(sh.sh) AS u(h) WHERE doc_id % 97 = 0),
  tr AS (SELECT doc_id, sh FROM sh WHERE doc_id % 97 <> 0),
  hits AS (SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_shared
           FROM tr, unnest(tr.sh) AS u(h)
           WHERE u.h IN (SELECT h FROM test_sh)
           GROUP BY tr.doc_id)
SELECT d.doc_id, coalesce(h.n_shared, 0)::BIGINT AS n_shared,
  h.doc_id IS NOT NULL AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
LEFT JOIN hits h ON h.doc_id = d.doc_id
ORDER BY d.doc_id"""

    o["q_dedup_ngram_jaccard"] = f"""
WITH {GRAMS.strip().lstrip()},
  {HASH_STAGES.strip().lstrip()},
  {minhash_cte(coefs).strip().lstrip()},
  shs AS (SELECT doc_id, list_distinct(wh) AS sh FROM f4),
  pairs AS (SELECT doc_a, doc_b FROM est WHERE est_jaccard >= 0.2)
SELECT p.doc_a, p.doc_b,
  round(len(list_intersect(a.sh, b.sh))::DOUBLE /
        len(list_distinct(a.sh || b.sh)), 6) AS jaccard
FROM pairs p JOIN shs a ON a.doc_id = p.doc_a JOIN shs b ON b.doc_id = p.doc_b
ORDER BY p.doc_a, p.doc_b"""
    return o


# ---- spectral family: O(n^2) DFT replication of Psd.fftPsd ----------------
# freqs[k] = k / ((1/256)*n)  (bit-exact np.fft.rfftfreq arithmetic);
# psd[k] = (re^2 + im^2) / (n*n) * 2, DC (and Nyquist for even n) halved.
# sig lists are short (<= ~90 samples at sf0.01), so the quadratic DFT is
# cheap; FFT-vs-DFT differences are ~1e-12 relative and vanish at round(,6)
# — verified exactly against the Spark dumps by this script.

PSD_FFT = """
  g AS (SELECT user_id, list(value ORDER BY ts, event_id) AS l
        FROM events GROUP BY user_id HAVING count(*) >= 8),
  m AS (SELECT user_id, l, len(l) AS n, list_sum(l) / len(l) AS mu FROM g),
  cx AS (SELECT user_id, n, list_transform(l, x -> x - mu) AS c FROM m),
  sp AS (SELECT user_id, n,
           list_transform(range(0, n // 2 + 1), k ->
             (pow(list_sum(list_transform(range(1, n + 1),
                j -> c[j] * cos(2 * pi() * (j - 1) * k / n))), 2)
            + pow(list_sum(list_transform(range(1, n + 1),
                j -> c[j] * sin(2 * pi() * (j - 1) * k / n))), 2))
             / (n * n) * 2.0) AS p0
         FROM cx),
  psd AS (SELECT user_id, n,
            list_transform(range(0, n // 2 + 1), k ->
              CASE WHEN k = 0 OR (n % 2 = 0 AND k = n // 2)
                   THEN p0[k + 1] / 2.0 ELSE p0[k + 1] END) AS p,
            list_transform(range(0, n // 2 + 1), k ->
              k / ((1.0 / 256.0) * n)) AS f
          FROM sp)
"""

# welch at n < 256 collapses to ONE hamming-windowed segment: nFft = n,
# per-segment demean, scale = 1/(sfreq * sum(w^2)), one-sided doubling
# except DC/Nyquist.
PSD_WELCH = """
  g AS (SELECT user_id, list(value ORDER BY ts, event_id) AS l
        FROM events GROUP BY user_id HAVING count(*) >= 8),
  m AS (SELECT user_id, l, len(l) AS n, list_sum(l) / len(l) AS mu FROM g),
  win AS (SELECT user_id, n, l, mu,
            list_transform(range(0, n), i ->
              0.54 - 0.46 * cos(2 * pi() * i / n)) AS w
          FROM m),
  seg AS (SELECT user_id, n,
            list_transform(range(1, n + 1), j -> (l[j] - mu) * w[j]) AS c,
            1.0 / (256.0 * list_sum(list_transform(w, x -> x * x))) AS scale
          FROM win),
  sp AS (SELECT user_id, n,
           list_transform(range(0, n // 2 + 1), k ->
             (pow(list_sum(list_transform(range(1, n + 1),
                j -> c[j] * cos(2 * pi() * (j - 1) * k / n))), 2)
            + pow(list_sum(list_transform(range(1, n + 1),
                j -> c[j] * sin(2 * pi() * (j - 1) * k / n))), 2))
             * scale) AS p0
         FROM seg),
  psd AS (SELECT user_id, n,
            list_transform(range(0, n // 2 + 1), k ->
              CASE WHEN k = 0 OR (n % 2 = 0 AND k = n // 2)
                   THEN p0[k + 1] ELSE p0[k + 1] * 2.0 END) AS p,
            list_transform(range(0, n // 2 + 1), k ->
              k / ((1.0 / 256.0) * n)) AS f
          FROM psd_pre)
""".replace("FROM psd_pre", "FROM sp")


def spectral_oracles():
    o = {}

    def ent_select(col_alias):
        return f"""
  tot AS (SELECT user_id, p, list_sum(p) AS m0 FROM psd),
  e AS (SELECT user_id,
          -list_sum(list_transform(range(2, len(p) + 1),
            k -> (p[k] / m0) * (ln(p[k] / m0) / ln(2.0)))) AS v
        FROM tot)
SELECT user_id, round(v, 6) AS {col_alias} FROM e ORDER BY user_id"""

    o["q_spect_entropy"] = "WITH " + PSD_FFT.strip() + "," + ent_select("spect_entropy")
    o["q_spect_entropy_welch"] = ("WITH " + PSD_WELCH.strip() + ","
                                  + ent_select("spect_entropy_welch"))

    band_edges = [0.5, 4.0, 8.0, 13.0, 30.0, 100.0]
    bands = list(zip(band_edges, band_edges[1:]))
    band_cols = ",\n  ".join(
        f"round(list_sum(list_transform(range(1, len(p) + 1), k -> "
        f"CASE WHEN f[k] >= {lo} AND f[k] <= {hi} THEN p[k] ELSE 0.0 END)) "
        f"/ list_sum(p), 6) AS band{i}"
        for i, (lo, hi) in enumerate(bands))
    o["q_pow_freq_bands"] = f"""
WITH {PSD_FFT.strip()}
SELECT user_id,
  {band_cols}
FROM psd ORDER BY user_id"""
    o["q_pow_freq_bands_welch"] = f"""
WITH {PSD_WELCH.strip()}
SELECT user_id,
  round(list_sum(list_transform(range(1, len(p) + 1), k ->
    CASE WHEN f[k] >= 4.0 AND f[k] <= 8.0 THEN p[k] ELSE 0.0 END))
    / list_sum(p), 6) AS band1,
  round(list_sum(list_transform(range(1, len(p) + 1), k ->
    CASE WHEN f[k] >= 30.0 AND f[k] <= 100.0 THEN p[k] ELSE 0.0 END))
    / list_sum(p), 6) AS band4
FROM psd ORDER BY user_id"""

    # f^4-weighted moments reach ~4e7 where the FFT-vs-DFT residue (~1e-12
    # relative) touches the 6th decimal; quantize complexity at 2 decimals
    # (still 10 significant digits) so the compare is noise-immune.
    for name, pw, dig in [("q_hjorth_mobility_spect", 2, 6),
                          ("q_hjorth_complexity_spect", 4, 2)]:
        alias = name[2:]
        o[name] = f"""
WITH {PSD_FFT.strip()}
SELECT user_id,
  round(list_sum(list_transform(range(1, len(p) + 1),
          k -> p[k] * pow(f[k], {pw})))
        / list_sum(p), {dig}) AS {alias}
FROM psd ORDER BY user_id"""

    # spect_edge_freq: ref power = cumsum up to first bin >= 128 (clamped to
    # the last bin when none reaches it); per edge: first bin with
    # cumsum >= edge * refpow
    o["q_spect_edge_freq"] = f"""
WITH {PSD_FFT.strip()},
  cum AS (SELECT user_id, p, f,
            list_transform(range(1, len(p) + 1),
              k -> list_sum(p[1:k])) AS cs
          FROM psd),
  ref AS (SELECT user_id, p, f, cs,
            coalesce(nullif(list_position(list_transform(f, x ->
              CASE WHEN x >= 128.0 THEN 1 ELSE 0 END), 1), 0),
              len(f)) AS idxref
          FROM cum),
  rp AS (SELECT user_id, f, cs, cs[idxref] AS refpow FROM ref)
SELECT user_id,
  round(CASE WHEN list_position(list_transform(cs, x ->
      CASE WHEN x >= 0.5 * refpow THEN 1 ELSE 0 END), 1) IS NULL THEN -1.0
    ELSE f[list_position(list_transform(cs, x ->
      CASE WHEN x >= 0.5 * refpow THEN 1 ELSE 0 END), 1)] END, 6) AS edge50,
  round(CASE WHEN list_position(list_transform(cs, x ->
      CASE WHEN x >= 0.9 * refpow THEN 1 ELSE 0 END), 1) IS NULL THEN -1.0
    ELSE f[list_position(list_transform(cs, x ->
      CASE WHEN x >= 0.9 * refpow THEN 1 ELSE 0 END), 1)] END, 6) AS edge90
FROM rp ORDER BY user_id"""

    # spect_slope: OLS of log10(psd) on log10(f) over 0.1 <= f <= 50
    o["q_spect_slope"] = f"""
WITH {PSD_FFT.strip()},
  sel AS (SELECT user_id,
            list_transform(list_filter(range(1, len(p) + 1),
              k -> f[k] >= 0.1 AND f[k] <= 50.0),
              k -> {{'x': log10(f[k]), 'y': log10(p[k])}}) AS pts
          FROM psd),
  ms AS (SELECT user_id, pts, len(pts) AS np,
           list_sum(list_transform(pts, s -> s.x)) / len(pts) AS mx,
           list_sum(list_transform(pts, s -> s.y)) / len(pts) AS my
         FROM sel),
  sl AS (SELECT user_id, pts, np, mx, my,
           list_sum(list_transform(pts, s -> (s.x - mx) * (s.y - my)))
         / list_sum(list_transform(pts, s -> (s.x - mx) * (s.x - mx))) AS slope
         FROM ms),
  ic AS (SELECT user_id, pts, np, mx, my, slope,
           my - slope * mx AS intercept FROM sl),
  rs AS (SELECT user_id, np, my, slope, intercept,
           list_transform(pts, s -> s.y - (intercept + slope * s.x)) AS resid,
           list_transform(pts, s -> (s.y - my) * (s.y - my)) AS devy
         FROM ic),
  fin AS (SELECT user_id, slope, intercept,
            list_sum(list_transform(resid, r -> r * r)) / np AS mse,
            1.0 - (list_sum(list_transform(resid, r ->
                (r - list_sum(resid) / np) * (r - list_sum(resid) / np))) / np)
              / (list_sum(devy) / np) AS r2
          FROM rs)
SELECT user_id, round(intercept, 6) AS intercept, round(slope, 6) AS slope,
  round(mse, 6) AS mse, round(r2, 6) AS r2
FROM fin ORDER BY user_id"""

    # decorr_time: circular unbiased ACF, first sign change / sfreq
    o["q_decorr_time"] = """
WITH g AS (SELECT user_id, list(value ORDER BY ts, event_id) AS l
        FROM events GROUP BY user_id HAVING count(*) >= 8),
  m AS (SELECT user_id, l, len(l) AS n, list_sum(l) / len(l) AS mu FROM g),
  cx AS (SELECT user_id, n, list_transform(l, x -> x - mu) AS c FROM m),
  acf AS (SELECT user_id, n,
            list_transform(range(0, least(50, n - 1) + 1), i ->
              list_sum(list_transform(range(1, n + 1),
                j -> c[j] * c[((j - 1 + i) % n) + 1])) / (n - i)) AS a
          FROM cx),
  nrm AS (SELECT user_id, list_transform(a, x -> x / a[1]) AS r FROM acf),
  sgn AS (SELECT user_id, list_transform(r, x ->
            CASE WHEN x > 0 THEN 1 WHEN x < 0 THEN -1 ELSE 0 END) AS s
          FROM nrm),
  hit AS (SELECT user_id,
            list_position(list_transform(range(1, len(s)), i ->
              CASE WHEN s[i + 1] <> s[i] THEN 1 ELSE 0 END), 1) AS idx
          FROM sgn)
SELECT user_id,
  CASE WHEN idx IS NULL THEN -1.0 ELSE round(idx / 256.0, 6) END
    AS decorr_time
FROM hit ORDER BY user_id"""
    return o


# ---- approximate / sample entropy (O(n^2) Chebyshev counts) ---------------

ENTROPY_BASE = """
  g AS (SELECT user_id, list(value ORDER BY ts, event_id) AS l
        FROM events GROUP BY user_id HAVING count(*) >= 8),
  m AS (SELECT user_id, l, len(l) AS n, list_sum(l) / len(l) AS mu FROM g),
  rr AS (SELECT user_id, l, n,
           0.2 * sqrt(list_sum(list_transform(l, x -> (x - mu) * (x - mu)))
                      / (n - 1)) AS r
         FROM m)
"""


def entropy_oracles():
    o = {}
    o["q_app_entropy"] = f"""
WITH {ENTROPY_BASE.strip()},
  c1 AS (SELECT user_id, l, n, r,
           list_transform(range(1, n), i ->
             list_sum(list_transform(range(1, n), j ->
               CASE WHEN greatest(abs(l[i] - l[j]), abs(l[i+1] - l[j+1])) <= r
                    THEN 1 ELSE 0 END))) AS c
         FROM rr),
  c2 AS (SELECT user_id, l, n, r, c,
           list_transform(range(1, n - 1), i ->
             list_sum(list_transform(range(1, n - 1), j ->
               CASE WHEN greatest(abs(l[i] - l[j]), abs(l[i+1] - l[j+1]),
                                  abs(l[i+2] - l[j+2])) <= r
                    THEN 1 ELSE 0 END))) AS c3
         FROM c1),
  phi AS (SELECT user_id,
            list_sum(list_transform(c, x -> ln(x::DOUBLE / (n - 1)))) / (n - 1)
              AS phi0,
            list_sum(list_transform(c3, x -> ln(x::DOUBLE / (n - 2)))) / (n - 2)
              AS phi1
          FROM c2)
SELECT user_id, round(phi0 - phi1, 6) AS app_entropy
FROM phi ORDER BY user_id"""

    # samp_entropy: the emb-dim window set drops its LAST row on both axes;
    # counts exclude self ((c-1)/(m-1)); undefined (phi ~ 0) -> NULL like
    # the kernel's NaN -> SQL NULL mapping
    o["q_samp_entropy"] = f"""
WITH {ENTROPY_BASE.strip()},
  c1 AS (SELECT user_id, l, n, r,
           list_transform(range(1, n - 1), i ->
             list_sum(list_transform(range(1, n - 1), j ->
               CASE WHEN greatest(abs(l[i] - l[j]), abs(l[i+1] - l[j+1])) <= r
                    THEN 1 ELSE 0 END))) AS c
         FROM rr),
  c2 AS (SELECT user_id, l, n, r, c,
           list_transform(range(1, n - 1), i ->
             list_sum(list_transform(range(1, n - 1), j ->
               CASE WHEN greatest(abs(l[i] - l[j]), abs(l[i+1] - l[j+1]),
                                  abs(l[i+2] - l[j+2])) <= r
                    THEN 1 ELSE 0 END))) AS c3
         FROM c1),
  phi AS (SELECT user_id,
            list_sum(list_transform(c, x -> (x - 1)::DOUBLE / (n - 3))) / (n - 2)
              AS phi0,
            list_sum(list_transform(c3, x -> (x - 1)::DOUBLE / (n - 3))) / (n - 2)
              AS phi1
          FROM c2)
SELECT user_id,
  CASE WHEN abs(phi0) < 1e-12 OR abs(phi1) < 1e-12 THEN NULL
       ELSE round(-ln(phi1 / phi0), 6) END AS samp_entropy
FROM phi ORDER BY user_id"""
    return o


# ---- bivariate (cross-channel) family -------------------------------------
# channels = a user's per-event_type series (event_type order), truncated to
# the common min length; users dropped when < 2 channels or min length < 8
# (TokenBivariate contract). p1/p2 = the (0,1) and (0,2) pair outputs.

BIV_BASE = """
  ch AS (SELECT user_id, event_type, list(value ORDER BY ts, event_id) AS sig
         FROM events GROUP BY user_id, event_type),
  chans0 AS (SELECT user_id, list(sig ORDER BY event_type) AS cs0,
                    min(len(sig))::BIGINT AS ml, count(*)::BIGINT AS nch
             FROM ch GROUP BY user_id),
  chans AS (SELECT user_id, list_transform(cs0, s -> s[1:ml]) AS cs, ml, nch
            FROM chans0 WHERE nch >= 2 AND ml >= 8)
"""

# per-time-point standardization across channels (population std; zero-std
# columns left centered), as scaleAcrossChannels
SCALED = """
  mus AS (SELECT user_id, cs, ml, nch,
            list_transform(range(1, ml + 1), t ->
              list_sum(list_transform(cs, s -> s[t])) / nch) AS mu
          FROM chans),
  sds AS (SELECT user_id, cs, ml, nch, mu,
            list_transform(range(1, ml + 1), t ->
              sqrt(list_sum(list_transform(cs,
                s -> (s[t] - mu[t]) * (s[t] - mu[t]))) / nch)) AS sd
          FROM mus),
  scaled AS (SELECT user_id, ml, nch,
               list_transform(cs, s -> list_transform(range(1, ml + 1), t ->
                 (s[t] - mu[t]) / (CASE WHEN sd[t] = 0 THEN 1.0
                                        ELSE sd[t] END))) AS sc
             FROM sds)
"""

# corrcoef machinery over the scaled rows: devs + norms per channel, then
# corr(i,j); drop users where any channel's dev-norm is 0 (NaN rows in the
# kernel -> SQL NULL -> filtered)
CORR_TAIL = """
  devs AS (SELECT user_id, ml, nch,
             list_transform(sc, s ->
               list_transform(s, x -> x - list_sum(s) / ml)) AS dv
           FROM scaled),
  nrm AS (SELECT user_id, ml, nch, dv,
            list_transform(dv, d ->
              sqrt(list_sum(list_transform(d, x -> x * x)))) AS nr
          FROM devs),
  corr AS (SELECT user_id,
             list_sum(list_transform(range(1, ml + 1),
               t -> dv[1][t] * dv[2][t])) / (nr[1] * nr[2]) AS p1,
             list_sum(list_transform(range(1, ml + 1),
               t -> dv[1][t] * dv[3][t])) / (nr[1] * nr[3]) AS p2
           FROM nrm
           WHERE nch >= 3 AND list_min(nr) > 0)
"""


def bivariate_oracles():
    o = {}
    o["q_biv_time_corr"] = f"""
WITH {BIV_BASE.strip()},
  {SCALED.strip()},
  {CORR_TAIL.strip()}
SELECT user_id, round(p1, 6) AS time_corr_p1, round(p2, 6) AS time_corr_p2
FROM corr ORDER BY user_id"""

    # spect_corr: the same corr features over per-channel WELCH PSDs
    # (single hamming segment at these lengths; sfreq 256)
    o["q_biv_spect_corr"] = f"""
WITH {BIV_BASE.strip()},
  psds AS (SELECT user_id, ml AS nt, nch,
             list_transform(cs, s ->
               list_transform(range(0, ml // 2 + 1), k ->
                 (pow(list_sum(list_transform(range(1, ml + 1), j ->
                    (s[j] - list_sum(s) / ml)
                    * (0.54 - 0.46 * cos(2 * pi() * (j - 1) / ml))
                    * cos(2 * pi() * (j - 1) * k / ml))), 2)
                + pow(list_sum(list_transform(range(1, ml + 1), j ->
                    (s[j] - list_sum(s) / ml)
                    * (0.54 - 0.46 * cos(2 * pi() * (j - 1) / ml))
                    * sin(2 * pi() * (j - 1) * k / ml))), 2))
                 * (1.0 / (256.0 * list_sum(list_transform(range(0, ml), i ->
                     pow(0.54 - 0.46 * cos(2 * pi() * i / ml), 2)))))
                 * (CASE WHEN k = 0 OR (ml % 2 = 0 AND k = ml // 2)
                         THEN 1.0 ELSE 2.0 END))) AS cs
             FROM chans),
  chans2 AS (SELECT user_id, cs, (nt // 2 + 1)::BIGINT AS ml, nch FROM psds),
  {SCALED.replace('FROM chans', 'FROM chans2').strip()},
  {CORR_TAIL.strip()}
SELECT user_id, round(p1, 6) AS spect_corr_p1, round(p2, 6) AS spect_corr_p2
FROM corr ORDER BY user_id"""

    # max_cross_corr: max over lags |tau| < min(128, n) of the
    # (n - |tau|)-normalized cross-correlation magnitude
    o["q_biv_max_cross_corr"] = f"""
WITH {BIV_BASE.strip()},
  st AS (SELECT user_id, cs, ml, nch,
           list_transform(cs, s -> list_sum(s) / ml) AS xm,
           list_transform(cs, s -> sqrt(list_sum(list_transform(s,
             x -> (x - list_sum(s) / ml) * (x - list_sum(s) / ml)))
             / (ml - 1))) AS xv
         FROM chans),
  mx AS (SELECT user_id, nch, list_min(xv) AS minv,
           list_max(list_transform(range(0, least(129, ml)), a ->
             abs(list_sum(list_transform(range(1, ml - a + 1), j ->
               ((cs[1][j + a] - xm[1]) / xv[1])
             * ((cs[2][j] - xm[2]) / xv[2]))) / (ml - a)))) AS p1,
           list_max(list_transform(range(0, least(129, ml)), a ->
             abs(list_sum(list_transform(range(1, ml - a + 1), j ->
               ((cs[1][j + a] - xm[1]) / xv[1])
             * ((cs[3][j] - xm[3]) / xv[3]))) / (ml - a)))) AS p2
         FROM st)
SELECT user_id, round(p1, 6) AS max_cross_corr_p1,
       round(p2, 6) AS max_cross_corr_p2
FROM mx WHERE nch >= 3 AND minv > 0 ORDER BY user_id"""

    # phase_lock_val: Hilbert analytic phases per channel via full DFT,
    # PLV = |mean exp(i(phi_x - phi_y))|
    hilbert = """
  xf AS (SELECT user_id, cs, ml, nch,
           list_transform(cs, s ->
             list_transform(range(0, ml), k -> {
               're': list_sum(list_transform(range(1, ml + 1), j ->
                       s[j] * cos(2 * pi() * (j - 1) * k / ml))),
               'im': -list_sum(list_transform(range(1, ml + 1), j ->
                       s[j] * sin(2 * pi() * (j - 1) * k / ml)))})) AS sp
         FROM chans),
  filt AS (SELECT user_id, ml, nch,
             list_transform(sp, f ->
               list_transform(range(0, ml), k -> {
                 're': f[k + 1].re * (CASE
                     WHEN k = 0 OR (ml % 2 = 0 AND k = ml // 2) THEN 1.0
                     WHEN k < (ml + 1) // 2 THEN 2.0 ELSE 0.0 END),
                 'im': f[k + 1].im * (CASE
                     WHEN k = 0 OR (ml % 2 = 0 AND k = ml // 2) THEN 1.0
                     WHEN k < (ml + 1) // 2 THEN 2.0 ELSE 0.0 END)})) AS fs
           FROM xf),
  ph AS (SELECT user_id, ml, nch,
           list_transform(fs, f ->
             list_transform(range(0, ml), t ->
               atan2(
                 list_sum(list_transform(range(0, ml), k ->
                   (f[k + 1].re * sin(2 * pi() * k * t / ml)
                  + f[k + 1].im * cos(2 * pi() * k * t / ml)) / ml)),
                 list_sum(list_transform(range(0, ml), k ->
                   (f[k + 1].re * cos(2 * pi() * k * t / ml)
                  - f[k + 1].im * sin(2 * pi() * k * t / ml)) / ml))))) AS phs
         FROM filt)
"""
    o["q_biv_phase_lock_val"] = f"""
WITH {BIV_BASE.strip()},
  {hilbert.strip()},
  plv AS (SELECT user_id, nch,
            sqrt(pow(list_sum(list_transform(range(1, ml + 1), t ->
                   cos(phs[1][t] - phs[2][t]))) / ml, 2)
               + pow(list_sum(list_transform(range(1, ml + 1), t ->
                   sin(phs[1][t] - phs[2][t]))) / ml, 2)) AS p1,
            sqrt(pow(list_sum(list_transform(range(1, ml + 1), t ->
                   cos(phs[1][t] - phs[3][t]))) / ml, 2)
               + pow(list_sum(list_transform(range(1, ml + 1), t ->
                   sin(phs[1][t] - phs[3][t]))) / ml, 2)) AS p2
          FROM ph)
SELECT user_id, round(p1, 6) AS phase_lock_val_p1,
       round(p2, 6) AS phase_lock_val_p2
FROM plv WHERE nch >= 3 ORDER BY user_id"""
    return o


# ---- embedding family ------------------------------------------------------

def splitmix_gaussians(seed, count):
    """SplitMix64 + Box-Muller with spare caching — mirrors gen.SplitMix64
    nextGaussian exactly (validated against the Scala stream)."""
    import math as _m
    MASK = (1 << 64) - 1
    state = seed
    spare = [None]

    def next_long():
        nonlocal state
        state = (state + 0x9e3779b97f4a7c15) & MASK
        z = state
        z = ((z ^ (z >> 30)) * 0xbf58476d1ce4e5b9) & MASK
        z = ((z ^ (z >> 27)) * 0x94d049bb133111eb) & MASK
        return z ^ (z >> 31)

    def next_double():
        return (next_long() >> 11) * 1.1102230246251565e-16

    out = []
    for _ in range(count):
        if spare[0] is not None:
            out.append(spare[0])
            spare[0] = None
            continue
        u1 = next_double()
        while u1 == 0.0:
            u1 = next_double()
        u2 = next_double()
        r = _m.sqrt(-2.0 * _m.log(u1))
        spare[0] = r * _m.sin(2 * _m.pi * u2)
        out.append(r * _m.cos(2 * _m.pi * u2))
    return out


def embed_oracles():
    g = splitmix_gaussians(7, 32 * 64)
    planes = [g[i * 64:(i + 1) * 64] for i in range(32)]
    rows = ", ".join(
        f"({pid}, [{', '.join(repr(x) for x in p)}]::DOUBLE[])"
        for pid, p in enumerate(planes))
    o = {}
    o["q_embed_near_dup"] = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
planes(pid, p) AS (VALUES {rows}),
dots AS (SELECT vec_id, pid // 4 AS band,
           CASE WHEN list_sum(list_transform(range(1, 65),
                  i -> v[i] * p[i])) > 0
                THEN 1 << (pid % 4) ELSE 0 END AS bitv
         FROM e, planes),
sigs AS (SELECT vec_id, band, sum(bitv) AS bucket FROM dots GROUP BY 1, 2),
cand AS (SELECT l.vec_id AS id_a, r.vec_id AS id_b
         FROM sigs l JOIN sigs r
           ON l.band = r.band AND l.bucket = r.bucket AND l.vec_id < r.vec_id
         GROUP BY 1, 2),
sim AS (SELECT id_a, id_b,
          list_cosine_similarity(a.v, b.v) AS s
        FROM cand JOIN e a ON a.vec_id = id_a JOIN e b ON b.vec_id = id_b)
SELECT id_a, id_b, round(s, 5) AS cos_sim FROM sim
WHERE s >= 0.4 ORDER BY id_a, id_b"""

    # k-means-refined IVF: the Lloyd iteration itself is mirrored as a
    # recursive CTE (normalized sample ordered by vec_id, stride-seeded
    # init, 10 iterations, sequential per-dim sums in sample order, first-
    # index argmin tie-break) — validated bit-exact against a python
    # mirror of AnnOps.kmeansCentroids before wiring (/tmp/km_proto.py,
    # worst abs diff 0.0). Assignment/probe/top-k mirror q_ann_ivf_top3
    # with cid = centroid index.
    o["q_ann_ivf_kmeans"] = """
WITH RECURSIVE
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
samp AS (SELECT rn, CASE WHEN nrm = 0 THEN raw
                         ELSE list_transform(raw, x -> x / nrm) END AS sv
         FROM (SELECT v AS raw,
                 sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
                 row_number() OVER (ORDER BY vec_id) - 1 AS rn
               FROM e ORDER BY vec_id LIMIT 4096)),
sampagg AS (SELECT list(sv ORDER BY rn) AS allv, count(*) AS cnt FROM samp),
init AS (SELECT list_transform(range(16),
           c -> allv[(c * cnt // 16) + 1]) AS cents FROM sampagg),
km AS (
  SELECT 0 AS iter, cents FROM init
  UNION ALL
  SELECT iter + 1,
    list_transform(range(16), ci ->
      CASE WHEN cnts[ci + 1] = 0 THEN cents[ci + 1]
           ELSE list_transform(range(1, 65), j -> sums[ci + 1][j] / cnts[ci + 1])
      END) AS cents
  FROM (
    SELECT iter, cents, allv,
      list_transform(range(16), ci -> len(list_filter(bests, b -> b = ci))) AS cnts,
      list_transform(range(16), ci ->
        list_transform(range(1, 65), j ->
          list_sum(list_transform(
            list_filter(range(1, len(bests) + 1), i -> bests[i] = ci),
            i -> allv[i][j])))) AS sums
    FROM (
      SELECT iter, cents, allv,
        list_transform(dls, dl -> list_position(dl, list_min(dl)) - 1) AS bests
      FROM (
        SELECT km.iter, km.cents, sampagg.allv,
          list_transform(allv, sv ->
            list_transform(range(16), ci ->
              list_sum(list_transform(range(1, 65), j ->
                (sv[j] - cents[ci + 1][j]) * (sv[j] - cents[ci + 1][j]))))) AS dls
        FROM km, sampagg
        WHERE km.iter < 10
      )
    )
  )
),
kcent AS (SELECT ci AS cid, cents[ci + 1] AS cv
          FROM (SELECT cents FROM km WHERE iter = 10), range(16) t(ci)),
asgn AS (SELECT vec_id, v, cid,
           row_number() OVER (PARTITION BY vec_id
             ORDER BY list_cosine_similarity(v, cv) DESC, cid) AS crk
         FROM e, kcent),
corpus AS (SELECT vec_id AS nn_id, v AS nv, cid AS cell
           FROM asgn WHERE crk = 1),
queries AS (SELECT vec_id AS query_id, v AS qv, cid AS cell
            FROM asgn WHERE vec_id % 50 = 0 AND crk <= 4),
cand AS (SELECT q.query_id, c.nn_id,
           list_cosine_similarity(q.qv, c.nv) AS sim
         FROM queries q JOIN corpus c ON c.cell = q.cell
         WHERE c.nn_id <> q.query_id),
best AS (SELECT query_id, nn_id, sim,
           row_number() OVER (PARTITION BY query_id
             ORDER BY sim DESC, nn_id) AS rk
         FROM cand WHERE NOT isnan(sim))
SELECT query_id, nn_id, round(sim, 5) AS cos_sim, rk::INT AS rk
FROM best WHERE rk <= 3 ORDER BY query_id, rk"""

    o["q_ann_ivf_top1"] = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (SELECT vec_id AS cid, v AS cv FROM e
          WHERE vec_id % (SELECT greatest(count(*) // 16, 1) FROM e) = 0
          ORDER BY vec_id LIMIT 16),
asgn AS (SELECT vec_id, v, cid,
           row_number() OVER (PARTITION BY vec_id
             ORDER BY list_cosine_similarity(v, cv) DESC, cid) AS rk
         FROM e, cents),
corpus AS (SELECT vec_id AS nn_id, v AS nv, cid AS cell
           FROM asgn WHERE rk = 1),
queries AS (SELECT vec_id AS query_id, v AS qv, cid AS cell
            FROM asgn WHERE vec_id % 50 = 0 AND rk <= 4),
cand AS (SELECT q.query_id, c.nn_id,
           list_cosine_similarity(q.qv, c.nv) AS sim
         FROM queries q JOIN corpus c ON c.cell = q.cell
         WHERE c.nn_id <> q.query_id),
best AS (SELECT query_id, nn_id, sim,
           row_number() OVER (PARTITION BY query_id
             ORDER BY sim DESC, nn_id) AS rk
         FROM cand WHERE NOT isnan(sim))
SELECT query_id, nn_id, round(sim, 5) AS cos_sim FROM best WHERE rk = 1
ORDER BY query_id"""
    return o


# ---- fractal / long-memory family -----------------------------------------

def fractal_oracles():
    o = {}
    # higuchi_fd, kmax=10: reference's own j in [1, nMax) loop, ll scaled by
    # (n-1)/(k*nMax); slope via the (n*sxy - sx*sy)/(n*sx2 - sx^2) lstsq
    o["q_higuchi_fd"] = """
WITH g AS (SELECT user_id, list(value ORDER BY ts, event_id) AS l
        FROM events GROUP BY user_id HAVING count(*) >= 8),
  m AS (SELECT user_id, l, len(l) AS n FROM g),
  reg AS (SELECT user_id, n,
            list_transform(range(1, 11), k -> ln(1.0 / k)) AS xr,
            list_transform(range(1, 11), k ->
              ln(list_sum(list_transform(range(0, k), mm ->
                   coalesce(list_sum(list_transform(
                       range(1, (n - mm - 1) // k), j ->
                     abs(l[mm + j * k + 1] - l[mm + (j - 1) * k + 1]))), 0.0)
                   / k * ((n - 1)::DOUBLE / (k * ((n - mm - 1) // k)))))
                 / k)) AS yr
          FROM m WHERE n >= 32),
  s AS (SELECT user_id,
          list_sum(list_transform(range(1, 11), i -> xr[i] * xr[i])) AS sx2,
          list_sum(xr) AS sx, list_sum(yr) AS sy,
          list_sum(list_transform(range(1, 11), i -> xr[i] * yr[i])) AS sxy
        FROM reg)
SELECT g2.user_id,
  round((10 * sxy - sx * sy) / (10 * sx2 - sx * sx), 6) AS higuchi_fd
FROM g g2 LEFT JOIN s ON s.user_id = g2.user_id ORDER BY g2.user_id"""

    # hurst_exp (minLen 64): 20 log2-spaced split sizes in [16, n/2],
    # per-split mean R/S with the Anis-Lloyd correction, lstsq slope of
    # ln(split) vs corrected ln(mean R/S)
    o["q_hurst_exp"] = """
WITH g AS (SELECT user_id, list(value ORDER BY ts, event_id) AS l
        FROM events GROUP BY user_id HAVING count(*) >= 8),
  m AS (SELECT user_id, l, len(l) AS n FROM g),
  sp AS (SELECT user_id, l, n,
           list_sort(list_distinct(list_transform(range(0, 20), i ->
             floor(pow(2.0, 4.0 + (ln(n / 2.0) / ln(2.0) - 4.0) * i / 19.0))
               ::BIGINT))) AS splits
         FROM m WHERE n >= 64),
  blk AS (SELECT user_id, t1.nb AS nb, t2.b AS b,
            l[t2.b * t1.nb + 1 : t2.b * t1.nb + t1.nb] AS sub
          FROM sp, unnest(sp.splits) AS t1(nb),
               unnest(range(0, sp.n // t1.nb)) AS t2(b)),
  pb AS (SELECT user_id, nb, b, sub,
           list_transform(range(1, nb + 1), q -> list_sum(sub[1:q])) AS ps
         FROM blk),
  zb AS (SELECT user_id, nb, b, sub, ps,
           list_transform(range(1, nb + 1),
             q -> ps[q] - q * (ps[nb] / nb)) AS z
         FROM pb),
  rsb AS (SELECT user_id, nb, b,
            list_transform(range(1, nb), k ->
              CASE WHEN sqrt(list_sum(list_transform(range(1, k + 2), q ->
                     pow(sub[q] - ps[k + 1] / (k + 1), 2))) / k) = 0
              THEN NULL ELSE
                (list_max(z[1:k + 1]) - list_min(z[1:k + 1]))
                / sqrt(list_sum(list_transform(range(1, k + 2), q ->
                    pow(sub[q] - ps[k + 1] / (k + 1), 2))) / k)
              END) AS rsl
          FROM zb),
  rsu AS (SELECT user_id, nb,
            list_filter(flatten(list(rsl ORDER BY b)), v -> v IS NOT NULL)
              AS rsv
          FROM rsb GROUP BY user_id, nb),
  regrow AS (SELECT user_id, nb, ln(nb::DOUBLE) AS xr,
               ln(list_sum(rsv) / len(rsv))
               - (ln((CASE WHEN nb <= 340
                      THEN exp(lgamma((nb - 1) / 2.0) - lgamma(nb / 2.0))
                           / sqrt(pi())
                      ELSE ((nb - 0.5) / nb)
                           * (1.0 / sqrt(pi() * nb / 2.0)) END)
                     * ((nb - 0.5) / nb)
                     * list_sum(list_transform(range(1, nb), i ->
                         sqrt((nb - i)::DOUBLE / i))))
                  - ln(nb::DOUBLE) / 2.0) AS yr
             FROM rsu),
  reg AS (SELECT user_id, list(xr ORDER BY nb) AS xr,
                 list(yr ORDER BY nb) AS yr
          FROM regrow GROUP BY user_id),
  s AS (SELECT user_id, len(xr) AS np,
          list_sum(list_transform(range(1, len(xr) + 1), i -> xr[i] * xr[i]))
            AS sx2,
          list_sum(xr) AS sx, list_sum(yr) AS sy,
          list_sum(list_transform(range(1, len(xr) + 1), i -> xr[i] * yr[i]))
            AS sxy
        FROM reg)
SELECT g2.user_id,
  round((np * sxy - sx * sy) / (np * sx2 - sx * sx), 6) AS hurst_exp
FROM g g2 LEFT JOIN s ON s.user_id = g2.user_id ORDER BY g2.user_id"""
    return o


# ---- wavelet family (db4 Mallat cascade, symmetric extension) --------------

DB4_LO = [-0.010597401784997278, 0.032883011666982945, 0.030841381835986965,
          -0.18703481171888114, -0.02798376941698385, 0.6308807679295904,
          0.7148465705525415, 0.23037781330885523]
DB4_HI = [(-1 if k % 2 == 0 else 1) * DB4_LO[7 - k] for k in range(8)]


def dwt_expr(src, srclen, coeffs):
    """One DWT output list: out[i] = sum_k h[k]*src[sym(2i+1-k)], i < (n+7)//2.
    Unrolled k=0..7 so the accumulation order matches the kernel loop."""
    terms = []
    for k in range(8):
        e = f"(2 * i + 1 - {k})"
        idx0 = f"((({e}) % (2 * {srclen}) + 2 * {srclen}) % (2 * {srclen}))"
        idx = (f"(CASE WHEN {idx0} < {srclen} THEN {idx0} "
               f"ELSE 2 * {srclen} - 1 - {idx0} END)")
        terms.append(f"({coeffs[k]!r}) * {src}[{idx} + 1]")
    body = " + ".join(terms)
    return f"list_transform(range(0, ({srclen} + 7) // 2), i -> {body})"


def wavelet_oracles():
    o = {}
    energy = "list_sum(list_transform({c}, x -> x * x))"
    # query outputs the two finest detail energies (cD1, cD2) — depth-
    # independent for the n >= 49 signals at this SF (lev >= 2)
    o["q_wavelet_coef_energy"] = f"""
WITH g AS (SELECT user_id, list(value ORDER BY ts, event_id) AS l
        FROM events GROUP BY user_id HAVING count(*) >= 8),
  m AS (SELECT user_id, l, len(l) AS n FROM g),
  l1 AS (SELECT user_id, n, (n + 7) // 2 AS n1,
           {dwt_expr('l', 'n', DB4_LO)} AS a1,
           {dwt_expr('l', 'n', DB4_HI)} AS d1
         FROM m),
  l2 AS (SELECT user_id, n1,
           {dwt_expr('a1', 'n1', DB4_HI)} AS d2,
           {energy.format(c='d1')} AS e1
         FROM l1)
SELECT user_id, round(e1, 6) AS d1_energy,
  round({energy.format(c='d2')}, 6) AS d2_energy
FROM l2 ORDER BY user_id"""

    # teager_kaiser_energy elements 1,2 = [mean, std] of the TK operator on
    # the DEEPEST approximation cA_lev; lev = trunc(ln(n/7)/ln 2) in {2,3}
    # for this SF's lengths
    tk = ("list_transform(range(2, len({c})), j -> "
          "{c}[j] * {c}[j] - {c}[j - 1] * {c}[j + 1])")
    o["q_teager_kaiser_energy"] = f"""
WITH g AS (SELECT user_id, list(value ORDER BY ts, event_id) AS l
        FROM events GROUP BY user_id HAVING count(*) >= 8),
  m AS (SELECT user_id, l, len(l) AS n,
          least(CAST(trunc(ln(len(l) / 7.0) / ln(2.0)) AS INT), 6) AS lev
        FROM g),
  l1 AS (SELECT user_id, n, lev, (n + 7) // 2 AS n1,
           {dwt_expr('l', 'n', DB4_LO)} AS a1
         FROM m),
  l2 AS (SELECT user_id, lev, n1, (n1 + 7) // 2 AS n2,
           {dwt_expr('a1', 'n1', DB4_LO)} AS a2
         FROM l1),
  l3 AS (SELECT user_id, lev, n2,
           CASE WHEN lev >= 3 THEN {dwt_expr('a2', 'n2', DB4_LO)}
                ELSE a2 END AS ca
         FROM l2),
  tk AS (SELECT user_id, {tk.format(c='ca')} AS t FROM l3),
  st AS (SELECT user_id, t, len(t) AS nt, list_sum(t) / len(t) AS mu FROM tk)
SELECT user_id, round(mu, 6) AS l0_mean,
  round(sqrt(list_sum(list_transform(t, x -> (x - mu) * (x - mu)))
             / (nt - 1)), 6) AS l0_std
FROM st ORDER BY user_id"""
    return o


# ---- energy_freq_bands (firwin design + zero-phase reflect convolution) ----

def firwin_oracle():
    # r3: taps are generated HERE with a pure-python mirror of the mne
    # composite firwin design (auto transition bandwidths, auto odd length
    # N = round(3.3*sfreq/min_trans), one hamming-windowed-sinc lowpass per
    # gain transition at its own odd length, centered; unit DC gain per
    # sub-lowpass) and inlined as literals; the SQL replicates the
    # zero-phase application (reflect_limited padding, full convolution,
    # (L-1)//2 delay compensation) and the band energy. Summation order
    # mirrors core/Firwin.scala exactly (sequential, k ascending).
    import math as _m

    def firwin_lowpass(numtaps, fc):
        m = numtaps - 1
        h = []
        s = 0.0
        for i in range(numtaps):
            k = i - m // 2
            sinc = fc if k == 0 else _m.sin(_m.pi * fc * k) / (_m.pi * k)
            w = 0.54 - 0.46 * _m.cos(2 * _m.pi * i / m)
            v = sinc * w
            h.append(v)
            s += v
        return [v / s for v in h]

    def design(sfreq, flo, fhi):
        nyq = sfreq / 2.0
        tlo = min(max(0.25 * flo, 2.0), flo)
        thi = min(max(0.25 * fhi, 2.0), nyq - fhi)
        n = max(int(round(3.3 * sfreq / min(tlo, thi))), 1)
        if n % 2 == 0:
            n += 1
        h = [0.0] * n

        def add(sign, cutoff, trans):
            tn = int(round(3.3 / trans))
            tn += 1 - tn % 2
            assert tn <= n, (tn, n)
            lp = firwin_lowpass(tn, cutoff)
            off = (n - tn) // 2
            for i, v in enumerate(lp):
                h[off + i] += sign * v

        fp2, fs2 = fhi / nyq, min((fhi + thi) / nyq, 1.0)
        add(1.0, (fp2 + fs2) / 2.0, (fs2 - fp2) / 2.0)
        fp1, fs1 = flo / nyq, max((flo - tlo) / nyq, 0.0)
        add(-1.0, (fp1 + fs1) / 2.0, (fp1 - fs1) / 2.0)
        return h

    def taps_sql(h):
        return "[" + ", ".join(repr(float(v)) for v in h) + "]::DOUBLE[]"

    band_tpl = """
  x{tag} AS (SELECT user_id, n, d, {taps} AS h FROM dv),
  p{tag} AS (SELECT user_id, n, d, h, len(h) AS L,
               least(len(h), n) - 1 AS ne FROM x{tag}),
  ex{tag} AS (SELECT user_id, n, h, L, ne,
               list_transform(range(0, n + 2 * ne), j ->
                 CASE WHEN j < ne THEN
                   (CASE WHEN ne - j <= n - 1
                         THEN 2 * d[1] - d[ne - j + 1] ELSE 0.0 END)
                 WHEN j < ne + n THEN d[j - ne + 1]
                 ELSE (CASE WHEN j - ne - n + 1 <= n - 1
                       THEN 2 * d[n] - d[n - (j - ne - n + 1)]
                       ELSE 0.0 END) END) AS ext
              FROM p{tag}),
  e{tag} AS (SELECT user_id,
      round(list_sum(list_transform(range(0, n), t ->
        pow(list_sum(list_transform(range(0, L), k ->
          CASE WHEN ne + (L - 1) // 2 + t - k >= 0
                AND ne + (L - 1) // 2 + t - k < n + 2 * ne
               THEN h[k + 1] * ext[ne + (L - 1) // 2 + t - k + 1]
               ELSE 0.0 END)), 2))), 6) AS band{tag}
    FROM ex{tag})
"""

    def mk(tag, flo, fhi):
        h = design(256.0, flo, fhi)
        return band_tpl.replace("{tag}", tag).replace("{taps}", taps_sql(h))

    sql = f"""
WITH g AS (SELECT user_id, list(value ORDER BY ts, event_id) AS l
        FROM events GROUP BY user_id HAVING count(*) >= 8),
  m AS (SELECT user_id, l, len(l) AS n FROM g),
  dv AS (SELECT user_id, n, list_transform(range(1, n + 1), i ->
           l[least(i + 1, n)] - l[greatest(i - 1, 1)]) AS d
         FROM m),
  {mk('0', 0.5, 4.0).strip().rstrip(',')},
  {mk('4', 30.0, 100.0).strip().rstrip(',')}
SELECT e0.user_id, e0.band0, e4.band4
FROM e0 JOIN e4 ON e0.user_id = e4.user_id ORDER BY e0.user_id"""
    return {"q_energy_freq_bands": sql}


# ---- nonlin_interdep (kNN ratio statistic over delay embeddings) -----------

def nonlin_oracle():
    sqd = ("list_sum(list_transform(range(1, 11), q -> "
           "({a}[q] - {b}[q]) * ({a}[q] - {b}[q])))")
    emb = ("list_transform(range(0, m), i -> "
           "list_transform(range(0, 10), k -> cs[{c}][i + k * tau + 1]))")
    knn = ("list_transform(range(0, m), j -> "
           "list_transform(list_sort(list_transform(range(0, m), i -> "
           "{'d': " + sqd.format(a="{e}[j + 1]", b="{e}[i + 1]") + ", 'i': i}"
           "))[1:5], s -> s.i))")
    # r{XY} = sum_j sum_k sqdist(eX[j], eX[knnY[j][k]])
    r = ("list_sum(flatten(list_transform(range(0, m), j -> "
         "list_transform(range(1, 6), k -> "
         + sqd.format(a="{e}[j + 1]", b="{e}[{idx}[j + 1][k] + 1]") + "))))")

    def pair(e1, e2, i1, i2):
        rx = r.replace("{e}", e1).replace("{idx}", i1)
        rxy = r.replace("{e}", e1).replace("{idx}", i2)
        ry = r.replace("{e}", e2).replace("{idx}", i2)
        ryx = r.replace("{e}", e2).replace("{idx}", i1)
        return f"({rx}) / ({rxy}) + ({ry}) / ({ryx})"

    sql = f"""
WITH {BIV_BASE.strip()},
  par AS (SELECT user_id, cs, nch, ml,
            least(2, (ml - 1) // 9) AS tau,
            ml - 9 * least(2, (ml - 1) // 9) AS m
          FROM chans WHERE ml - 9 * least(2, (ml - 1) // 9) > 5),
  embs AS (SELECT user_id, nch, m,
             {emb.format(c=1)} AS e1,
             {emb.format(c=2)} AS e2,
             {emb.format(c=3)} AS e3
           FROM par),
  knns AS (SELECT user_id, nch, m, e1, e2, e3,
             {knn.replace('{e}', 'e1')} AS k1,
             {knn.replace('{e}', 'e2')} AS k2,
             {knn.replace('{e}', 'e3')} AS k3
           FROM embs),
  vals AS (SELECT user_id, nch,
             {pair('e1', 'e2', 'k1', 'k2')} AS p1,
             {pair('e1', 'e3', 'k1', 'k3')} AS p2
           FROM knns)
SELECT user_id, round(p1, 6) AS nonlin_interdep_p1,
       round(p2, 6) AS nonlin_interdep_p2
FROM vals WHERE nch >= 3 ORDER BY user_id"""
    return {"q_biv_nonlin_interdep": sql}


# ---- SVD-embedding features: bit-exact cyclic Jacobi as a recursive CTE ----
# One (p,q) rotation per recursion step, 45 steps per sweep, kernel's
# convergence test (off-diagonal L1 vs 1e-14*(1+frobenius)) checked at each
# sweep boundary. Every arithmetic op mirrors Eig.symEigenvalues, so the
# eigenvalues are bit-identical, not just close.

def svd_oracles():
    A = "a[({i}) * 10 + ({j}) + 1]"

    def at(i, j):
        return A.replace("{i}", i).replace("{j}", j)

    i_ = "(x // 10)"
    j_ = "(x % 10)"
    bpj = (f"(CASE WHEN {j_} = p THEN c * {at('p', 'p')} - s * {at('p', 'q')} "
           f"WHEN {j_} = q THEN s * {at('p', 'p')} + c * {at('p', 'q')} "
           f"ELSE {at('p', j_)} END)")
    bqj = (f"(CASE WHEN {j_} = p THEN c * {at('q', 'p')} - s * {at('q', 'q')} "
           f"WHEN {j_} = q THEN s * {at('q', 'p')} + c * {at('q', 'q')} "
           f"ELSE {at('q', j_)} END)")
    rot = (f"CASE WHEN skip THEN a[x + 1] "
           f"WHEN {i_} = p THEN c * {bpj} - s * {bqj} "
           f"WHEN {i_} = q THEN s * {bpj} + c * {bqj} "
           f"WHEN {j_} = p THEN c * {at(i_, 'p')} - s * {at(i_, 'q')} "
           f"WHEN {j_} = q THEN s * {at(i_, 'p')} + c * {at(i_, 'q')} "
           f"ELSE a[x + 1] END")
    offd = ("list_sum(list_transform(range(0, 100), x -> "
            "CASE WHEN x // 10 = x % 10 THEN 0.0 ELSE abs(a[x + 1]) END))")
    pq_rows = ", ".join(f"({r}, {p}, {q})" for r, (p, q) in enumerate(
        [(p, q) for p in range(9) for q in range(p + 1, 10)]))

    base = f"""
  g AS (SELECT user_id, list(value ORDER BY ts, event_id) AS l
        FROM events GROUP BY user_id HAVING count(*) >= 8),
  par AS (SELECT user_id, l, len(l) AS n,
            least(2, (len(l) - 1) // 9) AS tau,
            len(l) - 9 * least(2, (len(l) - 1) // 9) AS m
          FROM g WHERE len(l) >= 16),
  init AS (SELECT user_id,
             list_transform(range(0, 100), x ->
               list_sum(list_transform(range(0, m), i ->
                 l[i + (x // 10) * tau + 1] * l[i + (x % 10) * tau + 1])))
               AS a
           FROM par),
  tl AS (SELECT user_id, a,
           1e-14 * (1.0 + sqrt(list_sum(list_transform(a, v -> v * v))))
             AS tol
         FROM init),
  pq(r, p, q) AS (VALUES {pq_rows}),
  rec AS (
    SELECT user_id, 0::BIGINT AS it, a, tol FROM tl
    UNION ALL
    SELECT user_id, it + 1,
      list_transform(range(0, 100), x -> {rot}), tol
    FROM (
      SELECT t3.*, tt * c AS s FROM (
        SELECT t2.*, 1.0 / sqrt(tt * tt + 1.0) AS c FROM (
          SELECT t1.*,
            CASE WHEN theta = 0.0 THEN 1.0 ELSE
              (CASE WHEN theta > 0 THEN 1.0 WHEN theta < 0 THEN -1.0
                    ELSE 0.0 END)
              / (abs(theta) + sqrt(theta * theta + 1.0)) END AS tt
          FROM (
            SELECT rec.user_id, rec.it, rec.a, rec.tol, pq.p, pq.q,
              ({at('pq.p', 'pq.q')} = 0.0) AS skip,
              CASE WHEN {at('pq.p', 'pq.q')} = 0.0 THEN 0.0
                   ELSE ({at('pq.q', 'pq.q')} - {at('pq.p', 'pq.p')})
                        / (2.0 * {at('pq.p', 'pq.q')}) END AS theta
            FROM rec, pq
            WHERE pq.r = rec.it % 45 AND rec.it < 4500
              AND (rec.it % 45 <> 0 OR {offd} > rec.tol)
          ) t1) t2) t3) t4),
  fin AS (SELECT user_id, max_by(a, it) AS a FROM rec GROUP BY user_id),
  sv AS (SELECT user_id,
           list_transform(list_sort(list_transform(range(0, 10),
             i -> a[i * 11 + 1]), 'DESC'), v -> sqrt(greatest(v, 0.0))) AS sg
         FROM fin),
  prob AS (SELECT user_id, list_transform(sg, v -> v / list_sum(sg)) AS p
           FROM sv)
"""

    o = {}
    o["q_svd_entropy"] = f"""
WITH RECURSIVE {base.strip()}
SELECT g2.user_id,
  round(-list_sum(list_transform(prob.p,
    v -> v * (ln(v) / ln(2.0)))), 6) AS svd_entropy
FROM g g2 LEFT JOIN prob ON prob.user_id = g2.user_id ORDER BY g2.user_id"""
    o["q_svd_fisher_info"] = f"""
WITH RECURSIVE {base.strip()}
SELECT g2.user_id,
  round(list_sum(list_transform(range(1, 10), i ->
    (prob.p[i + 1] - prob.p[i]) * (prob.p[i + 1] - prob.p[i]) / prob.p[i])),
    6) AS svd_fisher_info
FROM g g2 LEFT JOIN prob ON prob.user_id = g2.user_id ORDER BY g2.user_id"""
    return o


# ---- multitaper spectral entropy (fixed n=64 prefix) -----------------------

def dpss_numpy(n=64, half_nbw=4.0, n_tapers=7):
    """DPSS via the same tridiagonal route as core/Dpss.scala; numpy eigh
    agrees with the Jacobi solve to ~1e-12 per component, far below the
    round(,6) gate."""
    import numpy as np
    w = half_nbw / n
    t = np.arange(n)
    diag = ((n - 1 - 2.0 * t) / 2.0) ** 2 * np.cos(2 * np.pi * w)
    off = (t[:-1] + 1) * (n - 1.0 - t[:-1]) / 2.0
    mat = np.diag(diag) + np.diag(off, 1) + np.diag(off, -1)
    vals, vecs = np.linalg.eigh(mat)
    order = np.argsort(vals)[::-1][:n_tapers]
    tapers = []
    for idx in order:
        v = vecs[:, idx]
        if v.sum() < 0 if abs(v.sum()) > 1e-10 else v[np.nonzero(v)[0][0]] < 0:
            v = -v
        tapers.append(v / np.sqrt((v * v).sum()))
    i = np.arange(n)
    dij = i[:, None] - i[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        A = np.where(dij == 0, 2.0 * w,
                     np.sin(2 * np.pi * w * dij) / (np.pi * dij))
    lams = [float(v @ A @ v) for v in tapers]
    keep = [k for k, l in enumerate(lams) if l > 0.9] or [0]
    return [list(map(float, tapers[k])) for k in keep], [lams[k] for k in keep]


def multitaper_oracle(n=64, outcol="spect_entropy_mt",
                      qname="q_spect_entropy_mt"):
    tapers, lams = dpss_numpy(n=n)
    rows = ", ".join(
        f"({k}, [{', '.join(repr(x) for x in tp)}]::DOUBLE[], {lams[k]!r})"
        for k, tp in enumerate(tapers))
    half = n // 2  # Nyquist bin index for even n
    sql = f"""
WITH g AS (SELECT user_id, list(value ORDER BY ts, event_id) AS l0
        FROM events GROUP BY user_id HAVING count(*) >= {n}),
  m AS (SELECT user_id, l0[1:{n}] AS l FROM g),
  tap(tk, tp, lam) AS (VALUES {rows}),
  xt AS (SELECT user_id, tk, lam,
           list_transform(range(1, {n + 1}), j -> l[j] * tp[j]) AS w
         FROM m, tap),
  sp AS (SELECT user_id, fq.k AS k,
           sum(lam * (pow(list_sum(list_transform(range(1, {n + 1}), j ->
                 w[j] * cos(2 * pi() * (j - 1) * fq.k / {n}))), 2)
               + pow(list_sum(list_transform(range(1, {n + 1}), j ->
                 w[j] * sin(2 * pi() * (j - 1) * fq.k / {n}))), 2))) AS acc
         FROM xt, (SELECT unnest(range(0, {half + 1})) AS k) fq
         GROUP BY user_id, fq.k),
  psd AS (SELECT user_id, k,
            acc / (256.0 * (SELECT sum(lam) FROM tap))
              * (CASE WHEN k = 0 OR k = {half} THEN 1.0 ELSE 2.0 END) AS p
          FROM sp),
  tot AS (SELECT user_id, sum(p) AS m0 FROM psd GROUP BY user_id),
  e AS (SELECT psd.user_id,
          -sum((p / m0) * (ln(p / m0) / ln(2.0)))
            FILTER (WHERE k >= 1) AS v
        FROM psd JOIN tot ON psd.user_id = tot.user_id
        GROUP BY psd.user_id)
SELECT user_id, round(v, 6) AS {outcol} FROM e ORDER BY user_id"""
    return {qname: sql}


def mt_adaptive_oracle(n=64, outcol="spect_entropy_mt_adaptive",
                       qname="q_spect_entropy_mt_adaptive"):
    """Adaptive (Thomson-weighted) multitaper spectral entropy: same DPSS
    literals + DFT eigenspectra as multitaper_oracle, then the iterative
    adaptive weighting of core/Psd.scala (Percival & Walden eq. 370)
    mirrored as a recursive CTE — element-wise list arithmetic per
    iteration, per-user convergence at max rel change <= 1e-10, hard cap
    150, matching the Scala loop's order of operations (an off-by-one
    iteration near the fixed point moves the result ~1e-10 relative,
    far below the round(,6) gate)."""
    tapers, lams = dpss_numpy(n=n)
    ntap = len(tapers)
    rows = ", ".join(
        f"({k}, [{', '.join(repr(x) for x in tp)}]::DOUBLE[], {lams[k]!r})"
        for k, tp in enumerate(tapers))
    half = n // 2
    nb = half + 1  # number of one-sided bins
    wgt = (f"pow(sold[i] / (lams[k] * sold[i] + (1 - lams[k]) * s2), 2)"
           f" * lams[k]")
    sql = f"""
WITH RECURSIVE g AS (SELECT user_id, list(value ORDER BY ts, event_id) AS l0
        FROM events GROUP BY user_id HAVING count(*) >= {n}),
  m AS (SELECT user_id, l0[1:{n}] AS l FROM g),
  tap(tk, tp, lam) AS (VALUES {rows}),
  xt AS (SELECT user_id, tk, lam,
           list_transform(range(1, {n + 1}), j -> l[j] * tp[j]) AS w
         FROM m, tap),
  spk AS (SELECT user_id, tk, lam,
           list_transform(range(0, {nb}), k ->
             pow(list_sum(list_transform(range(1, {n + 1}), j ->
               w[j] * cos(2 * pi() * (j - 1) * k / {n}))), 2)
           + pow(list_sum(list_transform(range(1, {n + 1}), j ->
               w[j] * sin(2 * pi() * (j - 1) * k / {n}))), 2)) AS sk
         FROM xt),
  spg AS (SELECT user_id, list(sk ORDER BY tk) AS sks,
                 list(lam ORDER BY tk) AS lams
          FROM spk GROUP BY user_id),
  v AS (SELECT user_id,
          list_sum(list_transform(l, x -> (x - mu) * (x - mu))) / {n} AS s2
        FROM (SELECT user_id, l, list_sum(l) / {n} AS mu FROM m)),
  it AS (
    SELECT spg.user_id, sks, lams, s2,
      list_transform(range(1, {nb + 1}), i -> 0.5 * (sks[1][i] + sks[2][i])) AS s,
      0 AS iter, false AS done
    FROM spg JOIN v ON spg.user_id = v.user_id
    UNION ALL
    SELECT user_id, sks, lams, s2, snew AS s, iter + 1 AS iter,
      list_max(list_transform(range(1, {nb + 1}), i ->
        abs(snew[i] - sold[i]) / greatest(sold[i], 1e-300))) <= 1e-10 AS done
    FROM (
      SELECT user_id, sks, lams, s2, iter, s AS sold,
        list_transform(range(1, {nb + 1}), i ->
          CASE WHEN list_sum(list_transform(range(1, {ntap + 1}), k ->
                 {wgt})) > 0
               THEN list_sum(list_transform(range(1, {ntap + 1}), k ->
                 {wgt} * sks[k][i]))
                  / list_sum(list_transform(range(1, {ntap + 1}), k ->
                 {wgt}))
               ELSE s[i] END) AS snew
      FROM it WHERE NOT done AND iter < 150
    ) stp),
  fin AS (SELECT user_id, s FROM it
          QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY iter DESC) = 1),
  psd AS (SELECT user_id, fq.k AS k,
            s[fq.k + 1] / 256.0
              * (CASE WHEN fq.k = 0 OR fq.k = {half} THEN 1.0 ELSE 2.0 END) AS p
          FROM fin, (SELECT unnest(range(0, {nb})) AS k) fq),
  tot AS (SELECT user_id, sum(p) AS m0 FROM psd GROUP BY user_id),
  e AS (SELECT psd.user_id,
          -sum((p / m0) * (ln(p / m0) / ln(2.0)))
            FILTER (WHERE k >= 1) AS v
        FROM psd JOIN tot ON psd.user_id = tot.user_id
        GROUP BY psd.user_id)
SELECT user_id, round(v, 6) AS {outcol} FROM e ORDER BY user_id"""
    return {qname: sql}


# ---- multimodal batch-extract gate ------------------------------------------

def multimodal_oracle():
    fnv = ("list_reduce(list_prepend(14695981039346656037::HUGEINT, "
           "list_transform(string_split(text, ''), c -> unicode(c)::HUGEINT)), "
           f"(h, c) -> (xor(h, c) * 1099511628211::HUGEINT) % {M})")
    sql = f"""
WITH b AS (SELECT doc_id AS media_id,
             (['image', 'audio', 'video'])[(doc_id % 3)::INT + 1] AS kind,
             text, length(text) AS n
           FROM documents),
  h AS (SELECT media_id, kind, n, {fnv} AS hu,
          list_sum(list_transform(string_split(text, ''),
            c -> unicode(c))) AS s
        FROM b)
SELECT media_id, kind, n::INT AS n_bytes,
  (CASE WHEN hu >= 9223372036854775808::HUGEINT THEN hu - {M}
        ELSE hu END)::BIGINT AS checksum,
  round(s::DOUBLE / n / 255.0, 6) AS brightness,
  (CASE kind WHEN 'video' THEN greatest(n // 512, 1)
             WHEN 'audio' THEN greatest(n // 64, 1)
             ELSE 1 END)::INT AS n_frames
FROM h ORDER BY media_id"""
    return {"q_multimodal_extract": sql}


# ---- driver-compare semantics (from check_oracle.py) ---------------------

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t)), \
        [cols[i] for i in order]


def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    return a == b


def compare(con, name, sql, outdir, verbose=True):
    try:
        ora = con.execute(sql)
        ora_rows = ora.fetchall()
        ora_cols = [d[0] for d in ora.description]
    except Exception as e:
        print(f"ERR  {name}: oracle failed: {type(e).__name__} {e}")
        return False
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"ERR  {name}: no spark dump")
        return False
    got = con.execute(f"SELECT * FROM read_parquet({files!r})")
    got_rows = got.fetchall()
    got_cols = [d[0] for d in got.description]
    o_rows, o_cols = norm(ora_rows, ora_cols)
    g_rows, g_cols = norm(got_rows, got_cols)
    if o_cols != g_cols:
        print(f"FAIL {name}: schema {g_cols} != {o_cols}")
        return False
    if len(o_rows) != len(g_rows):
        print(f"FAIL {name}: rows {len(g_rows)} != {len(o_rows)}")
        return False
    for i, (orow, grow) in enumerate(zip(o_rows, g_rows)):
        if not all(eq(g, o) for g, o in zip(grow, orow)):
            print(f"FAIL {name}: row {i}\n  got    {grow}\n  oracle {orow}")
            return False
    print(f"PASS {name}: {len(g_rows)} rows (exact)")
    return True


TABLES = ['events', 'documents', 'embeddings']


def main(sfdir, outdir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    ok = True
    allo = {**oracles(), **spectral_oracles(), **entropy_oracles(),
            **bivariate_oracles(), **embed_oracles(), **fractal_oracles(),
            **wavelet_oracles(), **firwin_oracle(), **nonlin_oracle(),
            **svd_oracles(), **multitaper_oracle(),
            **multitaper_oracle(n=72, outcol="spect_entropy_mt72",
                                qname="q_spect_entropy_mt72"),
            **mt_adaptive_oracle(),
            **multimodal_oracle()}
    for name, sql in allo.items():
        if only and name not in only:
            continue
        ok = compare(con, name, sql, outdir) and ok
    return 0 if ok else 1


def emit_scala(path):
    allo = {**oracles(), **spectral_oracles(), **entropy_oracles(),
            **bivariate_oracles(), **embed_oracles(), **fractal_oracles(),
            **wavelet_oracles(), **firwin_oracle(), **nonlin_oracle(),
            **svd_oracles(), **multitaper_oracle(),
            **multitaper_oracle(n=72, outcol="spect_entropy_mt72",
                                qname="q_spect_entropy_mt72"),
            **mt_adaptive_oracle(),
            **multimodal_oracle()}
    with open(path, "w") as f:
        f.write("package graft\n\n")
        f.write("/** DuckDB oracle SQL for the round-2 gated queries —\n")
        f.write("  * GENERATED by tools/oracles_r2.py (the validated\n")
        f.write("  * prototypes; regenerate there, do not hand-edit).\n")
        f.write("  * Every entry was verified EXACT against the Spark\n")
        f.write("  * dump at sf0.01 before being wired in.\n")
        f.write("  */\n")
        f.write("object OracleSql {\n")
        f.write("  val sql: Map[String, String] = Map(\n")
        items = sorted(allo.items())
        for idx, (name, sql) in enumerate(items):
            assert '"""' not in sql and "\\" not in sql, name
            sep = "," if idx < len(items) - 1 else ""
            f.write(f'    "{name}" ->\n      """{sql.strip()}"""{sep}\n')
        f.write("  )\n}\n")
    print(f"wrote {path} ({len(allo)} oracles)")


if __name__ == "__main__":
    if sys.argv[1] == "--emit-scala":
        emit_scala(sys.argv[2])
        sys.exit(0)
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3:]) if len(sys.argv) > 3 else None))

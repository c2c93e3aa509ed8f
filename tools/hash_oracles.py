"""Prototype + validator for the SQL-replicated hash family
(fingerprint / simhash / minhash / shingles). The Python functions mirror
the Scala kernels (TextHashExprs.scala) bit for bit; the SQL fragments
mirror them in DuckDB; this script cross-checks all three on real docs.

Run: python3 tools/hash_oracles.py [sfdir]
"""
import sys
import duckdb

M64 = 1 << 64
MASK = M64 - 1


def to_signed(u):
    return u - M64 if u >= (1 << 63) else u


def fnv_mix(s):
    """ShinglesExpr.fnv / SimHash64 token hash: FNV-1a 64 + murmur finalizer."""
    h = 0xcbf29ce484222325
    for ch in s:
        h ^= ord(ch)
        h = (h * 0x100000001b3) & MASK
    h ^= h >> 33
    h = (h * 0xff51afd7ed558ccd) & MASK
    h ^= h >> 33
    return h  # unsigned


def shingles(text, n=3):
    words = [w for w in text.lower().strip().split() if w]
    m = max(len(words) - n + 1, 0)
    if words and m == 0:
        out = [fnv_mix(" ".join(words))]
    else:
        out = [fnv_mix(" ".join(words[i:i + n])) for i in range(m)]
    return sorted(set(out))


class SplitMix64:
    def __init__(self, seed):
        self.state = seed

    def next_long(self):
        self.state = (self.state + 0x9e3779b97f4a7c15) & MASK
        z = self.state
        z = ((z ^ (z >> 30)) * 0xbf58476d1ce4e5b9) & MASK
        z = ((z ^ (z >> 27)) * 0x94d049bb133111eb) & MASK
        return to_signed(z ^ (z >> 31))


P31 = 2147483647  # MinHashExpr.Prime


def minhash_coefs(k=64, seed=42):
    rng = SplitMix64(seed)
    a = [abs(rng.next_long()) % (P31 - 1) + 1 for _ in range(k)]
    b = [abs(rng.next_long()) % P31 for _ in range(k)]
    return a, b


def minhash_sig(sh_unsigned, a, b):
    """MinHashExpr over signed shingle hashes."""
    out = [ (1 << 63) - 1 ] * len(a)
    for u in sh_unsigned:
        s = to_signed(u)
        h = ((s % P31) + P31) % P31
        for j in range(len(a)):
            v = (a[j] * h + b[j]) % P31
            if v < out[j]:
                out[j] = v
    return out


def simhash64(text):
    votes = [0] * 64
    for tok in text.lower().strip().split():
        if not tok:
            continue
        h = fnv_mix(tok)
        for bit in range(64):
            votes[bit] += 1 if (h >> bit) & 1 else -1
    sig = 0
    for bit in range(64):
        if votes[bit] > 0:
            sig |= 1 << bit
    return to_signed(sig)


FP_P = 2147483629
FP_B = 131


def fingerprint(text):
    h = 0
    for tok in text.strip().split():
        if not tok:
            continue
        wh = to_signed(fnv_mix(tok))
        wp = ((wh % FP_P) + FP_P) % FP_P
        h = (h * FP_B + wp) % FP_P
    return h


# ---------------- SQL fragments (DuckDB) ---------------------------------
# fnv+mix of a word expression W (VARCHAR, ASCII) as HUGEINT in [0, 2^64):
# FNV loop via list_reduce over [seed] ++ char codes; finalizer inlined with
# the split multiply for the 64-bit constant 0xff51afd7ed558ccd.
M = "18446744073709551616::HUGEINT"  # 2^64

def sql_fnv(w):
    """SQL expr: FNV-1a 64 of word w (no finalizer), HUGEINT in [0,2^64)."""
    return (f"list_reduce(list_prepend(14695981039346656037::HUGEINT, "
            f"list_transform(string_split({w}, ''), c -> unicode(c)::HUGEINT)), "
            f"(h, c) -> (xor(h, c) * 1099511628211::HUGEINT) % {M})")

def sql_mix(h):
    """SQL expr: murmur finalizer of HUGEINT h in [0,2^64)."""
    step1 = f"xor({h}, ({h}) >> 33)"
    # (a * 0xff51afd7ed558ccd) mod 2^64, split: hi=4283543511 lo=3981806797
    mul = (f"((({step1}) * 3981806797::HUGEINT) % {M} + "
           f"(((({step1}) % 4294967296::HUGEINT) * 4283543511::HUGEINT) "
           f"% 4294967296::HUGEINT) * 4294967296::HUGEINT) % {M}")
    return f"xor(({mul}), ({mul}) >> 33)"


def sql_word_hash(w):
    return sql_mix(sql_fnv(w))


def main(sfdir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sfdir}/documents.parquet'")
    docs = con.sql("SELECT doc_id, text FROM documents ORDER BY doc_id").fetchall()

    # 1) word-hash parity on every token of the first 50 docs
    wh_sql = sql_word_hash("w")
    q = f"""
      SELECT doc_id, list_transform(string_split(trim(text), ' '),
                                    w -> {wh_sql}) AS hs
      FROM documents ORDER BY doc_id LIMIT 50"""
    rows = con.sql(q).fetchall()
    bad = 0
    for doc_id, hs in rows:
        toks = dict(zip(docs[doc_id][1].strip().split(), hs))
        for t, got in toks.items():
            if int(got) != fnv_mix(t):
                bad += 1
    print(f"word-hash parity: {'OK' if bad == 0 else f'{bad} MISMATCHES'}")

    # 2) fingerprint parity on all docs (python vs SQL)
    fp_sql = f"""
      SELECT doc_id, list_reduce(list_prepend(0::HUGEINT,
        list_transform(string_split(trim(text), ' '), w ->
          CASE WHEN ({wh_sql}) >= 9223372036854775808::HUGEINT
               THEN ((({wh_sql}) - {M}) % {FP_P} + {FP_P}) % {FP_P}
               ELSE ({wh_sql}) % {FP_P} END)),
        (h, wp) -> (h * {FP_B} + wp) % {FP_P})::BIGINT AS fp
      FROM documents ORDER BY doc_id"""
    rows = con.sql(fp_sql).fetchall()
    bad = sum(1 for (doc_id, fp) in rows
              if fp != fingerprint(docs[doc_id][1]))
    print(f"fingerprint parity: {'OK' if bad == 0 else f'{bad} MISMATCHES'}")

    # 3) simhash parity (python vs SQL): unnest words -> 64-bit votes
    sh_sql = f"""
      WITH toks AS (
        SELECT doc_id, {sql_word_hash('w')} AS h
        FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
              FROM documents)),
      bits AS (
        SELECT doc_id, b.b AS bit,
               sum(CASE WHEN (h >> b.b) % 2 = 1 THEN 1 ELSE -1 END) AS vote
        FROM toks, (SELECT unnest(range(64)) AS b) b
        GROUP BY doc_id, b.b),
      sig AS (
        SELECT doc_id, sum(CASE WHEN vote > 0
          THEN CASE WHEN bit = 63 THEN -9223372036854775808::HUGEINT
               ELSE (1::HUGEINT << bit) END ELSE 0::HUGEINT END)::BIGINT AS s
        FROM bits GROUP BY doc_id)
      SELECT doc_id, s FROM sig ORDER BY doc_id"""
    rows = con.sql(sh_sql).fetchall()
    bad = sum(1 for (doc_id, s) in rows if s != simhash64(docs[doc_id][1]))
    print(f"simhash parity: {'OK' if bad == 0 else f'{bad} MISMATCHES'}")

    # 4) shingle-set parity on first 30 docs
    shg_sql = f"""
      WITH w AS (SELECT doc_id, string_split(trim(lower(text)), ' ') AS ws
                 FROM documents),
      grams AS (
        SELECT doc_id, CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
          ELSE list_transform(range(1, len(ws) - 1),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) END AS gs
        FROM w),
      hs AS (SELECT doc_id,
               list_sort(list_distinct(list_transform(gs, g -> {sql_word_hash('g')}))) AS sh
             FROM grams)
      SELECT doc_id, sh FROM hs ORDER BY doc_id LIMIT 30"""
    rows = con.sql(shg_sql).fetchall()
    bad = 0
    for doc_id, sh in rows:
        if [int(x) for x in sh] != shingles(docs[doc_id][1]):
            bad += 1
    print(f"shingle parity: {'OK' if bad == 0 else f'{bad} MISMATCHES'}")

    # 5) minhash signature parity on first 10 docs
    a, b = minhash_coefs()
    ab_rows = ", ".join(f"({j}, {a[j]}, {b[j]})" for j in range(64))
    mh_sql = f"""
      WITH w AS (SELECT doc_id, string_split(trim(lower(text)), ' ') AS ws
                 FROM documents),
      grams AS (
        SELECT doc_id, CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
          ELSE list_transform(range(1, len(ws) - 1),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) END AS gs
        FROM w),
      hs AS (SELECT doc_id,
               list_distinct(list_transform(gs, g ->
                 CASE WHEN ({sql_word_hash('g')}) >= 9223372036854775808::HUGEINT
                      THEN ((({sql_word_hash('g')}) - {M}) % {P31} + {P31}) % {P31}
                      ELSE ({sql_word_hash('g')}) % {P31} END)) AS hmods
             FROM grams),
      coef(j, a, b) AS (VALUES {ab_rows}),
      sig AS (
        SELECT doc_id, j,
               min((a * h + b) % {P31})::BIGINT AS mh
        FROM hs, coef, unnest(hmods) AS u(h)
        GROUP BY doc_id, j)
      SELECT doc_id, list(mh ORDER BY j) FROM sig GROUP BY doc_id
      ORDER BY doc_id LIMIT 10"""
    rows = con.sql(mh_sql).fetchall()
    bad = 0
    for doc_id, sig in rows:
        expect = minhash_sig(shingles(docs[doc_id][1]), a, b)
        if [int(x) for x in sig] != expect:
            bad += 1
            if bad == 1:
                print(" first bad:", doc_id, list(sig)[:4], expect[:4])
    print(f"minhash parity: {'OK' if bad == 0 else f'{bad} MISMATCHES'}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")

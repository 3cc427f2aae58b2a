#!/usr/bin/env python3
"""Generate (and self-test) the dd2_minhash_sig DuckDB oracle SQL.

The dd2 entry's signatures are h_j = min over shingles of
XXH64.hashInt(j, XXH64.hashLong(xxhash64(shingle), 42)) — Spark's own
hash arithmetic (MinHashSigs.scala documents the structural identity
with the builtin chain). This script derandomizes the whole chain into
DuckDB SQL, sim17-style: the hash CONSTANTS (xxHash64's five primes and
the seed 42) are embedded identically in both engines and every step is
replayed in 64-bit modular arithmetic over HUGEINT, so the signature
arithmetic replays bit-exact and the entry graduates from an enforced
self-check to a full rows+schema+hash oracle.

Expression blowup is the enemy: naive nesting of mul/rotl/xor templates
is exponential (fmix alone would expand to ~20k copies of its input),
so every step lands in a NAMED lateral alias (DuckDB evaluates SELECT
aliases left-to-right) and the only lambda loop is the 32-byte stripe
fold, whose round function is xor-free and stays small. The
variable-length tail (<=3 words, <=1 four-byte chunk, <=3 bytes) is
unrolled into guarded alias steps; the 64-slot signature fold
(xxhash64(h0..h63) for the window's group key) is a recursive CTE.

Preconditions (asserted by the self-test, documented in the oracle):
ASCII-only text (byte value == codepoint via ascii()), no NULL texts —
both hold for the generated documents tables at every sf.

Usage:
  python3 tools/gen_dd2_oracle.py            # print SQL
  python3 tools/gen_dd2_oracle.py write
     # regenerate src/main/resources/graft/dd2_oracle.sql (the file the
     # engine ships as the entry's oracleSql — a resource, not a string
     # literal: the generated SQL is ~55 KB, up against the JVM's 64 KB
     # string-constant cap)
  python3 tools/gen_dd2_oracle.py test <sfDir> <verifyDump>
     # run the SQL in DuckDB against sfDir and diff with the parquet
     # dumped by graft.Verify for dd2_minhash_sig
"""
import sys

M64 = 18446744073709551616
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
SEED = 42


def mul(a, b):
    """(a * b) mod 2^64 via 32-bit split — both operands must already be
    in [0, 2^64); every partial product fits HUGEINT."""
    return (f"((({a})%4294967296)*(({b})%4294967296)"
            f" + (((({a})//4294967296)*(({b})%4294967296)"
            f" + (({a})%4294967296)*(({b})//4294967296))%4294967296)"
            f"*4294967296) % {M64}")


def add(*xs):
    return "(" + " + ".join(f"({x})" for x in xs) + f") % {M64}"


def rotl(x, r):
    return f"((({x})*{1 << r}) % {M64} + ({x})//{1 << (64 - r)})"


def shr(x, n):
    """Logical right shift via UBIGINT >> (cheaper than // on HUGEINT)."""
    return f"((({x})::UBIGINT >> {n})::HUGEINT)"


def xor(a, b):
    """64-bit xor natively on UBIGINT (values are always in [0, 2^64))."""
    return f"(xor(({a})::UBIGINT, ({b})::UBIGINT)::HUGEINT)"


def to_signed(x):
    return (f"(CASE WHEN ({x}) >= 9223372036854775808 THEN "
            f"(({x}) - {M64})::BIGINT ELSE ({x})::BIGINT END)")


def word8(bs, off):
    """Little-endian 8-byte word from 1-based list `bs` at 0-based byte
    offset `off` (an SQL expr), as HUGEINT."""
    return "(" + " + ".join(
        f"({bs})[({off})+{k + 1}]::HUGEINT*{1 << (8 * k)}"
        for k in range(8)) + ")"


def word4(bs, off):
    return "(" + " + ".join(
        f"({bs})[({off})+{k + 1}]::HUGEINT*{1 << (8 * k)}"
        for k in range(4)) + ")"


def round64_steps(p, w, acc="0"):
    """Named-alias chain for xxh64's round(acc, w); final alias {p}3."""
    return [
        (f"{p}1", mul(w, P2)),
        (f"{p}2", rotl(add(acc, f"{p}1") if acc != "0" else f"{p}1", 31)),
        (f"{p}3", mul(f"{p}2", P1)),
    ]


def fmix_steps(p, h):
    return [
        (f"{p}a", xor(h, shr(h, 33))),
        (f"{p}b", mul(f"{p}a", P2)),
        (f"{p}c", xor(f"{p}b", shr(f"{p}b", 29))),
        (f"{p}d", mul(f"{p}c", P3)),
        (f"{p}e", xor(f"{p}d", shr(f"{p}d", 32))),
    ]


def hash_bytes_steps(p):
    """Full xxh64(bytes, seed=42) over columns `bs` (1-based INT list)
    and `n` (byte length); final alias {p}fin (HUGEINT in [0,2^64))."""
    V1 = (SEED + P1 + P2) % M64
    V2 = (SEED + P2) % M64
    V3 = SEED
    V4 = (SEED - P1) % M64
    # 4-lane stripe fold: the only lambda loop; round64 is xor-free so
    # the expanded lambda stays a few KB
    def lane(i):
        a, w = f"acc[{i}]", f"x[{i}]"
        return mul(rotl(add(a, mul(w, P2)), 31), P1)
    stripes = (
        f"CASE WHEN n >= 32 THEN list_reduce(list_prepend("
        f"[{V1}::HUGEINT,{V2}::HUGEINT,{V3}::HUGEINT,{V4}::HUGEINT], "
        f"list_transform(range(0, n//32), st -> "
        f"[{word8('bs', 'st*32')},{word8('bs', 'st*32+8')},"
        f"{word8('bs', 'st*32+16')},{word8('bs', 'st*32+24')}])), "
        f"(acc, x) -> [{lane(1)},{lane(2)},{lane(3)},{lane(4)}]) "
        f"ELSE NULL END")
    steps = [(f"{p}lv", stripes),
             (f"{p}m0", add(rotl(f"{p}lv[1]", 1), rotl(f"{p}lv[2]", 7),
                            rotl(f"{p}lv[3]", 12), rotl(f"{p}lv[4]", 18)))]
    h = f"{p}m0"
    for i in (1, 2, 3, 4):
        steps += round64_steps(f"{p}mr{i}_", f"{p}lv[{i}]")
        steps += [(f"{p}mx{i}", xor(h, f"{p}mr{i}_3")),
                  (f"{p}mh{i}", add(mul(f"{p}mx{i}", P1), P4))]
        h = f"{p}mh{i}"
    steps += [
        (f"{p}off0", "CASE WHEN n >= 32 THEN (n//32)*32 ELSE 0 END"),
        (f"{p}h0", f"CASE WHEN n >= 32 THEN ({add(h, 'n')}) "
                   f"ELSE ({add(str((SEED + P5) % M64), 'n')}) END"),
    ]
    h = f"{p}h0"
    # <=3 guarded 8-byte tail words
    for i in (0, 1, 2):
        off = f"{p}off0+{8 * i}"
        steps += [(f"{p}w{i}", f"CASE WHEN {off}+8 <= n THEN "
                               f"{word8('bs', off)} ELSE NULL END")]
        steps += round64_steps(f"{p}wr{i}_", f"{p}w{i}")
        steps += [(f"{p}wx{i}", xor(h, f"{p}wr{i}_3")),
                  (f"{p}wh{i}",
                   f"CASE WHEN {off}+8 <= n THEN "
                   f"{add(mul(rotl(f'{p}wx{i}', 27), P1), P4)} "
                   f"ELSE {h} END")]
        h = f"{p}wh{i}"
    # guarded 4-byte chunk
    steps += [
        (f"{p}off4", f"{p}off0 + 8*((n - {p}off0)//8)"),
        (f"{p}q", f"CASE WHEN {p}off4+4 <= n THEN "
                  f"{word4('bs', f'{p}off4')} ELSE NULL END"),
        (f"{p}qk", mul(f"{p}q", P1)),
        (f"{p}qx", xor(h, f"{p}qk")),
        (f"{p}qh", f"CASE WHEN {p}off4+4 <= n THEN "
                   f"{add(mul(rotl(f'{p}qx', 23), P2), P3)} ELSE {h} END"),
        (f"{p}offb", f"{p}off4 + (CASE WHEN {p}off4+4 <= n "
                     f"THEN 4 ELSE 0 END)"),
    ]
    h = f"{p}qh"
    # <=3 guarded tail bytes
    for i in (0, 1, 2):
        steps += [
            (f"{p}bk{i}", f"CASE WHEN {p}offb+{i} < n THEN "
                          f"{mul(f'bs[{p}offb+{i + 1}]::HUGEINT', P5)} "
                          f"ELSE NULL END"),
            (f"{p}bx{i}", xor(h, f"{p}bk{i}")),
            (f"{p}bh{i}", f"CASE WHEN {p}offb+{i} < n THEN "
                          f"{mul(rotl(f'{p}bx{i}', 11), P1)} ELSE {h} END"),
        ]
        h = f"{p}bh{i}"
    steps += fmix_steps(f"{p}f", h)
    steps += [(f"{p}fin", f"{p}fe")]
    return steps


def hash_long_steps(p, v, seed):
    """xxh64 of one 8-byte long `v` with seed column `seed`; final
    alias {p}fin."""
    steps = [(f"{p}s0", add(seed, str(P5 + 8)))]
    steps += round64_steps(f"{p}r", v)
    steps += [(f"{p}x", xor(f"{p}s0", f"{p}r3")),
              (f"{p}h1", add(mul(rotl(f"{p}x", 27), P1), P4))]
    steps += fmix_steps(f"{p}f", f"{p}h1")
    steps += [(f"{p}fin", f"{p}fe")]
    return steps


def hash_int_steps(p, v, seed):
    """xxh64 of one 4-byte int `v` (in [0, 2^32)) with seed column
    `seed`; final alias {p}fin."""
    steps = [(f"{p}s0", add(seed, str(P5 + 4))),
             (f"{p}k", mul(v, P1)),
             (f"{p}x", xor(f"{p}s0", f"{p}k")),
             (f"{p}h1", add(mul(rotl(f"{p}x", 23), P2), P3))]
    steps += fmix_steps(f"{p}f", f"{p}h1")
    steps += [(f"{p}fin", f"{p}fe")]
    return steps


def nest(base_sql, steps):
    """Wrap `base_sql` in one nested SELECT per step. Lateral aliases in a
    single SELECT are out: DuckDB's binder substitutes the aliased
    EXPRESSION at each reference, so a chain whose steps each reference
    the previous alias 4-6 times (mul/xor templates) re-inflates to the
    exponential tree the named steps exist to avoid (measured: the
    single-SELECT form planned for minutes). Nested SELECTs are separate
    projection operators — each step's value is computed once per row and
    downstream levels reference the COLUMN."""
    sql = base_sql
    for n, e in steps:
        sql = f"SELECT *, {e} AS {n} FROM ({sql})"
    return sql


def oracle_sql():
    ghash_body = nest(
        "SELECT gs, list_transform(range(1, length(gs) + 1), "
        "c -> ascii(gs[c])) AS bs, length(gs) AS n FROM gstr",
        hash_bytes_steps("gh"))
    thash_body = nest(
        "SELECT text, list_transform(range(1, length(text) + 1), "
        "c -> ascii(text[c])) AS bs, length(text) AS n "
        "FROM (SELECT DISTINCT text FROM corpus)",
        hash_bytes_steps("t"))
    base2_body = nest("SELECT gs, ghfin FROM ghash",
                      hash_long_steps("b", "ghfin", str(SEED)))
    slot_body = nest(
        "SELECT g.doc_id, j.j, b.b2 FROM gram g "
        "JOIN base2 b USING (gs) "
        "CROSS JOIN (SELECT unnest(range(0, 64)) AS j) j",
        hash_int_steps("i", "j::HUGEINT", "b2"))
    fold_body = nest(
        "SELECT f.doc_id, f.j, s.hu AS v, f.h "
        "FROM sigfold f JOIN slots s ON s.doc_id = f.doc_id "
        "AND s.j = f.j WHERE f.j < 64",
        hash_long_steps("z", "v", "h"))
    return f"""-- dd2_minhash_sig oracle: bit-exact xxHash64 replay (see
-- tools/gen_dd2_oracle.py — REGENERATE, do not hand-edit).
-- Preconditions: ASCII-only, non-NULL text (holds for all sf tables).
WITH RECURSIVE corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 5000000, text FROM documents WHERE doc_id % 10 = 0
),
toks AS (
  SELECT doc_id, text, string_split_regex(lower(text), '\\s+') AS tk
  FROM corpus
),
gram AS (
  SELECT doc_id, unnest(CASE WHEN len(tk) < 3
    THEN [array_to_string(tk, ' ')]
    ELSE list_transform(range(1, len(tk) - 1),
           i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) END) AS gs
  FROM toks
),
gstr AS MATERIALIZED (SELECT DISTINCT gs FROM gram),
ghash AS MATERIALIZED (SELECT gs, ghfin FROM ({ghash_body})),
base2 AS MATERIALIZED (SELECT gs, bfin AS b2 FROM ({base2_body})),
slots AS MATERIALIZED (
  SELECT doc_id, j, hs,
         hs::HUGEINT + CASE WHEN hs < 0 THEN {M64} ELSE 0 END AS hu
  FROM (
    SELECT doc_id, j, min({to_signed('ifin')}) AS hs
    FROM ({slot_body})
    GROUP BY doc_id, j)
),
sigfold AS (
  SELECT doc_id, 0 AS j, {SEED}::HUGEINT AS h
  FROM (SELECT DISTINCT doc_id FROM slots)
  UNION ALL
  SELECT doc_id, j + 1 AS j, zfin AS h FROM ({fold_body})
),
sig AS (SELECT doc_id, h AS sig_u FROM sigfold WHERE j = 64),
thash AS (SELECT text, tfin FROM ({thash_body})),
verdict AS (
  SELECT c.doc_id,
    (max(s.sig_u) OVER (PARTITION BY th.tfin) =
     min(s.sig_u) OVER (PARTITION BY th.tfin)) AS equal
  FROM corpus c
  JOIN thash th USING (text)
  JOIN sig s USING (doc_id)
)
SELECT s.doc_id,
  max(CASE WHEN s.j = 0 THEN s.hs END) AS h0,
  max(CASE WHEN s.j = 1 THEN s.hs END) AS h1,
  max(CASE WHEN s.j = 2 THEN s.hs END) AS h2,
  max(CASE WHEN s.j = 3 THEN s.hs END) AS h3,
  any_value(v.equal) AS equal
FROM slots s JOIN verdict v USING (doc_id)
GROUP BY s.doc_id
ORDER BY s.doc_id"""


def run_test(sf_dir, dump_dir):
    import duckdb
    import glob
    import pandas as pd
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'")
    # precondition checks the oracle's comment promises
    pre = con.sql(
        r"SELECT count(*) FILTER (text IS NULL OR text !~ "
        r"'^[\x20-\x7e\x09\x0a\x0d]*$') FROM documents").fetchone()[0]
    assert pre == 0, f"{pre} non-ASCII/NULL texts - oracle preconditions broken"
    exp = con.sql(oracle_sql()).df()
    files = glob.glob(f"{dump_dir}/dd2_minhash_sig/*.parquet")
    assert files, f"no Verify dump under {dump_dir}"
    got = pd.concat([pd.read_parquet(f) for f in files])
    g = got[sorted(got.columns)].reset_index(drop=True)
    e = exp[sorted(exp.columns)].reset_index(drop=True)
    assert list(g.columns) == list(e.columns), (list(g.columns),
                                                list(e.columns))
    assert len(g) == len(e), (len(g), len(e))
    for c in g.columns:
        gs = g[c].map(repr).tolist()
        es = e[c].map(repr).tolist()
        if gs != es:
            bad = next(i for i, (x, y) in enumerate(zip(gs, es)) if x != y)
            raise AssertionError(
                f"col {c} row {bad}: spark={gs[bad]} oracle={es[bad]}")
    print(f"dd2 oracle MATCHES the Spark dump: {len(g)} rows, "
          f"{len(g.columns)} cols, bit-exact")


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "test":
        run_test(sys.argv[2], sys.argv[3])
    elif len(sys.argv) >= 2 and sys.argv[1] == "write":
        import os
        out = os.path.join(os.path.dirname(__file__), "..",
                           "src/main/resources/graft/dd2_oracle.sql")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        with open(out, "w") as f:
            f.write(oracle_sql() + "\n")
        print(f"wrote {os.path.normpath(out)} ({os.path.getsize(out)} B)")
    else:
        print(oracle_sql())

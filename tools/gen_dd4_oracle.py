#!/usr/bin/env python3
"""Generate (and self-test) the dd4_simhash DuckDB oracle SQL.

dd4's fingerprint is SimHash64 over per-TOKEN xxhash64 values: bit b of
the fingerprint is set when sum over token INSTANCES of (+1 if bit b of
the token's hash else -1) is positive. Every hash in the chain is
xxHash64, so the whole entry derandomizes exactly like dd2
(tools/gen_dd2_oracle.py, whose SQL emitters this script reuses): the
token string hash replays via the named-step chain, the bit votes are
plain relational arithmetic, and the window key sim_key =
xxhash64(simhash) replays via the hashLong chain.

Preconditions as dd2: ASCII-only, non-NULL text.

Usage:
  python3 tools/gen_dd4_oracle.py            # print SQL
  python3 tools/gen_dd4_oracle.py write      # regen the resource file
  python3 tools/gen_dd4_oracle.py test <sfDir> <verifyDump>
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_dd2_oracle import (M64, SEED, nest, hash_bytes_steps,
                            hash_long_steps, to_signed)


def oracle_sql():
    # distinct token strings hashed once; instances join back for votes
    thash_body = nest(
        "SELECT tok, list_transform(range(1, length(tok) + 1), "
        "c -> ascii(tok[c])) AS bs, length(tok) AS n "
        "FROM (SELECT DISTINCT tok FROM tokinst)",
        hash_bytes_steps("kh"))
    # sim_key = xxhash64(simhash) — hashLong of the SIGNED fingerprint's
    # unsigned 64-bit image, seed 42
    key_body = nest("SELECT doc_id, fp_u FROM fp",
                    hash_long_steps("sk", "fp_u", str(SEED)))
    texth_body = nest(
        "SELECT text, list_transform(range(1, length(text) + 1), "
        "c -> ascii(text[c])) AS bs, length(text) AS n "
        "FROM (SELECT DISTINCT text FROM corpus)",
        hash_bytes_steps("th"))
    return f"""-- dd4_simhash oracle: bit-exact xxHash64 + SimHash bit-vote replay
-- (see tools/gen_dd4_oracle.py — REGENERATE, do not hand-edit).
-- Preconditions: ASCII-only, non-NULL text (holds for all sf tables).
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 5000000, text FROM documents WHERE doc_id % 10 = 0
),
tokinst AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
  FROM corpus
),
tokh AS MATERIALIZED (SELECT tok, khfin FROM ({thash_body})),
votes AS (
  SELECT t.doc_id, b.b,
    SUM(CASE WHEN (h.khfin // (1::HUGEINT << b.b)) % 2 = 1
        THEN 1 ELSE -1 END) AS cnt
  FROM tokinst t
  JOIN tokh h USING (tok)
  CROSS JOIN (SELECT unnest(range(0, 64)) AS b) b
  GROUP BY t.doc_id, b.b
),
fp AS MATERIALIZED (
  SELECT doc_id,
    COALESCE(SUM(CASE WHEN cnt > 0 THEN (1::HUGEINT << b) ELSE 0 END),
      0)::HUGEINT AS fp_u
  FROM votes GROUP BY doc_id
),
simkey AS (SELECT doc_id, skfin FROM ({key_body})),
thash AS (SELECT text, thfin FROM ({texth_body})),
verdict AS (
  SELECT c.doc_id,
    (max(k.skfin) OVER (PARTITION BY th.thfin) =
     min(k.skfin) OVER (PARTITION BY th.thfin)) AS equal
  FROM corpus c
  JOIN thash th USING (text)
  JOIN simkey k USING (doc_id)
)
SELECT f.doc_id, {to_signed('f.fp_u')} AS simhash, v.equal
FROM fp f JOIN verdict v USING (doc_id)
ORDER BY f.doc_id"""


def run_test(sf_dir, dump_dir):
    import duckdb
    import glob
    import pandas as pd
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'")
    pre = con.sql(
        r"SELECT count(*) FILTER (text IS NULL OR text !~ "
        r"'^[\x20-\x7e\x09\x0a\x0d]*$') FROM documents").fetchone()[0]
    assert pre == 0, f"{pre} non-ASCII/NULL texts"
    exp = con.sql(oracle_sql()).df()
    files = glob.glob(f"{dump_dir}/dd4_simhash/*.parquet")
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
    print(f"dd4 oracle MATCHES the Spark dump: {len(g)} rows, "
          f"{len(g.columns)} cols, bit-exact")


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "test":
        run_test(sys.argv[2], sys.argv[3])
    elif len(sys.argv) >= 2 and sys.argv[1] == "write":
        out = os.path.join(os.path.dirname(__file__), "..",
                           "src/main/resources/graft/dd4_oracle.sql")
        with open(out, "w") as f:
            f.write(oracle_sql() + "\n")
        print(f"wrote {os.path.normpath(out)} ({os.path.getsize(out)} B)")
    else:
        print(oracle_sql())

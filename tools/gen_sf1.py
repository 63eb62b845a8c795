#!/usr/bin/env python3
"""Generate a ~sf1 dataset at /tmp/spark_graft_sf1 by scaling the
driver's sf0.1 fixture 10x (r7 verdict #4: empirically validate the
SCALE.md claims at sf1 for the heaviest queries).

/root/testdata is read-only, and the driver's generator is not
shipped, so sf1 is synthesized from the observed sf0.1 distributions:

- region/nation: dimension tables, copied verbatim (TPC-H semantics).
- customer/supplier/part/orders/lineitem/events: 10 replicas with
  per-key-family offsets (offset = replica * (max_key+1) of the
  family), so FK consistency holds within each replica and every
  non-key distribution is preserved exactly.
- entity NAMES (c_name/s_name/p_name) get a replica salt token
  inserted BEFORE the last token on salted replicas: verbatim-copied
  names would make every distinct name resolve to N entities
  (hydration fans out quadratically in the linkage family — measured
  187s on part_golden_records), while real TPC-H scaling grows the
  NAME DICTIONARY. The mid-token salt keeps the trailing-token
  blocking key distribution (blocks grow in cardinality — faithful
  to TPC-H name-collision growth) and puts cross-replica names
  beyond any edit-distance threshold (different entities, as they
  should be). r11: tokens are sha1-derived with ASSERTED pairwise
  edit distance >= 4 — the original 'rep{r}' tokens were lev-1
  apart, quietly making every cross-replica pair a true match and
  the linkage output quadratic in replicas.
- documents: replica 0 verbatim; replicas 1..9 salt every other word
  with the replica id. Cross-replica Jaccard lands ~0.33 — BELOW the
  0.5/0.8 set-similarity thresholds — so near-dup FAMILY SIZES stay
  bounded and output-bound operators grow the way a real corpus grows
  (more families), not quadratically (bigger families). n_chars is
  recomputed from the mutated text.
- embeddings: replicas apply a deterministic per-replica dimension
  ROTATION (cyclic shift by replica index). Norms and within-replica
  cluster geometry are exactly preserved (labels offset per replica =
  new clusters); cross-replica cosine decorrelates, so ANN/near-dup
  outputs scale by cluster count, not by artificial exact-duplicate
  families.

Each table is written as ONE parquet FILE PER REPLICA inside the
table's .parquet directory — at sf1 the scan is naturally
multi-partition, which is also the realistic layout (the single-file
sf0.1 fixture scans as one task; see candidate_keys r8 notes).

Deterministic (pure arithmetic, no RNG). Idempotent: wipes and
rewrites the output dir. Runtime ~1-2 min.
"""
from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
# replica count scales the output: 10 -> ~sf1 (the default artifact),
# 30 -> ~sf3 (the r11 second scale point for steep linear-band
# queries; same construction, shifts/salts stay valid to r=63)
N_REPLICAS = int(os.environ.get("SPARK_GRAFT_SF_REPLICAS", "10"))


def _max_plus_one(con, table: str, col: str) -> int:
    return con.sql(
        f"SELECT max({col}) + 1 FROM read_parquet('{SRC}/{table}.parquet')"
    ).fetchone()[0]


def main(dst: str | None = None, n_replicas: int | None = None) -> None:
    global DST, N_REPLICAS
    if dst is not None:
        DST = dst
    if n_replicas is not None:
        N_REPLICAS = int(n_replicas)
    con = duckdb.connect()
    shutil.rmtree(DST, ignore_errors=True)

    # key-family offsets (one per key space, shared by FK references)
    k_cust = _max_plus_one(con, "customer", "c_custkey")
    k_supp = _max_plus_one(con, "supplier", "s_suppkey")
    k_part = _max_plus_one(con, "part", "p_partkey")
    k_ord = _max_plus_one(con, "orders", "o_orderkey")
    k_evt = _max_plus_one(con, "events", "event_id")
    k_user = _max_plus_one(con, "events", "user_id")
    k_doc = _max_plus_one(con, "documents", "doc_id")
    k_vec = _max_plus_one(con, "embeddings", "vec_id")
    n_dim = con.sql(
        f"SELECT len(embedding) FROM read_parquet('{SRC}/embeddings.parquet') LIMIT 1"
    ).fetchone()[0]
    k_label = con.sql(
        f"SELECT max(label) + 1 FROM read_parquet('{SRC}/embeddings.parquet')"
    ).fetchone()[0]

    for t in ("region", "nation"):
        os.makedirs(f"{DST}/{t}.parquet", exist_ok=True)
        con.sql(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))"
            f" TO '{DST}/{t}.parquet/part-0.parquet' (FORMAT PARQUET)"
        )

    # Per-replica salt tokens with GUARANTEED pairwise edit distance
    # >= 4 (r11 fix): the original 'rep{r}' tokens were lev-1 apart
    # ('rep1' -> 'rep2'), so every cross-replica name pair was a TRUE
    # lev<=3 linkage match — output grew QUADRATICALLY in replicas, a
    # fixture artifact that contradicted this module's own invariant
    # and inflated the linkage family's measured sf growth (the sf3
    # probe caught it: part_golden_records 8.4x on 3x data). sha1-hex
    # tokens, nonce-bumped until every pair is >= 4 edits apart; the
    # unsalted replica 0 differs from every salted name by the whole
    # token (+space), >= 9 edits.
    import hashlib

    def _lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    nonce = 0
    while True:
        toks = [hashlib.sha1(f"salt{r}:{nonce}".encode()).hexdigest()[:8]
                for r in range(1, N_REPLICAS)]
        if all(_lev(a, b) >= 4
               for i, a in enumerate(toks) for b in toks[i + 1:]):
            break
        nonce += 1
    rep_tok = [""] + toks  # index by replica id

    def salt_name(col: str, r: int) -> str:
        # replica salt token inserted BEFORE the last token: trailing
        # blocking key preserved, cross-replica edit distance > any
        # linkage threshold (asserted above, see rep_tok)
        if r == 0:
            return col
        return (
            f"array_to_string(list_append(list_append("
            f"  list_slice(string_split({col}, ' '), 1,"
            f"             len(string_split({col}, ' ')) - 1),"
            f"  '{rep_tok[r]}'),"
            f"  string_split({col}, ' ')[len(string_split({col}, ' '))]"
            f"), ' ')"
        )

    fact_sql = {
        "customer": lambda r: f"""
            SELECT c_custkey + {r * k_cust} AS c_custkey,
                   {salt_name('c_name', r)} AS c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM read_parquet('{SRC}/customer.parquet')""",
        "supplier": lambda r: f"""
            SELECT s_suppkey + {r * k_supp} AS s_suppkey,
                   {salt_name('s_name', r)} AS s_name,
                   s_nationkey, s_acctbal
            FROM read_parquet('{SRC}/supplier.parquet')""",
        "part": lambda r: f"""
            SELECT p_partkey + {r * k_part} AS p_partkey,
                   {salt_name('p_name', r)} AS p_name,
                   p_brand, p_type, p_size, p_retailprice
            FROM read_parquet('{SRC}/part.parquet')""",
        "orders": lambda r: f"""
            SELECT o_orderkey + {r * k_ord} AS o_orderkey,
                   o_custkey + {r * k_cust} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate,
                   o_orderpriority
            FROM read_parquet('{SRC}/orders.parquet')""",
        "lineitem": lambda r: f"""
            SELECT l_orderkey + {r * k_ord} AS l_orderkey,
                   l_partkey + {r * k_part} AS l_partkey,
                   l_suppkey + {r * k_supp} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice,
                   l_discount, l_tax, l_returnflag, l_linestatus,
                   l_shipdate
            FROM read_parquet('{SRC}/lineitem.parquet')""",
        "events": lambda r: f"""
            SELECT event_id + {r * k_evt} AS event_id, ts,
                   user_id + {r * k_user} AS user_id,
                   event_type, value, props
            FROM read_parquet('{SRC}/events.parquet')""",
        "documents": lambda r: f"""
            SELECT doc_id + {r * k_doc} AS doc_id,
                   {"text" if r == 0 else f'''
                    array_to_string(list_transform(
                      string_split(text, ' '),
                      (w, i) -> CASE WHEN i % 2 = 0
                                     THEN w || 'r{r}' ELSE w END), ' ')
                   '''} AS text,
                   lang, source, 0 AS n_chars
            FROM read_parquet('{SRC}/documents.parquet')""",
        "embeddings": lambda r: f"""
            SELECT vec_id + {r * k_vec} AS vec_id,
                   {"embedding" if r == 0 else f'''
                    list_transform(range(1, {n_dim} + 1),
                      i -> embedding[1 + ((i - 1 + {r}) % {n_dim})])
                   '''}::FLOAT[] AS embedding,
                   label + {r * k_label} AS label
            FROM read_parquet('{SRC}/embeddings.parquet')""",
    }

    for t, sql in fact_sql.items():
        os.makedirs(f"{DST}/{t}.parquet", exist_ok=True)
        for r in range(N_REPLICAS):
            q = sql(r)
            if t == "documents":
                q = f"""SELECT doc_id, text, lang, source,
                               CAST(length(text) AS BIGINT) AS n_chars
                        FROM ({q})"""
            con.sql(
                f"COPY ({q}) TO '{DST}/{t}.parquet/part-{r}.parquet'"
                " (FORMAT PARQUET)"
            )
        n = con.sql(
            f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet/*.parquet')"
        ).fetchone()[0]
        print(f"{t:10s} {n:>9} rows x {N_REPLICAS} files")
    print(f"sf1 dataset at {DST}")


if __name__ == "__main__":
    sys.exit(main())

"""Deterministically scale a driver testdata dir by an integer factor.

The driver ships sf0.001/0.01/0.1 (TESTDATA.md, read-only). The round-6
scale proof (VERDICT r5 next-round #3) needs an sf1 rung: 10x sf0.1,
~6M-row lineitem — big enough that AQE's runtime join-strategy flips
(SMJ vs broadcast) and shuffle-partition sizing stop being theoretical.

Method: tile the source tables ``factor`` times (copy k = 0..factor-1;
k=0 is the identity copy) with key remapping so referential integrity
holds and key spaces stay dense 0-based:

- region/nation: fixed dims, copied once.
- customer/supplier/part/orders/lineitem: every FK/PK shifted by
  k * (max_key + 1) of its table; customer/supplier names re-formatted
  from the new key so name uniqueness survives tiling.
- events: event_id/user_id shifted (user population scales with sf,
  per-hour event volume scales x10, matching a bigger deployment).
- documents: doc_id shifted; for k>0 the text gets a per-tile suffix
  token so tiles are NEAR-duplicates, not exact duplicates — the
  dedup/LSH entries keep a realistic dup-rate instead of a degenerate
  90%-exact-dup corpus; n_chars recomputed from the new text.
- embeddings: vec_id shifted; for k>0 the vector is ROTATED by k
  positions (norm-preserving, decorrelates tiles) so ANN ground truth
  has no artificial distance-0 ten-way ties.

Everything is pure DuckDB SQL over the source parquet — deterministic,
no RNG. Output goes OUTSIDE the repo tree (default /tmp) so multi-GB
fixtures never enter git.

Usage: python tools/gen_sf.py [src_dir] [out_dir] [factor]
       defaults: /root/testdata/sf0.1 /tmp/spark_graft_testdata/sf1 10
"""

from __future__ import annotations

import os
import sys

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _tile_union(per_copy_sql: str, factor: int) -> str:
    return " UNION ALL ".join(
        per_copy_sql.format(k=k) for k in range(factor)
    )


def table_sql(src: str, name: str, factor: int, offs: dict[str, int]) -> str:
    p = f"read_parquet('{src}/{name}.parquet')"
    c, s, pt, o, e, u, d, v = (
        offs["customer"], offs["supplier"], offs["part"], offs["orders"],
        offs["event"], offs["user"], offs["doc"], offs["vec"],
    )
    if name in ("region", "nation"):
        return f"SELECT * FROM {p}"
    if name == "customer":
        per = (
            f"SELECT c_custkey + {{k}} * {c} AS c_custkey, "
            f"printf('Customer#%09d', CAST(c_custkey + {{k}} * {c} AS BIGINT)) AS c_name, "
            "c_nationkey, c_acctbal, c_mktsegment FROM " + p
        )
    elif name == "supplier":
        per = (
            f"SELECT s_suppkey + {{k}} * {s} AS s_suppkey, "
            f"printf('Supplier#%09d', CAST(s_suppkey + {{k}} * {s} AS BIGINT)) AS s_name, "
            "s_nationkey, s_acctbal FROM " + p
        )
    elif name == "part":
        # p_name patterns deliberately kept (TPC-H part names repeat
        # vocabulary; %green% selectivity must stay constant across sf).
        per = (
            f"SELECT p_partkey + {{k}} * {pt} AS p_partkey, p_name, "
            "p_brand, p_type, p_size, p_retailprice FROM " + p
        )
    elif name == "orders":
        per = (
            f"SELECT o_orderkey + {{k}} * {o} AS o_orderkey, "
            f"o_custkey + {{k}} * {c} AS o_custkey, "
            "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority "
            "FROM " + p
        )
    elif name == "lineitem":
        per = (
            f"SELECT l_orderkey + {{k}} * {o} AS l_orderkey, "
            f"l_partkey + {{k}} * {pt} AS l_partkey, "
            f"l_suppkey + {{k}} * {s} AS l_suppkey, "
            "l_linenumber, l_quantity, l_extendedprice, l_discount, "
            "l_tax, l_returnflag, l_linestatus, l_shipdate FROM " + p
        )
    elif name == "events":
        per = (
            f"SELECT event_id + {{k}} * {e} AS event_id, ts, "
            f"user_id + {{k}} * {u} AS user_id, "
            "event_type, value, props FROM " + p
        )
    elif name == "documents":
        per = (
            f"SELECT doc_id + {{k}} * {d} AS doc_id, "
            "CASE WHEN {k} = 0 THEN text "
            "     ELSE text || ' zqtile{k}' END AS text, "
            "lang, source, "
            "CASE WHEN {k} = 0 THEN n_chars "
            "     ELSE n_chars + length(' zqtile{k}') END AS n_chars "
            "FROM " + p
        )
    elif name == "embeddings":
        per = (
            f"SELECT vec_id + {{k}} * {v} AS vec_id, "
            "CASE WHEN {k} = 0 THEN embedding "
            "     ELSE CAST(list_concat(embedding[{k}+1:], "
            "                           embedding[1:{k}]) AS FLOAT[]) "
            "END AS embedding, label FROM " + p
        )
    else:  # pragma: no cover
        raise ValueError(name)
    return _tile_union(per, factor)


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "/tmp/spark_graft_testdata/sf1"
    )
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    offs = {}
    for key, table, col in (
        ("customer", "customer", "c_custkey"),
        ("supplier", "supplier", "s_suppkey"),
        ("part", "part", "p_partkey"),
        ("orders", "orders", "o_orderkey"),
        ("event", "events", "event_id"),
        ("user", "events", "user_id"),
        ("doc", "documents", "doc_id"),
        ("vec", "embeddings", "vec_id"),
    ):
        offs[key] = (
            con.execute(
                f"SELECT max({col}) + 1 FROM "
                f"read_parquet('{src}/{table}.parquet')"
            ).fetchone()[0]
        )
    for t in TABLES:
        sql = table_sql(src, t, factor, offs)
        dest = os.path.join(out, f"{t}.parquet")
        con.execute(f"COPY ({sql}) TO '{dest}' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dest}')"
        ).fetchone()[0]
        print(f"{t}: {n} rows -> {dest}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

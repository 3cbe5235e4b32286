#!/usr/bin/env python
"""Synthesize an sf1 table set (10x sf0.1) for the second-scale-point
headline record (round-5 ask #7). /root/testdata is read-only and tops
out at sf0.1, so sf1 is derived from it: ten key-shifted copies of every
fact table, with referential integrity preserved inside each copy
(copy k shifts every BIGINT key by k*10^7, far above any sf0.1 id).

Distribution discipline:
* joins/aggregations: per-copy key spaces are disjoint, so the star
  join and groupBys see 10x rows with identical per-copy selectivity;
* documents: copy k>0 prefixes every token with `c{k}`, making the
  copy's vocabulary disjoint — the intra-copy near-dup structure is
  EXACTLY sf0.1's while cross-copy shingle similarity is zero, so the
  dedup workload is a true 10x of the sf0.1 shape (plain replication
  would instead multiply the duplicate density 10x); n_chars is
  recomputed for the rewritten text;
* embeddings/events/dims: replicated with shifted ids (region/nation
  dims stay single — they are genuinely scale-free).

    python tools/gen_sf1.py [out_dir]   # default <repo>/.bench/sf1
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
OFF = 10_000_000
COPIES = 10


def copy_union(table: str, select_k: str) -> str:
    return " UNION ALL ".join(
        select_k.format(k=k, off=k * OFF) for k in range(COPIES)
    )


def main(out_dir: str | None = None) -> None:
    out = out_dir or os.path.join(REPO, ".bench", "sf1")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{out}/{t}.parquet'"
            " (FORMAT PARQUET)"
        )
    plans = {
        "customer": "SELECT c_custkey + {off} AS c_custkey, c_name, c_nationkey,"
                    " c_acctbal, c_mktsegment FROM src",
        "supplier": "SELECT s_suppkey + {off} AS s_suppkey, s_name, s_nationkey,"
                    " s_acctbal FROM src",
        "part": "SELECT p_partkey + {off} AS p_partkey, p_name, p_brand, p_type,"
                " p_size, p_retailprice FROM src",
        "orders": "SELECT o_orderkey + {off} AS o_orderkey, o_custkey + {off} AS"
                  " o_custkey, o_orderstatus, o_totalprice, o_orderdate,"
                  " o_orderpriority FROM src",
        "lineitem": "SELECT l_orderkey + {off} AS l_orderkey, l_partkey + {off}"
                    " AS l_partkey, l_suppkey + {off} AS l_suppkey, l_linenumber,"
                    " l_quantity, l_extendedprice, l_discount, l_tax,"
                    " l_returnflag, l_linestatus, l_shipdate FROM src",
        "events": "SELECT event_id + {off} AS event_id, ts, user_id + {off} AS"
                  " user_id, event_type, value, props FROM src",
        "documents": "SELECT doc_id + {off} AS doc_id,"
                     " CASE WHEN {k} = 0 THEN text"
                     " ELSE 'c{k}' || replace(text, ' ', ' c{k}') END AS text,"
                     " lang, source,"
                     " CASE WHEN {k} = 0 THEN n_chars"
                     " ELSE length('c{k}' || replace(text, ' ', ' c{k}')) END"
                     " AS n_chars FROM src",
        "embeddings": "SELECT vec_id + {off} AS vec_id, embedding, label FROM src",
    }
    for t, sel in plans.items():
        con.execute(f"CREATE OR REPLACE VIEW src AS SELECT * FROM '{SRC}/{t}.parquet'")
        con.execute(
            f"COPY ({copy_union(t, sel)}) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"[gen_sf1] {t}: {n} rows")
    con.close()
    print(f"[gen_sf1] wrote sf1 tables -> {out}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)

#!/usr/bin/env python3
"""Amplify a driver testdata dir by an integer factor for SCALE SWEEPS.

Usage: python3 scripts/make_sfx.py <src_sf_dir> <out_dir> <factor>

Produces `factor` key-shifted copies of every fact table so per-op scaling
can be measured empirically (BENCH_SF1.json) instead of argued from plan
shape alone. NOT for correctness runs — the oracle always runs on the
driver's own testdata.

Copies are DECORRELATED so data DENSITY stays constant while VOLUME grows:
  - every key space shifts by a copy-sized offset (FK relations preserved
    within a copy, so joins scale, not degenerate);
  - document tokens get a per-copy suffix (cross-copy shingle overlap -> 0,
    so dedup sweeps measure 10x corpus, not 10x duplicate density; the
    planted dup fixtures inside each copy survive verbatim);
  - embeddings rotate by the copy index (rotations of a dense vector are
    ~orthogonal, so ANN candidate sets scale instead of exploding with
    cosine-1.0 cross-copy pairs);
  - dims (region, nation) stay single-copy.
"""
import sys

import duckdb

SRC, OUT, F = sys.argv[1], sys.argv[2], int(sys.argv[3])

con = duckdb.connect()
con.execute(f"SET threads TO 8")


def amplify(table, select_for_copy, single=False):
    src = f"read_parquet('{SRC}/{table}.parquet')"
    if single:
        con.execute(f"COPY (SELECT * FROM {src}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    else:
        parts = [f"SELECT {select_for_copy(i)} FROM {src}" for i in range(F)]
        con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{OUT}/{table}.parquet')").fetchone()[0]
    print(f"{table}: {n} rows")


import os
os.makedirs(OUT, exist_ok=True)

amplify("region", None, single=True)
amplify("nation", None, single=True)
amplify("customer", lambda i:
    f"c_custkey + {i}::BIGINT*10000000 AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment")
amplify("supplier", lambda i:
    f"s_suppkey + {i}::BIGINT*100000 AS s_suppkey, s_name, s_nationkey, s_acctbal")
amplify("part", lambda i:
    f"p_partkey + {i}::BIGINT*1000000 AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice")
amplify("orders", lambda i:
    f"o_orderkey + {i}::BIGINT*100000000 AS o_orderkey, o_custkey + {i}::BIGINT*10000000 AS o_custkey, "
    f"o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
amplify("lineitem", lambda i:
    f"l_orderkey + {i}::BIGINT*100000000 AS l_orderkey, l_partkey + {i}::BIGINT*1000000 AS l_partkey, "
    f"l_suppkey + {i}::BIGINT*100000 AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
    f"l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate")
amplify("events", lambda i:
    f"event_id + {i}::BIGINT*1000000000 AS event_id, ts, user_id + {i}::BIGINT*10000000 AS user_id, "
    f"event_type, value, props")


def doc_text(i):
    if i == 0:
        return "text"
    # per-copy token suffix: alpha-only so quality ratios barely move
    return f"regexp_replace(text, '(\\S+)', '\\1c{i}', 'g')"


amplify("documents", lambda i:
    f"doc_id + {i}::BIGINT*100000000 AS doc_id, {doc_text(i)} AS text, lang, source, "
    f"CAST(length({doc_text(i)}) AS BIGINT) AS n_chars")


def emb(i):
    if i == 0:
        return "embedding"
    return (f"embedding[{i} + 1:len(embedding)] || embedding[1:{i}]")


amplify("embeddings", lambda i:
    f"vec_id + {i}::BIGINT*100000000 AS vec_id, CAST({emb(i)} AS FLOAT[]) AS embedding, label")

print("done ->", OUT)

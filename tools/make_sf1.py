#!/usr/bin/env python3
"""Materialize an approximate sf1 dataset from sf0.1 for throughput-scaling
runs (BENCH_sf1): 10 copies of every fact table with disjoint keys.

Design notes (what keeps the scale-up honest):
- Keys are shifted by copy*10M so joins stay within a copy — join
  selectivity and group cardinality scale linearly, never quadratically.
- documents.text is token-mangled per copy (every token suffixed _c for
  copies >0) so cross-copy shingle/minhash/simhash similarity is ~0:
  near-dup pair counts scale linearly with corpus size instead of
  exploding combinatorially across identical copies.
- embeddings are rotated by the copy index — a rotation of a random
  vector is ~orthogonal to the original, so embedding near-dup structure
  also stays linear.
- region/nation are SF-invariant dimensions (TPC-H convention): 1 copy.

Usage: python3 tools/make_sf1.py [SRC_DIR] [DST_DIR] [COPIES]
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
SHIFT = 10_000_000

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()


def write(name, select):
    src = f"'{SRC}/{name}.parquet'"
    q = select.format(src=src, shift=SHIFT)
    con.execute(
        f"COPY ({q}) TO '{DST}/{name}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{DST}/{name}.parquet'").fetchone()[0]
    print(f"{name}: {n} rows")


# SF-invariant dimensions: single copy
for dim in ("region", "nation"):
    write(dim, "SELECT * FROM {src}")

write("customer", """
  SELECT c_custkey + c.i*{shift} AS c_custkey, * EXCLUDE (c_custkey, i)
  FROM {src} CROSS JOIN (SELECT unnest(range(%d)) AS i) c""" % COPIES)

write("supplier", """
  SELECT s_suppkey + c.i*{shift} AS s_suppkey, * EXCLUDE (s_suppkey, i)
  FROM {src} CROSS JOIN (SELECT unnest(range(%d)) AS i) c""" % COPIES)

write("part", """
  SELECT p_partkey + c.i*{shift} AS p_partkey, * EXCLUDE (p_partkey, i)
  FROM {src} CROSS JOIN (SELECT unnest(range(%d)) AS i) c""" % COPIES)

write("orders", """
  SELECT o_orderkey + c.i*{shift} AS o_orderkey,
         o_custkey + c.i*{shift} AS o_custkey,
         * EXCLUDE (o_orderkey, o_custkey, i)
  FROM {src} CROSS JOIN (SELECT unnest(range(%d)) AS i) c""" % COPIES)

write("lineitem", """
  SELECT l_orderkey + c.i*{shift} AS l_orderkey,
         l_partkey + c.i*{shift} AS l_partkey,
         l_suppkey + c.i*{shift} AS l_suppkey,
         * EXCLUDE (l_orderkey, l_partkey, l_suppkey, i)
  FROM {src} CROSS JOIN (SELECT unnest(range(%d)) AS i) c""" % COPIES)

# ts is written as BIGINT epoch-nanos: the driver's events.parquet is
# parquet TIMESTAMP(NANOS) which Spark reads as a nano LONG (see
# Tables.events); duckdb's parquet writer downcasts TIMESTAMP_NS to
# micros, which would silently change the engine's ingest path.
write("events", """
  SELECT event_id + c.i*{shift} AS event_id,
         user_id + c.i*{shift} AS user_id,
         CAST(epoch_ns(ts) AS BIGINT) AS ts,
         * EXCLUDE (event_id, user_id, ts, i)
  FROM {src} CROSS JOIN (SELECT unnest(range(%d)) AS i) c""" % COPIES)

write("documents", """
  SELECT doc_id + c.i*{shift} AS doc_id,
         CASE WHEN c.i = 0 THEN text
              ELSE regexp_replace(text, '(\\S+)', '\\1_' || c.i, 'g') END AS text,
         lang, source,
         CAST(length(CASE WHEN c.i = 0 THEN text
              ELSE regexp_replace(text, '(\\S+)', '\\1_' || c.i, 'g') END) AS BIGINT) AS n_chars
  FROM {src} CROSS JOIN (SELECT unnest(range(%d)) AS i) c""" % COPIES)

write("embeddings", """
  SELECT vec_id + c.i*{shift} AS vec_id,
         CASE WHEN c.i = 0 THEN embedding
              ELSE embedding[(c.i + 1):] || embedding[1:c.i] END AS embedding,
         label
  FROM {src} CROSS JOIN (SELECT unnest(range(%d)) AS i) c""" % COPIES)

print(f"done -> {DST}")

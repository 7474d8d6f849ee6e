#!/usr/bin/env python3
"""Build a bench-only scaled lake by replicating a testdata sf dir K times
with shifted keys (FK-consistent: lineitem/orders/customer/part/supplier
shift together; region/nation stay fixed). events keeps its TIMESTAMP(NANOS)
physical type via pyarrow. NOT oracle data — throughput scaling only.

Usage: python3 tools/make_sfN.py SRC OUT K [table,table,...]

The optional 4th arg restricts output to a table subset (plus the
always-tiny region/nation) — e.g. `documents,embeddings` builds a
partial lake for the pipeline/ANN lanes without materializing a
billion-row events table.
"""
import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

src, out, K = sys.argv[1], sys.argv[2], int(sys.argv[3])
only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
os.makedirs(out, exist_ok=True)

# larger than any key in the source lake; override when re-replicating
# an already-shifted lake (e.g. sf100 = sf10 x10 with a 1e11 shift)
SHIFT = int(os.environ.get("MAKE_SFN_SHIFT", 100_000_000))

con = duckdb.connect()
for t in ["region", "nation"]:
    con.execute(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)")

keyed = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
for t, keys in keyed.items():
    if only is not None and t not in only:
        continue
    cols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
    def sel(k):
        return ", ".join(c if c not in keys else f"{c} + {k * SHIFT} AS {c}" for c in cols)
    union = " UNION ALL ".join(f"SELECT {sel(k)} FROM '{src}/{t}.parquet'" for k in range(K))
    con.execute(f"COPY ({union}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    print(t, con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0])

# events via pyarrow so ts stays timestamp[ns] (Spark reads it as raw nanos)
if only is not None and "events" not in only:
    sys.exit(0)
tbl = pq.read_table(f"{src}/events.parquet")
parts = []
for k in range(K):
    t2 = tbl
    for c in ["event_id", "user_id"]:
        i = t2.schema.get_field_index(c)
        t2 = t2.set_column(i, c, pc.add(t2.column(c), k * SHIFT))
    parts.append(t2)
pq.write_table(pa.concat_tables(parts), f"{out}/events.parquet")
print("events", pq.read_metadata(f"{out}/events.parquet").num_rows)

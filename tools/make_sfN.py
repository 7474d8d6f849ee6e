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

# Replica timestamps shift by k * TS_SHIFT_NS (default 1 µs per replica):
# the stateful streaming operators and their SQL oracles key on
# (event_type, ts div 1000), so un-shifted replicas create K-1 duplicate
# keys per source row and the stream_* lanes refuse the lake via
# requireUniqueSeriesTs (VERDICT r10 #4). A µs-scale shift preserves
# every window/session/day assignment (window bounds are >= 1s here)
# while restoring key uniqueness. When re-replicating an already-shifted
# lake (sf100 = sf10 x10), set MAKE_SFN_TS_SHIFT_NS = K_inner * 1000 so
# the inner lake's 0..(K_inner-1) µs offsets nest without collision.
TS_SHIFT_NS = int(os.environ.get("MAKE_SFN_TS_SHIFT_NS", 1000))

tbl = pq.read_table(f"{src}/events.parquet")
ts_type = tbl.schema.field("ts").type
# the shift is specified in ns; apply it in the column's own unit
ns_per_unit = {pa.timestamp("ns"): 1, pa.timestamp("us"): 1000,
               pa.int64(): 1}[ts_type]
if TS_SHIFT_NS % ns_per_unit:
    sys.exit(f"make_sfN: TS_SHIFT_NS={TS_SHIFT_NS} is not a multiple of the "
             f"ts column's {ns_per_unit} ns resolution ({ts_type})")
parts = []
for k in range(K):
    t2 = tbl
    for c in ["event_id", "user_id"]:
        i = t2.schema.get_field_index(c)
        t2 = t2.set_column(i, c, pc.add(t2.column(c), k * SHIFT))
    if TS_SHIFT_NS and k:
        i = t2.schema.get_field_index("ts")
        shifted = pc.add(t2.column("ts").cast(pa.int64()),
                         k * TS_SHIFT_NS // ns_per_unit)
        t2 = t2.set_column(i, "ts", shifted.cast(ts_type))
    parts.append(t2)
pq.write_table(pa.concat_tables(parts), f"{out}/events.parquet")
print("events", pq.read_metadata(f"{out}/events.parquet").num_rows)

# Loud uniqueness check: the stream-lane precondition the shift exists
# to restore. A source lake with same-type events < K µs apart could
# still collide across replicas — fail here, not 5 lanes downstream.
ts_expr = "ts" if ts_type == pa.int64() else "epoch_ns(ts)"
dup = con.execute(
    f"SELECT count(*) - count(DISTINCT (event_type, {ts_expr} // 1000)) "
    f"FROM read_parquet('{out}/events.parquet')").fetchone()[0]
if dup:
    # At ~1e8 rows over a fixed span, duplicate (type, µs) keys become
    # statistically unavoidable under any window-preserving shift (the
    # birthday density alone predicts ~77 at sf100). The stream lanes'
    # own requireUniqueSeriesTs guard still protects them loudly; fail
    # here only when the caller demands the stream precondition.
    msg = (f"make_sfN: {dup} duplicate (event_type, ts_us) keys survive the "
           f"TS_SHIFT_NS={TS_SHIFT_NS} shift")
    if os.environ.get("MAKE_SFN_REQUIRE_UNIQUE_TS"):
        sys.exit(msg)
    print(f"WARNING {msg} — stream_* lanes will refuse this lake by design")
else:
    print("events unique (event_type, ts_us): OK")

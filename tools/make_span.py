#!/usr/bin/env python3
"""Build a SPAN-scaled events-only lake: K replicas of the source events
table, replica k shifted forward by k x the whole source span (whole
days), so the lake's DAY COUNT grows Kx at constant per-day volume.

This is the shape a production time-series lake actually grows in
(days accumulate; a day's volume is roughly stationary), and it is the
lake the flat-cost pruning table needs: a one-day query against the
day-partitioned layout should cost O(day) — flat across span decades —
while the same query against the unpartitioned lake pays O(lake).
make_sfN.py, by contrast, grows DENSITY (same days, Kx rows per day),
which is the right shape for shuffle/agg scaling but the wrong one for
partition-pruning claims.

Usage: python3 tools/make_span.py SRC OUT K
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

src, out, K = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(out, exist_ok=True)

ID_SHIFT = int(os.environ.get("MAKE_SPAN_SHIFT", 100_000_000))

tbl = pq.read_table(f"{src}/events.parquet")
ts_type = tbl.schema.field("ts").type
units_per_day = {pa.timestamp("ns"): 86_400_000_000_000,
                 pa.timestamp("us"): 86_400_000_000,
                 pa.int64(): 86_400_000_000_000}[ts_type]

ts64 = tbl.column("ts").cast(pa.int64())
lo, hi = pc.min(ts64).as_py(), pc.max(ts64).as_py()
span_days = hi // units_per_day - lo // units_per_day + 1
shift_units = span_days * units_per_day

parts = []
for k in range(K):
    t2 = tbl
    for c in ["event_id", "user_id"]:
        i = t2.schema.get_field_index(c)
        t2 = t2.set_column(i, c, pc.add(t2.column(c), k * ID_SHIFT))
    if k:
        i = t2.schema.get_field_index("ts")
        t2 = t2.set_column(
            i, "ts", pc.add(t2.column("ts").cast(pa.int64()),
                            k * shift_units).cast(ts_type))
    parts.append(t2)
pq.write_table(pa.concat_tables(parts), f"{out}/events.parquet")
md = pq.read_metadata(f"{out}/events.parquet")
print(f"events {md.num_rows} rows, {span_days} -> {span_days * K} days")

#!/usr/bin/env python3
"""Restore the TIMESTAMP(NANOS) logical type on a ScaleUp corpus's
events table.

Spark cannot write nanosecond parquet timestamps, so graft.tools.ScaleUp
emits `ts` as plain INT64 nanoseconds — fine for the Spark side (which
reads TIMESTAMP(NANOS) the same way via nanosAsLong), but DuckDB then
binds `ts` as BIGINT and every event-time oracle (epoch_us etc.) fails.
This rewrites events.parquet with ts as timestamp[ns] through pyarrow
(parquet format 2.6 keeps NANOS), matching the driver-generated
testdata's physical schema: Spark sees nanos-as-long again, DuckDB sees
a timestamp.

Usage: python3 tools/fix_scaleup_events.py <sf_dir>
"""
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.dataset as ds
import pyarrow.parquet as pq


def main(sf_dir: str) -> int:
    src = f"{sf_dir}/events.parquet"
    table = ds.dataset(src, format="parquet").to_table()
    i = table.schema.get_field_index("ts")
    ts = table.column(i)
    # plain INT64 nanos (raw ScaleUp output), micros timestamps (ScaleUp
    # passthrough of the regenerated driver testdata), or an
    # already-nanos column all cast losslessly to ns
    ts_ns = ts.cast(pa.timestamp("ns"))
    table = table.set_column(i, pa.field("ts", pa.timestamp("ns")), ts_ns)
    # drop the Spark-written key-value metadata: it embeds the WRITER's
    # catalyst schema (org.apache.spark.sql.parquet.row.metadata), which
    # Spark trusts over the parquet annotation on read — after this
    # rewrite it would claim a non-nanos ts over NANOS data, passing
    # analysis and failing every scan (round-10 sf1 sweep)
    table = table.replace_schema_metadata(
        {k: v for k, v in (table.schema.metadata or {}).items()
         if not k.startswith(b"org.apache.spark")})
    tmp = f"{sf_dir}/events_ns.parquet"
    pq.write_table(table, tmp, version="2.6", coerce_timestamps=None)
    if os.path.isdir(src):
        shutil.rmtree(src)
    else:
        os.remove(src)
    os.rename(tmp, src)
    print(f"[fix-events] {src}: ts -> {pq.read_metadata(src).schema.column(i).logical_type}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))

#!/usr/bin/env python
"""Repack a testdata dir into multi-row-group parquet (round-8 soak
finding, VERDICT r8 #6): the driver's sf* tables are single-row-group
files, so every Spark scan is ONE task wide regardless of cores and all
recorded bench numbers are serial-scan-bound. This tool rewrites each
table with ~``GROUPS`` row groups (schema and physical types preserved
byte-for-byte — pyarrow read → write with a smaller row_group_size), so
a bench run against the repacked dir shows what the same queries cost
when the scan can actually fan out. BENCH_r*.json stays on the driver
layout for round-over-round continuity; the repacked numbers live in
SCALE.md.

Usage: python tools/repack_testdata.py [SRC_DIR] [OUT_DIR] [GROUPS]
Defaults: SRC=/root/testdata/sf0.1, OUT=/tmp/sf0.1_repacked, GROUPS=256
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow.parquet as pq


def main() -> None:
    src = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
    out = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf0.1_repacked")
    groups = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    out.mkdir(parents=True, exist_ok=True)
    for f in sorted(src.glob("*.parquet")):
        t = pq.read_table(f)
        rg = max(1, len(t) // groups)
        pq.write_table(t, out / f.name, row_group_size=rg)
        meta = pq.ParquetFile(out / f.name).metadata
        print(f"{f.name}: {len(t)} rows -> {meta.num_row_groups} row groups")


if __name__ == "__main__":
    main()

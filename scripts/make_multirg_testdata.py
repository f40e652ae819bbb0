#!/usr/bin/env python
"""Re-chunk the driver testdata into MULTI-row-group parquet so local
scans split (round-3 verdict item 4: every sf table is one file with
one row group, capping every scan stage — including map-side partial
aggregation — at a single core regardless of maxPartitionBytes).

Writes each table with a fixed row-group size so Spark's byte-range
splitting produces real parallel scan partitions, into an OUTPUT copy
(never touches /root/testdata). Values are byte-identical — only the
physical layout changes — so correctness oracles are unaffected; the
point is re-measuring which local-bench artifacts (notably the
`spread_small_input` pre-shuffle) were compensating for the layout.

Usage: python scripts/make_multirg_testdata.py [src_dir] [out_dir] [rows_per_rg]
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/multirg_" + os.path.basename(
        src.rstrip("/")
    )
    rows_per_rg = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000
    os.makedirs(out, exist_ok=True)
    for name in sorted(os.listdir(src)):
        if not name.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(src, name))
        # at least ~8 groups per table (small tables included) so the
        # scan can split once maxPartitionBytes is sized to match
        per_rg = max(1, min(rows_per_rg, -(-t.num_rows // 8)))
        pq.write_table(t, os.path.join(out, name), row_group_size=per_rg)
        meta = pq.ParquetFile(os.path.join(out, name)).metadata
        print(f"{name}: {meta.num_rows} rows -> {meta.num_row_groups} row groups")
    print(out)


if __name__ == "__main__":
    main()

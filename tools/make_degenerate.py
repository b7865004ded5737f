#!/usr/bin/env python3
"""Write the degenerate fixtures the exit ritual verifies against.

Usage: python3 tools/make_degenerate.py <srcSfDir> <emptyDir> <oneDir>

Mirrors DegenerateSpec's fixtures on disk so the engine==oracle half of
the degenerate law can run through the real gate:

    python3 tools/make_degenerate.py /root/testdata/sf0.001 /tmp/degen0 /tmp/degen1
    (sbt) runMain graft.Verify /tmp/degen0 /tmp/degen0_out
    python3 tools/check.py /tmp/degen0 /tmp/degen0_out
    ... same for /tmp/degen1

Empty fixture: zero rows, exact source schema. One-row fixture: the
min-key row per table (so vec_id 0 / the first doc_id are present and
single-point geometry paths execute).
"""
import os
import sys

import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

KEY = {"region": "r_regionkey", "nation": "n_nationkey",
       "customer": "c_custkey", "supplier": "s_suppkey",
       "part": "p_partkey", "orders": "o_orderkey",
       "lineitem": "l_orderkey", "events": "event_id",
       "documents": "doc_id", "embeddings": "vec_id"}


def main():
    src, dst0, dst1 = sys.argv[1], sys.argv[2], sys.argv[3]
    os.makedirs(dst0, exist_ok=True)
    os.makedirs(dst1, exist_ok=True)
    for t in TABLES:
        tab = pq.read_table(os.path.join(src, f"{t}.parquet"))
        pq.write_table(tab.slice(0, 0), os.path.join(dst0, f"{t}.parquet"))
        one = tab.take(pc.sort_indices(tab, sort_keys=[(KEY[t], "ascending")])[:1])
        pq.write_table(one, os.path.join(dst1, f"{t}.parquet"))
    print(f"wrote empty fixture -> {dst0}, one-row fixture -> {dst1}")


if __name__ == "__main__":
    main()

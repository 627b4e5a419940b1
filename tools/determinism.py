#!/usr/bin/env python3
"""Bit-determinism check for the rows-only queries: compare two
independent Verify dumps ORDER BY ALL. Usage:
  python3 tools/determinism.py <outDirA> <outDirB> [query ...]
Defaults to the rows-only set."""
import sys
import duckdb

ROWS_ONLY = ["ann_ivf", "ann_ivf_int8", "stream_ann_ivf_int8", "ann_range_ivf",
             "stream_index_append",
             "dedup_embedding_ivf", "ann_pq", "ann_ivf_pq", "stream_ann_ivf_pq", "dedup_semantic",
             "stream_semantic", "ann_recall_probe",
             "q27_approx_distinct", "q40_approx_quantile",
             "text_rolling_hash",
             # deterministic on ONE decoder build; rows-only because JPEG
             # decode is not bit-portable ACROSS decoder implementations
             "mm_image_jpeg_ahash", "mm_avi_frame_ahash"]

def main():
    a, b = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or ROWS_ONLY
    con = duckdb.connect()
    bad = 0
    for n in names:
        # EXCEPT ALL is multiset difference — order-insensitive; with the
        # row-count equality below it proves the dumps are identical
        q = (f"SELECT * FROM read_parquet('{a}/{n}/*.parquet')"
             f" EXCEPT ALL "
             f"SELECT * FROM read_parquet('{b}/{n}/*.parquet')")
        diff = con.execute(q).fetchall()
        n_a = con.execute(f"SELECT count(*) FROM read_parquet('{a}/{n}/*.parquet')").fetchone()[0]
        n_b = con.execute(f"SELECT count(*) FROM read_parquet('{b}/{n}/*.parquet')").fetchone()[0]
        if diff or n_a != n_b:
            print(f"NONDETERMINISTIC {n}: rows {n_a} vs {n_b}, {len(diff)} differing")
            bad += 1
        else:
            print(f"DETERMINISTIC {n} ({n_a} rows)")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()

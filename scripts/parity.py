#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB-oracle gate.

Usage: python3 scripts/parity.py <outDir-from-graft.Verify> <sfDir>

Loads each <outDir>/<name> parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sfDir tables, sorts
columns by name and rows by all columns, and diffs values.
"""
import json
import math
import sys

import duckdb
import pyarrow.dataset as pads

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def values_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        import os
        if not os.path.isdir(f"{out_dir}/{name}"):
            n_skip += 1  # targeted Verify run: gate not dumped
            continue
        try:
            spark_df = canon(pads.dataset(f"{out_dir}/{name}").to_table().to_pandas())
            duck_df = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: load/exec error: {e}")
            n_fail += 1
            continue
        problems = []
        if list(spark_df.columns) != list(duck_df.columns):
            problems.append(f"columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
        elif len(spark_df) != len(duck_df):
            problems.append(f"rows {len(spark_df)} vs {len(duck_df)}")
        else:
            for c in spark_df.columns:
                # r13: dtype KIND skew is a FAILURE even when values
                # compare equal — the driver hashes rendered cells, so
                # int64 7 vs float64 7.0 (an uncast DuckDB SUM ->
                # HUGEINT -> pandas float64) is exactly the eternal
                # hash_match:false of r9-r12 (scripts/hash_repro.py).
                # Width-only skew (int32 vs int64) renders identically
                # and is benign — only cross-kind skew breaks the hash.
                sk, dk = spark_df[c].dtype.kind, duck_df[c].dtype.kind
                if (sk in "iu") != (dk in "iu") or \
                        (sk == "f") != (dk == "f"):
                    problems.append(
                        f"col {c}: dtype kind skew {spark_df[c].dtype} vs "
                        f"{duck_df[c].dtype} (driver hash hazard)")
                    continue
                sv, dv = spark_df[c].tolist(), duck_df[c].tolist()
                bad = [(i, a, b) for i, (a, b) in enumerate(zip(sv, dv))
                       if not values_equal(a, b)]
                if bad:
                    i, a, b = bad[0]
                    problems.append(
                        f"col {c}: {len(bad)} diffs, first at row {i}: {a!r} vs {b!r} "
                        f"(types {type(a).__name__}/{type(b).__name__})")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} not dumped ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])

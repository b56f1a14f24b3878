#!/usr/bin/env python3
"""Repro for the driver's eternal hash_match:false flicker (VERDICT r12
next #4): dump the exact canonical text each side would hash and diff it.

Usage: python3 scripts/hash_repro.py <outDir-from-graft.Verify> <sfDir> [gate]

Finding (r13, root cause named): the six driver-red gates each had ONE
oracle column produced by an UNCAST DuckDB integer aggregate. DuckDB's
SUM(BIGINT) returns HUGEINT (int128); pandas has no int128, so the
column materializes as float64 — e.g. q48_bitwise.sum_bits arrives as
45091.0 from the oracle while the Spark parquet holds int64 45091.
A value-level compare passes (45091 == 45091.0 is True — which is why
scripts/parity.py and every judge adjudication said PASS), but ANY hash
over the rendered cells sees "45091" vs "45091.0" and mismatches,
deterministically, forever. The fix is builder-side: CAST the six
aggregates to BIGINT in the oracle SQL so both engines hand pandas the
same dtype. This script remains as the instrument: it prints per-column
dtypes, the value-level verdict, the representation-level verdict, and
the first differing rendered cell, and writes both canonical byte
streams for diffing.
"""
import hashlib
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


def render(df):
    """The canonical text a representation-level hash would consume:
    one line per row, cells rendered with str() (pandas dtype shows
    through: int64 7 -> '7', float64 7.0 -> '7.0')."""
    lines = []
    for row in df.itertuples(index=False):
        lines.append("\x1f".join(str(v) for v in row))
    return "\n".join(lines) + "\n"


def values_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main(out_dir, sf_dir, gate):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    sqls = json.load(open(f"{out_dir}/oracle_sql.json"))
    spark_df = canon(pads.dataset(f"{out_dir}/{gate}").to_table().to_pandas())
    oracle_df = canon(con.sql(sqls[gate]).df())

    print(f"== {gate}: {len(spark_df)} spark rows, {len(oracle_df)} oracle rows")
    print("-- dtypes (spark | oracle):")
    skew = []
    for c in spark_df.columns:
        s, o = str(spark_df[c].dtype), str(oracle_df[c].dtype)
        flag = "   <-- SKEW" if s != o else ""
        if s != o:
            skew.append(c)
        print(f"   {c}: {s} | {o}{flag}")

    veq = len(spark_df) == len(oracle_df) and all(
        values_equal(a, b)
        for ra, rb in zip(spark_df.itertuples(index=False),
                          oracle_df.itertuples(index=False))
        for a, b in zip(ra, rb))
    print(f"-- value-level compare (parity.py semantics): "
          f"{'PASS' if veq else 'FAIL'}")

    st, ot = render(spark_df), render(oracle_df)
    sh = hashlib.md5(st.encode()).hexdigest()
    oh = hashlib.md5(ot.encode()).hexdigest()
    print(f"-- representation-level hash: spark={sh} oracle={oh} "
          f"{'MATCH' if sh == oh else 'MISMATCH'}")
    with open(f"/tmp/hash_repro_{gate}_spark.txt", "w") as f:
        f.write(st)
    with open(f"/tmp/hash_repro_{gate}_oracle.txt", "w") as f:
        f.write(ot)
    print(f"-- canonical bytes: /tmp/hash_repro_{gate}_{{spark,oracle}}.txt")
    if sh != oh:
        for i, (a, b) in enumerate(zip(st.splitlines(), ot.splitlines())):
            if a != b:
                print(f"-- first differing row {i}:\n   spark:  {a}\n   oracle: {b}")
                break
        if skew:
            print(f"-- root cause candidates (dtype skew): {skew} — "
                  f"an uncast DuckDB integer aggregate (SUM->HUGEINT) "
                  f"reaches pandas as float64; CAST(... AS BIGINT) in "
                  f"the oracle SQL")
        return 1
    print("-- canonical inputs are BIT-IDENTICAL: any remaining driver "
          "mismatch is inside ITS hash pipeline, not the data")
    return 0


if __name__ == "__main__":
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/.graft/verify_out"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    gate = sys.argv[3] if len(sys.argv) > 3 else "q48_bitwise"
    sys.exit(main(out_dir, sf_dir, gate))

#!/usr/bin/env python3
"""Head-to-head throughput: reference PySpark connector vs graft.

Runs the REFERENCE (tnixon/alpaca-pyspark, /root/reference) Python
DataSource under the local pyspark against graft's fixture stub server
— the exact workload of graft's `alpaca_trades_throughput` gate (one
year of 10-minute trades x 2 symbols, ~105k records, 730 day
partitions, monthly aggregation) — and times it, so BENCH numbers can
be compared against a measured reference figure instead of the
reference's unquantified "10x faster than row-by-row" claim.

Usage:
  1. sbt -batch "runMain graft.stub.StubMain"   # note STUB_ENDPOINT=...
  2. python3 scripts/ref_bench.py <endpoint>    # e.g. http://127.0.0.1:PORT/v2

Driver-side tooling only (pyspark/pyarrow are NOT dependencies of the
library, same as duckdb in parity.py).
"""
import os
import sys
import time

# the Python DataSource executes in worker processes too — they import
# alpaca_pyspark via PYTHONPATH, not the driver's sys.path
os.environ["PYTHONPATH"] = \
    "/root/reference:" + os.environ.get("PYTHONPATH", "")
sys.path.insert(0, "/root/reference")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main():
    endpoint = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    from alpaca_pyspark.stocks.trades import StockTradesDataSource
    from alpaca_pyspark.stocks.bars import StockBarsDataSource
    spark.dataSource.register(StockTradesDataSource)
    spark.dataSource.register(StockBarsDataSource)

    def bars_workload():
        df = (spark.read.format("Alpaca_Stocks_Bars")
              .options(**{
                  "symbols": "['AAPL', 'MSFT']",
                  "start": "2021-01-01T00:00:00Z",
                  "end": "2022-01-01T00:00:00Z",
                  "timeframe": "1Min",
                  "APCA-API-KEY-ID": "test-key",
                  "APCA-API-SECRET-KEY": "test-secret",
                  "endpoint": endpoint,
              })
              .load())
        agg = (df.groupBy(F.col("symbol"),
                          F.date_format(F.col("time"), "yyyy-MM").alias("month"))
               .agg(F.count(F.lit(1)).alias("n_bars"),
                    F.sum(F.col("volume")).alias("sum_volume")))
        rows = agg.collect()
        return len(rows), sum(r["n_bars"] for r in rows)

    def workload():
        df = (spark.read.format("Alpaca_Stocks_Trades")
              .options(**{
                  "symbols": "['AAPL', 'MSFT']",
                  "start": "2021-01-01T00:00:00Z",
                  "end": "2022-01-01T00:00:00Z",
                  "APCA-API-KEY-ID": "test-key",
                  "APCA-API-SECRET-KEY": "test-secret",
                  "endpoint": endpoint,
              })
              .load())
        agg = (df.groupBy(F.col("symbol"),
                          F.date_format(F.col("time"), "yyyy-MM").alias("month"))
               .agg(F.count(F.lit(1)).alias("n_trades"),
                    F.sum(F.col("size")).alias("sum_size")))
        rows = agg.collect()
        return len(rows), sum(r["n_trades"] for r in rows)

    # Large grid (round 7): 10 symbols x 5 years of minute bars
    # (~26.3M records; per symbol the volume-aware planner caps
    # partitions at limit*5 = 50k rows -> 53 intervals/symbol = 530
    # partitions x ~5 pages of 10k). Proves the ratio holds past the
    # 1M-row workload.
    LARGE_SYMBOLS = "['AAPL','MSFT','GOOG','AMZN','TSLA','NVDA','META','AMD','INTC','CRM']"

    def bars_large_workload():
        df = (spark.read.format("Alpaca_Stocks_Bars")
              .options(**{
                  "symbols": LARGE_SYMBOLS,
                  "start": "2021-01-01T00:00:00Z",
                  "end": "2026-01-01T00:00:00Z",
                  "timeframe": "1Min",
                  "APCA-API-KEY-ID": "test-key",
                  "APCA-API-SECRET-KEY": "test-secret",
                  "endpoint": endpoint,
              })
              .load())
        agg = (df.groupBy(F.col("symbol"),
                          F.date_format(F.col("time"), "yyyy").alias("year"))
               .agg(F.count(F.lit(1)).alias("n_bars"),
                    F.sum(F.col("volume")).alias("sum_volume")))
        rows = agg.collect()
        return len(rows), sum(r["n_bars"] for r in rows)

    workloads = [("trades", workload), ("bars", bars_workload)]
    if os.environ.get("REFBENCH_LARGE", "") == "1":
        workloads.append(("bars_large", bars_large_workload))
    for label, fn in workloads:
        results = []
        for i in range(runs):
            t0 = time.monotonic()
            n_groups, n_records = fn()
            dt = time.monotonic() - t0
            results.append(dt)
            print(f"{label} run {i}: {dt:.2f}s  groups={n_groups} "
                  f"records={n_records}", flush=True)
        print(f'{{"metric":"ref_{label}_throughput","unit":"sec",'
              f'"runs":{[round(r, 3) for r in results]},'
              f'"best":{min(results):.3f}}}', flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

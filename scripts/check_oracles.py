"""Local emulation of the driver's correctness gate: run each
__spark_entry__.queries() entry and its oracle_sql() twin at a given sf,
compare row count + order-insensitive values (columns sorted by name).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb  # noqa: E402

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v


def main() -> int:
    results = []
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            cols = sorted(sdf.columns)
            srows = sdf.collect()
            s_set = sorted(
                tuple(norm(r[c]) for c in cols) for r in srows
            )
        except Exception as e:  # noqa: BLE001
            results.append(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        took = time.time() - t0
        if name not in oracles:
            results.append(f"rows  {name}: {len(srows)} rows (rows-only) [{took:.1f}s]")
            if len(srows) == 0 and name not in ("minhash_pairs", "simhash_pairs"):
                results.append(f"WARN  {name}: zero rows")
            continue
        try:
            drows = con.sql(oracles[name]).fetchdf()
            dcols = sorted(drows.columns)
            d_set = sorted(
                tuple(norm(v) for v in row)
                for row in drows[dcols].itertuples(index=False, name=None)
            )
        except Exception as e:  # noqa: BLE001
            results.append(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        if cols != dcols:
            results.append(f"FAIL  {name}: schema {cols} != {dcols}")
            failures += 1
        elif len(s_set) != len(d_set):
            results.append(f"FAIL  {name}: rows {len(s_set)} != {len(d_set)}")
            failures += 1
        elif s_set != d_set:
            bad = sum(1 for a, b in zip(s_set, d_set) if a != b)
            ex = next((a, b) for a, b in zip(s_set, d_set) if a != b)
            results.append(f"FAIL  {name}: {bad} value mismatches, e.g. {ex}")
            failures += 1
        else:
            results.append(f"OK    {name}: {len(s_set)} rows match [{took:.1f}s]")
    spark.stop()
    print("\n".join(results), flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Replicates the driver's correctness gate locally: runs every
queries() entry on Spark and its oracle_sql() twin on DuckDB at the
given sf dir, compares row count, column names, and values
(columns sorted by name, rows sorted, floats to 1e-9)."""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from ukis_pysat_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_df) != len(duck_df):
        problems.append(f"rowcount spark={len(spark_df)} duck={len(duck_df)}")
        return problems
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(f"columns spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
        return problems
    a, b = normalize(spark_df), normalize(duck_df)
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if np.issubdtype(np.asarray(av).dtype, np.floating) or np.issubdtype(
            np.asarray(bv).dtype, np.floating
        ):
            af = np.asarray(av, dtype=np.float64)
            bf = np.asarray(bv, dtype=np.float64)
            bad = ~(np.isclose(af, bf, rtol=0, atol=1e-9) | (np.isnan(af) & np.isnan(bf)))
            if bad.any():
                i = int(np.argmax(bad))
                problems.append(f"col {c}: {bad.sum()} mismatches, first {af[i]} vs {bf[i]}")
        else:
            if not (np.asarray(av) == np.asarray(bv)).all():
                bad = np.asarray(av) != np.asarray(bv)
                i = int(np.argmax(bad))
                problems.append(f"col {c}: {bad.sum()} mismatches, first {av[i]!r} vs {bv[i]!r}")
    return problems


def main(sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    spark = get_spark("contract-check", master="local[8]")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"[FAIL] {name}: spark error {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(sdf)} rows")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"[FAIL] {name}: duckdb error {exc}")
            failures += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failures += 1
            print(f"[FAIL] {name}: " + "; ".join(problems))
        else:
            print(f"[OK]   {name}: {len(sdf)} rows match")
    edf = entrymod.entry(spark)
    print(f"[entry] rows={edf.count()} schema={edf.schema.simpleString()}")
    spark.stop()
    return failures


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"))

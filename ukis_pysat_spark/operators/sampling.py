"""Deterministic sampling for training-data pipelines.

Random sampling on a cluster is a reproducibility trap: ``rand()`` is
task-attempt-dependent, so a retried partition yields a different
sample, and `df.sample` can't give exact per-group counts.  These
operators derive ALL randomness from ``md5`` of the row's id — pure,
partitioning-independent, retry-safe, and reproducible across engines
(the driver's DuckDB twins recompute the identical hashes):

- ``sample_per_key``   exact k rows per group (stratified sampling)
- ``split_assign``     train/val/test assignment by hash thresholds
- ``take_sample``      exact global n (deterministic "reservoir")

Physical strategy: sample_per_key is a rank-filter window — Spark
rewrites it to WindowGroupLimit, so each map task keeps only its local
top-k per key BEFORE the shuffle (the same mechanism the kNN operator
rides); the exchange carries O(groups * k), not the table.
take_sample is a global top-n — TakeOrderedAndProject, no full sort.
split_assign is a pure projection: zero shuffle.

Hash-threshold splits compare the md5 HEX STRING against precomputed
hex literals, so the same literals drive any SQL engine; fractions
quantize to 1/16^8 (~6e-10) of the id space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

_HEX_DIGITS = 8  # threshold resolution: 16^8 buckets over the id space


def _hash_col(id_col: str):
    """Deterministic per-row sort key: md5 of the id rendered as a
    string (same rendering in ANSI SQL: CAST(id AS VARCHAR))."""
    return F.md5(F.col(id_col).cast("string"))


def sample_per_key(
    df: DataFrame, key_cols: list[str] | str, k: int, id_col: str
) -> DataFrame:
    """Exactly min(k, group size) rows per key group, chosen by md5(id)
    order (ties by id) — a deterministic stratified sample.  Adds no
    columns; rows keep their input schema."""
    if k < 1:
        raise ValueError("k must be >= 1")
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    w = Window.partitionBy(*keys).orderBy(_hash_col(id_col), F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def split_thresholds(fractions: dict[str, float]) -> list[tuple[str, str]]:
    """(split, upper-hex-threshold) pairs in declaration order; the
    last split absorbs the rounding tail.  Exposed so SQL twins can
    inline the identical literals."""
    if not fractions or any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be non-negative")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    space = 16 ** _HEX_DIGITS
    out = []
    acc = 0.0
    for name, frac in fractions.items():
        acc += frac
        bound = min(int(acc * space), space)
        out.append((name, format(bound, f"0{_HEX_DIGITS}x")))
    return out


def split_assign(
    df: DataFrame, fractions: dict[str, float], id_col: str, out_col: str = "split"
) -> DataFrame:
    """Adds `out_col` assigning each row to a split by comparing the
    first 8 hex chars of md5(id) against the fraction thresholds —
    stable under reruns, retries, and repartitioning, and disjoint and
    exhaustive by construction.  Pure projection: zero shuffle."""
    pairs = split_thresholds(fractions)
    h = F.substring(_hash_col(id_col), 1, _HEX_DIGITS)
    # nested WHENs from the last split inward: h < bound_i picks split i
    expr = F.lit(pairs[-1][0])
    for name, bound in reversed(pairs[:-1]):
        expr = F.when(h < F.lit(bound), F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def take_sample(df: DataFrame, n: int, id_col: str) -> DataFrame:
    """Exactly min(n, count) rows, chosen by md5(id) order (ties by
    id) — a deterministic global sample that plans as
    TakeOrderedAndProject (per-partition top-n, no full sort)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    return (
        df.orderBy(_hash_col(id_col), F.col(id_col)).limit(n)
    )

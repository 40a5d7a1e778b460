"""Generate driver-STYLE tables at an arbitrary scale factor for local
measurement only.

The driver's own testdata (/root/testdata/sf*) is read-only and its
sf1.0 escalation corpus is not persisted in this sandbox, so A/B and
profiling runs at sf1.0 need a local stand-in.  This script writes the
same ten tables with the same schemas and the same marginal
distributions as the sf0.1 driver data (vocabulary, doc-length, lang /
source mix, unit-norm 64-d embeddings, TPC-H-ish fact tables with
consistent join keys), scaled by SF/0.1.  Seeded and deterministic.

NOT part of the driver contract; never read by bench.py or queries().

Usage: python tools/gen_driver_sf.py /root/testdata_local/sf1.0 1.0
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "batch", "part", "line", "order", "small", "sort", "fast",
    "scan", "a", "hash", "slow", "group", "agg", "filter", "query",
    "big", "key", "row", "the", "data", "join", "customer", "random",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
EVENT_P = [0.40, 0.30, 0.10, 0.10, 0.10]


def gen_documents(rng: np.random.Generator, n: int) -> pd.DataFrame:
    lens = rng.integers(10, 101, size=n)
    texts = []
    for ln in lens:
        texts.append(" ".join(VOCAB[i] for i in rng.integers(0, len(VOCAB), size=ln)))
    # plant the same small exact-dup rate as the driver data (~8/5000)
    n_dup = max(1, int(n * 8 / 5000))
    dup_src = rng.integers(0, n, size=n_dup)
    dup_dst = rng.integers(0, n, size=n_dup)
    for s, d in zip(dup_src, dup_dst):
        texts[d] = texts[s]
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": rng.choice(LANGS, size=n, p=LANG_P),
            "source": [f"src{i}" for i in rng.integers(0, 20, size=n)],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )


def gen_embeddings(rng: np.random.Generator, n: int) -> pd.DataFrame:
    v = rng.standard_normal((n, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": list(v),
            "label": rng.integers(0, 10, size=n).astype(np.int64),
        }
    )


def gen_events(rng: np.random.Generator, n: int, n_users: int) -> pd.DataFrame:
    ts0 = np.datetime64("2024-01-01T00:00:00", "us")
    gaps = rng.exponential(30.0, size=n) * 1e6  # ~30 s mean gap, microseconds
    ts = ts0 + np.cumsum(gaps).astype("timedelta64[us]")
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts,
            "user_id": rng.integers(0, n_users, size=n).astype(np.int64),
            "event_type": rng.choice(EVENT_TYPES, size=n, p=EVENT_P),
            "value": np.round(rng.exponential(60.0, size=n), 2),
            "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, size=n)],
        }
    )


def gen_tpch(rng: np.random.Generator, mult: float, out: str) -> None:
    n_li = int(600_000 * mult)
    n_ord = int(150_000 * mult)
    n_cust = int(15_000 * mult)
    n_part = int(20_000 * mult)
    n_supp = int(1_000 * mult)

    region = pd.DataFrame(
        {"r_regionkey": np.arange(5, dtype=np.int64),
         "r_name": [f"REGION_{i}" for i in range(5)]}
    )
    nation = pd.DataFrame(
        {"n_nationkey": np.arange(25, dtype=np.int64),
         "n_name": [f"NATION_{i}" for i in range(25)],
         "n_regionkey": (np.arange(25) % 5).astype(np.int64)}
    )
    customer = pd.DataFrame(
        {"c_custkey": np.arange(n_cust, dtype=np.int64),
         "c_name": [f"Customer_{i}" for i in range(n_cust)],
         "c_nationkey": rng.integers(0, 25, size=n_cust).astype(np.int64),
         "c_acctbal": np.round(rng.uniform(-999, 9999, size=n_cust), 2),
         "c_mktsegment": rng.choice(
             ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"],
             size=n_cust)}
    )
    supplier = pd.DataFrame(
        {"s_suppkey": np.arange(n_supp, dtype=np.int64),
         "s_name": [f"Supplier_{i}" for i in range(n_supp)],
         "s_nationkey": rng.integers(0, 25, size=n_supp).astype(np.int64),
         "s_acctbal": np.round(rng.uniform(-999, 9999, size=n_supp), 2)}
    )
    part = pd.DataFrame(
        {"p_partkey": np.arange(n_part, dtype=np.int64),
         "p_name": [f"part {i}" for i in range(n_part)],
         "p_brand": [f"Brand#{i % 25}" for i in range(n_part)],
         "p_type": rng.choice(
             ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"],
             size=n_part),
         "p_size": rng.integers(1, 51, size=n_part).astype(np.int64),
         "p_retailprice": np.round(rng.uniform(900, 2000, size=n_part), 2)}
    )
    dates = (np.datetime64("1992-01-01") +
             rng.integers(0, 2500, size=n_ord).astype("timedelta64[D]"))
    orders = pd.DataFrame(
        {"o_orderkey": np.arange(n_ord, dtype=np.int64),
         "o_custkey": rng.integers(0, n_cust, size=n_ord).astype(np.int64),
         "o_orderstatus": rng.choice(["O", "F", "P"], size=n_ord, p=[0.49, 0.49, 0.02]),
         "o_totalprice": np.round(rng.uniform(900, 500000, size=n_ord), 2),
         "o_orderdate": dates,
         "o_orderpriority": rng.choice(
             ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
             size=n_ord)}
    )
    ship = (np.datetime64("1992-01-02") +
            rng.integers(0, 2520, size=n_li).astype("timedelta64[D]"))
    lineitem = pd.DataFrame(
        {"l_orderkey": rng.integers(0, n_ord, size=n_li).astype(np.int64),
         "l_partkey": rng.integers(0, n_part, size=n_li).astype(np.int64),
         "l_suppkey": rng.integers(0, n_supp, size=n_li).astype(np.int64),
         "l_linenumber": (np.arange(n_li) % 7 + 1).astype(np.int64),
         "l_quantity": rng.integers(1, 51, size=n_li).astype(np.float64),
         "l_extendedprice": np.round(rng.uniform(900, 100000, size=n_li), 2),
         "l_discount": np.round(rng.integers(0, 11, size=n_li) / 100.0, 2),
         "l_tax": np.round(rng.integers(0, 9, size=n_li) / 100.0, 2),
         "l_returnflag": rng.choice(["A", "N", "R"], size=n_li, p=[0.25, 0.5, 0.25]),
         "l_linestatus": rng.choice(["O", "F"], size=n_li),
         "l_shipdate": ship}
    )
    for name, df in [("region", region), ("nation", nation), ("customer", customer),
                     ("supplier", supplier), ("part", part), ("orders", orders),
                     ("lineitem", lineitem)]:
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       f"{out}/{name}.parquet")


def main() -> None:
    out = sys.argv[1]
    sf = float(sys.argv[2])
    mult = sf / 0.1
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    pq.write_table(
        pa.Table.from_pandas(gen_documents(rng, int(5000 * mult)), preserve_index=False),
        f"{out}/documents.parquet")
    pq.write_table(
        pa.Table.from_pandas(gen_embeddings(rng, int(2000 * mult)), preserve_index=False),
        f"{out}/embeddings.parquet")
    pq.write_table(
        pa.Table.from_pandas(
            gen_events(rng, int(100_000 * mult), int(1500 * mult)), preserve_index=False),
        f"{out}/events.parquet")
    gen_tpch(rng, mult, out)
    with open(f"{out}/_DONE", "w") as f:
        f.write("local measurement corpus (tools/gen_driver_sf.py)\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

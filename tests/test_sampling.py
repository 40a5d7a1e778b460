"""Deterministic sampling: exactness, reproducibility, plan shape."""

import hashlib

import pytest

from ukis_pysat_spark.operators import sampling
from tests.conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_sample_per_key_exact_and_deterministic(spark):
    docs = _docs(spark)
    got = sampling.sample_per_key(docs, "lang", 5, "doc_id")
    counts = {r["lang"]: r["n"] for r in got.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    full = {r["lang"]: r["n"] for r in docs.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    for lang, n in counts.items():
        assert n == min(5, full[lang])
    # reproducible across runs and repartitioning
    ids1 = sorted(r["doc_id"] for r in got.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in sampling.sample_per_key(docs.repartition(7), "lang", 5, "doc_id").collect()
    )
    assert ids1 == ids2
    # matches a local md5 oracle per group
    rows = docs.select("doc_id", "lang").collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        h = hashlib.md5(str(r["doc_id"]).encode()).hexdigest()
        by_lang.setdefault(r["lang"], []).append((h, r["doc_id"]))
    want = sorted(
        d for lang, hs in by_lang.items() for _, d in sorted(hs)[:5]
    )
    assert ids1 == want


def test_split_assign_disjoint_exhaustive_reproducible(spark):
    docs = _docs(spark)
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = sampling.split_assign(docs, fr, "doc_id")
    n = docs.count()
    sizes = {r["split"]: r["count"] for r in got.groupBy("split").count().collect()}
    assert sum(sizes.values()) == n
    assert set(sizes) <= set(fr)
    assert sizes["train"] > sizes.get("val", 0)
    # local oracle agreement on every row
    pairs = got.select("doc_id", "split").collect()
    ths = sampling.split_thresholds(fr)
    for r in pairs[:500]:
        h = hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8]
        want = next(name for name, bound in ths if h < bound or (name, bound) == ths[-1])
        assert r["split"] == want, r


def test_take_sample_plans_take_ordered(spark):
    docs = _docs(spark)
    got = sampling.take_sample(docs, 20, "doc_id")
    assert got.count() == 20
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    ids1 = sorted(r["doc_id"] for r in got.collect())
    ids2 = sorted(r["doc_id"] for r in sampling.take_sample(docs.repartition(5), 20, "doc_id").collect())
    assert ids1 == ids2


def test_sample_per_key_plans_window_group_limit(spark):
    docs = _docs(spark)
    plan = (
        sampling.sample_per_key(docs, "lang", 5, "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan, plan


def test_sampling_validation():
    with pytest.raises(ValueError):
        sampling.split_thresholds({"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError):
        sampling.split_thresholds({"a": -0.1, "b": 1.1})
    import pyspark.sql  # noqa: F401
    with pytest.raises(ValueError):
        sampling.sample_per_key(None, "k", 0, "id")
    with pytest.raises(ValueError):
        sampling.take_sample(None, 0, "id")

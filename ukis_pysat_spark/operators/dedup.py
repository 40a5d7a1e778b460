"""Deduplication operators for training-data pipelines.

Five strategies over ``documents`` / ``embeddings``:

- exact_dedup           hash-groupBy on a normalized fingerprint (SQL-
                        oracle-checkable, pure relational).
- ngram_jaccard_pairs   exact n-gram-shingle Jaccard via shingle
                        explode + self-equi-join on shingle + group
                        count (|A∩B|) and |A|+|B| — the inclusion-
                        exclusion trick keeps everything relational.
- minhash_lsh_pairs     MinHash signatures (vectorized numpy, one
                        pandas UDF) banded into LSH buckets; candidate
                        pairs from a bucket self-join, verified by exact
                        Jaccard.  The scale path: no quadratic work.
- simhash_pairs         64-bit SimHash; near-dups = equal bucket on
                        rotated prefixes + Hamming<=`max_hamming` check.
- embedding_neardup     cosine >= threshold pairs on embeddings
                        (relational dot product via zip_with/aggregate,
                        SQL-oracle-checkable).

All pair outputs are canonicalized (id_a < id_b) and deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F
from pyspark.sql.types import ArrayType, LongType

from ukis_pysat_spark.operators.text import fingerprint, normalized_text

# --- exact -----------------------------------------------------------------


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Keep the smallest doc_id per identical normalized text; emit
    (fp, keep_id, n_dups).  Map-side partial aggregation applies."""
    return (
        documents.select(fingerprint(F.col("text")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_dups"))
    )


# --- n-gram shingles ---------------------------------------------------------


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of normalized text (relational).

    Documents with fewer than n words yield an EMPTY shingle set:
    sequence(1, k) with k<=0 would produce a descending range and
    slice(words, 0, n) would throw on executors, so the index list is
    gated on k >= 1."""
    words = F.split(normalized_text(text), " ")
    k = F.size(words) - (n - 1)
    idx = F.when(k >= 1, F.sequence(F.lit(1), k)).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, n)))
    )


def _shingle_table(documents: DataFrame, n: int) -> DataFrame:
    return documents.select(
        "doc_id", F.explode(shingles(F.col("text"), n)).alias("sh")
    )


def ngram_jaccard_pairs(
    documents: DataFrame, n: int = 3, threshold: float = 0.8
) -> DataFrame:
    """Exact Jaccard-similar pairs via shingle self-join.

    J(A,B) = |A∩B| / (|A|+|B|-|A∩B|); the intersection count comes from
    the shingle equi-join, sizes from a per-doc count — no quadratic
    cross join, only pairs sharing >=1 shingle are ever materialized.
    """
    sh = _shingle_table(documents, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"doc_id": "id_a", "sz": "sz_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"doc_id": "id_b", "sz": "sz_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --- MinHash + LSH -----------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_matrix(hash_lists: pd.Series, n_hashes: int, seed: int) -> np.ndarray:
    """(rows, n_hashes) MinHash signatures from PRE-HASHED shingles
    (int64 arrays; the string->int64 hashing runs JVM-side via
    xxhash64 so Python only does vectorized integer math)."""
    rng = np.random.Generator(np.random.Philox(key=np.uint64(seed)))
    a = rng.integers(1, _MERSENNE, size=n_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=n_hashes, dtype=np.int64)
    out = np.empty((len(hash_lists), n_hashes), dtype=np.int64)
    for i, hs in enumerate(hash_lists):
        if hs is None or len(hs) == 0:
            out[i] = 0
            continue
        hs = np.asarray(hs, dtype=np.int64) & 0x7FFFFFFFFFFFFFFF
        # (n_shingles, n_hashes) universal hashing mod Mersenne prime
        m = (hs[:, None] * a[None, :] + b[None, :]) % _MERSENNE
        out[i] = m.min(axis=0)
    return out


def _fnv1a(s: str) -> int:
    h = 0xCBF29CE484222325
    for ch in s.encode("utf-8"):
        h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def minhash_lsh_pairs(
    documents: DataFrame,
    n: int = 3,
    n_hashes: int = 128,
    bands: int = 32,
    threshold: float = 0.8,
    seed: int = 1,
) -> DataFrame:
    """Banded-MinHash candidate generation + exact Jaccard verification.

    rows/band = n_hashes/bands; docs sharing any band bucket become
    candidates (equi-join on (band, bucket) — distributes/salts like any
    key join), then exact Jaccard filters false positives, so output ==
    the exact ngram_jaccard_pairs at the same threshold up to LSH
    recall (tests measure recall=1.0 on the fixtures at these params).

    Shingle strings are hashed to int64 JVM-side (xxhash64 inside
    transform()) so the Python stage is pure vectorized integer math;
    the exact verify stage intersects hashed shingle sets (64-bit, so
    collision-induced error is negligible and deterministic).
    """
    rows_per_band = n_hashes // bands

    @F.pandas_udf(ArrayType(LongType()))
    def band_buckets(sh: pd.Series) -> pd.Series:
        sig = _minhash_matrix(sh, n_hashes, seed)
        sig = sig.reshape(len(sh), bands, rows_per_band)
        # bucket = FNV over the band's signature values
        buckets = np.empty((len(sh), bands), dtype=np.int64)
        for bi in range(bands):
            acc = np.full(len(sh), 0xCBF29CE484222325, dtype=np.uint64)
            for ri in range(rows_per_band):
                acc = (acc ^ sig[:, bi, ri].astype(np.uint64)) * np.uint64(0x100000001B3)
            buckets[:, bi] = (acc >> np.uint64(1)).astype(np.int64) + bi * (1 << 40)
        return pd.Series(list(buckets))

    # small-file sources arrive as one partition; spread the signature
    # UDF across the cluster before any Python runs
    n_parts = int(documents.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    docs_sh = documents.repartition(n_parts, "doc_id").select(
        "doc_id",
        F.transform(shingles(F.col("text"), n), lambda s: F.xxhash64(s)).alias("sh"),
    )
    bucketed = docs_sh.select(
        "doc_id", "sh", F.explode(band_buckets("sh")).alias("bucket")
    )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    cand = (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cand.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --- SimHash -----------------------------------------------------------------


def simhash_pairs(documents: DataFrame, max_hamming: int = 3) -> DataFrame:
    """64-bit SimHash near-dup pairs.

    Candidates: equal 16-bit block in any of 4 block positions (pigeonhole:
    hamming<=3 over 4 blocks guarantees one equal block) — a relational
    equi-join per block; then exact popcount filter.
    """

    @F.pandas_udf(LongType())
    def simhash64(texts: pd.Series) -> pd.Series:
        out = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            words = (t or "").lower().split()
            if not words:
                out[i] = 0
                continue
            hs = np.fromiter((_fnv1a(w) for w in words), dtype=np.uint64, count=len(words))
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
                np.int64
            )
            v = (2 * bits - 1).sum(axis=0)
            val = int.from_bytes(np.packbits((v > 0).astype(np.uint8)).tobytes(), "big")
            out[i] = np.int64(np.uint64(val))
        return pd.Series(out)

    n_parts = int(documents.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    docs = documents.repartition(n_parts, "doc_id").select(
        "doc_id", simhash64("text").alias("sh64")
    )
    blocks = [
        docs.select(
            "doc_id",
            "sh64",
            F.lit(bi).alias("blk"),
            F.shiftrightunsigned(F.col("sh64"), bi * 16).bitwiseAND(F.lit(0xFFFF)).alias("key"),
        )
        for bi in range(4)
    ]
    bucketed = blocks[0]
    for blx in blocks[1:]:
        bucketed = bucketed.unionByName(blx)
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.sh64").alias("ha"),
            F.col("b.sh64").alias("hb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cand.filter(hamming <= max_hamming).select(
        "id_a", "id_b", hamming.alias("hamming")
    )


# --- embedding cosine near-dup ------------------------------------------------


def cosine_col(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns — relational
    (zip_with + aggregate), no UDF."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    return dot / (na * nb)


def embedding_neardup_blocked(embeddings: DataFrame, threshold: float = 0.95) -> DataFrame:
    """All pairs with cosine >= threshold via blocked GEMM.

    The normalized embedding matrix is broadcast to every executor
    (a 10^6 x 64 float32 matrix is 256 MB — fits executor memory); each
    task multiplies its partition's block against the full matrix with
    one numpy matmul and emits only pairs (i < j) above threshold.
    O(n^2) FLOPs but vectorized and embarrassingly parallel — the exact
    path for mid-size corpora; beyond that use similarity.lsh_ann.
    """
    import pandas as pd  # noqa: F811 (local to keep the closure light)

    rows = embeddings.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    mat = np.stack([np.asarray(rows[i].embedding, dtype=np.float64) for i in order])
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    sc = embeddings.sparkSession.sparkContext
    b_ids = sc.broadcast(ids)
    b_mat = sc.broadcast(mat)
    thr = float(threshold)

    def block(batches):
        all_ids = b_ids.value
        all_mat = b_mat.value
        pos = {int(v): i for i, v in enumerate(all_ids)}
        for pdf in batches:
            if not len(pdf):
                continue
            idx = np.fromiter((pos[int(v)] for v in pdf["vec_id"]), dtype=np.int64,
                              count=len(pdf))
            sims = all_mat[idx] @ all_mat.T  # (block, n)
            keep_i, keep_j = np.nonzero(sims >= thr)
            gi = idx[keep_i]
            gj = keep_j
            mask = gi < gj  # canonical i<j, drops self-pairs
            yield pd.DataFrame(
                {
                    "id_a": all_ids[gi[mask]],
                    "id_b": all_ids[gj[mask]],
                    "cosine": np.round(sims[keep_i[mask], keep_j[mask]], 6),
                }
            )

    return embeddings.select("vec_id").mapInPandas(
        block, schema="id_a long, id_b long, cosine double"
    )


def embedding_neardup(embeddings: DataFrame, threshold: float = 0.95) -> DataFrame:
    """All pairs with cosine >= threshold.  Pure-relational exact
    variant (zip_with/aggregate — deterministic sequential summation,
    used by the DuckDB-oracle correctness gate).  For throughput use
    embedding_neardup_blocked; for web scale use similarity.lsh_ann."""
    a = embeddings.alias("a")
    b = embeddings.alias("b")
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
    cos = cosine_col(F.col("a.embedding"), F.col("b.embedding"))
    return (
        pairs.select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round(cos, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )

"""Interleaved A/B of two CODE VERSIONS on the same corpus and the same
noise window (the protocol that settled the round-3 ivf question, now
generalized: tools/scaling_interleaved.py interleaves cluster sizes,
this interleaves git revisions).

Co-tenant noise on this host swings identical runs 2-6x, so comparing
BENCH_rN.json files across rounds cannot distinguish a regression from
a noisy window.  Here version A and version B legs alternate
(A/B/A/B/...) as separate spark-submit invocations against one
materialized corpus; each adjacent pair shares a noise window and the
per-query min-of-reps ratio B/A is reported per pair with its median.

    python tools/ab_versions.py WORKTREE REV [rounds] [cores]

WORKTREE is usually 'HEAD' (the current working tree, uncommitted edits
included); REV is any git rev to compare against (extracted via
`git archive`).  Emits one JSON line:
  {"a": ..., "b": ..., "queries": {q: {"a": [...], "b": [...],
   "ratio_b_over_a": [...], "median_ratio": r}}}
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERIES = os.environ.get(
    "AB_QUERIES", "spatial_join,tile_pixels,knn_indexed,dn2toa_pixels"
).split(",")

_LEG = r'''
import json, os, sys, time
from pyspark.sql import SparkSession
import pyspark.sql.functions as F

cores = sys.argv[1]
base = sys.argv[2]
queries = sys.argv[3].split(",")
reps = int(os.environ.get("AB_REPS", "3"))

from ukis_pysat_spark.operators import dedup, graph, knn, polygonize, rasterize, spatial_join, tiling, transforms, zonal
from ukis_pysat_spark import sinks
from ukis_pysat_spark.operators import terrain

spark = (
    SparkSession.builder.master(f"local[{cores}]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "128")
    .config("spark.sql.parquet.columnarReaderBatchSize", "128")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
images = spark.read.parquet(f"{base}/images")
aois = spark.read.parquet(f"{base}/aois")
toa_images = spark.read.parquet(f"{base}/toa_images")
toa_metadata = spark.read.parquet(f"{base}/toa_metadata")
SF_DIR = os.environ.get("AB_SF_DIR", "/root/testdata/sf0.1")

FNS = {
    "spatial_join": lambda: spatial_join.spatial_join(images, aois, res=12).count(),
    "tile_pixels": lambda: tiling.tile_pixels(images, 32, 32, 4).count(),
    "knn_indexed": lambda: knn.knn_indexed(images, aois, k=5, res=6, ring=2).count(),
    "dn2toa_pixels": lambda: transforms.dn2toa(toa_images, toa_metadata).count(),
    "zonal_stats": lambda: zonal.zonal_stats(images, aois, res=12).count(),
    "zonal_mode": lambda: zonal.zonal_mode(images, aois, res=12).count(),
    "rasterize": lambda: rasterize.rasterize(images, aois, res=12).count(),
    "polygonize": lambda: polygonize.polygonize(images, band=0, quantize=256.0).count(),
    "phash_neardup": lambda: dedup.phash_neardup(
        spark.read.parquet(f"{base}/hashes"), max_hamming=4
    ).count(),
    "gtiff_roundtrip": lambda: sinks.from_geotiff(
        sinks.to_geotiff(toa_images, compression="deflate")
    ).count(),
    "viewshed": lambda: transforms.apply_transforms(
        images, [terrain.viewshed((64, 64), oh=2.0, maxdist=24)], out_fmt="raw"
    ).count(),
    "simhash_docs": lambda: dedup.simhash_pairs(
        spark.read.parquet(f"{SF_DIR}/documents.parquet"), max_hamming=6
    ).count(),
    "ngram_jaccard": lambda: dedup.ngram_jaccard_pairs(
        spark.read.parquet(f"{SF_DIR}/documents.parquet"), n=3, threshold=0.4
    ).count(),
    "dedup_clusters_blocked": lambda: graph.connected_components(
        dedup.embedding_neardup_blocked(
            spark.read.parquet(f"{SF_DIR}/embeddings.parquet"), threshold=0.35
        )
    ).count(),
}
out = {}
for q in queries:
    fn = FNS[q]
    fn()  # warm-up
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(round(time.perf_counter() - t0, 3))
    out[q] = ts
print(json.dumps(out))
spark.stop()
'''


def _zip_tree(pkg_root: str, path: str) -> str:
    with zipfile.ZipFile(path, "w") as z:
        pkg = os.path.join(pkg_root, "ukis_pysat_spark")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, pkg_root))
    return path


def _zip_for(rev: str, tag: str) -> str:
    if rev == "HEAD":
        return _zip_tree(REPO, f"/tmp/ab_{tag}.zip")
    tree = f"/tmp/ab_tree_{tag}"
    shutil.rmtree(tree, ignore_errors=True)
    os.makedirs(tree)
    ar = subprocess.run(
        ["git", "-C", REPO, "archive", rev, "ukis_pysat_spark"],
        capture_output=True, check=True,
    )
    subprocess.run(["tar", "-x", "-C", tree], input=ar.stdout, check=True)
    return _zip_tree(tree, f"/tmp/ab_{tag}.zip")


def run_leg(zip_path: str, cores: int, base: str) -> dict:
    cmd = [
        "spark-submit",
        "--master", f"local[{cores}]",
        "--driver-memory", "16g",
        "--conf", "spark.driver.extraJavaOptions=-XX:MaxDirectMemorySize=8g",
        "--py-files", zip_path,
        "/tmp/ab_leg.py", str(cores), base, ",".join(QUERIES),
    ]
    timeout = int(os.environ.get("AB_LEG_TIMEOUT", "1200"))
    for attempt in (1, 2):
        try:
            # cwd must NOT be the repo: PySpark workers put the driver's
            # cwd on sys.path, and a leg running rev B would mix B's
            # zipped modules with HEAD modules imported from the repo
            # tree (observed: old rasterize calling new zonal._ring_info)
            out = subprocess.run(
                cmd, capture_output=True, text=True, timeout=timeout, cwd="/tmp"
            )
        except subprocess.TimeoutExpired:
            print(f"leg attempt {attempt} timed out; retrying", file=sys.stderr)
            continue
        for line in out.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
        print(f"leg attempt {attempt} no JSON:\n{out.stderr[-1500:]}", file=sys.stderr)
    raise RuntimeError("leg failed twice")


def main() -> None:
    rev_a = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
    rev_b = sys.argv[2] if len(sys.argv) > 2 else "HEAD~1"
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cores = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    base = os.environ.get("AB_CORPUS", "/tmp/upss_bench_sf0.1")
    with open("/tmp/ab_leg.py", "w") as f:
        f.write(_LEG)
    za = _zip_for(rev_a, "a")
    zb = _zip_for(rev_b, "b")

    per_q: dict[str, dict] = {q: {"a": [], "b": []} for q in QUERIES}
    for i in range(rounds):
        a = run_leg(za, cores, base)
        b = run_leg(zb, cores, base)
        for q in QUERIES:
            per_q[q]["a"].append(min(a[q]))
            per_q[q]["b"].append(min(b[q]))
        print(json.dumps({"round": i, "a": a, "b": b}), file=sys.stderr)

    result = {"a": rev_a, "b": rev_b, "cores": cores, "queries": {}}
    for q in QUERIES:
        ratios = sorted(
            round(tb / ta, 3) for ta, tb in zip(per_q[q]["a"], per_q[q]["b"])
        )
        result["queries"][q] = {
            "a": per_q[q]["a"],
            "b": per_q[q]["b"],
            "ratio_b_over_a": ratios,
            "median_ratio": ratios[len(ratios) // 2],
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Sieve filter vs an independent pure-python reference of the same
round/union spec, plus invariant and closed-form fixtures."""

import numpy as np
import pytest

from ukis_pysat_spark import codec
from ukis_pysat_spark.operators import polygonize, transforms
from tests.test_terrain import _img_df


def _ref_sieve(plane, nod, threshold):
    """Independent reference: BFS labeling + per-round dict/set merge
    following the documented spec (largest (size, id) neighbor, uphill
    orientation, union-find by explicit root maps)."""
    h, w = plane.shape
    plane = plane.astype(float).copy()

    def label():
        lab = -np.ones((h, w), dtype=int)
        regions = {}
        for r in range(h):
            for c in range(w):
                if lab[r, c] != -1:
                    continue
                rid = r * w + c
                stack = [(r, c)]
                lab[r, c] = rid
                px = []
                while stack:
                    rr, cc = stack.pop()
                    px.append((rr, cc))
                    for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                        r2, c2 = rr + dr, cc + dc
                        if 0 <= r2 < h and 0 <= c2 < w and lab[r2, c2] == -1 \
                                and plane[r2, c2] == plane[r, c]:
                            lab[r2, c2] = rid
                            stack.append((r2, c2))
                regions[rid] = px
        return lab, regions

    lab, regions = label()
    root = {rid: rid for rid in regions}
    size = {rid: len(px) for rid, px in regions.items()}
    val = {rid: plane[px[0]] for rid, px in regions.items()}

    def find(x):
        while root[x] != x:
            x = root[x]
        return x

    def adjacency():
        adj = {}
        for r in range(h):
            for c in range(w):
                for dr, dc in ((0, 1), (1, 0)):
                    r2, c2 = r + dr, c + dc
                    if r2 >= h or c2 >= w:
                        continue
                    a, b = find(lab[r, c]), find(lab[r2, c2])
                    if a == b:
                        continue
                    if nod is not None and (val[a] == nod or val[b] == nod):
                        continue
                    adj.setdefault(a, set()).add(b)
                    adj.setdefault(b, set()).add(a)
        return adj

    while True:
        adj = adjacency()
        merges = []
        for rid in sorted(root):
            if find(rid) != rid:
                continue
            if nod is not None and val[rid] == nod:
                continue
            if size[rid] >= threshold or rid not in adj:
                continue
            best = max(adj[rid], key=lambda n: (size[n], n))
            if (size[best], best) > (size[rid], rid):
                merges.append((rid, best))
        if not merges:
            break
        for s, d in merges:
            root[s] = d
        # recompute sizes on roots
        new_size = {}
        for rid in root:
            if find(rid) == rid:
                new_size[rid] = 0
        for rid, px in regions.items():
            new_size[find(rid)] += len(px)
        size = {k: v for k, v in new_size.items()}
    out = np.empty((h, w))
    for rid, px in regions.items():
        v = val[find(rid)]
        for p in px:
            out[p] = v
    return out


def _run_sieve(spark, plane, threshold, nodata=0.0):
    df = _img_df(spark, plane, nodata=nodata)
    out = transforms.apply_transforms(
        df, [polygonize.sieve(threshold)], out_fmt="raw"
    )
    return codec.decode(bytes(out.first()["bytes"]))[0]


def test_sieve_differential_random(spark):
    rng = np.random.Generator(np.random.Philox(key=np.uint64(23)))
    for trial in range(4):
        plane = rng.integers(0, 4, size=(9, 11)).astype(np.float64) * 10.0
        if trial % 2:
            plane[rng.random((9, 11)) < 0.15] = 0.0  # nodata holes
        for threshold in (2, 4):
            got = _run_sieve(spark, plane, threshold)
            want = _ref_sieve(plane, 0.0, threshold)
            assert np.array_equal(got, want), (trial, threshold)


def test_sieve_speck_removal(spark):
    # salt specks on a uniform background vanish; background unchanged
    plane = np.full((8, 10), 5.0)
    plane[2, 3] = plane[5, 7] = plane[6, 1] = 9.0
    out = _run_sieve(spark, plane, threshold=2, nodata=None)
    assert np.all(out == 5.0)


def test_sieve_small_pair_unions_above_threshold(spark):
    # two adjacent size-1 regions of DIFFERENT values: with
    # threshold=2 each is small; they may union with each other or the
    # background — afterwards no valid region below threshold remains
    plane = np.full((6, 6), 5.0)
    plane[2, 2], plane[2, 3] = 7.0, 9.0
    out = _run_sieve(spark, plane, threshold=3, nodata=None)
    labs = polygonize.label_regions(out)
    ids, counts = np.unique(labs, return_counts=True)
    assert counts.min() >= 3


def test_sieve_nodata_untouched(spark):
    plane = np.full((6, 8), 5.0)
    plane[0:2, :] = 0.0  # nodata strip
    plane[3, 3] = 9.0
    out = _run_sieve(spark, plane, threshold=2)
    assert np.array_equal(out[0:2, :], plane[0:2, :])  # strip intact
    assert out[3, 3] == 5.0  # speck absorbed
    # a small region fully enclosed by nodata has no neighbor: kept
    plane2 = np.zeros((5, 5))
    plane2[2, 2] = 7.0
    out2 = _run_sieve(spark, plane2, threshold=4)
    assert out2[2, 2] == 7.0


def test_sieve_band_scope_and_validation(spark):
    arr = np.full((2, 6, 6), 5.0)
    arr[0, 2, 2] = 9.0
    arr[1, 2, 2] = 9.0
    df = _img_df(spark, arr, nodata=None)
    out = codec.decode(
        bytes(
            transforms.apply_transforms(
                df, [polygonize.sieve(2, band=0)], out_fmt="raw"
            ).first()["bytes"]
        )
    )
    assert out[0, 2, 2] == 5.0 and out[1, 2, 2] == 9.0
    with pytest.raises(ValueError):
        polygonize.sieve(0)

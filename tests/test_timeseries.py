"""Temporal gap-fill vs a brute per-pixel python reference."""

import numpy as np
import pytest

from ukis_pysat_spark import codec
from ukis_pysat_spark.operators import timeseries


def _series_df(spark, stacks, ts, nodata=0.0, sid="s0"):
    rows = []
    for k, arr in enumerate(stacks):
        rows.append(
            (
                sid,
                float(ts[k]),
                bytearray(codec.encode(arr, "raw")),
                [0.5, 0.0, -10.0, 0.0, -0.5, 60.0],
                nodata,
            )
        )
    return spark.createDataFrame(
        rows,
        "series_id string, epoch double, bytes binary, "
        "transform array<double>, nodata double",
    )


def _brute_fill(stacks, ts, nod):
    T = len(stacks)
    out = [a.astype(float).copy() for a in stacks]
    nb, h, w = stacks[0].shape
    for b in range(nb):
        for r in range(h):
            for c in range(w):
                vals = [stacks[k][b, r, c] for k in range(T)]
                valid = [k for k in range(T) if vals[k] != nod]
                for k in range(T):
                    if vals[k] != nod:
                        continue
                    prevs = [j for j in valid if j < k]
                    nxts = [j for j in valid if j > k]
                    if prevs and nxts:
                        p, n = prevs[-1], nxts[0]
                        frac = (ts[k] - ts[p]) / (ts[n] - ts[p])
                        out[k][b, r, c] = vals[p] + (vals[n] - vals[p]) * frac
                    elif prevs:
                        out[k][b, r, c] = vals[prevs[-1]]
                    elif nxts:
                        out[k][b, r, c] = vals[nxts[0]]
    return out


def test_gapfill_differential_random(spark):
    rng = np.random.Generator(np.random.Philox(key=np.uint64(83)))
    T = 5
    ts = [0.0, 1.0, 2.5, 4.0, 7.0]
    stacks = [
        rng.integers(1, 100, size=(2, 4, 6)).astype(np.float64) for _ in range(T)
    ]
    for a in stacks:
        a[rng.random((2, 4, 6)) < 0.4] = 0.0
    stacks[2][0, 0, 0] = 0.0
    df = _series_df(spark, stacks, ts)
    rows = timeseries.gapfill_series(df).collect()
    assert len(rows) == T
    want = _brute_fill(stacks, ts, 0.0)
    total_filled = 0
    for r in rows:
        k = ts.index(r["epoch"])
        got = codec.decode(bytes(r["bytes"]))
        assert np.array_equal(got, want[k]), k
        n_should = int(
            ((stacks[k] == 0.0) & (got != 0.0)).sum()
        )
        assert r["n_filled"] == n_should
        total_filled += r["n_filled"]
    assert total_filled > 0


def test_gapfill_input_order_irrelevant(spark):
    rng = np.random.Generator(np.random.Philox(key=np.uint64(89)))
    ts = [0.0, 2.0, 4.0]
    stacks = [rng.integers(1, 50, size=(1, 3, 3)).astype(float) for _ in ts]
    stacks[1][0, 1, 1] = 0.0
    df = _series_df(spark, stacks, ts)
    shuffled = _series_df(spark, stacks[::-1], ts[::-1])
    a = {r["epoch"]: bytes(r["bytes"]) for r in timeseries.gapfill_series(df).collect()}
    b = {r["epoch"]: bytes(r["bytes"]) for r in timeseries.gapfill_series(shuffled).collect()}
    assert a == b


def test_gapfill_mixed_grid_raises(spark):
    ts = [0.0, 1.0]
    s = [np.ones((1, 3, 3)), np.ones((1, 4, 4))]
    with pytest.raises(Exception, match="mixes grids"):
        timeseries.gapfill_series(_series_df(spark, s, ts)).collect()


def test_gapfill_all_nodata_passthrough(spark):
    ts = [0.0, 1.0]
    s = [np.zeros((1, 2, 2)), np.zeros((1, 2, 2))]
    rows = timeseries.gapfill_series(_series_df(spark, s, ts)).collect()
    for r in rows:
        assert np.all(codec.decode(bytes(r["bytes"])) == 0.0)
        assert r["n_filled"] == 0


def _brute_composite(stacks, nod, stat):
    nb, h, w = stacks[0].shape
    out = np.zeros((nb, h, w))
    for b in range(nb):
        for r in range(h):
            for c in range(w):
                vals = sorted(
                    a[b, r, c] for a in stacks if nod is None or a[b, r, c] != nod
                )
                k = len(vals)
                if stat == "count":
                    out[b, r, c] = float(k)
                elif k == 0:
                    out[b, r, c] = nod
                elif stat == "mean":
                    out[b, r, c] = sum(vals) / k
                elif stat == "min":
                    out[b, r, c] = vals[0]
                elif stat == "max":
                    out[b, r, c] = vals[-1]
                else:  # interpolated median
                    out[b, r, c] = (vals[(k - 1) // 2] + vals[k // 2]) / 2.0
    return out


def test_composite_differential_all_stats(spark):
    rng = np.random.Generator(np.random.Philox(key=np.uint64(97)))
    ts = [0.0, 1.0, 2.0, 5.0, 6.0, 9.0]
    stacks = [
        rng.integers(1, 200, size=(2, 5, 4)).astype(np.float64) for _ in ts
    ]
    for a in stacks:
        a[rng.random((2, 5, 4)) < 0.35] = 0.0
    # one pixel with NO valid epoch at all
    for a in stacks:
        a[1, 4, 3] = 0.0
    df = _series_df(spark, stacks, ts)
    for stat in timeseries._COMPOSITE_STATS:
        row = timeseries.composite_series(df, stat=stat).first()
        assert row["stat"] == stat and row["n_epochs"] == len(ts)
        got = codec.decode(bytes(row["bytes"]))
        want = _brute_composite(stacks, 0.0, stat)
        assert np.array_equal(got, want), stat
        assert row["nodata"] == 0.0
    with pytest.raises(ValueError, match="composite stat"):
        timeseries.composite_series(df, stat="mode")


def test_composite_multi_series_grouping(spark):
    ts = [0.0, 1.0, 2.0]
    a = [np.full((1, 2, 2), float(10 + k)) for k in range(3)]
    b = [np.full((1, 2, 2), float(40 + 2 * k)) for k in range(3)]
    df = _series_df(spark, a, ts, sid="sA").unionByName(
        _series_df(spark, b, ts, sid="sB")
    )
    rows = {
        r["series_id"]: codec.decode(bytes(r["bytes"]))
        for r in timeseries.composite_series(df, stat="median").collect()
    }
    assert set(rows) == {"sA", "sB"}
    assert np.all(rows["sA"] == 11.0) and np.all(rows["sB"] == 42.0)


def _brute_trend(stacks, ts, nod):
    T = len(stacks)
    nb, h, w = stacks[0].shape
    slope = np.full((nb, h, w), nod)
    intercept = np.full((nb, h, w), nod)
    nval = np.zeros((nb, h, w))
    for b in range(nb):
        for r in range(h):
            for c in range(w):
                obs = [(ts[k], stacks[k][b, r, c]) for k in range(T)
                       if stacks[k][b, r, c] != nod]
                nval[b, r, c] = len(obs)
                if len(obs) < 2:
                    continue
                n = float(len(obs))
                st = sum(t for t, _ in obs)
                sv = sum(v for _, v in obs)
                stt = sum(t * t for t, _ in obs)
                stv = sum(t * v for t, v in obs)
                den = n * stt - st * st
                if den <= 0.0:
                    continue
                s = (n * stv - st * sv) / den
                slope[b, r, c] = s
                intercept[b, r, c] = (sv - s * st) / n
    return slope, intercept, nval


def test_trend_differential(spark):
    rng = np.random.Generator(np.random.Philox(key=np.uint64(53)))
    ts = [0.0, 1.0, 3.0, 4.0, 7.0]
    stacks = [
        rng.integers(1, 50, size=(2, 4, 5)).astype(np.float64) for _ in ts
    ]
    for a in stacks:
        a[rng.random((2, 4, 5)) < 0.3] = 0.0
    # a pixel with zero valid epochs and one with exactly one
    for a in stacks:
        a[0, 3, 4] = 0.0
        a[1, 0, 0] = 0.0
    stacks[2][1, 0, 0] = 17.0
    df = _series_df(spark, stacks, ts)
    rows = {r["stat"]: r for r in timeseries.trend_series(df).collect()}
    assert set(rows) == {"slope", "intercept", "n_valid"}
    bs, bi, bn = _brute_trend(stacks, ts, 0.0)
    # sums are integer-exact here, so equality is exact
    assert np.array_equal(codec.decode(bytes(rows["slope"]["bytes"])), bs)
    assert np.array_equal(codec.decode(bytes(rows["intercept"]["bytes"])), bi)
    assert np.array_equal(codec.decode(bytes(rows["n_valid"]["bytes"])), bn)
    assert rows["n_valid"]["nodata"] == 0.0
    # the single-obs pixel reports its count but nodata fit
    assert codec.decode(bytes(rows["n_valid"]["bytes"]))[1, 0, 0] == 1.0
    assert codec.decode(bytes(rows["slope"]["bytes"]))[1, 0, 0] == 0.0


def test_trend_matches_polyfit(spark):
    """Float-valued series: the sum formula agrees with np.polyfit to
    fp tolerance on a fully-valid series."""
    ts = [0.0, 2.0, 3.0, 5.0, 8.0, 13.0]
    rng = np.random.Generator(np.random.Philox(key=np.uint64(59)))
    stacks = [rng.uniform(1.0, 9.0, size=(1, 3, 3)) for _ in ts]
    df = _series_df(spark, stacks, ts, nodata=-1.0)
    rows = {r["stat"]: codec.decode(bytes(r["bytes"]))
            for r in timeseries.trend_series(df).collect()}
    arr = np.stack(stacks)  # (T, 1, 3, 3)
    for r in range(3):
        for c in range(3):
            b1, b0 = np.polyfit(ts, arr[:, 0, r, c], 1)
            assert rows["slope"][0, r, c] == pytest.approx(b1, rel=1e-10)
            assert rows["intercept"][0, r, c] == pytest.approx(b0, rel=1e-10)
    assert np.all(rows["n_valid"] == len(ts))


def test_gapfill_rejects_duplicate_epochs(spark):
    """ADVICE r5: duplicate epochs make the interpolation denominator
    ambiguous — gapfill must reject them loudly; composite accepts
    them (repeat observations are legitimate under a median)."""
    import pytest as _pytest

    from ukis_pysat_spark import codec as _codec

    rows = []
    for t in (0.0, 1.0, 1.0):
        arr = np.full((1, 2, 2), 3.0 + t)
        rows.append(("s0", t, bytearray(_codec.encode(arr, "raw")),
                     [1.0, 0.0, 0.0, 0.0, -1.0, 0.0], 0.0))
    df = spark.createDataFrame(
        rows,
        "series_id string, epoch double, bytes binary, "
        "transform array<double>, nodata double",
    )
    with _pytest.raises(Exception, match="duplicate epoch"):
        timeseries.gapfill_series(df).collect()
    # composite over the same rows is fine
    assert timeseries.composite_series(df, stat="median").count() == 1

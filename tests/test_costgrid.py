"""cost_distance_grid: the tiled halo-exchange scale path must equal
the single-image terrain.cost_distance on the assembled raster, bit
for bit — including barrier corridors that force shortest paths to
cross tile boundaries repeatedly — and must converge in O(tile-graph
crossings) halo rounds, not O(pixel hop count)."""

from __future__ import annotations

import numpy as np

from ukis_pysat_spark import codec
from ukis_pysat_spark.operators import costgrid, terrain

GT = [0.25, 0.0, -10.0, 0.0, -0.25, 60.0]


def _tiles_df(spark, z: np.ndarray, tile: int, nodata: float = 0.0):
    h, w = z.shape
    rows = []
    for ty in range(h // tile):
        for tx in range(w // tile):
            seg = z[ty * tile : (ty + 1) * tile, tx * tile : (tx + 1) * tile]
            rows.append(
                {
                    "image_id": f"t_{tx}_{ty}",
                    "bytes": bytearray(codec.encode(seg[None], "raw")),
                    "transform": [
                        GT[0], 0.0, GT[2] + tx * tile * GT[0],
                        0.0, GT[4], GT[5] + ty * tile * GT[4],
                    ],
                    "nodata": nodata,
                }
            )
    return spark.createDataFrame(
        rows,
        "image_id string, bytes binary, transform array<double>, nodata double",
    )


def _assemble(rows, h, w, tile):
    out = np.full((h, w), np.nan)
    for r in rows:
        tx, ty = (int(v) for v in r["image_id"].split("_")[1:])
        arr = codec.decode(bytes(r["bytes"]))
        out[ty * tile : ty * tile + arr.shape[1], tx * tile : tx * tile + arr.shape[2]] = arr[0]
    assert not np.isnan(out).any()
    return out


def _untiled(z: np.ndarray) -> np.ndarray:
    t = terrain.cost_distance()
    out, _ = t(z[None], {"nodata": 0.0, "transform": GT})
    return out[0]


def test_tiled_equals_untiled_smooth(spark):
    """Fully-valid smooth cost surface: every pixel's shortest path may
    wander across all four tiles."""
    h = w = 40
    r = np.arange(h)[:, None]
    c = np.arange(w)[None, :]
    z = ((r * 3 + c * 5) % 7 + 1).astype(np.float64)
    stats: dict = {}
    got = costgrid.cost_distance_grid(
        _tiles_df(spark, z, 20), GT, tile=20, stats=stats
    ).collect()
    assert np.array_equal(_assemble(got, h, w, 20), _untiled(z))
    assert stats["halo_rounds"] <= 8, stats


def test_tiled_equals_untiled_corridor(spark):
    """Barrier walls force a serpentine corridor whose shortest paths
    cross tile boundaries many times — the shape where the halo scheme
    must keep iterating until the TRUE cross-tile fixpoint."""
    h = w = 40
    r = np.arange(h)[:, None]
    c = np.arange(w)[None, :]
    z = ((r + c) % 5 + 1).astype(np.float64)
    z[8:10, 0:36] = 0.0    # wall with a gap on the right
    z[20:22, 4:40] = 0.0   # wall with a gap on the left
    z[30:32, 0:36] = 0.0
    stats: dict = {}
    got = costgrid.cost_distance_grid(
        _tiles_df(spark, z, 20), GT, tile=20, stats=stats
    ).collect()
    assert np.array_equal(_assemble(got, h, w, 20), _untiled(z))
    # serpentine geodesic ~120 pixel hops; the halo loop converges in
    # O(boundary crossings) global rounds, not O(hops)
    assert stats["halo_rounds"] <= 12, stats


def test_disconnected_and_all_nodata_tiles(spark):
    """A tile that is pure barrier plus an unreachable pocket: barriers
    emit out_nodata, the unreachable pocket emits out_nodata (inf), and
    the reachable component matches the untiled answer."""
    h = w = 40
    z = np.zeros((h, w))
    z[0:8, 0:8] = 1.0       # component with the global min (sources)
    z[30:38, 30:38] = 5.0   # unreachable pocket (no path through 0s)
    got = costgrid.cost_distance_grid(_tiles_df(spark, z, 20), GT, tile=20).collect()
    assert np.array_equal(_assemble(got, h, w, 20), _untiled(z))

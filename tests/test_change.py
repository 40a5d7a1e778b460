"""Change detection vs a numpy oracle (b - a over mutually valid px)."""

import numpy as np
import pytest

from ukis_pysat_spark import codec, datagen
from ukis_pysat_spark.operators import change, transforms


def _epochs(spark, n=10):
    a = datagen.gen_images(spark, n, profile="mixed")
    b = transforms.apply_transforms(
        a,
        [transforms.pixel_math(lambda x: x.astype("float64") * 0.5 + 2.0)],
        out_fmt="raw",
    )
    return a, b


def test_change_stats_matches_numpy(spark):
    a, b = _epochs(spark)
    got = {
        (r["image_id"], r["band"]): r
        for r in change.change_stats(a, b, threshold=5.0).collect()
    }
    pdf = datagen.images_pdf(np.arange(10), profile="mixed")
    checked = 0
    for _, img in pdf.iterrows():
        arr = codec.decode(img["bytes"]).astype(np.float64)
        brr = arr * 0.5 + 2.0
        nod = img["nodata"]
        for band in range(arr.shape[0]):
            va = arr[band]
            vb = brr[band]
            valid = np.ones(va.shape, bool)
            if nod is not None:
                valid &= (va != nod) & (vb != nod)
            d = (vb - va)[valid]
            if d.size == 0:
                assert (img["image_id"], band) not in got
                continue
            r = got[(img["image_id"], band)]
            assert r["n_valid"] == d.size
            assert r["mean_diff"] == pytest.approx(d.mean(), rel=1e-12)
            assert (r["min_diff"], r["max_diff"]) == (d.min(), d.max())
            assert r["rmse"] == pytest.approx(
                float(np.sqrt((d * d).mean())), rel=1e-12
            )
            assert r["n_changed"] == int((np.abs(d) > 5.0).sum())
            checked += 1
    assert checked > 10


def test_change_mask_and_grid_mismatch(spark):
    a, b = _epochs(spark, n=4)
    rows = change.change_mask(a, b, threshold=5.0).collect()
    assert len(rows) == 4
    for r in rows:
        m = codec.decode(r["bytes"])
        assert m.dtype == np.uint8 and m.shape[0] == 1
        assert int(m.sum()) == r["n_changed"]
    # mismatched grids raise loudly
    import pyspark.sql.functions as F

    shifted = b.withColumn(
        "transform", F.expr("transform(transform, x -> x + 1.0)")
    )
    with pytest.raises(Exception, match="identical grids"):
        change.change_stats(a, shifted).collect()

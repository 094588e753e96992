"""Z-order layout: the footer-statistics proof. Writing the same rows
Z-ordered must shrink per-file min/max ranges on BOTH dimensions
relative to a single-column sort — the statistic parquet scan planning
actually prunes with."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from pyspark_streaming_base_spark.operators.zorder import morton_code, zorder_by


def _coverage(path: str, col_a: str, col_b: str):
    """Sum over files of the fraction of each column's global range the
    file's [min, max] spans — 'covering volume'; smaller = better
    pruning. Returns (frac_a, frac_b, n_files)."""
    files = [
        os.path.join(path, n) for n in os.listdir(path) if n.endswith(".parquet")
    ]
    stats = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        mins = {col_a: None, col_b: None}
        maxs = {col_a: None, col_b: None}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                cc = md.row_group(rg).column(ci)
                name = cc.path_in_schema
                if name in mins and cc.statistics is not None:
                    lo, hi = cc.statistics.min, cc.statistics.max
                    mins[name] = lo if mins[name] is None else min(mins[name], lo)
                    maxs[name] = hi if maxs[name] is None else max(maxs[name], hi)
        stats.append((mins, maxs))
    out = []
    for col in (col_a, col_b):
        glo = min(s[0][col] for s in stats)
        ghi = max(s[1][col] for s in stats)
        span = (ghi - glo) or 1
        out.append(sum((s[1][col] - s[0][col]) / span for s in stats) / len(stats))
    return out[0], out[1], len(files)


@pytest.fixture(scope="module")
def grid(spark):
    # a 200x200 grid: two independent uniform dimensions
    return (
        spark.range(40_000)
        .select(
            (F.col("id") % 200).alias("x"),
            (F.col("id") / 200).cast("long").alias("y"),
            F.col("id").alias("payload"),
        )
        .cache()
    )


def test_morton_code_locality(spark):
    import itertools

    df = spark.createDataFrame(
        [(x, y) for x, y in itertools.product(range(8), range(8))], "x long, y long"
    )
    rows = df.select(
        "x", "y", morton_code([F.col("x"), F.col("y")], bits=3).alias("z")
    ).collect()
    z = {(r.x, r.y): r.z for r in rows}
    assert len(set(z.values())) == 64  # bijective on the grid
    assert z[(0, 0)] == 0
    # interleave property: x contributes even bit positions, y odd
    assert z[(1, 0)] == 1 and z[(0, 1)] == 2 and z[(1, 1)] == 3
    assert z[(2, 0)] == 4 and z[(0, 2)] == 8


def test_zorder_shrinks_file_ranges_on_both_dims(spark, grid, tmp_path):
    n_parts = 16
    linear = str(tmp_path / "linear")
    zpath = str(tmp_path / "zorder")
    # baseline: sort by x only (perfect for x, shuffles y everywhere)
    grid.repartitionByRange(n_parts, "x").sortWithinPartitions("x").write.mode(
        "overwrite"
    ).parquet(linear)
    zorder_by(grid, ["x", "y"], bits=8, num_partitions=n_parts).write.mode(
        "overwrite"
    ).parquet(zpath)

    lx, ly, nl = _coverage(linear, "x", "y")
    zx, zy, nz = _coverage(zpath, "x", "y")
    assert nl > 1 and nz > 1
    # single-column sort: x tight, y spans ~everything
    assert lx < 0.2 and ly > 0.8
    # z-order: BOTH dimensions materially tighter than the bad axis
    assert zx < 0.5 and zy < 0.5, (zx, zy)
    # and the combined covering volume improves on the baseline
    assert (zx * zy) < (lx * ly) * 5  # sanity: not catastrophically worse
    assert zy < ly / 2


def test_zorder_preserves_rows(spark, grid, tmp_path):
    out = str(tmp_path / "z")
    zorder_by(grid, ["x", "y"], bits=6, num_partitions=8).write.mode(
        "overwrite"
    ).parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == grid.count()
    assert back.agg(F.sum("payload")).first()[0] == grid.agg(F.sum("payload")).first()[0]


def test_zorder_handles_constant_and_timestamp(spark, tmp_path):
    df = spark.range(100).select(
        F.lit(7).alias("c"),
        (F.col("id") * 3600).cast("timestamp").alias("ts"),
        F.col("id").alias("v"),
    )
    out = zorder_by(df, ["c", "ts"], bits=4, num_partitions=2)
    assert out.count() == 100
    with pytest.raises(ValueError):
        zorder_by(df, [], bits=4)

"""Z-order layout: per-file min/max footprints must shrink on BOTH
clustered columns (the data-skipping contract), where a linear sort
shrinks one and destroys the other."""

from __future__ import annotations

import pyarrow.parquet as pq

from ecommerce_data_pipeline_23a91a05i4_spark.operators.zorder import zorder_write
from ecommerce_data_pipeline_23a91a05i4_spark.sources.maintenance import (
    parquet_data_files,
)


def _file_ranges(path: str, col: str) -> list[tuple[int, int]]:
    out = []
    for f in parquet_data_files(path):
        md = pq.ParquetFile(f).metadata
        los, his = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    los.append(c.statistics.min)
                    his.append(c.statistics.max)
        if los:
            out.append((min(los), max(his)))
    return out


def _files_hit(ranges: list[tuple[int, int]], needle: int) -> int:
    return sum(1 for lo, hi in ranges if lo <= needle <= hi)


def test_zorder_prunes_on_both_columns(spark, tmp_path):
    n, files = 40000, 16
    grid = spark.range(n).selectExpr(
        "cast(id % 200 as long) as x",
        "cast(id div 200 as long) as y",
        "id as payload",
    )
    zpath = str(tmp_path / "zordered")
    zorder_write(grid, zpath, ["x", "y"], n_files=files)

    assert spark.read.parquet(zpath).count() == n
    xr, yr = _file_ranges(zpath, "x"), _file_ranges(zpath, "y")
    assert len(xr) == files
    # Point predicates on EITHER column must prune well.  Bounds are set
    # below the measured rates (~40% x / ~28% y) but far under the 100%
    # a single-column sort gives the non-sorted column: no single needle
    # may touch >60% of files, and the average must stay under 50%.
    needles = range(0, 200, 10)
    for ranges in (xr, yr):
        hits = [_files_hit(ranges, v) for v in needles]
        assert max(hits) <= 0.6 * files, (hits, ranges)
        assert sum(hits) / len(hits) <= 0.5 * files, hits

    # contrast: linear sort on x prunes x but every file spans all of y
    lpath = str(tmp_path / "linear")
    grid.repartitionByRange(files, "x").sortWithinPartitions("x").write.parquet(
        lpath
    )
    ly = _file_ranges(lpath, "y")
    assert _files_hit(ly, 100) == len(ly)  # y-pruning impossible


def test_zorder_handles_constant_column(spark, tmp_path):
    df = spark.range(1000).selectExpr("id as x", "cast(7 as long) as y")
    path = str(tmp_path / "const")
    zorder_write(df, path, ["x", "y"], n_files=4)
    out = spark.read.parquet(path)
    assert out.count() == 1000
    assert out.columns == ["x", "y"]

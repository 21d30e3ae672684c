"""Small-file compaction: file-count reduction, row preservation,
clustering preservation."""

import glob

import pyarrow.parquet as pq
import pytest

from datas_spark.io.maintenance import compact_parquet, table_stats


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    src = str(tmp_path / "fragmented")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # fragment: 32 tiny files
    ev.repartition(32).write.parquet(src)
    before = table_stats(spark, src)
    assert before["n_files"] == 32

    dst = str(tmp_path / "compacted")
    after = compact_parquet(
        spark, src, dst, target_file_bytes=before["total_bytes"] // 2 + 1
    )
    assert after["n_files"] <= 2
    assert after["n_rows"] == before["n_rows"]


def test_compaction_with_order_preserves_clustering(spark, tmp_path):
    src = str(tmp_path / "frag2")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.repartition(16).write.parquet(src)
    dst = str(tmp_path / "clustered")
    stats = compact_parquet(
        spark, src, dst, target_file_bytes=10_000, order_col="event_id"
    )
    assert stats["n_files"] >= 2
    # files cover disjoint event_id ranges (range exchange + local sort)
    ranges = []
    for f in glob.glob(f"{dst}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        if md.num_rows == 0:
            continue
        col = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "event_id"
        )
        st = [md.row_group(g).column(col).statistics for g in range(md.num_row_groups)]
        ranges.append((min(s.min for s in st), max(s.max for s in st)))
    ranges.sort()
    for (l1, h1), (l2, h2) in zip(ranges, ranges[1:]):
        assert h1 <= l2


def test_compaction_validation(spark, tmp_path):
    with pytest.raises(ValueError):
        compact_parquet(spark, str(tmp_path), str(tmp_path / "x"), target_file_bytes=0)

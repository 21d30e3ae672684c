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


# ---------------------------------------------------------------------------
# upsert_partitioned (MERGE-lite)
# ---------------------------------------------------------------------------

def _days_rows(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v string, day string")


def test_upsert_replaces_carries_and_appends(spark, tmp_path):
    from datas_spark.io.maintenance import upsert_partitioned

    path = str(tmp_path / "t")
    base = _days_rows(
        spark,
        [(1, "a", "d1"), (2, "b", "d1"), (3, "c", "d2"), (4, "d", "d3")],
    )
    upsert_partitioned(spark, path, base, ["k"], "day")
    batch = _days_rows(spark, [(1, "a2", "d1"), (5, "e", "d1")])
    upsert_partitioned(spark, path, batch, ["k"], "day")
    got = {
        (r.k, r.v, r.day) for r in spark.read.parquet(path).collect()
    }
    assert got == {
        (1, "a2", "d1"),  # replaced
        (2, "b", "d1"),   # carried over in the touched partition
        (5, "e", "d1"),   # appended
        (3, "c", "d2"),   # untouched partitions intact
        (4, "d", "d3"),
    }


def test_upsert_rewrites_only_touched_partitions(spark, tmp_path):
    import glob
    import os

    from datas_spark.io.maintenance import upsert_partitioned

    path = str(tmp_path / "t")
    base = _days_rows(spark, [(1, "a", "d1"), (2, "b", "d2")])
    upsert_partitioned(spark, path, base, ["k"], "day")
    before = set(glob.glob(f"{path}/day=d2/part-*"))
    mtimes = {f: os.path.getmtime(f) for f in before}
    upsert_partitioned(
        spark, path, _days_rows(spark, [(1, "a2", "d1")]), ["k"], "day"
    )
    after = set(glob.glob(f"{path}/day=d2/part-*"))
    assert after == before  # d2's files untouched by a d1-only batch
    assert all(os.path.getmtime(f) == mtimes[f] for f in after)
    assert {
        (r.k, r.v) for r in spark.read.parquet(path).where("day = 'd1'").collect()
    } == {(1, "a2")}


def test_upsert_first_write_and_validation(spark, tmp_path):
    from datas_spark.io.maintenance import upsert_partitioned

    path = str(tmp_path / "fresh")
    upsert_partitioned(spark, path, _days_rows(spark, [(1, "a", "d1")]), ["k"], "day")
    assert spark.read.parquet(path).count() == 1
    with pytest.raises(ValueError):
        upsert_partitioned(spark, path, _days_rows(spark, []), [], "day")

"""Layout optimization: sorted/range-clustered writes must yield
selective row-group statistics (the parquet data-skipping contract)."""

import glob

import pyarrow.parquet as pq
import pyspark.sql.functions as F

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.sources.layout import optimize_layout


def _value_ranges(path):
    """(min, max) of event_id per row group across all files."""
    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        meta = pq.ParquetFile(f).metadata
        for rg in range(meta.num_row_groups):
            col = next(
                meta.row_group(rg).column(i)
                for i in range(meta.row_group(rg).num_columns)
                if meta.row_group(rg).column(i).path_in_schema == "event_id"
            )
            spans.append((col.statistics.min, col.statistics.max))
    return spans


def test_optimized_layout_has_disjoint_rowgroup_stats(spark, sf_dir, tmp_path):
    (events,) = load(spark, sf_dir, "events")
    # destroy natural clustering first (what a shuffle does in practice)
    shuffled = events.repartition(8, "user_id")
    messy = str(tmp_path / "messy")
    tidy = str(tmp_path / "tidy")
    shuffled.write.parquet(messy)
    optimize_layout(shuffled, tidy, ["event_id"], n_files=8)

    total = events.count()
    lo, hi = 0, int(total * 0.1)  # a 10% range predicate on the sort key

    def overlapping(spans):
        return sum(1 for mn, mx in spans if not (mx < lo or mn > hi))

    messy_spans, tidy_spans = _value_ranges(messy), _value_ranges(tidy)
    assert len(tidy_spans) >= 4
    # messy layout: nearly every row group overlaps the range;
    # optimized: only the few covering it
    assert overlapping(messy_spans) >= len(messy_spans) * 0.9
    assert overlapping(tidy_spans) <= max(2, len(tidy_spans) * 0.3)
    # ranges are pairwise disjoint after range-partition + sort
    ordered = sorted(tidy_spans)
    assert all(a[1] <= b[0] for a, b in zip(ordered, ordered[1:]))
    # and the data survived intact
    assert spark.read.parquet(tidy).count() == total


def _spans_for(path, col_name):
    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        meta = pq.ParquetFile(f).metadata
        for rg in range(meta.num_row_groups):
            col = next(
                meta.row_group(rg).column(i)
                for i in range(meta.row_group(rg).num_columns)
                if meta.row_group(rg).column(i).path_in_schema == col_name
            )
            spans.append((col.statistics.min, col.statistics.max))
    return spans


def test_zorder_prunes_on_both_columns(spark, sf_dir, tmp_path):
    from kafka_stream_spark.sources.layout import zorder_layout

    (events,) = load(spark, sf_dir, "events")
    df = events.select("event_id", "user_id", "value").repartition(8)
    z = str(tmp_path / "z")
    lin = str(tmp_path / "lin")
    zorder_layout(df, z, ["event_id", "user_id"], n_files=8)
    optimize_layout(df, lin, ["event_id"], n_files=8)
    assert spark.read.parquet(z).count() == df.count()

    def frac_overlap(spans, lo, hi):
        hit = sum(1 for mn, mx in spans if not (mx < lo or mn > hi))
        return hit / len(spans)

    n_events = df.count()
    n_users = df.agg(F.countDistinct("user_id")).collect()[0][0]
    # Z-order trades per-dim selectivity across dims: with 8 files over 2
    # dims each file covers ~a half-range per dim, so a 10% predicate on
    # EITHER column overlaps ~half the row groups (vs ALL of them for the
    # non-clustered column of a linear layout)
    ev_hi = int(n_events * 0.1)
    assert frac_overlap(_spans_for(z, "event_id"), 0, ev_hi) <= 0.75
    u_hi = max(1, int(n_users * 0.1))
    z_frac = frac_overlap(_spans_for(z, "user_id"), 0, u_hi)
    lin_frac = frac_overlap(_spans_for(lin, "user_id"), 0, u_hi)
    assert lin_frac >= 0.9  # linear layout: user_id predicates scan everything
    assert z_frac <= 0.75, f"zorder user_id overlap {z_frac}"
    assert z_frac < lin_frac  # the point: the SECOND column still prunes


def test_compact_small_files_bin_packs(spark, sf_dir, tmp_path):
    """64 tiny files compact to the computed byte-target count; rows and
    content survive; with sort_cols the output is also range-clustered."""
    import os

    from kafka_stream_spark.operators._common import load
    from kafka_stream_spark.sources.layout import compact_small_files

    (events,) = load(spark, sf_dir, "events")
    src = str(tmp_path / "tiny")
    events.repartition(64).write.parquet(src)
    n_src = sum(f.endswith(".parquet") for f in os.listdir(src))
    assert n_src == 64
    total = sum(
        os.path.getsize(os.path.join(src, f))
        for f in os.listdir(src) if f.endswith(".parquet")
    )
    dst = str(tmp_path / "packed")
    n = compact_small_files(spark, src, dst, target_file_bytes=total // 3 + 1,
                            sort_cols=["ts"])
    assert n == 3
    n_dst = sum(f.endswith(".parquet") for f in os.listdir(dst))
    assert n_dst == 3
    a = sorted(map(tuple, spark.read.parquet(src).collect()))
    b = sorted(map(tuple, spark.read.parquet(dst).collect()))
    assert a == b

"""File-layout optimization for scan pruning (SCALING.md: push down and
prune).

Parquet readers skip whole row groups when column min/max statistics
exclude a predicate — but only if the writer clustered values so the
stats are selective. ``optimize_layout`` is the compaction/maintenance
write: range-partition by the sort key(s), sort within partitions, and
write files sized for the scan path.

At 100 TB this is the difference between "point query touches every file"
and "touches one": a time-keyed event table laid out by
``optimize_layout(df, path, ["ts"])`` serves time-range queries from the
few row groups whose [min,max] overlap the range. (The reference's
per-topic segment files are append-ordered — naturally time-clustered;
this restores that property after shuffles destroyed it.)

``repartitionByRange`` samples the key distribution, so output files are
balanced even under skew (quantile boundaries, not hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def optimize_layout(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` range-clustered + sorted by ``sort_cols``.

    Each output file covers a disjoint key range (range partitioner) and
    is internally sorted (row-group stats monotone) — maximal min/max
    selectivity for predicates on the sort keys.
    """
    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .parquet(path)
    )

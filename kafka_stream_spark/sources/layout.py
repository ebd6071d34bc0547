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


def _zvalue_expr(rank_cols: list[str], bits: int = 16) -> str:
    """Bit-interleaving expression over pre-computed integer ranks
    (JVM-side shifts/ors only — no UDF)."""
    terms = []
    for b in range(bits):
        for i, c in enumerate(rank_cols):
            # bit b of column i lands at position b*n_cols + i
            terms.append(
                f"shiftleft(cast((shiftright({c}, {b}) & 1) as bigint),"
                f" {b * len(rank_cols) + i})"
            )
    return " | ".join(terms)


def zorder_layout(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int | None = None,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Multi-column clustering via Z-order (Morton) curve (numeric cols).

    Range-clustering on one key leaves other predicates unprunable;
    interleaving the bits of each column's QUANTILE BUCKET (approx
    quantile boundaries → ``2^bits`` buckets — bucket by rank, not raw
    value, so skewed distributions still spread evenly over the curve)
    keeps row groups selective for predicates on ANY clustered column —
    the Delta/Iceberg OPTIMIZE ZORDER technique as a plain write-path
    function.

    Scale: boundaries come from ``approxQuantile`` (one distributed
    sketch pass, ≤255 doubles per column shipped as an expression
    literal — NOT a global sort); bucket lookup is a JVM-side
    ``filter``-count over that literal array, O(2^bits) comparisons per
    row. Everything stays partition-parallel.
    """
    import pyspark.sql.functions as F

    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    work = df
    rank_cols = []
    for c in cols:
        bounds = df.stat.approxQuantile(c, probs, 0.001)
        arr = "array(" + ", ".join(f"cast({b!r} as double)" for b in bounds) + ")"
        rc = f"__rank_{c}"
        work = work.withColumn(
            rc,
            F.expr(
                f"cast(size(filter({arr}, b -> b <= cast({c} as double))) as bigint)"
            ),
        )
        rank_cols.append(rc)
    work = work.withColumn("__z", F.expr(_zvalue_expr(rank_cols, bits)))
    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    (
        work.repartitionByRange(n, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *rank_cols)
        .write.mode(mode)
        .parquet(path)
    )


def compact_small_files(
    spark,
    src: str,
    dst: str,
    target_file_bytes: int = 128 << 20,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> int:
    """Small-file compaction (the OPTIMIZE/bin-packing maintenance write).

    Streaming sinks and fine-grained upserts leave directories of tiny
    files; at 100 TB that kills scan throughput (per-file open cost,
    undersized row groups, starved vectorized readers). This rewrites
    ``src`` into ``ceil(total_bytes / target_file_bytes)`` files at
    ``dst`` — with ``sort_cols`` it compacts THROUGH ``optimize_layout``
    so compaction also restores range-clustering (stats selectivity),
    otherwise a plain round-robin repartition balances bytes.

    Returns the target file count. Sizing walks the local filesystem
    (this engine's FileTopic layout); on a cluster store swap the sizing
    to the Hadoop FileSystem listing — the write path is unchanged.
    """
    import os

    total = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(src)
        for f in fs
        if f.endswith(".parquet")
    )
    n = max(1, -(-total // target_file_bytes))
    df = spark.read.parquet(src)
    if sort_cols:
        optimize_layout(df, dst, sort_cols, n_files=n, mode=mode)
    else:
        df.repartition(n).write.mode(mode).parquet(dst)
    return n

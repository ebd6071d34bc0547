"""Streaming data-quality gate: declarative row constraints routing a
stream into (valid, quarantine) with per-constraint audit counts.

The streaming face of ``dq_audit`` (operators/relational_ext) and the
constraint-level sibling of ``dlq.decode_json_with_dlq``: decode errors
go to the DLQ, rows that DECODE fine but VIOLATE business constraints
go to quarantine — with the names of every constraint they broke, so
reprocessing can be selective.

Constraints are (name, boolean Column) pairs evaluated JVM-side; both
output branches share one scan (Catalyst CSE — the P5 branch pattern),
and the violation list is built with array/filter expressions, never a
UDF. At any scale the gate adds one projection to the stream; the audit
aggregation is map-side combinable on the tiny constraint-name key.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def apply_dq_gate(
    df: DataFrame, constraints: list[tuple[str, Column]]
) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` into (valid, quarantine) on declared constraints.

    ``constraints``: (name, predicate) pairs; a row is quarantined iff
    some predicate is definitively FALSE — SQL CHECK semantics, where a
    NULL (unknown) result is NOT a violation; guard nullability with an
    explicit ``isNotNull`` constraint. Quarantined rows carry a
    ``violations`` array of the constraint names they broke (a row can
    break several). Works identically on batch and streaming frames.
    """
    flags = F.array(
        *[
            F.when(~cond, F.lit(name)).otherwise(F.lit(None))
            for name, cond in constraints
        ]
    )
    tagged = df.withColumn(
        "violations", F.filter(flags, lambda x: x.isNotNull())
    )
    valid = tagged.where(F.size("violations") == 0).drop("violations")
    quarantine = tagged.where(F.size("violations") > 0)
    return valid, quarantine


def violation_counts(quarantine: DataFrame) -> DataFrame:
    """Per-constraint violation counts from a quarantine frame (batch or
    per-microbatch inside foreachBatch): explode the violation names,
    groupBy — |constraints| rows out."""
    return (
        quarantine.select(F.explode("violations").alias("constraint"))
        .groupBy("constraint")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .orderBy("constraint")
    )

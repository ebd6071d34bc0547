"""Orphan-leg coverage for reconcile_order_totals.

The round-7 rewrite fused the orphan-lineitem left-anti join into one
full-outer join; the TPC-H test data has no orphans on either side, so
these fixtures exercise the legs the sweep never reaches: an order with
no line items, line items with no order (n_keys must count DISTINCT
orphan order keys), and the orphan_lineitem row's absence when there
are none.
"""

import os

import pytest

from kafka_stream_spark.operators.relational_ext import reconcile_order_totals


def _write_fixture(spark, tmpdir, orders_rows, lineitem_rows):
    spark.createDataFrame(
        orders_rows, "o_orderkey bigint, o_totalprice double"
    ).write.mode("overwrite").parquet(os.path.join(tmpdir, "orders.parquet"))
    spark.createDataFrame(
        lineitem_rows,
        "l_orderkey bigint, l_extendedprice double, l_discount double, l_tax double",
    ).write.mode("overwrite").parquet(os.path.join(tmpdir, "lineitem.parquet"))


def test_reconcile_all_statuses_and_orphan_lineitem_count(spark, tmp_path):
    d = str(tmp_path)
    _write_fixture(
        spark,
        d,
        [
            (1, 10.00),  # match: recomputed exactly 10.00
            (2, 20.00),  # orphan_order: no line items
            (3, 50.00),  # fact_high: lines total 30.00
            (4, 10.00),  # fact_low: lines total 20.00
        ],
        [
            (1, 10.00, 0.0, 0.0),
            (3, 30.00, 0.0, 0.0),
            (4, 20.00, 0.0, 0.0),
            # two orphan order keys, one with two lines — n_keys must be
            # the DISTINCT key count (2), not the row count (3)
            (98, 5.00, 0.0, 0.0),
            (99, 1.00, 0.0, 0.0),
            (99, 2.00, 0.0, 0.0),
        ],
    )
    rows = {r["status"]: r for r in reconcile_order_totals(spark, d).collect()}
    assert set(rows) == {
        "match", "orphan_order", "fact_high", "fact_low", "orphan_lineitem"
    }
    assert rows["match"]["n_keys"] == 1
    assert rows["match"]["sum_abs_diff_cents"] == 0
    assert rows["orphan_order"]["n_keys"] == 1
    assert rows["orphan_order"]["sum_abs_diff_cents"] == 0
    assert rows["fact_high"]["n_keys"] == 1
    assert rows["fact_high"]["sum_abs_diff_cents"] == 2000
    assert rows["fact_high"]["max_abs_diff_cents"] == 2000
    assert rows["fact_low"]["n_keys"] == 1
    assert rows["fact_low"]["sum_abs_diff_cents"] == 1000
    assert rows["orphan_lineitem"]["n_keys"] == 2
    assert rows["orphan_lineitem"]["sum_abs_diff_cents"] == 0
    assert rows["orphan_lineitem"]["max_abs_diff_cents"] == 0


def test_reconcile_no_orphan_lineitem_row_when_none(spark, tmp_path):
    d = str(tmp_path)
    _write_fixture(
        spark,
        d,
        [(1, 10.00)],
        [(1, 10.00, 0.0, 0.0)],
    )
    statuses = [r["status"] for r in reconcile_order_totals(spark, d).collect()]
    assert statuses == ["match"]

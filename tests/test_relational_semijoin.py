"""Relational semi-join (Q4 shape) and multi-way join chain (Q3 shape)
operator tests on hand-built corner-case tables: orders with no lineitems
(semi-join must drop them), the strict-> grace boundary, revenue ties
(deterministic orderkey break), and all-filtered lineitems. The hard
correctness gate is each surface's DuckDB oracle; these pin the local
semantics so failures localize."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_tpch_micro(tmp_path):
    day = np.timedelta64(1, "D")
    base = np.datetime64("1995-01-01")
    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "o_custkey": pa.array([10, 10, 20, 30, 40], pa.int64()),
        "o_orderstatus": pa.array(["O"] * 5, pa.string()),
        "o_totalprice": pa.array([100.0] * 5, pa.float64()),
        # orders 1-4 before the Q3 cutoff; order 5 after it
        "o_orderdate": pa.array(np.array(
            [base, base, base, base, np.datetime64("1996-01-01")],
            dtype="datetime64[us]")),
        "o_orderpriority": pa.array(
            ["1-URGENT", "1-URGENT", "2-HIGH", "3-MEDIUM", "1-URGENT"],
            pa.string()),
    })
    # order 1: one lineitem exactly 60 days later (NOT late, strict >)
    #          + one 61 days later (late)
    # order 2: shipped 10 days later (not late)
    # order 3: shipped 200 days later (late)
    # order 4: NO lineitems at all (semi-join must drop it)
    # order 5: one lineitem (after cutoff order — Q3 excludes the order)
    li_rows = [
        (1, base + 60 * day, 100.0, 0.10),
        (1, base + 61 * day, 200.0, 0.00),
        (2, base + 10 * day, 300.0, 0.05),
        (3, base + 200 * day, 400.0, 0.10),
        (5, np.datetime64("1996-06-01"), 500.0, 0.00),
    ]
    lineitem = pa.table({
        "l_orderkey": pa.array([r[0] for r in li_rows], pa.int64()),
        "l_shipdate": pa.array(np.array([r[1] for r in li_rows],
                                        dtype="datetime64[us]")),
        "l_extendedprice": pa.array([r[2] for r in li_rows], pa.float64()),
        "l_discount": pa.array([r[3] for r in li_rows], pa.float64()),
        "l_quantity": pa.array([1.0] * len(li_rows), pa.float64()),
        "l_tax": pa.array([0.0] * len(li_rows), pa.float64()),
        "l_returnflag": pa.array(["N"] * len(li_rows), pa.string()),
        "l_linestatus": pa.array(["O"] * len(li_rows), pa.string()),
    })
    customer = pa.table({
        "c_custkey": pa.array([10, 20, 30, 40], pa.int64()),
        "c_name": pa.array([f"c{i}" for i in (10, 20, 30, 40)], pa.string()),
        "c_mktsegment": pa.array(
            ["BUILDING", "BUILDING", "MACHINERY", "BUILDING"], pa.string()),
    })
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    pq.write_table(lineitem, str(tmp_path / "lineitem.parquet"))
    pq.write_table(customer, str(tmp_path / "customer.parquet"))
    return str(tmp_path)


def test_late_shipment_semijoin_boundary_and_missing(ray_session, tmp_path):
    from graphrag_ray import queries as q

    sf = _write_tpch_micro(tmp_path)
    df = (q.late_shipment_priority_counts(sf).to_pandas()
          .sort_values("o_orderpriority").reset_index(drop=True))
    # order 1 late (61d item), order 3 late (200d); order 2 not late
    # (10d), the 60d item is NOT late (strict >), order 4 has no
    # lineitems, order 5 shipped 152d after its own orderdate → late
    exp = pd.DataFrame({"o_orderpriority": ["1-URGENT", "2-HIGH"],
                        "n_late_orders": [2, 1]})
    pd.testing.assert_frame_equal(df, exp, check_dtype=False)


def test_top_segment_revenue_joins_filters_and_ties(ray_session, tmp_path):
    from graphrag_ray import queries as q

    sf = _write_tpch_micro(tmp_path)
    df = q.top_segment_order_revenue(sf, segment="BUILDING",
                                     cutoff="1995-03-15", k=10)
    # BUILDING customers {10, 20, 40}. Order 4 (cust 30, MACHINERY) is
    # out on segment; order 5 is out on the order-date cutoff; orders 1
    # and 2 ship entirely BEFORE the cutoff (1995-03-02/03-03 and
    # 1995-01-11) so their lineitems are filtered; order 3 (cust 20)
    # ships 1995-07-20 → the only qualifier: 400.0@10% → 40000*90
    assert list(df["o_orderkey"]) == [3]
    assert list(df["revenue_e4"]) == [3600000]

    # move the cutoff earlier so order 1's items also qualify; check the
    # integer-e4 revenue (100.0@10% → 10000*90=900000 plus 200.0@0% →
    # 20000*100=2000000 = 2900000) and the revenue-desc ordering
    df2 = q.top_segment_order_revenue(sf, segment="BUILDING",
                                      cutoff="1995-02-01", k=10)
    assert list(df2["o_orderkey"]) == [3, 1]
    assert list(df2["revenue_e4"]) == [3600000, 2900000]


def test_top_segment_revenue_tie_breaks_to_smallest_orderkey(
        ray_session, tmp_path):
    from graphrag_ray import queries as q

    day = np.timedelta64(1, "D")
    base = np.datetime64("1995-01-01")
    n = 8
    orders = pa.table({
        "o_orderkey": pa.array(range(1, n + 1), pa.int64()),
        "o_custkey": pa.array([10] * n, pa.int64()),
        "o_orderstatus": pa.array(["O"] * n, pa.string()),
        "o_totalprice": pa.array([1.0] * n, pa.float64()),
        "o_orderdate": pa.array(np.array([base] * n,
                                         dtype="datetime64[us]")),
        "o_orderpriority": pa.array(["1-URGENT"] * n, pa.string()),
    })
    lineitem = pa.table({
        "l_orderkey": pa.array(range(1, n + 1), pa.int64()),
        "l_shipdate": pa.array(np.array([base + 100 * day] * n,
                                        dtype="datetime64[us]")),
        "l_extendedprice": pa.array([50.0] * n, pa.float64()),
        "l_discount": pa.array([0.0] * n, pa.float64()),
        "l_quantity": pa.array([1.0] * n, pa.float64()),
        "l_tax": pa.array([0.0] * n, pa.float64()),
        "l_returnflag": pa.array(["N"] * n, pa.string()),
        "l_linestatus": pa.array(["O"] * n, pa.string()),
    })
    customer = pa.table({
        "c_custkey": pa.array([10], pa.int64()),
        "c_name": pa.array(["c10"], pa.string()),
        "c_mktsegment": pa.array(["BUILDING"], pa.string()),
    })
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    pq.write_table(lineitem, str(tmp_path / "lineitem.parquet"))
    pq.write_table(customer, str(tmp_path / "customer.parquet"))
    # all 8 orders tie at revenue 500000 e4; k=3 must keep keys 1,2,3
    df = q.top_segment_order_revenue(str(tmp_path), segment="BUILDING",
                                     cutoff="1995-03-15", k=3)
    assert list(df["o_orderkey"]) == [1, 2, 3]
    assert (df["revenue_e4"] == 500000).all()

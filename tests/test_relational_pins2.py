"""Round-15 GROUND_TRUTH pins for the eight remaining unpinned
relational entries (TPC-H Q2/Q5/Q11/Q12/Q16/Q17/Q19/Q20 shapes):
full-semantics pure-python recomputation over the collected sf0.001
tables, exact DECIMAL arithmetic where the entries use it. Each pin
converts an unpinned entry to the 4-round rotation cap AND makes it
retirement-eligible at 3 green driver rounds — the pin-throughput
lever the r14 capacity analysis identified."""

from __future__ import annotations

import datetime
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pytest

from optimal_parallel_fp_growth_spark.queries_relational import (
    Q2_SIZE,
    Q5_END,
    Q5_REGION,
    Q5_START,
    Q11_FRACTION,
    Q11_NATION,
    Q12_END,
    Q12_START,
    Q16_BRAND,
    Q16_SIZES,
    Q16_TYPE_PREFIX,
    Q17_BRAND,
    Q17_QTY_FACTOR,
    Q19_BRANDS,
    Q20_NAME_PREFIX,
    Q20_NATION,
    Q20_RECENT,
    q_brand_discount_revenue,
    q_important_parts,
    q_local_supplier_revenue,
    q_min_cost_part_supplier,
    q_recent_concentration_suppliers,
    q_returnflag_priority_lines,
    q_small_qty_revenue,
    q_supplier_variety,
)
from optimal_parallel_fp_growth_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"

SIX = Decimal("0.000001")


def _dec6(x: float) -> Decimal:
    """Spark's CAST(double AS DECIMAL(18,6)): java BigDecimal(double)
    .setScale(6, HALF_UP) — Decimal(float) is the same exact binary
    value, quantized the same way."""
    return Decimal(x).quantize(SIX, rounding=ROUND_HALF_UP)


def _date(v):
    return v.date() if isinstance(v, datetime.datetime) else v


@pytest.fixture(scope="module")
def tables(spark):
    t = {}
    for name in (
        "lineitem", "orders", "customer", "supplier", "nation", "part",
        "region",
    ):
        t[name] = load_table(spark, SF, name).collect()
    return t


def test_brand_discount_revenue_matches_python(spark, tables):
    part = {r.p_partkey: (r.p_brand, r.p_size) for r in tables["part"]}
    total = Decimal(0)
    for r in tables["lineitem"]:
        p = part.get(r.l_partkey)
        if p is None:
            continue
        brand, size = p
        if any(
            brand == b and size <= s and lo <= r.l_quantity <= hi
            for b, s, lo, hi in Q19_BRANDS
        ):
            total += _dec6(r.l_extendedprice * (1 - r.l_discount))
    want = float(total.quantize(Decimal("0.01"), rounding=ROUND_HALF_UP))
    got = q_brand_discount_revenue(spark, SF).collect()[0].revenue
    assert abs(got - want) < 1e-9 + 1e-12 * abs(want)


def test_small_qty_revenue_matches_python(spark, tables):
    brand_parts = {
        r.p_partkey for r in tables["part"] if r.p_brand == Q17_BRAND
    }
    per_part = defaultdict(list)
    for r in tables["lineitem"]:
        if r.l_partkey in brand_parts:
            per_part[r.l_partkey].append(r)
    total = Decimal(0)
    for rows in per_part.values():
        cap = Q17_QTY_FACTOR * (sum(r.l_quantity for r in rows) / len(rows))
        for r in rows:
            # guard: the float boundary must not be knife-edge (a
            # different summation order would then flip a row)
            assert abs(r.l_quantity - cap) > 1e-6 * max(1.0, cap)
            if r.l_quantity < cap:
                total += _dec6(r.l_extendedprice)
    want = round(float(total) / 7.0, 2)
    got = q_small_qty_revenue(spark, SF).collect()[0].avg_yearly
    assert abs(got - want) < 0.01 + 1e-9 * abs(want)


def test_returnflag_priority_lines_matches_python(spark, tables):
    lo = datetime.date.fromisoformat(Q12_START)
    hi = datetime.date.fromisoformat(Q12_END)
    prio = {r.o_orderkey: r.o_orderpriority for r in tables["orders"]}
    agg = defaultdict(lambda: [0, 0])
    for r in tables["lineitem"]:
        d = _date(r.l_shipdate)
        if not (lo <= d < hi):
            continue
        p = prio.get(r.l_orderkey)
        if p is None:
            continue
        agg[r.l_returnflag][0 if p in ("1-URGENT", "2-HIGH") else 1] += 1
    got = {
        r.l_returnflag: (r.high_line_count, r.low_line_count)
        for r in q_returnflag_priority_lines(spark, SF).collect()
    }
    assert got == {k: (v[0], v[1]) for k, v in agg.items()}


def test_supplier_variety_matches_python(spark, tables):
    complaints = {
        r.s_suppkey for r in tables["supplier"] if r.s_acctbal < 0
    }
    fam = {
        r.p_partkey: (r.p_brand, r.p_type, r.p_size)
        for r in tables["part"]
        if r.p_brand != Q16_BRAND
        and not r.p_type.startswith(Q16_TYPE_PREFIX)
        and r.p_size in Q16_SIZES
    }
    quads = set()
    for r in tables["lineitem"]:
        if r.l_suppkey in complaints:
            continue
        f = fam.get(r.l_partkey)
        if f is not None:
            quads.add((*f, r.l_suppkey))
    counts = defaultdict(int)
    for b, t, s, _ in quads:
        counts[(b, t, s)] += 1
    got = {
        (r.p_brand, r.p_type, r.p_size): r.supplier_cnt
        for r in q_supplier_variety(spark, SF).collect()
    }
    assert got == dict(counts)


def test_recent_concentration_suppliers_matches_python(spark, tables):
    small = {
        r.p_partkey
        for r in tables["part"]
        if r.p_name.startswith(Q20_NAME_PREFIX)
    }
    cutoff = datetime.date.fromisoformat(Q20_RECENT)
    pair = defaultdict(lambda: [Decimal(0), Decimal(0)])  # recent, all
    for r in tables["lineitem"]:
        if r.l_partkey not in small:
            continue
        a = pair[(r.l_suppkey, r.l_partkey)]
        q = _dec6(r.l_quantity)
        if _date(r.l_shipdate) >= cutoff:
            a[0] += q
        a[1] += q
    qualifying = {
        sk for (sk, _), (rec, life) in pair.items()
        if rec > life * Decimal("0.5")
    }
    nk = {
        r.n_nationkey for r in tables["nation"] if r.n_name == Q20_NATION
    }
    want = {
        (r.s_name, r.s_acctbal)
        for r in tables["supplier"]
        if r.s_nationkey in nk and r.s_suppkey in qualifying
    }
    got = {
        (r.s_name, r.s_acctbal)
        for r in q_recent_concentration_suppliers(spark, SF).collect()
    }
    assert got == want


def test_local_supplier_revenue_matches_python(spark, tables):
    rk = {r.r_regionkey for r in tables["region"] if r.r_name == Q5_REGION}
    nation = {
        r.n_nationkey: r.n_name
        for r in tables["nation"]
        if r.n_regionkey in rk
    }
    lo = datetime.date.fromisoformat(Q5_START)
    hi = datetime.date.fromisoformat(Q5_END)
    ordc = {
        r.o_orderkey: r.o_custkey
        for r in tables["orders"]
        if lo <= _date(r.o_orderdate) < hi
    }
    cnat = {r.c_custkey: r.c_nationkey for r in tables["customer"]}
    snat = {r.s_suppkey: r.s_nationkey for r in tables["supplier"]}
    rev = defaultdict(lambda: Decimal(0))
    for r in tables["lineitem"]:
        ck = ordc.get(r.l_orderkey)
        if ck is None:
            continue
        cn, sn = cnat.get(ck), snat.get(r.l_suppkey)
        if cn is None or sn is None or cn != sn or sn not in nation:
            continue
        rev[nation[sn]] += _dec6(r.l_extendedprice * (1 - r.l_discount))
    got = {
        r.n_name: r.revenue
        for r in q_local_supplier_revenue(spark, SF).collect()
    }
    want = {
        n: float(v.quantize(Decimal("0.01"), rounding=ROUND_HALF_UP))
        for n, v in rev.items()
    }
    assert set(got) == set(want)
    for n in want:
        assert abs(got[n] - want[n]) < 1e-9 + 1e-12 * abs(want[n])


def test_min_cost_part_supplier_matches_python(spark, tables):
    parts = {
        r.p_partkey: r.p_name
        for r in tables["part"]
        if r.p_size == Q2_SIZE
    }
    min_price: dict[int, float] = {}
    for r in tables["lineitem"]:
        if r.l_partkey in parts:
            mp = min_price.get(r.l_partkey)
            if mp is None or r.l_extendedprice < mp:
                min_price[r.l_partkey] = r.l_extendedprice
    supp = {
        r.s_suppkey: (r.s_name, r.s_acctbal, r.s_nationkey)
        for r in tables["supplier"]
    }
    nname = {r.n_nationkey: r.n_name for r in tables["nation"]}
    rows = set()
    for r in tables["lineitem"]:
        if (
            r.l_partkey in parts
            and r.l_extendedprice == min_price[r.l_partkey]
        ):
            sn, bal, nk = supp[r.l_suppkey]
            rows.add(
                (bal, sn, nname[nk], r.l_partkey, parts[r.l_partkey])
            )
        # (exact float equality on both sides: the values compared are
        # the SAME stored doubles, min() introduces no arithmetic)
    want = sorted(rows, key=lambda t: (-t[0], t[1], t[3]))[:100]
    got = [
        (r.s_acctbal, r.s_name, r.n_name, r.p_partkey, r.p_name)
        for r in q_min_cost_part_supplier(spark, SF).collect()
    ]
    assert set(got) == set(want)
    assert len(got) == len(want)


def test_important_parts_matches_python(spark, tables):
    nk = {
        r.n_nationkey for r in tables["nation"] if r.n_name == Q11_NATION
    }
    sk = {
        r.s_suppkey for r in tables["supplier"] if r.s_nationkey in nk
    }
    per_part = defaultdict(lambda: Decimal(0))
    total = Decimal(0)
    for r in tables["lineitem"]:
        if r.l_suppkey not in sk:
            continue
        v = _dec6(r.l_extendedprice * (1 - r.l_discount))
        per_part[r.l_partkey] += v
        total += v
    threshold = total * Decimal(Q11_FRACTION)
    want = {
        pk: float(v.quantize(Decimal("0.01"), rounding=ROUND_HALF_UP))
        for pk, v in per_part.items()
        if v > threshold
    }
    got = {
        r.l_partkey: r.part_value
        for r in q_important_parts(spark, SF).collect()
    }
    assert set(got) == set(want)
    for pk in want:
        assert abs(got[pk] - want[pk]) < 1e-9 + 1e-12 * abs(want[pk])

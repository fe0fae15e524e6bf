"""Round-14 GROUND_TRUTH pins for eight relational/core entries:
full-semantics pure-python recomputation over the collected sf0.001
tables (they are tiny — 6k lineitems). Each pin converts an unpinned
entry to the 4-round rotation cap AND makes it retirement-eligible
once it holds 3 green driver rounds — the pin tier's throughput is
the lever the r14 capacity analysis identified."""

from __future__ import annotations

import datetime
from collections import Counter, defaultdict

import pytest

from optimal_parallel_fp_growth_spark.queries import (
    q_count_rows,
    q_revenue_by_nation,
    q_top_orders,
)
from optimal_parallel_fp_growth_spark.queries_relational import (
    BIG_ORDER,
    Q13_EXCLUDED_PRIORITY,
    Q18_QTY,
    SHIP_CUTOFF,
    q_customer_order_counts,
    q_customers_no_big_orders,
    q_large_orders,
    q_pricing_summary,
)
from optimal_parallel_fp_growth_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tables(spark):
    t = {}
    for name in ("lineitem", "orders", "customer", "nation"):
        t[name] = load_table(spark, SF, name).collect()
    return t


def test_count_rows_matches_python(spark, tables):
    want = len({r.l_orderkey for r in tables["lineitem"]})
    assert q_count_rows(spark, SF).collect()[0].n == want


def test_revenue_by_nation_matches_python(spark, tables):
    cust = {r.c_custkey: r.c_nationkey for r in tables["customer"]}
    nation = {r.n_nationkey: r.n_name for r in tables["nation"]}
    o_cust = {r.o_orderkey: r.o_custkey for r in tables["orders"]}
    rev = defaultdict(float)
    n = Counter()
    for r in tables["lineitem"]:
        ck = o_cust.get(r.l_orderkey)
        if ck is None or ck not in cust:
            continue
        nm = nation[cust[ck]]
        rev[nm] += r.l_extendedprice * (1 - r.l_discount)
        n[nm] += 1
    got = {r.n_name: (r.revenue, r.n_lines)
           for r in q_revenue_by_nation(spark, SF).collect()}
    assert set(got) == set(rev)
    for nm in rev:
        assert got[nm][1] == n[nm]
        assert abs(got[nm][0] - rev[nm]) < 0.01 + 1e-9 * abs(rev[nm])


def test_top_orders_matches_python(spark, tables):
    names = {r.c_custkey: r.c_name for r in tables["customer"]}
    top = sorted(
        tables["orders"], key=lambda r: (-r.o_totalprice, r.o_orderkey)
    )[:10]
    want = [(r.o_orderkey, names[r.o_custkey], r.o_totalprice) for r in top]
    got = {
        (r.o_orderkey, r.c_name, r.o_totalprice)
        for r in q_top_orders(spark, SF).collect()
    }
    assert got == set(want) and len(got) == 10


def test_pricing_summary_matches_python(spark, tables):
    cutoff = datetime.date.fromisoformat(SHIP_CUTOFF)
    agg = defaultdict(lambda: [0.0, 0.0, 0.0, 0.0, 0.0, 0])
    for r in tables["lineitem"]:
        d = r.l_shipdate
        if isinstance(d, datetime.datetime):
            d = d.date()
        if d > cutoff:
            continue
        a = agg[(r.l_returnflag, r.l_linestatus)]
        disc = r.l_extendedprice * (1 - r.l_discount)
        a[0] += r.l_quantity
        a[1] += r.l_extendedprice
        a[2] += disc
        a[3] += disc * (1 + r.l_tax)
        a[4] += r.l_discount
        a[5] += 1
    got = {
        (r.l_returnflag, r.l_linestatus): r
        for r in q_pricing_summary(spark, SF).collect()
    }
    assert set(got) == set(agg)
    for k, a in agg.items():
        r = got[k]
        assert r.count_order == a[5]
        assert abs(r.sum_qty - a[0]) < 0.01 + 1e-9 * a[0]
        assert abs(r.sum_base_price - a[1]) < 0.01 + 1e-9 * a[1]
        assert abs(r.sum_disc_price - a[2]) < 0.01 + 1e-9 * a[2]
        assert abs(r.sum_charge - a[3]) < 0.01 + 1e-9 * a[3]
        assert abs(r.avg_qty - a[0] / a[5]) < 1e-5
        assert abs(r.avg_price - a[1] / a[5]) < 1e-5
        assert abs(r.avg_disc - a[4] / a[5]) < 1e-5


def test_customer_order_counts_matches_python(spark, tables):
    per = Counter()
    for r in tables["orders"]:
        if r.o_orderpriority != Q13_EXCLUDED_PRIORITY:
            per[r.o_custkey] += 1
    dist = Counter(per.get(r.c_custkey, 0) for r in tables["customer"])
    got = {
        r.c_count: r.custdist
        for r in q_customer_order_counts(spark, SF).collect()
    }
    assert got == dict(dist)


def test_large_orders_matches_python(spark, tables):
    import calendar

    qty = defaultdict(float)
    for r in tables["lineitem"]:
        qty[r.l_orderkey] += r.l_quantity
    big = {k: v for k, v in qty.items() if round(v, 2) > Q18_QTY}
    names = {r.c_custkey: r.c_name for r in tables["customer"]}
    want = {}
    for r in tables["orders"]:
        if r.o_orderkey in big:
            d = r.o_orderdate
            tt = (
                d.utctimetuple()
                if isinstance(d, datetime.datetime)
                else d.timetuple()
            )
            want[r.o_orderkey] = (
                r.o_custkey,
                names[r.o_custkey],
                calendar.timegm(tt),
                r.o_totalprice,
                round(big[r.o_orderkey], 2),
            )
    got = {
        r.orderkey: (
            r.c_custkey, r.c_name, r.o_orderdate_epoch, r.o_totalprice,
            r.total_qty,
        )
        for r in q_large_orders(spark, SF).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][:2] == want[k][:2] and got[k][3] == want[k][3]
        assert abs(got[k][4] - want[k][4]) < 1e-6
        assert got[k][2] == want[k][2], (k, got[k][2], want[k][2])


def test_customers_no_big_orders_matches_python(spark, tables):
    big_cust = {
        r.o_custkey for r in tables["orders"] if r.o_totalprice > BIG_ORDER
    }
    want = {
        r.c_custkey for r in tables["customer"] if r.c_custkey not in big_cust
    }
    got = {
        r.c_custkey for r in q_customers_no_big_orders(spark, SF).collect()
    }
    assert got == want and len(want) > 0


# --- batch 2: five more (Q6/Q14/Q3/Q10 + priority stats) -------------


def _d(x):
    if isinstance(x, datetime.datetime):
        return x.date()
    return x


def test_forecast_revenue_matches_python(spark, tables):
    from optimal_parallel_fp_growth_spark.queries_relational import (
        Q6_DISC_HI,
        Q6_DISC_LO,
        Q6_END,
        Q6_QTY,
        Q6_START,
        q_forecast_revenue,
    )

    lo = datetime.date.fromisoformat(Q6_START)
    hi = datetime.date.fromisoformat(Q6_END)
    want = sum(
        r.l_extendedprice * r.l_discount
        for r in tables["lineitem"]
        if lo <= _d(r.l_shipdate) < hi
        and Q6_DISC_LO <= r.l_discount <= Q6_DISC_HI
        and r.l_quantity < Q6_QTY
    )
    got = q_forecast_revenue(spark, SF).collect()[0].revenue
    assert abs(got - want) < 0.01 + 1e-9 * abs(want)


def test_order_priority_stats_matches_python(spark, tables):
    from optimal_parallel_fp_growth_spark.queries_relational import (
        q_order_priority_stats,
    )

    agg = defaultdict(lambda: [0, set(), 0.0])
    for r in tables["orders"]:
        a = agg[r.o_orderpriority]
        a[0] += 1
        a[1].add(r.o_custkey)
        a[2] += r.o_totalprice
    got = {
        r.o_orderpriority: (r.n_orders, r.n_customers, r.avg_price)
        for r in q_order_priority_stats(spark, SF).collect()
    }
    assert set(got) == set(agg)
    for k, a in agg.items():
        assert got[k][0] == a[0] and got[k][1] == len(a[1])
        assert abs(got[k][2] - a[2] / a[0]) < 1e-5


def test_promo_revenue_share_matches_python(spark, tables):
    from optimal_parallel_fp_growth_spark.queries_relational import (
        Q14_END,
        Q14_START,
        q_promo_revenue_share,
    )

    part_type = {
        r.p_partkey: r.p_type
        for r in load_table(spark, SF, "part").collect()
    }
    lo = datetime.date.fromisoformat(Q14_START)
    hi = datetime.date.fromisoformat(Q14_END)
    promo = total = 0.0
    for r in tables["lineitem"]:
        if not (lo <= _d(r.l_shipdate) < hi) or r.l_partkey not in part_type:
            continue
        rev = r.l_extendedprice * (1 - r.l_discount)
        total += rev
        if part_type[r.l_partkey] == "PROMO":
            promo += rev
    want = 100.0 * promo / total
    got = q_promo_revenue_share(spark, SF).collect()[0].promo_revenue_pct
    assert abs(got - want) < 1e-5


def test_shipping_priority_matches_python(spark, tables):
    import calendar

    from optimal_parallel_fp_growth_spark.queries_relational import (
        Q3_DATE,
        Q3_SEGMENT,
        q_shipping_priority,
    )

    cut = datetime.date.fromisoformat(Q3_DATE)
    seg_cust = {
        r.c_custkey
        for r in tables["customer"]
        if r.c_mktsegment == Q3_SEGMENT
    }
    ords = {
        r.o_orderkey: r
        for r in tables["orders"]
        if _d(r.o_orderdate) < cut and r.o_custkey in seg_cust
    }
    rev = defaultdict(float)
    for r in tables["lineitem"]:
        if _d(r.l_shipdate) > cut and r.l_orderkey in ords:
            rev[r.l_orderkey] += r.l_extendedprice * (1 - r.l_discount)
    ranked = sorted(rev.items(), key=lambda kv: (-round(kv[1], 2), kv[0]))[:10]
    want = {}
    for k, v in ranked:
        o = ords[k]
        d = o.o_orderdate
        tt = (
            d.utctimetuple()
            if isinstance(d, datetime.datetime)
            else d.timetuple()
        )
        want[k] = (calendar.timegm(tt), o.o_orderpriority, round(v, 2))
    got = {
        r.l_orderkey: (r.o_orderdate_epoch, r.o_orderpriority, r.revenue)
        for r in q_shipping_priority(spark, SF).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][:2] == want[k][:2]
        assert abs(got[k][2] - want[k][2]) < 1e-6


def test_returned_item_report_matches_python(spark, tables):
    from optimal_parallel_fp_growth_spark.queries_relational import (
        Q10_END,
        Q10_START,
        Q10_TOP,
        q_returned_item_report,
    )

    lo = datetime.date.fromisoformat(Q10_START)
    hi = datetime.date.fromisoformat(Q10_END)
    ords = {
        r.o_orderkey: r.o_custkey
        for r in tables["orders"]
        if lo <= _d(r.o_orderdate) < hi
    }
    cust = {r.c_custkey: r for r in tables["customer"]}
    nation = {r.n_nationkey: r.n_name for r in tables["nation"]}
    rev = defaultdict(float)
    for r in tables["lineitem"]:
        if r.l_returnflag == "R" and r.l_orderkey in ords:
            rev[ords[r.l_orderkey]] += r.l_extendedprice * (1 - r.l_discount)
    ranked = sorted(
        rev.items(), key=lambda kv: (-round(kv[1], 2), kv[0])
    )[:Q10_TOP]
    want = {
        ck: (
            cust[ck].c_name,
            cust[ck].c_acctbal,
            nation[cust[ck].c_nationkey],
            round(v, 2),
        )
        for ck, v in ranked
    }
    got = {
        r.c_custkey: (r.c_name, r.c_acctbal, r.n_name, r.revenue)
        for r in q_returned_item_report(spark, SF).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][:3] == want[k][:3]
        assert abs(got[k][3] - want[k][3]) < 1e-6


# --- batch 3: Q9 / Q7 / per-nation top-k / segment overlap -----------


def test_top_suppliers_per_nation_matches_python(spark, tables):
    from optimal_parallel_fp_growth_spark.queries_relational import (
        TOP_N,
        q_top_suppliers_per_nation,
    )

    supp = load_table(spark, SF, "supplier").collect()
    sinfo = {r.s_suppkey: (r.s_name, r.s_nationkey) for r in supp}
    rev = defaultdict(float)
    for r in tables["lineitem"]:
        if r.l_suppkey in sinfo:
            rev[r.l_suppkey] += r.l_extendedprice * (1 - r.l_discount)
    per_nation = defaultdict(list)
    for sk, v in rev.items():
        per_nation[sinfo[sk][1]].append((sk, round(v, 2)))
    want = {}
    for nk, lst in per_nation.items():
        lst.sort(key=lambda kv: (-kv[1], kv[0]))
        for rank, (sk, v) in enumerate(lst[:TOP_N], start=1):
            want[(nk, rank)] = (sk, sinfo[sk][0], v)
    got = {
        (r.s_nationkey, r.rank): (r.s_suppkey, r.s_name, r.revenue)
        for r in q_top_suppliers_per_nation(spark, SF).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][:2] == want[k][:2]
        assert abs(got[k][2] - want[k][2]) < 1e-6


def test_nation_trade_volume_matches_python(spark, tables):
    from optimal_parallel_fp_growth_spark.queries_relational import (
        Q7_END,
        Q7_NATION_A,
        Q7_NATION_B,
        Q7_START,
        q_nation_trade_volume,
    )

    lo = datetime.date.fromisoformat(Q7_START)
    hi = datetime.date.fromisoformat(Q7_END)
    nation = {r.n_nationkey: r.n_name for r in tables["nation"]}
    pair = {Q7_NATION_A, Q7_NATION_B}
    supp = {
        r.s_suppkey: nation[r.s_nationkey]
        for r in load_table(spark, SF, "supplier").collect()
        if nation[r.s_nationkey] in pair
    }
    cust = {
        r.c_custkey: nation[r.c_nationkey]
        for r in tables["customer"]
        if nation[r.c_nationkey] in pair
    }
    o_cust = {r.o_orderkey: r.o_custkey for r in tables["orders"]}
    agg = defaultdict(float)
    for r in tables["lineitem"]:
        d = _d(r.l_shipdate)
        if not (lo <= d < hi):
            continue
        sn = supp.get(r.l_suppkey)
        ck = o_cust.get(r.l_orderkey)
        cn = cust.get(ck)
        if sn is None or cn is None or sn == cn:
            continue
        agg[(sn, cn, d.year)] += r.l_extendedprice * (1 - r.l_discount)
    got = {
        (r.supp_nation, r.cust_nation, r.l_year): r.volume
        for r in q_nation_trade_volume(spark, SF).collect()
    }
    assert set(got) == set(agg)
    for k, v in agg.items():
        assert abs(got[k] - v) < 0.01 + 1e-9 * abs(v)


def test_product_line_revenue_matches_python(spark, tables):
    from optimal_parallel_fp_growth_spark.queries_relational import (
        Q9_PART_LIKE,
        q_product_line_revenue,
    )

    parts = {
        r.p_partkey
        for r in load_table(spark, SF, "part").collect()
        if Q9_PART_LIKE in r.p_name
    }
    nation = {r.n_nationkey: r.n_name for r in tables["nation"]}
    supp = {
        r.s_suppkey: nation[r.s_nationkey]
        for r in load_table(spark, SF, "supplier").collect()
    }
    o_date = {r.o_orderkey: _d(r.o_orderdate) for r in tables["orders"]}
    agg = defaultdict(float)
    for r in tables["lineitem"]:
        if r.l_partkey not in parts or r.l_orderkey not in o_date:
            continue
        sn = supp.get(r.l_suppkey)
        if sn is None:
            continue
        agg[(sn, o_date[r.l_orderkey].year)] += (
            r.l_extendedprice * (1 - r.l_discount)
        )
    got = {
        (r.nation, r.o_year): r.revenue
        for r in q_product_line_revenue(spark, SF).collect()
    }
    assert set(got) == set(agg)
    for k, v in agg.items():
        assert abs(got[k] - v) < 0.01 + 1e-9 * abs(v)


def test_segment_part_overlap_matches_python(spark, tables):
    from optimal_parallel_fp_growth_spark.queries_relational import (
        SEG_A,
        SEG_B,
        q_segment_part_overlap,
    )

    o_cust = {r.o_orderkey: r.o_custkey for r in tables["orders"]}
    seg = {r.c_custkey: r.c_mktsegment for r in tables["customer"]}

    def parts_of(segment):
        out = set()
        for r in tables["lineitem"]:
            ck = o_cust.get(r.l_orderkey)
            if ck is not None and seg.get(ck) == segment:
                out.add(r.l_partkey)
        return out

    want = parts_of(SEG_A) & parts_of(SEG_B)
    got = {r.partkey for r in q_segment_part_overlap(spark, SF).collect()}
    assert got == want and len(want) > 0


# --- batch 4: Q15 / Q8 / Q22 / Q4 / Q21 ------------------------------


def test_top_supplier_matches_python(spark, tables):
    from optimal_parallel_fp_growth_spark.queries_relational import (
        Q15_END,
        Q15_START,
        q_top_supplier,
    )

    lo = datetime.date.fromisoformat(Q15_START)
    hi = datetime.date.fromisoformat(Q15_END)
    rev = defaultdict(float)
    for r in tables["lineitem"]:
        if lo <= _d(r.l_shipdate) < hi:
            rev[r.l_suppkey] += r.l_extendedprice * (1 - r.l_discount)
    rounded = {k: round(v, 2) for k, v in rev.items()}
    mx = max(rounded.values())
    names = {
        r.s_suppkey: r.s_name
        for r in load_table(spark, SF, "supplier").collect()
    }
    want = {
        (k, names[k], v) for k, v in rounded.items() if v == mx
    }
    got = {
        (r.s_suppkey, r.s_name, r.total_revenue)
        for r in q_top_supplier(spark, SF).collect()
    }
    assert got == want and len(want) >= 1


def test_nation_revenue_share_matches_python(spark, tables):
    from optimal_parallel_fp_growth_spark.queries_relational import (
        q_nation_revenue_share,
    )

    nation = {r.n_nationkey: r.n_name for r in tables["nation"]}
    supp = {
        r.s_suppkey: nation[r.s_nationkey]
        for r in load_table(spark, SF, "supplier").collect()
    }
    o_year = {r.o_orderkey: _d(r.o_orderdate).year for r in tables["orders"]}
    rev = defaultdict(float)
    for r in tables["lineitem"]:
        y = o_year.get(r.l_orderkey)
        sn = supp.get(r.l_suppkey)
        if y is None or sn is None:
            continue
        rev[(y, sn)] += r.l_extendedprice * (1 - r.l_discount)
    year_tot = defaultdict(float)
    for (y, _), v in rev.items():
        year_tot[y] += v
    got = {
        (r.o_year, r.n_name): (r.revenue, r.share)
        for r in q_nation_revenue_share(spark, SF).collect()
    }
    assert set(got) == set(rev)
    for k, v in rev.items():
        assert abs(got[k][0] - v) < 0.01 + 1e-9 * abs(v)
        assert abs(got[k][1] - v / year_tot[k[0]]) < 1e-5


def test_idle_rich_customers_matches_python(spark, tables):
    from optimal_parallel_fp_growth_spark.queries_relational import (
        Q22_URGENT,
        q_idle_rich_customers,
    )

    pos = [r.c_acctbal for r in tables["customer"] if r.c_acctbal > 0]
    avg_bal = sum(pos) / len(pos)
    urgent = {
        r.o_custkey
        for r in tables["orders"]
        if r.o_orderpriority == Q22_URGENT
    }
    agg = defaultdict(lambda: [0, 0.0])
    for r in tables["customer"]:
        if r.c_acctbal > avg_bal and r.c_custkey not in urgent:
            a = agg[r.c_mktsegment]
            a[0] += 1
            a[1] += r.c_acctbal
    got = {
        r.c_mktsegment: (r.numcust, r.totacctbal)
        for r in q_idle_rich_customers(spark, SF).collect()
    }
    assert set(got) == set(agg)
    for k, a in agg.items():
        assert got[k][0] == a[0]
        assert abs(got[k][1] - a[1]) < 0.01 + 1e-9 * abs(a[1])


def test_late_order_priorities_matches_python(spark, tables):
    from optimal_parallel_fp_growth_spark.queries_relational import (
        q_late_order_priorities,
    )

    ship = defaultdict(list)
    for r in tables["lineitem"]:
        ship[r.l_orderkey].append(_d(r.l_shipdate))
    cnt = Counter()
    for r in tables["orders"]:
        cut = _d(r.o_orderdate) + datetime.timedelta(days=60)
        if any(d > cut for d in ship.get(r.o_orderkey, ())):
            cnt[r.o_orderpriority] += 1
    got = {
        r.o_orderpriority: r.order_count
        for r in q_late_order_priorities(spark, SF).collect()
    }
    assert got == dict(cnt)


def test_sole_late_suppliers_matches_python(spark, tables):
    from optimal_parallel_fp_growth_spark.queries_relational import (
        q_sole_late_suppliers,
    )

    per_order = defaultdict(list)
    for r in tables["lineitem"]:
        per_order[r.l_orderkey].append((r.l_suppkey, _d(r.l_shipdate)))
    waits = Counter()
    for ok, rows in per_order.items():
        supps = {s for s, _ in rows}
        if len(supps) < 2:
            continue
        mx = max(d for _, d in rows)
        at_max = {s for s, d in rows if d == mx}
        if len(at_max) == 1:
            waits[next(iter(at_max))] += 1
    names = {
        r.s_suppkey: r.s_name
        for r in load_table(spark, SF, "supplier").collect()
    }
    ranked = sorted(
        ((names[s], n) for s, n in waits.items()),
        key=lambda kv: (-kv[1], kv[0]),
    )[:20]
    got = [
        (r.s_name, r.numwait)
        for r in q_sole_late_suppliers(spark, SF).collect()
    ]
    assert sorted(got, key=lambda kv: (-kv[1], kv[0])) == ranked
    assert len(ranked) > 0


# --- batch 5: the mining/core trio (word_count, freq_items,
#     tokenize_distinct) ----------------------------------------------


def test_word_count_matches_python(spark):
    from optimal_parallel_fp_growth_spark.queries import q_word_count

    cnt = Counter()
    for r in load_table(spark, SF, "documents").select("text").collect():
        cnt.update(r.text.split(" "))
    got = [(r.word, r.cnt) for r in q_word_count(spark, SF).collect()]
    # exact counts AND the (cnt desc, word asc) total order
    assert dict(got) == dict(cnt)
    assert got == sorted(got, key=lambda kv: (-kv[1], kv[0]))


def test_freq_items_matches_python(spark, tables):
    import math

    from optimal_parallel_fp_growth_spark.queries import (
        LINEITEM_MIN_SUPPORT,
        q_freq_items,
    )

    baskets = defaultdict(set)
    for r in tables["lineitem"]:
        baskets[r.l_orderkey].add(str(r.l_partkey))
    need = math.ceil(LINEITEM_MIN_SUPPORT * len(baskets))
    cnt = Counter()
    for items in baskets.values():
        cnt.update(items)
    want = {k: v for k, v in cnt.items() if v >= need}
    got = {r.item: r.freq for r in q_freq_items(spark, SF).collect()}
    assert got == want


def test_tokenize_distinct_matches_python(spark):
    from optimal_parallel_fp_growth_spark.queries import q_tokenize_distinct

    docs = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    out = q_tokenize_distinct(spark, SF).collect()  # exploded (doc_id, item)
    got = defaultdict(list)
    for r in out:
        got[r.doc_id].append(r.item)
    assert len(got) == len(docs)
    for r in docs:
        want = set(r.text.split(" "))
        # distinct per doc: every token exactly once
        assert len(got[r.doc_id]) == len(want), r.doc_id
        assert set(got[r.doc_id]) == want, r.doc_id


# --- batch 6: events rank-family pins --------------------------------


def test_events_top_users_matches_python(spark):
    from optimal_parallel_fp_growth_spark.queries_events import (
        TOP_USERS_K,
        q_events_top_users,
    )

    ev = load_table(spark, SF, "events").select("event_type", "user_id")
    cnt = Counter((r.event_type, r.user_id) for r in ev.collect())
    per_type = defaultdict(list)
    for (t, u), n in cnt.items():
        per_type[t].append((u, n))
    want = {}
    for t, lst in per_type.items():
        lst.sort(key=lambda kv: (-kv[1], kv[0]))
        for rank, (u, n) in enumerate(lst[:TOP_USERS_K], start=1):
            want[(t, rank)] = (u, n)
    got = {
        (r.event_type, r.rank): (r.user_id, r.cnt)
        for r in q_events_top_users(spark, SF).collect()
    }
    assert got == want


def test_events_user_quartiles_matches_python(spark):
    from optimal_parallel_fp_growth_spark.queries_events import (
        q_events_user_quartiles,
    )

    ev = load_table(spark, SF, "events").select(
        "event_type", "user_id", "value"
    )
    totals = defaultdict(float)
    for r in ev.collect():
        totals[(r.event_type, r.user_id)] += r.value
    per_type = defaultdict(list)
    for (t, u), v in totals.items():
        per_type[t].append((u, round(v, 6)))
    want = {}
    for t, lst in per_type.items():
        lst.sort(key=lambda kv: (-kv[1], kv[0]))
        n = len(lst)
        base, extra = divmod(n, 4)
        # Spark ntile: the first (n % 4) tiles get one extra row
        bounds = []
        pos = 0
        for tile in range(1, 5):
            size = base + (1 if tile <= extra else 0)
            bounds.extend([tile] * size)
            pos += size
        for i, (u, v) in enumerate(lst):
            want[(t, u)] = (
                v,
                bounds[i],
                round(i / (n - 1), 6) if n > 1 else 0.0,
                round((i + 1) / n, 6),
            )
    got = {
        (r.event_type, r.user_id): (
            r.total_value, r.quartile, r.pct_rank, r.cume
        )
        for r in q_events_user_quartiles(spark, SF).collect()
    }
    assert set(got) == set(want)
    for k, (v, q, pr, cu) in want.items():
        gv, gq, gpr, gcu = got[k]
        assert abs(gv - v) < 1e-6 and gq == q, k
        assert abs(gpr - pr) < 1e-6 and abs(gcu - cu) < 1e-6, k

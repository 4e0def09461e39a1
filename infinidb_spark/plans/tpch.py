"""The reference's TPC-H suite, run through the MySQL front-end.

The reference documents and validates itself against the full TPC-H
workload: ``dbcon/doc/tpch01.sql``-``tpch22.sql`` are its own copies of
the 22 functional query definitions, with matching optimizer plan dumps
(``dbcon/doc/q*_plan.txt``) — this IS the query surface a reference
user runs.  Q1/Q3/Q5/Q10 shapes already live in plans/ref_perf.py; this
module completes the suite (Q2, Q4, Q6-Q9, Q11-Q22).

Each query is the reference file's text with two kinds of adaptation,
both documented per query:

* **constants** scaled to the driver testdata's value domain
  (TESTDATA.md; nations are ``NATION_<n>``, dates span 1995-2001);
* **schema substitutions** where TESTDATA.md lacks a TPC-H column or
  table (no ``partsupp``, no ``l_commitdate/l_receiptdate/l_shipmode``,
  no ``o_comment/o_shippriority``, no ``c_phone/c_address``, no
  ``p_container/p_mfgr``).  Substitutions preserve the query's operator
  shape — e.g. Q4's EXISTS correlation keeps its correlated EXISTS but
  tests ``l_returnflag`` instead of commit-vs-receipt dates; Q9 prices
  cost from ``p_retailprice`` instead of ``ps_supplycost``; Q11/Q16/Q20
  read the part-supplier relationship from ``lineitem`` instead of
  ``partsupp``.

Corpus determinism rules (plans/registry.py) applied throughout: float
aggregates round-pinned on both sides; every LIMIT ordered by a unique
key; int-valued CASE sums cast to BIGINT on both sides (DuckDB sums
integers into HUGEINT, Spark into BIGINT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from infinidb_spark.plans.registry import query


# shared MySQL-text runner (plans/registry.py) — one copy of the
# load/translate contract
from infinidb_spark.plans.registry import run_mysql as _mysql  # noqa: E402


# --- Q1: pricing summary report (dbcon/doc/tpch01.sql) -----------------
# The one query of the suite that is fully expressible verbatim —
# including the sum_charge tax term.  (ref_pricing_summary runs the
# reference perf corpus's own Q1 variant; this is the official text.)
_Q1 = """select l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) as sum_qty,
       round(sum(l_extendedprice), 4) as sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) as sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) as sum_charge,
       round(avg(l_quantity), 6) as avg_qty,
       round(avg(l_extendedprice), 6) as avg_price,
       round(avg(l_discount), 6) as avg_disc,
       count(*) as count_order
from lineitem
where l_shipdate <= date '1998-09-02'
group by l_returnflag, l_linestatus
order by l_returnflag, l_linestatus"""


@query("tpch_q1", oracle=_Q1)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (dbcon/doc/tpch01.sql): the pricing summary — one
    date-filtered scan into a 2-phase aggregate battery of eight
    functions, including the (1-disc)(1+tax) charge expression."""
    return _mysql(spark, sf_dir, _Q1, "lineitem")


# --- Q2: minimum-cost supplier (dbcon/doc/tpch02.sql) ------------------
# No partsupp: the part-supplier link and its cost come from lineitem
# (min l_extendedprice per part within the region).  The correlated
# scalar-subquery-with-join shape — the point of Q2 — is intact.
_Q2 = """select distinct s_acctbal, s_name, n_name, p_partkey, p_name
from part, supplier, lineitem, nation, region
where p_partkey = l_partkey
  and s_suppkey = l_suppkey
  and p_size = 15
  and p_type = 'STANDARD'
  and s_nationkey = n_nationkey
  and n_regionkey = r_regionkey
  and r_name = 'EUROPE'
  and l_extendedprice = (
    select min(l2.l_extendedprice)
    from lineitem l2, supplier s2, nation n2, region r2
    where l2.l_partkey = p_partkey
      and s2.s_suppkey = l2.l_suppkey
      and s2.s_nationkey = n2.n_nationkey
      and n2.n_regionkey = r2.r_regionkey
      and r2.r_name = 'EUROPE')
order by s_acctbal desc, n_name, s_name, p_partkey
limit 100"""


@query("tpch_q2", oracle=_Q2)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (dbcon/doc/tpch02.sql; lineitem stands in for
    partsupp): correlated MIN scalar subquery over a 4-way join,
    decorrelated by Catalyst into an aggregate + rejoin.  DISTINCT +
    (s_name, p_partkey) ordering make the LIMIT set well-defined."""
    return _mysql(
        spark, sf_dir, _Q2, "part", "supplier", "lineitem", "nation", "region"
    )


# --- Q4: order priority checking (dbcon/doc/tpch04.sql) ----------------
# EXISTS correlation kept; the lineitem predicate is l_returnflag = 'R'
# (no l_commitdate/l_receiptdate in the testdata schema).
_Q4 = """select o_orderpriority, count(*) as order_count
from orders
where o_orderdate >= date '1997-07-01'
  and o_orderdate < date '1997-10-01'
  and exists (
    select * from lineitem
    where l_orderkey = o_orderkey and l_returnflag = 'R')
group by o_orderpriority
order by o_orderpriority"""


@query("tpch_q4", oracle=_Q4)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (dbcon/doc/tpch04.sql): correlated EXISTS → left-semi
    join into a date-windowed orders scan, then a small group-by."""
    return _mysql(spark, sf_dir, _Q4, "orders", "lineitem")


# --- Q6: forecasting revenue change (dbcon/doc/tpch06.sql) -------------
# Fully expressible; dates/constants in-domain (discount 0.05-0.07).
_Q6 = """select round(sum(l_extendedprice * l_discount), 4) as revenue
from lineitem
where l_shipdate >= date '1996-01-01'
  and l_shipdate < date '1997-01-01'
  and l_discount between 0.05 and 0.07
  and l_quantity < 24"""


@query("tpch_q6", oracle=_Q6)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (dbcon/doc/tpch06.sql, constants in-domain): pure
    scan-filter-aggregate — predicate fully pushed to Parquet, one
    2-phase agg, no shuffle beyond the final single-row exchange."""
    return _mysql(spark, sf_dir, _Q6, "lineitem")


# --- Q7: volume shipping (dbcon/doc/tpch07.sql) ------------------------
# Original shape: self-joined nation (n1/n2) with the symmetric
# either-direction predicate.  Nation names from the testdata domain.
_Q7 = """select supp_nation, cust_nation, l_year, round(sum(volume), 4) as revenue
from (
  select n1.n_name as supp_nation, n2.n_name as cust_nation,
         cast(extract(year from l_shipdate) as bigint) as l_year,
         l_extendedprice * (1 - l_discount) as volume
  from supplier, lineitem, orders, customer, nation n1, nation n2
  where s_suppkey = l_suppkey and o_orderkey = l_orderkey
    and c_custkey = o_custkey and s_nationkey = n1.n_nationkey
    and c_nationkey = n2.n_nationkey
    and ((n1.n_name = 'NATION_3' and n2.n_name = 'NATION_7')
      or (n1.n_name = 'NATION_7' and n2.n_name = 'NATION_3'))
    and l_shipdate between date '1996-01-01' and date '1997-12-31'
) shipping
group by supp_nation, cust_nation, l_year
order by supp_nation, cust_nation, l_year"""


@query("tpch_q7", oracle=_Q7)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (dbcon/doc/tpch07.sql): 6-way join with a self-joined
    nation dimension and a disjunctive cross-dimension predicate —
    both nation sides broadcast, fact tables shuffle on keys."""
    return _mysql(
        spark, sf_dir, _Q7,
        "supplier", "lineitem", "orders", "customer", "nation",
    )


# --- Q8: national market share (dbcon/doc/tpch08.sql) ------------------
_Q8 = """select o_year,
       round(sum(case when nation = 'NATION_5' then volume else 0 end)
             / sum(volume), 6) as mkt_share
from (
  select cast(extract(year from o_orderdate) as bigint) as o_year,
         l_extendedprice * (1 - l_discount) as volume,
         n2.n_name as nation
  from part, supplier, lineitem, orders, customer, nation n1, nation n2, region
  where p_partkey = l_partkey and s_suppkey = l_suppkey
    and l_orderkey = o_orderkey and o_custkey = c_custkey
    and c_nationkey = n1.n_nationkey and n1.n_regionkey = r_regionkey
    and r_name = 'AMERICA' and s_nationkey = n2.n_nationkey
    and o_orderdate between date '1996-01-01' and date '1997-12-31'
    and p_type = 'ECONOMY'
) all_nations
group by o_year
order by o_year"""


@query("tpch_q8", oracle=_Q8)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (dbcon/doc/tpch08.sql): the 8-way join — region filter
    through customer's nation, market share via conditional/total sum
    ratio per order year."""
    return _mysql(
        spark, sf_dir, _Q8,
        "part", "supplier", "lineitem", "orders", "customer",
        "nation", "region",
    )


# --- Q9: product type profit (dbcon/doc/tpch09.sql) --------------------
# ps_supplycost → p_retailprice (no partsupp); p_name LIKE in-domain.
_Q9 = """select nation, o_year, round(sum(amount), 4) as sum_profit
from (
  select n_name as nation,
         cast(extract(year from o_orderdate) as bigint) as o_year,
         l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity as amount
  from part, supplier, lineitem, orders, nation
  where s_suppkey = l_suppkey and p_partkey = l_partkey
    and o_orderkey = l_orderkey and s_nationkey = n_nationkey
    and p_name like '%gear%'
) profit
group by nation, o_year
order by nation, o_year desc"""


@query("tpch_q9", oracle=_Q9)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (dbcon/doc/tpch09.sql; p_retailprice prices the cost
    side — no partsupp in the testdata): LIKE-filtered part dimension
    drives a 5-way join, profit grouped by supplier nation × year."""
    return _mysql(
        spark, sf_dir, _Q9, "part", "supplier", "lineitem", "orders", "nation"
    )


# --- Q11: important stock identification (dbcon/doc/tpch11.sql) --------
# partsupp value → lineitem value (l_extendedprice * l_quantity); the
# HAVING-vs-global-scalar-subquery shape is the point and is intact.
_Q11 = """select l_partkey, round(sum(l_extendedprice * l_quantity), 4) as value
from lineitem, supplier, nation
where l_suppkey = s_suppkey and s_nationkey = n_nationkey
  and n_name = 'NATION_3'
group by l_partkey
having sum(l_extendedprice * l_quantity) > (
  select sum(l_extendedprice * l_quantity) * 0.003
  from lineitem, supplier, nation
  where l_suppkey = s_suppkey and s_nationkey = n_nationkey
    and n_name = 'NATION_3')
order by value desc, l_partkey"""


@query("tpch_q11", oracle=_Q11)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (dbcon/doc/tpch11.sql; lineitem value stands in for
    partsupp): group-by with HAVING against an uncorrelated scalar
    subquery computing the same aggregate globally."""
    return _mysql(spark, sf_dir, _Q11, "lineitem", "supplier", "nation")


# --- Q12: shipping modes and order priority (dbcon/doc/tpch12.sql) -----
# l_shipmode → l_linestatus buckets; receipt/commit window → shipdate.
# The two-branch CASE-count pivot on o_orderpriority is verbatim.
_Q12 = """select l_linestatus,
       cast(sum(case when o_orderpriority = '1-URGENT' or o_orderpriority = '2-HIGH'
                then 1 else 0 end) as bigint) as high_line_count,
       cast(sum(case when o_orderpriority <> '1-URGENT' and o_orderpriority <> '2-HIGH'
                then 1 else 0 end) as bigint) as low_line_count
from orders, lineitem
where o_orderkey = l_orderkey
  and l_linestatus in ('F', 'O')
  and l_shipdate >= date '1997-01-01' and l_shipdate < date '1998-01-01'
group by l_linestatus
order by l_linestatus"""


@query("tpch_q12", oracle=_Q12)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (dbcon/doc/tpch12.sql; l_linestatus buckets, shipdate
    window): fact-fact join + conditional-count pivot.  CASE sums cast
    to BIGINT on both sides (DuckDB would widen to HUGEINT)."""
    return _mysql(spark, sf_dir, _Q12, "orders", "lineitem")


# --- Q13: customer distribution (dbcon/doc/tpch13.sql) -----------------
# o_comment not like '%special%requests%' → o_orderpriority not like
# '%URGENT%' (no o_comment); the join-predicate-side filter on a LEFT
# OUTER join — the subtle part of Q13 — is preserved.
_Q13 = """select c_count, count(*) as custdist
from (
  select c_custkey, count(o_orderkey) as c_count
  from customer left outer join orders on
    c_custkey = o_custkey
    and o_orderpriority not like '%URGENT%'
  group by c_custkey
) c_orders
group by c_count
order by custdist desc, c_count desc"""


@query("tpch_q13", oracle=_Q13)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (dbcon/doc/tpch13.sql): LEFT OUTER join with the
    filter in the ON clause (kept, not pushed to WHERE — the semantics
    differ), double aggregation for the distribution histogram."""
    return _mysql(spark, sf_dir, _Q13, "customer", "orders")


# --- Q14: promotion effect (dbcon/doc/tpch14.sql) ----------------------
# p_type LIKE 'PROMO%' works unchanged on the testdata's type domain.
_Q14 = """select round(100.00 * sum(case when p_type like 'PROMO%'
                 then l_extendedprice * (1 - l_discount) else 0 end)
             / sum(l_extendedprice * (1 - l_discount)), 6) as promo_revenue
from lineitem, part
where l_partkey = p_partkey
  and l_shipdate >= date '1997-09-01' and l_shipdate < date '1997-10-01'"""


@query("tpch_q14", oracle=_Q14)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (dbcon/doc/tpch14.sql): conditional-revenue ratio over
    a month of lineitem joined to the part dimension (broadcast)."""
    return _mysql(spark, sf_dir, _Q14, "lineitem", "part")


# --- Q15: top supplier (dbcon/doc/tpch15.sql) --------------------------
# The reference creates a revenue view, selects the max, drops the
# view; here the view body is inlined as a derived table on both sides
# (the engine's CREATE VIEW surface is exercised by view_query).
# total_revenue is round-pinned INSIDE the derived table so the
# max-equality predicate compares identical values in both engines.
_Q15_REV = """select l_suppkey as supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 4) as total_revenue
  from lineitem
  where l_shipdate >= date '1997-01-01' and l_shipdate < date '1997-04-01'
  group by l_suppkey"""

_Q15 = f"""select s_suppkey, s_name, total_revenue
from supplier, ({_Q15_REV}) revenue0
where s_suppkey = supplier_no
  and total_revenue = (select max(total_revenue) from ({_Q15_REV}) r2)
order by s_suppkey"""


@query("tpch_q15", oracle=_Q15)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (dbcon/doc/tpch15.sql, revenue view inlined): argmax
    via self-referencing scalar subquery over the same aggregation —
    Spark computes the agg once per reference (both tiny, post-agg)."""
    return _mysql(spark, sf_dir, _Q15, "supplier", "lineitem")


# --- Q16: parts/supplier relationship (dbcon/doc/tpch16.sql) -----------
# partsupp → lineitem link; the supplier NOT IN exclusion tests
# s_acctbal < 0 (no s_comment '%Customer%Complaints%' in the schema).
_Q16 = """select p_brand, p_type, p_size, count(distinct l_suppkey) as supplier_cnt
from part, lineitem
where p_partkey = l_partkey
  and p_brand <> 'Brand#1'
  and p_type not like 'MEDIUM%'
  and p_size in (1, 4, 7, 10, 15, 23, 45, 49)
  and l_suppkey not in (
    select s_suppkey from supplier where s_acctbal < 0)
group by p_brand, p_type, p_size
order by supplier_cnt desc, p_brand, p_type, p_size"""


@query("tpch_q16", oracle=_Q16)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (dbcon/doc/tpch16.sql; lineitem link, acctbal
    exclusion): NOT IN (null-free key) anti-join + COUNT(DISTINCT)
    under a multi-predicate dimension filter."""
    return _mysql(spark, sf_dir, _Q16, "part", "lineitem", "supplier")


# --- Q17: small-quantity-order revenue (dbcon/doc/tpch17.sql) ----------
# p_container → p_size (schema); the per-part correlated AVG subquery —
# the expensive heart of Q17 — is verbatim.
_Q17 = """select round(sum(l_extendedprice) / 7.0, 4) as avg_yearly
from lineitem, part
where p_partkey = l_partkey
  and p_brand = 'Brand#23'
  and p_size = 7
  and l_quantity < (
    select 0.2 * avg(l2.l_quantity) from lineitem l2
    where l2.l_partkey = p_partkey)"""


@query("tpch_q17", oracle=_Q17)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (dbcon/doc/tpch17.sql; p_size for p_container):
    correlated AVG threshold per part — decorrelated into an aggregate
    joined back on partkey."""
    return _mysql(spark, sf_dir, _Q17, "lineitem", "part")


# --- Q18: large-volume customer (dbcon/doc/tpch18.sql) -----------------
# Quantity threshold scaled to the testdata's ~4-lineitem orders.
# o_totalprice/sum(l_quantity) are exact (stored 2-decimal doubles /
# integer-valued quantities), so no round-pin is needed; the ORDER BY
# adds o_orderkey to make the LIMIT set unique.
_Q18 = """select c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       sum(l_quantity) as sum_qty
from customer, orders, lineitem
where o_orderkey in (
    select l_orderkey from lineitem
    group by l_orderkey having sum(l_quantity) > 200)
  and c_custkey = o_custkey and o_orderkey = l_orderkey
group by c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
order by o_totalprice desc, o_orderdate, o_orderkey
limit 100"""


@query("tpch_q18", oracle=_Q18)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (dbcon/doc/tpch18.sql): IN over a group-by-HAVING
    subquery (semi-join on orderkey) feeding a 3-way join + top-100."""
    return _mysql(spark, sf_dir, _Q18, "customer", "orders", "lineitem")


# --- Q19: discounted revenue (dbcon/doc/tpch19.sql) --------------------
# Disjunction of brand/size/quantity bands (container+shipmode columns
# substituted by size/quantity bands).  The common p_partkey =
# l_partkey conjunct is factored out of the OR — the reference's
# optimizer does this extraction internally (and Catalyst would
# otherwise plan a cartesian filter).
_Q19 = """select round(sum(l_extendedprice * (1 - l_discount)), 4) as revenue
from lineitem, part
where p_partkey = l_partkey
  and ((p_brand = 'Brand#3' and p_size between 1 and 5
        and l_quantity >= 1 and l_quantity <= 11)
    or (p_brand = 'Brand#15' and p_size between 1 and 10
        and l_quantity >= 10 and l_quantity <= 20)
    or (p_brand = 'Brand#24' and p_size between 1 and 15
        and l_quantity >= 20 and l_quantity <= 30))"""


@query("tpch_q19", oracle=_Q19)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (dbcon/doc/tpch19.sql): equi-join with a 3-branch
    disjunctive residual predicate — stays a broadcast hash join (the
    equi conjunct is factored), the OR evaluates as a post-filter."""
    return _mysql(spark, sf_dir, _Q19, "lineitem", "part")


# --- Q20: potential part promotion (dbcon/doc/tpch20.sql) --------------
# partsupp availability → shipped-quantity threshold from lineitem;
# the nested IN-subquery chain (supplier ← lineitem ← part) is intact.
_Q20 = """select s_name, s_acctbal
from supplier, nation
where s_suppkey in (
    select l_suppkey from lineitem
    where l_partkey in (select p_partkey from part where p_name like 'small%')
      and l_shipdate >= date '1997-01-01' and l_shipdate < date '1998-01-01'
    group by l_suppkey
    having sum(l_quantity) > 100)
  and s_nationkey = n_nationkey
  and n_name = 'NATION_3'
order by s_name"""


@query("tpch_q20", oracle=_Q20)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (dbcon/doc/tpch20.sql; lineitem quantities for
    partsupp availability): two nested IN subqueries — part filter
    semi-joins into lineitem, HAVING threshold semi-joins into
    supplier."""
    return _mysql(spark, sf_dir, _Q20, "supplier", "nation", "lineitem", "part")


# --- Q21: suppliers who kept orders waiting (dbcon/doc/tpch21.sql) -----
# receipt-vs-commit lateness → l_returnflag = 'R' (schema); the
# EXISTS/NOT EXISTS pair over self-joined lineitem — Q21's signature
# shape — is verbatim.
_Q21 = """select s_name, count(*) as numwait
from supplier, lineitem l1, orders, nation
where s_suppkey = l1.l_suppkey and o_orderkey = l1.l_orderkey
  and o_orderstatus = 'F'
  and l1.l_returnflag = 'R'
  and exists (
    select * from lineitem l2
    where l2.l_orderkey = l1.l_orderkey and l2.l_suppkey <> l1.l_suppkey)
  and not exists (
    select * from lineitem l3
    where l3.l_orderkey = l1.l_orderkey and l3.l_suppkey <> l1.l_suppkey
      and l3.l_returnflag = 'R')
  and s_nationkey = n_nationkey and n_name = 'NATION_1'
group by s_name
order by numwait desc, s_name
limit 100"""


@query("tpch_q21", oracle=_Q21)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (dbcon/doc/tpch21.sql): correlated EXISTS + NOT EXISTS
    over self-joined lineitem (semi + anti join on orderkey with a
    non-equi suppkey disqualifier), top-100 waiting suppliers."""
    return _mysql(spark, sf_dir, _Q21, "supplier", "lineitem", "orders", "nation")


# --- Q22: global sales opportunity (dbcon/doc/tpch22.sql) --------------
# c_phone country code → digits of c_name ('Customer#NNNNNNNNN',
# positions 17-18); "has no orders" → "has no orders since 2000-01-01"
# (every testdata customer has early orders, so the verbatim anti-join
# would select nothing at any SF).  The shape — selective substring IN,
# scalar AVG threshold, NOT EXISTS anti-join, grouped rollup — is
# intact.
_Q22 = """select cntrycode, count(*) as numcust, round(sum(c_acctbal), 4) as totacctbal
from (
  select substring(c_name, 17, 2) as cntrycode, c_acctbal, c_custkey
  from customer
  where substring(c_name, 17, 2) in ('13', '31', '23', '29', '30', '18', '17')
    and c_acctbal > (
      select round(avg(c_acctbal), 4) from customer
      where c_acctbal > 0.00
        and substring(c_name, 17, 2) in ('13', '31', '23', '29', '30', '18', '17'))
) custsale
where not exists (
    select * from orders
    where o_custkey = c_custkey and o_orderdate >= date '2000-01-01')
group by cntrycode
order by cntrycode"""


@query("tpch_q22", oracle=_Q22)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (dbcon/doc/tpch22.sql; c_name digits for the phone
    country code, dormant-since-2000 for never-ordered): substring
    bucketing + uncorrelated AVG scalar threshold + NOT EXISTS
    anti-join, aggregated per code."""
    return _mysql(spark, sf_dir, _Q22, "customer", "orders")

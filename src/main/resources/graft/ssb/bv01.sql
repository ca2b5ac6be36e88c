-- SSB generated #1 (reference resources/query/ssb/generated/1.sql —
-- Q2-family at month grain): d_yearmonthnum -> yyyymm computed from
-- o_orderdate; p_brand1 range MFGR#2110..2117 -> the unpadded
-- Brand#21..Brand#27 lexicographic range; s_region EUROPE via
-- nation->region; integer discounts 1..3 -> 0.01..0.03; the 1993 date
-- window re-drawn to 1996 (data domain 1995-2001).
-- r12: money sums decimal-exact inside sum() — hash-stable under any
-- plan order; same text both engines (see graft.sources.Tables.exactSum)
select cast(sum(cast(revenue as decimal(25,6))) as double) as revenue, d_yearmonthnum, p_brand
from (
  select l_extendedprice * (1 - l_discount) as revenue,
    cast(extract(year from o_orderdate) * 100
       + extract(month from o_orderdate) as bigint) as d_yearmonthnum,
    p_brand
  from lineitem, orders, supplier, part, nation, region
  where l_orderkey = o_orderkey
    and l_partkey = p_partkey
    and l_suppkey = s_suppkey
    and s_nationkey = n_nationkey
    and n_regionkey = r_regionkey
    and p_brand between 'Brand#21' and 'Brand#27'
    and r_name = 'EUROPE'
    and l_discount between 0.01 and 0.03
    and o_orderdate >= date '1996-01-01' and o_orderdate < date '1997-01-01'
) as t
group by d_yearmonthnum, p_brand
order by d_yearmonthnum, p_brand

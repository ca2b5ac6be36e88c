-- SSB generated #4 (reference resources/query/ssb/generated/4.sql —
-- Q2-family at month grain, single brand): p_brand1 'MFGR#5120' ->
-- 'Brand#12'; s_region ASIA; quantity 17..27 kept; the 1997 window kept
-- (in the data domain).
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
    and p_brand = 'Brand#12'
    and r_name = 'ASIA'
    and l_quantity between 17 and 27
    and o_orderdate >= date '1997-01-01' and o_orderdate < date '1998-01-01'
) as t
group by d_yearmonthnum, p_brand
order by d_yearmonthnum, p_brand

-- SSB Q2.3 (single brand, supplier region EUROPE)
-- r12: money sums decimal-exact inside sum() — hash-stable under any
-- plan order; same text both engines (see graft.sources.Tables.exactSum)
select d_year, p_brand, cast(sum(cast(revenue as decimal(25,6))) as double) as revenue
from (
  select cast(extract(year from o_orderdate) as bigint) as d_year,
    p_brand, l_extendedprice * (1 - l_discount) as revenue
  from lineitem, orders, part, supplier, nation, region
  where l_orderkey = o_orderkey
    and l_partkey = p_partkey
    and l_suppkey = s_suppkey
    and s_nationkey = n_nationkey
    and n_regionkey = r_regionkey
    and p_brand = 'Brand#22'
    and r_name = 'EUROPE'
) as t
group by d_year, p_brand
order by d_year, p_brand

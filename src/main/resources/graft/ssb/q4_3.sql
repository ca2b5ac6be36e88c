-- SSB Q4.3 (s_city -> supplier nation within EUROPE; p_brand1 -> p_brand)
-- r12: money sums decimal-exact inside sum() — hash-stable under any
-- plan order; same text both engines (see graft.sources.Tables.exactSum)
select d_year, s_nation, p_brand, cast(sum(cast(profit as decimal(25,6))) as double) as profit
from (
  select cast(extract(year from o_orderdate) as bigint) as d_year,
    n1.n_name as s_nation, p_brand,
    l_extendedprice * (1 - l_discount) * (1 - l_tax) as profit
  from lineitem, orders, supplier, part, nation n1, region r1
  where l_orderkey = o_orderkey
    and l_suppkey = s_suppkey
    and l_partkey = p_partkey
    and s_nationkey = n1.n_nationkey
    and n1.n_regionkey = r1.r_regionkey
    and r1.r_name = 'EUROPE'
    and p_type = 'SMALL'
    and o_orderdate >= date '1997-01-01' and o_orderdate < date '1999-01-01'
) as t
group by d_year, s_nation, p_brand
order by d_year, s_nation, p_brand

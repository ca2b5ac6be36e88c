-- SSB Q4.2 (drill to supplier nation and part class, two years)
-- r12: money sums decimal-exact inside sum() — hash-stable under any
-- plan order; same text both engines (see graft.sources.Tables.exactSum)
select d_year, s_nation, p_type, cast(sum(cast(profit as decimal(25,6))) as double) as profit
from (
  select cast(extract(year from o_orderdate) as bigint) as d_year,
    n1.n_name as s_nation, p_type,
    l_extendedprice * (1 - l_discount) * (1 - l_tax) as profit
  from lineitem, orders, customer, supplier, part,
       nation n1, nation n2, region r1, region r2
  where l_orderkey = o_orderkey
    and o_custkey = c_custkey
    and l_suppkey = s_suppkey
    and l_partkey = p_partkey
    and s_nationkey = n1.n_nationkey
    and n1.n_regionkey = r1.r_regionkey
    and c_nationkey = n2.n_nationkey
    and n2.n_regionkey = r2.r_regionkey
    and r1.r_name = 'AMERICA'
    and r2.r_name = 'AMERICA'
    and (p_type = 'ECONOMY' or p_type = 'STANDARD')
    and o_orderdate >= date '1997-01-01' and o_orderdate < date '1999-01-01'
) as t
group by d_year, s_nation, p_type
order by d_year, s_nation, p_type

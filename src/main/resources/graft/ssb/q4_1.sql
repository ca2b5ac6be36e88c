-- SSB Q4.1 (lo_supplycost absent -> profit is revenue net of tax;
-- p_mfgr classes -> p_type classes)
-- r12: money sums decimal-exact inside sum() — hash-stable under any
-- plan order; same text both engines (see graft.sources.Tables.exactSum)
select d_year, c_nation, cast(sum(cast(profit as decimal(25,6))) as double) as profit
from (
  select cast(extract(year from o_orderdate) as bigint) as d_year,
    n2.n_name as c_nation,
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
) as t
group by d_year, c_nation
order by d_year, c_nation

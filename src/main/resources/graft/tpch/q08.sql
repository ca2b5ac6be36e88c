-- TPC-H Q8 national market share
-- r12: money sums decimal-exact inside sum() — hash-stable under any
-- plan order; same text both engines (see graft.sources.Tables.exactSum)
select o_year,
  cast(sum(cast(case when nation = 'NATION_7' then volume else 0 end as decimal(25,6))) as double)
    / cast(sum(cast(volume as decimal(25,6))) as double) as mkt_share
from (
  select
    cast(extract(year from o_orderdate) as bigint) as o_year,
    l_extendedprice * (1 - l_discount) as volume,
    n2.n_name as nation
  from part, supplier, lineitem, orders, customer, nation n1, nation n2, region
  where p_partkey = l_partkey
    and s_suppkey = l_suppkey
    and l_orderkey = o_orderkey
    and o_custkey = c_custkey
    and c_nationkey = n1.n_nationkey
    and n1.n_regionkey = r_regionkey
    and r_name = 'AMERICA'
    and s_nationkey = n2.n_nationkey
    and o_orderdate between date '1996-01-01' and date '1997-12-31'
    and p_type = 'ECONOMY'
) as all_nations
group by o_year
order by o_year

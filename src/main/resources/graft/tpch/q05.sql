-- TPC-H Q5 local supplier volume
-- r12: money sums decimal-exact inside sum() — hash-stable under any
-- plan order; same text both engines (see graft.sources.Tables.exactSum)
select n_name, cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(25,6))) as double) as revenue
from customer, orders, lineitem, supplier, nation, region
where c_custkey = o_custkey
  and l_orderkey = o_orderkey
  and l_suppkey = s_suppkey
  and c_nationkey = s_nationkey
  and s_nationkey = n_nationkey
  and n_regionkey = r_regionkey
  and r_name = 'ASIA'
  and o_orderdate >= date '1996-01-01'
  and o_orderdate < date '1997-01-01'
group by n_name
order by revenue desc, n_name

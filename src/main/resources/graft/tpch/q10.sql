-- TPC-H Q10 returned item reporting (c_address/c_phone/c_comment absent)
-- r12: money sums decimal-exact inside sum() — hash-stable under any
-- plan order; same text both engines (see graft.sources.Tables.exactSum)
select c_custkey, c_name,
  cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(25,6))) as double) as revenue,
  c_acctbal, n_name
from customer, orders, lineitem, nation
where c_custkey = o_custkey
  and l_orderkey = o_orderkey
  and o_orderdate >= date '1996-10-01'
  and o_orderdate < date '1997-01-01'
  and l_returnflag = 'R'
  and c_nationkey = n_nationkey
group by c_custkey, c_name, c_acctbal, n_name
order by revenue desc, c_custkey
limit 20

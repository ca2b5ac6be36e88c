-- TPC-H Q5 join-order variant 2 (reference resources/query/tpch/modified/
-- 05-jo2.sql): supplier-first FROM order — same semantics as hv51, a
-- different declared join order. Deltas: n_name ORDER BY tiebreak (see
-- hv51).
-- r12: money sums decimal-exact inside sum() — hash-stable under any
-- plan order; same text both engines (see graft.sources.Tables.exactSum)
select
  n.n_name,
  cast(sum(cast(l.l_extendedprice * (1 - l.l_discount) as decimal(25,6))) as double) as revenue
from
  supplier s,
  lineitem l,
  orders o,
  customer c,
  nation n,
  region r
where
  c.c_custkey = o.o_custkey
  and l.l_orderkey = o.o_orderkey
  and l.l_suppkey = s.s_suppkey
  and c.c_nationkey = s.s_nationkey
  and s.s_nationkey = n.n_nationkey
  and n.n_regionkey = r.r_regionkey
  and r.r_name = 'EUROPE'
  and o.o_orderdate >= date '1997-01-01'
  and o.o_orderdate < date '1997-01-01' + interval '1' year
group by
  n.n_name
order by
  revenue desc, n.n_name

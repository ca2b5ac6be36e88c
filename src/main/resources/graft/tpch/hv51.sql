-- TPC-H Q5 join-order variant 1 (reference resources/query/tpch/modified/
-- 05-jo1.sql): the same local-supplier-volume query with the FROM clause
-- reordered (orders first, customer last) and the 1997/EUROPE literals —
-- the reference's plan-robustness harness for its Calcite join-order
-- heuristics; here it exercises Catalyst's join reordering on a
-- rewritten form of h05. Deltas from the reference text: n_name added to
-- the ORDER BY as a deterministic tiebreak (the engines may order equal
-- revenues differently).
-- r12: money sums decimal-exact inside sum() — hash-stable under any
-- plan order; same text both engines (see graft.sources.Tables.exactSum)
select
  n.n_name,
  cast(sum(cast(l.l_extendedprice * (1 - l.l_discount) as decimal(25,6))) as double) as revenue
from
  orders o,
  lineitem l,
  supplier s,
  nation n,
  region r,
  customer c
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

-- TPC-H Q9 join-order variant 2 (reference resources/query/tpch/modified/
-- 09-jo2.sql): part-first FROM order with partsupp and orders declared
-- last — same semantics as hv91, a different declared join order (see
-- hv91 for the derived-partsupp and literal notes).
with partsupp as (
  select
    l_partkey as ps_partkey,
    l_suppkey as ps_suppkey,
    min(l_extendedprice / l_quantity) as ps_supplycost,
    cast(sum(l_quantity) as bigint) as ps_availqty
  from lineitem
  group by l_partkey, l_suppkey
)
select
  nation,
  o_year,
  sum(amount) as sum_profit
from
  (
    select
      n.n_name as nation,
      cast(extract(year from o.o_orderdate) as bigint) as o_year,
      l.l_extendedprice * (1 - l.l_discount) - ps.ps_supplycost * l.l_quantity as amount
    from
      part p,
      lineitem l,
      supplier s,
      nation n,
      partsupp ps,
      orders o
    where
      s.s_suppkey = l.l_suppkey
      and ps.ps_suppkey = l.l_suppkey
      and ps.ps_partkey = l.l_partkey
      and p.p_partkey = l.l_partkey
      and o.o_orderkey = l.l_orderkey
      and s.s_nationkey = n.n_nationkey
      and p.p_name like '%red%'
  ) as profit
group by
  nation,
  o_year
order by
  nation,
  o_year desc

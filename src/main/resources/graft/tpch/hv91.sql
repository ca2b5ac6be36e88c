-- TPC-H Q9 join-order variant 1 (reference resources/query/tpch/modified/
-- 09-jo1.sql): partsupp-first FROM order. Unlike h09 (which drops the
-- supplycost term), the variants keep the reference's full profit
-- expression via the derived-partsupp CTE (see q02.sql — one row per
-- observed (part, supplier) pair; supplycost = min observed unit price),
-- identical text in both engines. Literal delta: p_name like '%yellow%'
-- -> '%red%' (the testdata p_name domain).
-- r12: ps_supplycost here is DECIMAL-EXACT by construction (1% of the
-- cheapest observed line price) instead of the min-division double used
-- where supplycost is only compared (q02/q16/hv02): a division-derived
-- double cannot be cast to decimal reproducibly across engines (Spark
-- rounds the double's shortest decimal repr, DuckDB its exact binary
-- expansion — they disagree when the repr sits on a rounding boundary),
-- and this file SUMS supplycost products, so the whole money pipeline
-- stays in exact decimal and the sum is hash-stable under any plan order.
with partsupp as (
  select
    l_partkey as ps_partkey,
    l_suppkey as ps_suppkey,
    cast(min(l_extendedprice) as decimal(12,2)) * 0.01 as ps_supplycost,
    cast(sum(l_quantity) as bigint) as ps_availqty
  from lineitem
  group by l_partkey, l_suppkey
)
select
  nation,
  o_year,
  cast(sum(amount) as double) as sum_profit
from
  (
    select
      n.n_name as nation,
      cast(extract(year from o.o_orderdate) as bigint) as o_year,
      cast(l.l_extendedprice as decimal(12,2)) * (1 - cast(l.l_discount as decimal(12,2)))
        - ps.ps_supplycost * cast(l.l_quantity as decimal(12,2)) as amount
    from
      partsupp ps,
      lineitem l,
      part p,
      supplier s,
      orders o,
      nation n
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

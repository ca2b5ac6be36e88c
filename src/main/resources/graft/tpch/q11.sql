-- TPC-H Q11 important stock identification. partsupp derived from
-- lineitem as in q02.sql (same CTE text in both engines). The grouped
-- HAVING against a scalar-subquery threshold — the query's point — is
-- preserved verbatim. Literal deltas: 'GERMANY' -> 'NATION_8' (a nation
-- with suppliers at every shipped SF, sf0.001 included); the original's
-- reserved-word alias "value" -> part_value.
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
  ps.ps_partkey,
  cast(sum(ps.ps_supplycost * ps.ps_availqty) as double) as part_value
from
  partsupp ps,
  supplier s,
  nation n
where
  ps.ps_suppkey = s.s_suppkey
  and s.s_nationkey = n.n_nationkey
  and n.n_name = 'NATION_8'
group by
  ps.ps_partkey
having
  cast(sum(ps.ps_supplycost * ps.ps_availqty) as double) > (
    select
      cast(sum(ps.ps_supplycost * ps.ps_availqty) as double) * 0.0001000000
    from
      partsupp ps,
      supplier s,
      nation n
    where
      ps.ps_suppkey = s.s_suppkey
      and s.s_nationkey = n.n_nationkey
      and n.n_name = 'NATION_8'
  )
order by
  part_value desc,
  ps.ps_partkey

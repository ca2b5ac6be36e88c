-- TPC-H Q11 important stock identification. partsupp derived from
-- lineitem as in q02.sql (same CTE text in both engines). The grouped
-- HAVING against a scalar-subquery threshold — the query's point — is
-- preserved verbatim. Literal deltas: 'GERMANY' -> 'NATION_8' (a nation
-- with suppliers at every shipped SF, sf0.001 included); the original's
-- reserved-word alias "value" -> part_value.
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
  ps.ps_partkey,
  sum(ps.ps_supplycost * ps.ps_availqty) as part_value
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
  sum(ps.ps_supplycost * ps.ps_availqty) > (
    select
      sum(ps.ps_supplycost * ps.ps_availqty) * 0.0001000000
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

-- TPC-H Q16 parts/supplier relationship. partsupp derived from lineitem
-- as in q02.sql (same CTE text in both engines; r12: supplycost is
-- decimal-exact — see q11.sql header). Structure preserved:
-- anti-semi NOT IN subquery over supplier + COUNT(DISTINCT) grouped on
-- three part attributes. Literal deltas: p_type 'MEDIUM POLISHED%' ->
-- 'MEDIUM%' (single-word domain); the s_comment LIKE '%Customer%
-- Complaints%' blacklist re-drawn as s_acctbal < 0 (s_comment absent) —
-- still a non-correlated NOT IN over a filtered supplier scan.
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
  p.p_brand,
  p.p_type,
  p.p_size,
  count(distinct ps.ps_suppkey) as supplier_cnt
from
  partsupp ps,
  part p
where
  p.p_partkey = ps.ps_partkey
  and p.p_brand <> 'Brand#21'
  and p.p_type not like 'MEDIUM%'
  and p.p_size in (38, 2, 8, 31, 44, 5, 14, 24)
  and ps.ps_suppkey not in (
    select
      s.s_suppkey
    from
      supplier s
    where
      s.s_acctbal < 0
  )
group by
  p.p_brand,
  p.p_type,
  p.p_size
order by
  supplier_cnt desc,
  p.p_brand,
  p.p_type,
  p.p_size

-- TPC-H Q2 minimum-cost supplier. The testdata ships no partsupp table,
-- so it is derived deterministically from lineitem: one row per observed
-- (part, supplier) pair, supplycost = cheapest observed unit price,
-- availqty = total quantity shipped. The same CTE text runs in BOTH
-- engines, so the query's defining structure — a correlated scalar-min
-- subquery re-joining supplier->nation->region — is checked exactly.
-- Literal deltas: p_type '%NICKEL' -> single-word 'STANDARD', p_size 41
-- -> <= 25 (the equality would select zero of sf0.001's 200 parts);
-- output drops the absent p_mfgr/s_address/s_phone/s_comment.
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
  s.s_acctbal,
  s.s_name,
  n.n_name,
  p.p_partkey
from
  part p,
  supplier s,
  partsupp ps,
  nation n,
  region r
where
  p.p_partkey = ps.ps_partkey
  and s.s_suppkey = ps.ps_suppkey
  and p.p_size <= 25
  and p.p_type = 'STANDARD'
  and s.s_nationkey = n.n_nationkey
  and n.n_regionkey = r.r_regionkey
  and r.r_name = 'EUROPE'
  and ps.ps_supplycost = (
    select
      min(ps2.ps_supplycost)
    from
      partsupp ps2,
      supplier s2,
      nation n2,
      region r2
    where
      p.p_partkey = ps2.ps_partkey
      and s2.s_suppkey = ps2.ps_suppkey
      and s2.s_nationkey = n2.n_nationkey
      and n2.n_regionkey = r2.r_regionkey
      and r2.r_name = 'EUROPE'
  )
order by
  s.s_acctbal desc,
  n.n_name,
  s.s_name,
  p.p_partkey
limit 100

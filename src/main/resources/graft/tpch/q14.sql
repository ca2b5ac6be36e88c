-- TPC-H Q14 promotion effect
-- r12: money sums decimal-exact inside sum() — hash-stable under any
-- plan order; same text both engines (see graft.sources.Tables.exactSum)
select 100.00 * cast(sum(cast(case when p_type like 'PROMO%'
    then l_extendedprice * (1 - l_discount) else 0 end as decimal(25,6))) as double)
  / cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(25,6))) as double) as promo_revenue
from lineitem, part
where l_partkey = p_partkey
  and l_shipdate >= date '1996-09-01'
  and l_shipdate < date '1996-10-01'

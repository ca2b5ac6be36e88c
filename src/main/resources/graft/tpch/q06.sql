-- TPC-H Q6 forecasting revenue change
-- r12: money sums decimal-exact inside sum() — hash-stable under any
-- plan order; same text both engines (see graft.sources.Tables.exactSum)
select cast(sum(cast(l_extendedprice * l_discount as decimal(25,6))) as double) as revenue
from lineitem
where l_shipdate >= date '1996-01-01'
  and l_shipdate < date '1997-01-01'
  and l_discount between 0.05 and 0.07
  and l_quantity < 24

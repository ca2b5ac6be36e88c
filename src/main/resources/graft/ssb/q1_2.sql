-- SSB Q1.2 (d_yearmonthnum = 199604 -> the month's date range)
-- r12: money sums decimal-exact inside sum() — hash-stable under any
-- plan order; same text both engines (see graft.sources.Tables.exactSum)
select cast(sum(cast(l_extendedprice * l_discount as decimal(25,6))) as double) as revenue
from lineitem, orders
where l_orderkey = o_orderkey
  and o_orderdate >= date '1996-04-01' and o_orderdate < date '1996-05-01'
  and l_discount between 0.04 and 0.06
  and l_quantity between 26 and 35

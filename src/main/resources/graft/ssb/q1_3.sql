-- SSB Q1.3 (d_weeknuminyear = 6 -> the week's explicit date range, since
-- ISO-week extraction differs across engines at year boundaries)
-- r12: money sums decimal-exact inside sum() — hash-stable under any
-- plan order; same text both engines (see graft.sources.Tables.exactSum)
select cast(sum(cast(l_extendedprice * l_discount as decimal(25,6))) as double) as revenue
from lineitem, orders
where l_orderkey = o_orderkey
  and o_orderdate between date '1996-02-05' and date '1996-02-11'
  and l_discount between 0.05 and 0.07
  and l_quantity between 26 and 35

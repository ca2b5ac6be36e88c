-- SSB Q1.1 (lineorder -> lineitem JOIN orders; date dim -> extract from
-- o_orderdate; integer discounts 1..3 -> the data's 0.01..0.03 doubles)
-- r12: money sums decimal-exact inside sum() — hash-stable under any
-- plan order; same text both engines (see graft.sources.Tables.exactSum)
select cast(sum(cast(l_extendedprice * l_discount as decimal(25,6))) as double) as revenue
from lineitem, orders
where l_orderkey = o_orderkey
  and cast(extract(year from o_orderdate) as bigint) = 1996
  and l_discount between 0.01 and 0.03
  and l_quantity < 25

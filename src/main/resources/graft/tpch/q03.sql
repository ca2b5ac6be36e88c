-- TPC-H Q3 shipping priority (o_shippriority column absent -> dropped
-- from the output; l_orderkey is unique per group so the limit is total)
-- r12: money sums decimal-exact inside sum() — hash-stable under any
-- plan order; same text both engines (see graft.sources.Tables.exactSum)
select
    l_orderkey,
    cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(25,6))) as double) as revenue,
    o_orderdate
from customer, orders, lineitem
where c_mktsegment = 'BUILDING'
  and c_custkey = o_custkey
  and l_orderkey = o_orderkey
  and o_orderdate < date '1997-03-15'
  and l_shipdate > date '1997-03-15'
group by l_orderkey, o_orderdate
order by revenue desc, l_orderkey
limit 10

-- TPC-H Q12 shipping modes and order priority (l_shipmode absent ->
-- classes are the returned/accepted flags; late = shipped > 90 days
-- after order; integer sums cast so both engines emit bigint)
select l_returnflag,
  cast(sum(case when o_orderpriority = '1-URGENT' or o_orderpriority = '2-HIGH'
      then 1 else 0 end) as bigint) as high_line_count,
  cast(sum(case when o_orderpriority <> '1-URGENT' and o_orderpriority <> '2-HIGH'
      then 1 else 0 end) as bigint) as low_line_count
from orders, lineitem
where o_orderkey = l_orderkey
  and l_returnflag in ('A', 'R')
  and l_shipdate > o_orderdate + interval '90' day
  and l_shipdate >= date '1996-01-01'
  and l_shipdate < date '1997-01-01'
group by l_returnflag
order by l_returnflag

-- TPC-H Q4 order priority checking (l_commitdate/l_receiptdate absent ->
-- "late" means shipped more than 60 days after the order date)
select o_orderpriority, count(*) as order_count
from orders
where o_orderdate >= date '1996-07-01'
  and o_orderdate < date '1996-10-01'
  and exists (
    select * from lineitem
    where l_orderkey = o_orderkey
      and l_shipdate > o_orderdate + interval '60' day)
group by o_orderpriority
order by o_orderpriority

-- TPC-H Q13 customer distribution (o_comment filter -> order status)
select c_count, count(*) as custdist
from (
  select c_custkey, count(o_orderkey) as c_count
  from customer left outer join orders
    on c_custkey = o_custkey and o_orderstatus <> 'P'
  group by c_custkey
) as c_orders
group by c_count
order by custdist desc, c_count desc

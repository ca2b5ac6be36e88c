-- TPC-H Q6 forecasting revenue change
select sum(l_extendedprice * l_discount) as revenue
from lineitem
where l_shipdate >= date '1996-01-01'
  and l_shipdate < date '1997-01-01'
  and l_discount between 0.05 and 0.07
  and l_quantity < 24

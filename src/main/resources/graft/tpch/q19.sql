-- TPC-H Q19 discounted revenue (p_container/l_shipmode/l_shipinstruct
-- absent -> the disjunction is over brand, size and quantity bands)
select sum(l_extendedprice * (1 - l_discount)) as revenue
from lineitem, part
where p_partkey = l_partkey
  and ((p_brand = 'Brand#12' and p_size between 1 and 15
        and l_quantity between 1 and 11)
    or (p_brand = 'Brand#23' and p_size between 1 and 25
        and l_quantity between 10 and 20)
    or (p_brand = 'Brand#34' and p_size between 1 and 35
        and l_quantity between 20 and 30))

-- TPC-H Q9 product type profit (partsupp absent -> profit has no
-- supplycost term; 'green' is not in the p_name domain -> 'red')
-- r12: money sums decimal-exact inside sum() — hash-stable under any
-- plan order; same text both engines (see graft.sources.Tables.exactSum)
select nation, o_year, cast(sum(cast(amount as decimal(25,6))) as double) as sum_profit
from (
  select
    n_name as nation,
    cast(extract(year from o_orderdate) as bigint) as o_year,
    l_extendedprice * (1 - l_discount) as amount
  from part, supplier, lineitem, orders, nation
  where s_suppkey = l_suppkey
    and p_partkey = l_partkey
    and o_orderkey = l_orderkey
    and s_nationkey = n_nationkey
    and p_name like 'red%'
) as profit
group by nation, o_year
order by nation, o_year desc

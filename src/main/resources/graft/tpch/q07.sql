-- TPC-H Q7 volume shipping (nation names follow the testdata domain;
-- extract() cast so both engines emit bigint)
-- r12: money sums decimal-exact inside sum() — hash-stable under any
-- plan order; same text both engines (see graft.sources.Tables.exactSum)
select supp_nation, cust_nation, l_year, cast(sum(cast(volume as decimal(25,6))) as double) as revenue
from (
  select
    n1.n_name as supp_nation,
    n2.n_name as cust_nation,
    cast(extract(year from l_shipdate) as bigint) as l_year,
    l_extendedprice * (1 - l_discount) as volume
  from supplier, lineitem, orders, customer, nation n1, nation n2
  where s_suppkey = l_suppkey
    and o_orderkey = l_orderkey
    and c_custkey = o_custkey
    and s_nationkey = n1.n_nationkey
    and c_nationkey = n2.n_nationkey
    and ((n1.n_name = 'NATION_7' and n2.n_name = 'NATION_17')
      or (n1.n_name = 'NATION_17' and n2.n_name = 'NATION_7'))
    and l_shipdate between date '1996-01-01' and date '1997-12-31'
) as shipping
group by supp_nation, cust_nation, l_year
order by supp_nation, cust_nation, l_year

-- SSB Q3.4 (Q3.3 narrowed to one month)
-- r12: money sums decimal-exact inside sum() — hash-stable under any
-- plan order; same text both engines (see graft.sources.Tables.exactSum)
select c_nation, s_nation, d_year, cast(sum(cast(revenue as decimal(25,6))) as double) as revenue
from (
  select n2.n_name as c_nation, n1.n_name as s_nation,
    cast(extract(year from o_orderdate) as bigint) as d_year,
    l_extendedprice * (1 - l_discount) as revenue
  from lineitem, orders, customer, supplier, nation n1, nation n2
  where l_orderkey = o_orderkey
    and o_custkey = c_custkey
    and l_suppkey = s_suppkey
    and s_nationkey = n1.n_nationkey
    and c_nationkey = n2.n_nationkey
    and n1.n_name in ('NATION_4', 'NATION_9')
    and n2.n_name in ('NATION_4', 'NATION_9')
    and o_orderdate >= date '1997-12-01' and o_orderdate < date '1998-01-01'
) as t
group by c_nation, s_nation, d_year
order by d_year asc, revenue desc, c_nation, s_nation

-- SSB generated #2 (reference resources/query/ssb/generated/2.sql —
-- Q3-family at month grain): c_city/s_city absent -> one drill level
-- coarser (nations), so the c_nation = s_nation = 'RUSSIA' filter maps
-- one level up too: customer and supplier both in ASIA; quantity window
-- kept; 1992 -> 1996. ORDER BY gains nation tiebreaks after the
-- reference's (d_yearmonthnum, revenue desc) for determinism.
-- r12: money sums decimal-exact inside sum() — hash-stable under any
-- plan order; same text both engines (see graft.sources.Tables.exactSum)
select c_nation, s_nation, d_yearmonthnum, cast(sum(cast(revenue as decimal(25,6))) as double) as revenue
from (
  select n2.n_name as c_nation, n1.n_name as s_nation,
    cast(extract(year from o_orderdate) * 100
       + extract(month from o_orderdate) as bigint) as d_yearmonthnum,
    l_extendedprice * (1 - l_discount) as revenue
  from lineitem, orders, customer, supplier,
       nation n1, nation n2, region r1, region r2
  where l_orderkey = o_orderkey
    and o_custkey = c_custkey
    and l_suppkey = s_suppkey
    and s_nationkey = n1.n_nationkey
    and n1.n_regionkey = r1.r_regionkey
    and c_nationkey = n2.n_nationkey
    and n2.n_regionkey = r2.r_regionkey
    and r1.r_name = 'ASIA'
    and r2.r_name = 'ASIA'
    and l_quantity between 16 and 26
    and o_orderdate >= date '1996-01-01' and o_orderdate < date '1997-01-01'
) as t
group by c_nation, s_nation, d_yearmonthnum
order by d_yearmonthnum asc, revenue desc, c_nation, s_nation

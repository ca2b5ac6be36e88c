-- SSB generated #5 (reference resources/query/ssb/generated/5.sql —
-- Q3-family at month grain, two specific cities on both sides): the two
-- UNITED ST3/ST6 cities map one drill level coarser to two specific
-- nations on both customer and supplier sides (the q3_3 convention);
-- quantity 12..22 kept; 1993 -> 1998. Deterministic ORDER BY tiebreaks
-- as in bv02.
-- r12: money sums decimal-exact inside sum() — hash-stable under any
-- plan order; same text both engines (see graft.sources.Tables.exactSum)
select c_nation, s_nation, d_yearmonthnum, cast(sum(cast(revenue as decimal(25,6))) as double) as revenue
from (
  select n2.n_name as c_nation, n1.n_name as s_nation,
    cast(extract(year from o_orderdate) * 100
       + extract(month from o_orderdate) as bigint) as d_yearmonthnum,
    l_extendedprice * (1 - l_discount) as revenue
  from lineitem, orders, customer, supplier, nation n1, nation n2
  where l_orderkey = o_orderkey
    and o_custkey = c_custkey
    and l_suppkey = s_suppkey
    and s_nationkey = n1.n_nationkey
    and c_nationkey = n2.n_nationkey
    and n1.n_name in ('NATION_3', 'NATION_6')
    and n2.n_name in ('NATION_3', 'NATION_6')
    and l_quantity between 12 and 22
    and o_orderdate >= date '1998-01-01' and o_orderdate < date '1999-01-01'
) as t
group by c_nation, s_nation, d_yearmonthnum
order by d_yearmonthnum asc, revenue desc, c_nation, s_nation

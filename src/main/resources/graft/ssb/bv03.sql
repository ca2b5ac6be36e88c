-- SSB generated #3 (reference resources/query/ssb/generated/3.sql —
-- Q4-family at month grain): profit = revenue net of tax (lo_supplycost
-- absent, the q4_1 convention); p_mfgr MFGR#2/MFGR#3 -> two p_type
-- classes; customer+supplier regions MIDDLE EAST; integer discounts 0..2
-- -> 0.00..0.02; 1992 -> 1997.
-- r12: money sums decimal-exact inside sum() — hash-stable under any
-- plan order; same text both engines (see graft.sources.Tables.exactSum)
select d_yearmonthnum, s_nation, p_type, cast(sum(cast(profit as decimal(25,6))) as double) as profit
from (
  select cast(extract(year from o_orderdate) * 100
            + extract(month from o_orderdate) as bigint) as d_yearmonthnum,
    n1.n_name as s_nation, p_type,
    l_extendedprice * (1 - l_discount) * (1 - l_tax) as profit
  from lineitem, orders, customer, supplier, part,
       nation n1, nation n2, region r1, region r2
  where l_orderkey = o_orderkey
    and o_custkey = c_custkey
    and l_suppkey = s_suppkey
    and l_partkey = p_partkey
    and s_nationkey = n1.n_nationkey
    and n1.n_regionkey = r1.r_regionkey
    and c_nationkey = n2.n_nationkey
    and n2.n_regionkey = r2.r_regionkey
    and r1.r_name = 'MIDDLE EAST'
    and r2.r_name = 'MIDDLE EAST'
    and (p_type = 'ECONOMY' or p_type = 'PROMO')
    and l_discount between 0.00 and 0.02
    and o_orderdate >= date '1997-01-01' and o_orderdate < date '1998-01-01'
) as t
group by d_yearmonthnum, s_nation, p_type
order by d_yearmonthnum, s_nation, p_type

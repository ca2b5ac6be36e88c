-- SSB typed variant of Q3.1 (reference resources/query/ssb/
-- typed/3.1.sql): the reference re-casts its all-string CSV
-- schema at every measure/filter use site and moves the date dimension
-- first in FROM; this adaptation keeps the explicit per-use-site CAST
-- structure (exercising the cast path in the same expression positions)
-- with value-preserving target types -- a double->int cast here would
-- be engine-divergent (DuckDB rounds, Spark truncates) and is not what
-- the original computes on SSB's integer-typed data anyway. Base
-- adaptation deltas: see q3_1.sql.
-- r12: money sums decimal-exact inside sum() — hash-stable under any
-- plan order; same text both engines (see graft.sources.Tables.exactSum)
select c_nation, s_nation, d_year, cast(sum(cast(revenue as decimal(25,6))) as double) as revenue
from (
  select n2.n_name as c_nation, n1.n_name as s_nation,
    cast(extract(year from o_orderdate) as bigint) as d_year,
    cast(l_extendedprice as double) * (1 - cast(l_discount as double)) as revenue
  from orders, lineitem, customer, supplier,
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
    and o_orderdate >= date '1996-01-01' and o_orderdate < date '1998-01-01'
) as t
group by c_nation, s_nation, d_year
order by d_year asc, revenue desc, c_nation, s_nation

-- SSB typed variant of Q4.1 (reference resources/query/ssb/
-- typed/4.1.sql): the reference re-casts its all-string CSV
-- schema at every measure/filter use site and moves the date dimension
-- first in FROM; this adaptation keeps the explicit per-use-site CAST
-- structure (exercising the cast path in the same expression positions)
-- with value-preserving target types -- a double->int cast here would
-- be engine-divergent (DuckDB rounds, Spark truncates) and is not what
-- the original computes on SSB's integer-typed data anyway. Base
-- adaptation deltas: see q4_1.sql.
-- r12: money sums decimal-exact inside sum() — hash-stable under any
-- plan order; same text both engines (see graft.sources.Tables.exactSum)
select d_year, c_nation, cast(sum(cast(profit as decimal(25,6))) as double) as profit
from (
  select cast(extract(year from o_orderdate) as bigint) as d_year,
    n2.n_name as c_nation,
    cast(l_extendedprice as double) * (1 - cast(l_discount as double)) * (1 - cast(l_tax as double)) as profit
  from orders, lineitem, customer, supplier, part,
       nation n1, nation n2, region r1, region r2
  where l_orderkey = o_orderkey
    and o_custkey = c_custkey
    and l_suppkey = s_suppkey
    and l_partkey = p_partkey
    and s_nationkey = n1.n_nationkey
    and n1.n_regionkey = r1.r_regionkey
    and c_nationkey = n2.n_nationkey
    and n2.n_regionkey = r2.r_regionkey
    and r1.r_name = 'AMERICA'
    and r2.r_name = 'AMERICA'
    and (p_type = 'ECONOMY' or p_type = 'STANDARD')
) as t
group by d_year, c_nation
order by d_year, c_nation

-- SSB typed variant of Q4.3 (reference resources/query/ssb/
-- typed/4.3.sql): the reference re-casts its all-string CSV
-- schema at every measure/filter use site and moves the date dimension
-- first in FROM; this adaptation keeps the explicit per-use-site CAST
-- structure (exercising the cast path in the same expression positions)
-- with value-preserving target types -- a double->int cast here would
-- be engine-divergent (DuckDB rounds, Spark truncates) and is not what
-- the original computes on SSB's integer-typed data anyway. Base
-- adaptation deltas: see q4_3.sql.
-- r12: money sums decimal-exact inside sum() — hash-stable under any
-- plan order; same text both engines (see graft.sources.Tables.exactSum)
select d_year, s_nation, p_brand, cast(sum(cast(profit as decimal(25,6))) as double) as profit
from (
  select cast(extract(year from o_orderdate) as bigint) as d_year,
    n1.n_name as s_nation, p_brand,
    cast(l_extendedprice as double) * (1 - cast(l_discount as double)) * (1 - cast(l_tax as double)) as profit
  from orders, lineitem, supplier, part, nation n1, region r1
  where l_orderkey = o_orderkey
    and l_suppkey = s_suppkey
    and l_partkey = p_partkey
    and s_nationkey = n1.n_nationkey
    and n1.n_regionkey = r1.r_regionkey
    and r1.r_name = 'EUROPE'
    and p_type = 'SMALL'
    and o_orderdate >= date '1997-01-01' and o_orderdate < date '1999-01-01'
) as t
group by d_year, s_nation, p_brand
order by d_year, s_nation, p_brand

-- SSB typed variant of Q2.2 (reference resources/query/ssb/
-- typed/2.2.sql): the reference re-casts its all-string CSV
-- schema at every measure/filter use site and moves the date dimension
-- first in FROM; this adaptation keeps the explicit per-use-site CAST
-- structure (exercising the cast path in the same expression positions)
-- with value-preserving target types -- a double->int cast here would
-- be engine-divergent (DuckDB rounds, Spark truncates) and is not what
-- the original computes on SSB's integer-typed data anyway. Base
-- adaptation deltas: see q2_2.sql.
-- r12: money sums decimal-exact inside sum() — hash-stable under any
-- plan order; same text both engines (see graft.sources.Tables.exactSum)
select d_year, p_brand, cast(sum(cast(revenue as decimal(25,6))) as double) as revenue
from (
  select cast(extract(year from o_orderdate) as bigint) as d_year,
    p_brand, cast(l_extendedprice as double) * (1 - cast(l_discount as double)) as revenue
  from orders, lineitem, part, supplier, nation, region
  where l_orderkey = o_orderkey
    and l_partkey = p_partkey
    and l_suppkey = s_suppkey
    and s_nationkey = n_nationkey
    and n_regionkey = r_regionkey
    and p_brand between 'Brand#20' and 'Brand#28'
    and r_name = 'ASIA'
) as t
group by d_year, p_brand
order by d_year, p_brand

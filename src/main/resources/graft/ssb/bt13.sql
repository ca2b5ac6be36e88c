-- SSB typed variant of Q1.3 (reference resources/query/ssb/
-- typed/1.3.sql): the reference re-casts its all-string CSV
-- schema at every measure/filter use site and moves the date dimension
-- first in FROM; this adaptation keeps the explicit per-use-site CAST
-- structure (exercising the cast path in the same expression positions)
-- with value-preserving target types -- a double->int cast here would
-- be engine-divergent (DuckDB rounds, Spark truncates) and is not what
-- the original computes on SSB's integer-typed data anyway. Base
-- adaptation deltas: see q1_3.sql.
-- r12: money sums decimal-exact inside sum() — hash-stable under any
-- plan order; same text both engines (see graft.sources.Tables.exactSum)
select cast(sum(cast(cast(l_extendedprice as double) * cast(l_discount as double) as decimal(25,6))) as double) as revenue
from lineitem, orders
where l_orderkey = o_orderkey
  and o_orderdate between date '1996-02-05' and date '1996-02-11'
  and cast(l_discount as double) between 0.05 and 0.07
  and cast(l_quantity as double) between 26 and 35

-- TPC-H synthetic co-located 2-table join (reference resources/query/
-- tpch/synthetic/co-join-2-table.sql): the fact-fact lineitem JOIN orders
-- on l_orderkey — the reference annotates it "require co-located at
-- l_orderkey = o_orderkey" for its storage-side co-located join; graft's
-- equivalent is the bucketed-write path (plans/Bucketing: both sides
-- bucketed by orderkey join with zero Exchange, BucketingSpec-asserted).
-- This entry checks the query's semantics through the SQL text path.
-- Deltas: l_commitdate/l_receiptdate are absent from the testdata, so
-- "late" means shipped more than 60 days after the order date (the q04
-- convention); the 1994 date literal is re-drawn into the 1995-2001 data
-- domain.
select
  o.o_orderpriority,
  count(*) as order_count
from
  lineitem l,
  orders o
where
  l.l_orderkey = o.o_orderkey
  and l.l_shipdate > o.o_orderdate + interval '60' day
  and o.o_orderdate >= date '1996-01-01'
group by
  o.o_orderpriority
order by
  o.o_orderpriority

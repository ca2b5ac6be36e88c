-- TPC-H synthetic co-located 3-table join (reference resources/query/
-- tpch/synthetic/co-join-3-table.sql): lineitem JOIN orders (co-located
-- key) with a deliberate partkey-only fan-out join to partsupp. See hv01
-- for the co-location mapping. Deltas: partsupp is the derived CTE (q02
-- convention); the o_comment NOT LIKE predicate is dropped (no comment
-- columns in the testdata); availqty < 500 -> < 100 so the derived
-- availqty domain keeps the filter selective; 1994 -> 1996.
with partsupp as (
  select
    l_partkey as ps_partkey,
    l_suppkey as ps_suppkey,
    cast(min(l_extendedprice) as decimal(12,2)) * 0.01 as ps_supplycost,
    cast(sum(l_quantity) as bigint) as ps_availqty
  from lineitem
  group by l_partkey, l_suppkey
)
select
  o.o_orderpriority,
  count(*) as order_count
from
  lineitem l,
  orders o,
  partsupp ps
where
  l.l_orderkey = o.o_orderkey
  and l.l_partkey = ps.ps_partkey
  and o.o_orderdate >= date '1996-01-01'
  and ps.ps_availqty < 100
group by
  o.o_orderpriority
order by
  o.o_orderpriority

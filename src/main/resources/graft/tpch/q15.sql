-- TPC-H Q15 top supplier (the stock CREATE VIEW becomes a CTE;
-- s_address/s_phone absent)
-- r12: money sums decimal-exact inside sum() — hash-stable under any
-- plan order; same text both engines (see graft.sources.Tables.exactSum)
with revenue0 as (
  select l_suppkey as supplier_no,
    cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(25,6))) as double) as total_revenue
  from lineitem
  where l_shipdate >= date '1996-01-01'
    and l_shipdate < date '1996-04-01'
  group by l_suppkey)
select s_suppkey, s_name, total_revenue
from supplier, revenue0
where s_suppkey = supplier_no
  and total_revenue = (select max(total_revenue) from revenue0)
order by s_suppkey

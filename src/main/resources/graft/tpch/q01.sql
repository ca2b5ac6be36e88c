-- TPC-H Q1 pricing summary report, adapted to the testdata schema
-- (interval arithmetic folded to a literal date; date domain 1995-2001)
-- r12: money sums decimal-exact inside sum() — hash-stable under any
-- plan order; same text both engines (see graft.sources.Tables.exactSum)
select
    l_returnflag,
    l_linestatus,
    sum(l_quantity) as sum_qty,
    cast(sum(cast(l_extendedprice as decimal(25,6))) as double) as sum_base_price,
    cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(25,6))) as double) as sum_disc_price,
    cast(sum(cast(l_extendedprice * (1 - l_discount) * (1 + l_tax) as decimal(25,6))) as double) as sum_charge,
    avg(l_quantity) as avg_qty,
    avg(l_extendedprice) as avg_price,
    avg(l_discount) as avg_disc,
    count(*) as count_order
from lineitem
where l_shipdate <= date '1998-09-02'
group by l_returnflag, l_linestatus
order by l_returnflag, l_linestatus

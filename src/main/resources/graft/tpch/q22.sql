-- TPC-H Q22 global sales opportunity (c_phone absent -> the country
-- code is the customer id's last two digits; every customer has SOME
-- order in this data, so the anti-join is on recent orders)
-- r12: money sums decimal-exact inside sum() — hash-stable under any
-- plan order; same text both engines (see graft.sources.Tables.exactSum)
select cntrycode, count(*) as numcust, cast(sum(cast(c_acctbal as decimal(25,6))) as double) as totacctbal
from (
  select substring(c_name, 17, 2) as cntrycode, c_acctbal, c_custkey
  from customer
  where substring(c_name, 17, 2) in ('12', '17', '23', '29', '30', '31', '18')
    and c_acctbal > (
      select avg(c_acctbal) from customer where c_acctbal > 0.00)
    and not exists (
      select * from orders
      where o_custkey = c_custkey
        and o_orderdate >= date '1999-01-01')
) as custsale
group by cntrycode
order by cntrycode

-- TPC-H Q20 potential part promotion (partsupp absent -> the inner
-- grouped-HAVING subquery thresholds shipped volume instead of
-- availqty vs half of shipped)
select s_name, s_acctbal
from supplier, nation
where s_suppkey in (
    select l_suppkey
    from lineitem, part
    where l_partkey = p_partkey
      and p_name like 'small%'
      and l_shipdate >= date '1996-01-01'
      and l_shipdate < date '1997-01-01'
    group by l_suppkey
    having sum(l_quantity) > 50)
  and s_nationkey = n_nationkey
  and n_name = 'NATION_3'
order by s_name

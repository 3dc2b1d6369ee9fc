-- Customers per nation/region above a parameterized balance floor.
-- Placeholder ${min_acctbal} is rendered by graft.sources.SqlTemplates
-- before execution (the reference's Jinja-templated SQL-file pattern,
-- dags/example_python_operator.py:70-75).
SELECT n_name, r_name, count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_acctbal > ${min_acctbal}
GROUP BY n_name, r_name

-- SQL sweep: every statement below is executed VERBATIM by BOTH
-- spark.sql(...) and DuckDB over the same parquet tables and diffed
-- (order-insensitive rows, column-name-sorted, bit-exact values).
-- The reference drives 488 lines of mixed SQL through its engine + SQLite
-- the same way (sqlite_testrunner.hpp:38-41,
-- resources/test_data/sqlite_testrunner_queries.sql); this file is the
-- Spark/DuckDB shared-dialect analog.
--
-- Shared-dialect rules (enforced by review + the runner's failures):
--  * double sums go through CAST(... AS DECIMAL(38,6)) then back to DOUBLE
--    (engines' native double accumulation orders differ);
--  * no double->int CAST (truncate vs round-half-even differs): floor/ceil;
--  * no ROUND (rounding mode differs), no division that can hit zero;
--  * timestamps compared via CAST(ts AS STRING) / EXTRACT, never via
--    (date_trunc results go through CAST(.. AS TIMESTAMP): DuckDB returns DATE)
--    timestamp literals (Spark literal is LTZ, parquet columns are NTZ);
--  * LIMIT only under a totally-ordering ORDER BY.
-- Statements are ';'-separated; '--' comments are stripped by the runner.

-- ============================= scans: comparisons ===========================
SELECT n_nationkey, n_name FROM nation WHERE n_nationkey = 7;
SELECT n_nationkey FROM nation WHERE n_nationkey <> 7;
SELECT n_nationkey FROM nation WHERE n_nationkey < 5;
SELECT n_nationkey FROM nation WHERE n_nationkey <= 5;
SELECT n_nationkey FROM nation WHERE n_nationkey > 20;
SELECT n_nationkey FROM nation WHERE n_nationkey >= 20;
SELECT COUNT(*) AS n FROM lineitem WHERE l_quantity BETWEEN 10 AND 20;
SELECT COUNT(*) AS n FROM lineitem WHERE l_quantity >= 10 AND l_quantity < 20;
SELECT COUNT(*) AS n FROM lineitem WHERE l_quantity > 10 AND l_quantity <= 20;
SELECT COUNT(*) AS n FROM orders WHERE o_totalprice > 100000 OR o_orderstatus = 'F';
SELECT COUNT(*) AS n FROM orders WHERE NOT (o_orderstatus = 'F');
SELECT COUNT(*) AS n FROM events WHERE value IS NULL;
SELECT COUNT(*) AS n FROM events WHERE value IS NOT NULL;
SELECT COUNT(*) AS n FROM events WHERE value IS NULL AND event_type = 'error';
SELECT COUNT(*) AS n FROM events WHERE value IS NULL OR value > 95;

-- ============================= scans: LIKE =================================
SELECT p_partkey FROM part WHERE p_name LIKE 'red%' ORDER BY p_partkey LIMIT 50;
SELECT COUNT(*) AS n FROM part WHERE p_name LIKE '%bolt';
SELECT COUNT(*) AS n FROM part WHERE p_name LIKE '%ring%';
SELECT COUNT(*) AS n FROM part WHERE p_name NOT LIKE '%ring%';
SELECT COUNT(*) AS n FROM part WHERE p_name LIKE '_ed%';
SELECT COUNT(*) AS n FROM part WHERE p_name LIKE 'red _____t';
SELECT COUNT(*) AS n FROM customer WHERE c_name LIKE 'Customer#0000000__';

-- ============================= scans: IN ===================================
SELECT COUNT(*) AS n FROM customer WHERE c_nationkey IN (1, 2, 3);
SELECT COUNT(*) AS n FROM customer WHERE c_nationkey NOT IN (1, 2, 3);
SELECT COUNT(*) AS n FROM part WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3');
SELECT COUNT(*) AS n FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW');
SELECT COUNT(*) AS n FROM part WHERE p_size IN (1);

-- ====================== projections / expressions ==========================
SELECT n_nationkey, n_nationkey + 1 AS inc, n_nationkey - 1 AS dec,
       n_nationkey * 2 AS dbl, n_nationkey % 3 AS m3, -n_nationkey AS neg
FROM nation;
SELECT o_orderkey, o_totalprice * 1.07 AS taxed FROM orders
WHERE o_orderkey % 101 = 0 ORDER BY o_orderkey;
SELECT p_partkey,
       CASE WHEN p_size > 40 THEN 'XL' WHEN p_size > 20 THEN 'L' ELSE 'S' END AS sz
FROM part ORDER BY p_partkey LIMIT 100;
SELECT p_partkey,
       CASE p_type WHEN 'ECONOMY' THEN 1 WHEN 'SMALL' THEN 2 ELSE 0 END AS type_code
FROM part ORDER BY p_partkey LIMIT 100;
SELECT n_nationkey, CAST(n_nationkey AS STRING) AS k_str,
       CAST(n_nationkey AS DOUBLE) AS k_dbl,
       CAST(CAST(n_nationkey AS STRING) AS BIGINT) AS k_rt
FROM nation;
SELECT c_custkey, COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg
FROM customer ORDER BY c_custkey LIMIT 200;
SELECT event_id, COALESCE(value, -1.0) AS v FROM events
WHERE event_id % 97 = 0 ORDER BY event_id;
SELECT p_partkey, CAST(FLOOR(p_retailprice) AS BIGINT) AS fl,
       CAST(CEIL(p_retailprice) AS BIGINT) AS ce,
       ABS(p_retailprice - 1000.0) AS dist
FROM part ORDER BY p_partkey LIMIT 100;
SELECT GREATEST(1, 2, 3) AS g, LEAST(4, 5, 6) AS l FROM region WHERE r_regionkey = 0;

-- ============================ string functions ==============================
SELECT n_name, UPPER(n_name) AS up, LOWER(n_name) AS lo, LENGTH(n_name) AS len
FROM nation;
SELECT n_name, SUBSTRING(n_name, 1, 6) AS pfx, SUBSTRING(n_name, 8) AS sfx FROM nation;
SELECT n_name || '/' || r_name AS path FROM nation JOIN region ON n_regionkey = r_regionkey;
SELECT CONCAT(r_name, '-', CAST(r_regionkey AS STRING)) AS tag FROM region;
SELECT TRIM('  x  ') AS t, LTRIM('  x') AS lt, RTRIM('x  ') AS rt
FROM region WHERE r_regionkey = 0;
SELECT REPLACE(n_name, 'NATION', 'N') AS short_name FROM nation;
SELECT LEFT(c_name, 9) AS pfx, RIGHT(c_name, 2) AS sfx FROM customer
ORDER BY c_custkey LIMIT 100;
SELECT c_name, INSTR(c_name, '#') AS hash_pos FROM customer ORDER BY c_custkey LIMIT 50;
SELECT p_name, REVERSE(p_name) AS rev FROM part ORDER BY p_partkey LIMIT 50;
SELECT LPAD(CAST(n_nationkey AS STRING), 4, '0') AS padded FROM nation;
SELECT SPLIT_PART(c_name, '#', 2) AS numpart FROM customer ORDER BY c_custkey LIMIT 50;

-- ============================ date/time extract =============================
SELECT EXTRACT(YEAR FROM o_orderdate) AS y, EXTRACT(MONTH FROM o_orderdate) AS m,
       EXTRACT(DAY FROM o_orderdate) AS d, o_orderkey
FROM orders ORDER BY o_orderkey LIMIT 100;
SELECT CAST(o_orderdate AS STRING) AS od, o_orderkey FROM orders
ORDER BY o_orderkey LIMIT 100;
SELECT YEAR(l_shipdate) AS y, COUNT(*) AS n FROM lineitem GROUP BY YEAR(l_shipdate);
SELECT EXTRACT(QUARTER FROM o_orderdate) AS q, COUNT(*) AS n FROM orders GROUP BY 1;
-- (DAYOFWEEK is excluded: Spark numbers Sunday=1, DuckDB Sunday=0)
SELECT EXTRACT(DOY FROM o_orderdate) AS doy, COUNT(*) AS n FROM orders GROUP BY 1;

-- ============================== aggregates =================================
SELECT COUNT(*) AS n_rows, COUNT(value) AS n_vals, COUNT(DISTINCT event_type) AS n_types
FROM events;
SELECT MIN(p_retailprice) AS mn, MAX(p_retailprice) AS mx FROM part;
SELECT MIN(n_name) AS first_name, MAX(n_name) AS last_name FROM nation;
SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty FROM lineitem;
SELECT l_returnflag, CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS rev,
       COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag;
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders GROUP BY o_orderstatus, o_orderpriority;
SELECT c_nationkey, COUNT(DISTINCT c_mktsegment) AS n_segs FROM customer GROUP BY c_nationkey;
SELECT COUNT(DISTINCT l_suppkey) AS n_sup, COUNT(DISTINCT l_partkey) AS n_part FROM lineitem;
SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type HAVING COUNT(*) > 1000;
SELECT c_nationkey,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_bal
FROM customer GROUP BY c_nationkey HAVING COUNT(*) >= 10;
SELECT DISTINCT o_orderstatus FROM orders;
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem;
SELECT COUNT(*) AS n FROM (SELECT DISTINCT l_orderkey FROM lineitem) d;

-- ============================ grouping sets ================================
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority);
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority);
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ());

-- ================================ joins ====================================
SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey;
SELECT c_custkey, n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
ORDER BY c_custkey LIMIT 200;
SELECT s_name, n_name, r_name FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey;
SELECT c.c_custkey, o.o_orderkey FROM customer c
LEFT JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_totalprice > 200000
ORDER BY c.c_custkey, o.o_orderkey LIMIT 500;
SELECT c.c_custkey, o.o_orderkey FROM orders o
RIGHT JOIN customer c ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'P'
ORDER BY c.c_custkey, o.o_orderkey LIMIT 500;
SELECT COUNT(*) AS n FROM region r1 FULL OUTER JOIN region r2
ON r1.r_regionkey = r2.r_regionkey + 3;
SELECT r1.r_name AS a, r2.r_name AS b FROM region r1 CROSS JOIN region r2;
SELECT COUNT(*) AS n FROM nation n1 JOIN nation n2
ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey;
SELECT COUNT(*) AS n FROM customer JOIN orders
ON c_custkey = o_custkey AND c_acctbal > o_totalprice;
SELECT s_suppkey, s_name FROM supplier WHERE EXISTS
(SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey AND l_quantity > 49);
SELECT s_suppkey FROM supplier WHERE NOT EXISTS
(SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey AND l_quantity > 49);
SELECT c_custkey FROM customer WHERE c_custkey IN
(SELECT o_custkey FROM orders WHERE o_totalprice > 300000);
SELECT COUNT(*) AS n FROM customer WHERE c_nationkey NOT IN
(SELECT n_nationkey FROM nation WHERE n_regionkey = 2);

-- ============================= set operations ==============================
SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9900
UNION ALL
SELECT s_nationkey AS k FROM supplier WHERE s_acctbal > 9000;
SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9900
UNION
SELECT s_nationkey AS k FROM supplier WHERE s_acctbal > 9000;
SELECT c_nationkey AS k FROM customer
INTERSECT
SELECT n_nationkey AS k FROM nation WHERE n_regionkey = 1;
SELECT n_nationkey AS k FROM nation
EXCEPT
SELECT c_nationkey AS k FROM customer;
SELECT p_size AS v FROM part WHERE p_size <= 3
INTERSECT
SELECT n_regionkey AS v FROM nation;

-- =============================== subqueries ================================
SELECT COUNT(*) AS n FROM part
WHERE p_retailprice > (SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(38,6))) AS DOUBLE)
                              / COUNT(*) FROM part);
SELECT o_orderkey, o_totalprice FROM orders
WHERE o_totalprice = (SELECT MAX(o_totalprice) FROM orders);
SELECT p_brand, COUNT(*) AS n FROM part p1
WHERE p_retailprice = (SELECT MIN(p_retailprice) FROM part p2 WHERE p2.p_brand = p1.p_brand)
GROUP BY p_brand;
SELECT t.seg, t.n FROM
(SELECT c_mktsegment AS seg, COUNT(*) AS n FROM customer GROUP BY c_mktsegment) t
WHERE t.n > 200;
WITH big_orders AS (SELECT * FROM orders WHERE o_totalprice > 250000)
SELECT o_orderstatus, COUNT(*) AS n FROM big_orders GROUP BY o_orderstatus;
WITH a AS (SELECT n_regionkey, COUNT(*) AS n FROM nation GROUP BY n_regionkey),
     b AS (SELECT n_regionkey FROM a WHERE n = 5)
SELECT r_name FROM region JOIN b ON r_regionkey = n_regionkey;
SELECT c_custkey,
       (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
FROM customer ORDER BY c_custkey LIMIT 100;

-- ============================ window functions =============================
SELECT c_custkey, c_mktsegment,
       ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
FROM customer ORDER BY c_custkey LIMIT 300;
SELECT p_partkey, p_size,
       RANK() OVER (ORDER BY p_size, p_partkey) AS rk,
       DENSE_RANK() OVER (ORDER BY p_size) AS drk
FROM part ORDER BY p_partkey LIMIT 300;
SELECT o_custkey, o_orderkey,
       LAG(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_o,
       LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS next_o
FROM orders WHERE o_custkey < 50 ORDER BY o_custkey, o_orderkey;
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER
            (PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
FROM orders WHERE o_custkey < 30 ORDER BY o_custkey, o_orderkey;
SELECT n_regionkey, n_nationkey,
       FIRST_VALUE(n_name) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS first_nation,
       COUNT(*) OVER (PARTITION BY n_regionkey) AS region_size
FROM nation ORDER BY n_nationkey;
SELECT p_partkey,
       NTILE(4) OVER (ORDER BY p_partkey) AS quartile
FROM part WHERE p_partkey < 100 ORDER BY p_partkey;

-- =========================== order by / limit ==============================
SELECT event_id, value FROM events
ORDER BY value ASC NULLS FIRST, event_id LIMIT 40;
SELECT event_id, value FROM events
ORDER BY value DESC NULLS FIRST, event_id LIMIT 40;
SELECT event_id, value FROM events
ORDER BY value ASC NULLS LAST, event_id LIMIT 40;
SELECT c_custkey, c_acctbal FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 15;
SELECT p_partkey FROM part ORDER BY p_partkey DESC LIMIT 10;

-- ============================= NULL semantics ==============================
SELECT COUNT(*) AS n FROM events WHERE (value > 50) IS NULL;
SELECT event_type, COUNT(*) AS n FROM events WHERE value IS NULL GROUP BY event_type;
SELECT CAST(SUM(CAST(COALESCE(value, 0.0) AS DECIMAL(38,6))) AS DOUBLE) AS s FROM events;
SELECT MAX(value) AS mx, MIN(value) AS mn FROM events WHERE event_type = 'error';
SELECT NULLIF(1, 1) AS a, NULLIF(1, 2) AS b FROM region WHERE r_regionkey = 0;
SELECT COUNT(*) AS n FROM events WHERE NOT (value > 50);

-- ====================== mixed multi-operator queries =======================
SELECT n_name,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS nation_rev,
       COUNT(DISTINCT c_custkey) AS n_active
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderstatus <> 'F'
GROUP BY n_name
HAVING COUNT(*) > 50;
SELECT seg, mx - mn AS spread FROM
(SELECT c_mktsegment AS seg, MAX(c_acctbal) AS mx, MIN(c_acctbal) AS mn
 FROM customer GROUP BY c_mktsegment) t;
SELECT l_returnflag,
       CAST(SUM(CAST(CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0 END
                     AS DECIMAL(38,6))) AS DOUBLE) AS discounted_rev
FROM lineitem GROUP BY l_returnflag;
SELECT x.o_orderstatus, x.n, y.total_n FROM
(SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus) x
CROSS JOIN (SELECT COUNT(*) AS total_n FROM orders) y;
SELECT p_type, COUNT(*) AS n,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price
FROM part WHERE p_name LIKE '%w%' GROUP BY p_type;
SELECT u.user_id, u.n_events FROM
(SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id) u
WHERE u.n_events > (SELECT COUNT(*) FROM events) / (SELECT COUNT(DISTINCT user_id) FROM events)
ORDER BY u.user_id LIMIT 100;
SELECT d.lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
FROM documents d GROUP BY d.lang;
SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY source, lang;
SELECT doc_id, LENGTH(text) AS len FROM documents
WHERE LENGTH(text) > 900 ORDER BY doc_id LIMIT 100;
SELECT vec_id, label FROM embeddings WHERE label = 3 ORDER BY vec_id LIMIT 100;
SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label;

-- =================== in-engine interval / date arithmetic ==================
SELECT COUNT(*) AS n FROM orders o JOIN lineitem l ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY;
SELECT COUNT(*) AS n FROM orders o JOIN lineitem l ON o_orderkey = l_orderkey
WHERE l_shipdate <= o_orderdate + INTERVAL 1 MONTH;
SELECT COUNT(*) AS n FROM lineitem WHERE l_shipdate + INTERVAL 1 YEAR > l_shipdate;
SELECT o_orderpriority, COUNT(*) AS n FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority;
SELECT CAST(CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS STRING) AS mon, COUNT(*) AS n
FROM orders GROUP BY 1;
SELECT CAST(CAST(DATE_TRUNC('year', l_shipdate) AS TIMESTAMP) AS STRING) AS yr,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS qty
FROM lineitem GROUP BY 1;
SELECT COUNT(*) AS n FROM orders
WHERE o_orderdate BETWEEN DATE_TRUNC('year', o_orderdate)
                      AND DATE_TRUNC('year', o_orderdate) + INTERVAL 6 MONTH;

-- ======================= window frames / rank variants =====================
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER
            (PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS win3
FROM orders WHERE o_custkey < 40 ORDER BY o_custkey, o_orderkey;
SELECT o_custkey, o_orderkey,
       MIN(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                             ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING) AS next_min
FROM orders WHERE o_custkey < 40 ORDER BY o_custkey, o_orderkey;
SELECT p_partkey,
       PERCENT_RANK() OVER (ORDER BY p_partkey) AS pr,
       CUME_DIST() OVER (ORDER BY p_partkey) AS cd
FROM part WHERE p_partkey < 200 ORDER BY p_partkey;
SELECT n_regionkey, n_nationkey,
       LAST_VALUE(n_name) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey
                                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS last_nation
FROM nation ORDER BY n_nationkey;
SELECT o_custkey, COUNT(*) OVER (PARTITION BY o_custkey) AS cust_orders, o_orderkey
FROM orders WHERE o_custkey < 25 ORDER BY o_custkey, o_orderkey;

-- =========================== set ops: ALL variants =========================
SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9800
INTERSECT ALL
SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9600;
SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9600
EXCEPT ALL
SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9800;

-- ======================= subquery / CTE compositions =======================
WITH r AS (SELECT r_regionkey FROM region WHERE r_name <> 'ASIA'),
     n AS (SELECT n_nationkey, n_regionkey FROM nation),
     j AS (SELECT n_nationkey FROM n JOIN r ON n.n_regionkey = r.r_regionkey)
SELECT COUNT(*) AS n FROM j;
SELECT s_suppkey,
       (SELECT MAX(l_quantity) FROM lineitem WHERE l_suppkey = s_suppkey) AS max_qty
FROM supplier ORDER BY s_suppkey LIMIT 100;
SELECT o_orderstatus, COUNT(*) AS n FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
GROUP BY o_orderstatus;
SELECT COUNT(*) AS n FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45));
SELECT t.k, t.n FROM (
  SELECT c_nationkey AS k, COUNT(*) AS n FROM customer GROUP BY c_nationkey
  UNION ALL
  SELECT s_nationkey AS k, COUNT(*) AS n FROM supplier GROUP BY s_nationkey) t
ORDER BY t.k, t.n;
SELECT x.p_brand, x.n FROM
 (SELECT p_brand, COUNT(*) AS n,
         MAX(COUNT(*)) OVER () AS mx
  FROM part GROUP BY p_brand) x
WHERE x.n = x.mx;

-- ====================== aggregates over whole table ========================
SELECT COUNT(*) AS n, COUNT(DISTINCT o_custkey) AS actives FROM orders
HAVING COUNT(*) > 0;
SELECT CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sv,
       MIN(event_id) AS mn, MAX(event_id) AS mx
FROM events WHERE event_type IN ('click', 'view');
SELECT SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS closed,
       SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS open
FROM orders;

-- ===================== join-condition expressions ==========================
SELECT COUNT(*) AS n FROM nation n1 JOIN nation n2
ON n1.n_nationkey + 1 = n2.n_nationkey;
SELECT COUNT(*) AS n FROM nation n1 JOIN region r
ON n1.n_regionkey = r.r_regionkey AND LENGTH(r.r_name) > 4;
SELECT COUNT(*) AS n FROM customer JOIN nation
ON c_nationkey = n_nationkey AND SUBSTRING(n_name, 1, 6) = 'NATION';
SELECT c1.c_custkey, c2.c_custkey AS other FROM customer c1 JOIN customer c2
ON c1.c_nationkey = c2.c_nationkey AND c1.c_custkey + 1000 = c2.c_custkey
ORDER BY c1.c_custkey LIMIT 100;
-- ====================== grouping sets / rollup / cube ======================

SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       GROUPING(o_orderstatus) AS g1, GROUPING(o_orderpriority) AS g2
FROM orders GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ());
SELECT l_returnflag, l_linestatus, COUNT(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus);
SELECT l_returnflag, l_linestatus, COUNT(*) AS n
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus);
SELECT c_mktsegment, c_nationkey, COUNT(*) AS n,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS bal
FROM customer GROUP BY ROLLUP (c_mktsegment, c_nationkey);
SELECT l_returnflag, COUNT(*) AS n, GROUPING(l_returnflag) AS g
FROM lineitem GROUP BY CUBE (l_returnflag);

-- ====================== deeper CTE nesting =================================
WITH a AS (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey),
     b AS (SELECT n, COUNT(*) AS custs FROM a GROUP BY n),
     c AS (SELECT MAX(custs) AS mx FROM b)
SELECT b.n, b.custs FROM b, c WHERE b.custs = c.mx ORDER BY b.n;
WITH big AS (SELECT * FROM orders WHERE o_totalprice > 200000),
     by_cust AS (SELECT o_custkey, COUNT(*) AS n_big FROM big GROUP BY o_custkey),
     ranked AS (SELECT o_custkey, n_big FROM by_cust WHERE n_big >= 2)
SELECT c.c_mktsegment, COUNT(*) AS n FROM ranked r JOIN customer c ON r.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment;
WITH r1 AS (SELECT n_regionkey, COUNT(*) AS n FROM nation GROUP BY n_regionkey),
     r2 AS (SELECT r.r_name, r1.n FROM r1 JOIN region r ON r1.n_regionkey = r.r_regionkey),
     r3 AS (SELECT r_name, n FROM r2 WHERE n > 0)
SELECT * FROM r3 ORDER BY r_name;

-- ====================== correlated subqueries ==============================
SELECT c_custkey FROM customer c
WHERE c_acctbal > (SELECT CAST(AVG(CAST(c2.c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                   FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
ORDER BY c_custkey LIMIT 100;
SELECT p_partkey, p_brand FROM part p
WHERE p_retailprice = (SELECT MIN(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand)
ORDER BY p_partkey;
SELECT o_orderkey FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
ORDER BY o_orderkey LIMIT 100;
SELECT o_orderkey FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
ORDER BY o_orderkey;
SELECT s_suppkey, s_name FROM supplier s
WHERE (SELECT COUNT(*) FROM lineitem l WHERE l.l_suppkey = s.s_suppkey) > 50
ORDER BY s_suppkey;
SELECT n_name FROM nation n
WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal < 0)
ORDER BY n_name;

-- ====================== scalar subqueries (uncorrelated) ===================
SELECT COUNT(*) AS n FROM orders WHERE o_totalprice > (SELECT CAST(AVG(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) FROM orders);
SELECT p_partkey FROM part WHERE p_size = (SELECT MAX(p_size) FROM part) ORDER BY p_partkey;
SELECT (SELECT COUNT(*) FROM nation) AS n_nations, (SELECT COUNT(*) FROM region) AS n_regions;
SELECT c_custkey FROM customer
WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
ORDER BY c_custkey LIMIT 100;
SELECT c_custkey FROM customer
WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_regionkey <> 1)
ORDER BY c_custkey LIMIT 100;

-- ====================== string function edge cases =========================
SELECT p_partkey, UPPER(p_name) AS up, LOWER(p_brand) AS lo, LENGTH(p_name) AS len
FROM part WHERE p_partkey <= 20 ORDER BY p_partkey;
SELECT p_partkey, SUBSTRING(p_name, 1, 3) AS pfx, SUBSTRING(p_name, 4) AS rest
FROM part WHERE p_partkey <= 20 ORDER BY p_partkey;
SELECT p_partkey, SUBSTRING(p_name, LENGTH(p_name), 1) AS last_ch
FROM part WHERE p_partkey <= 20 ORDER BY p_partkey;
SELECT p_partkey, SUBSTRING(p_name, 1, 0) AS empty_sub, SUBSTRING(p_name, 100, 5) AS past_end
FROM part WHERE p_partkey <= 10 ORDER BY p_partkey;
SELECT c_custkey, TRIM(c_name) AS t, LTRIM(c_name) AS lt, RTRIM(c_name) AS rt
FROM customer WHERE c_custkey <= 10 ORDER BY c_custkey;
SELECT n_nationkey, REPLACE(n_name, 'A', '_') AS repl FROM nation ORDER BY n_nationkey;
SELECT n_nationkey, REVERSE(n_name) AS rev FROM nation ORDER BY n_nationkey;
SELECT n_nationkey, REPEAT(n_name, 2) AS rep FROM nation WHERE n_nationkey < 5 ORDER BY n_nationkey;
SELECT n_nationkey, LPAD(n_name, 12, '.') AS lp, RPAD(n_name, 12, '.') AS rp
FROM nation ORDER BY n_nationkey;
SELECT n_nationkey, n_name || '/' || CAST(n_regionkey AS STRING) AS tagged
FROM nation ORDER BY n_nationkey;
SELECT o_orderkey, POSITION('URGENT' IN o_orderpriority) AS pos
FROM orders WHERE o_orderkey <= 64 ORDER BY o_orderkey;
SELECT DISTINCT SPLIT_PART(o_orderpriority, '-', 1) AS code FROM orders ORDER BY code;
SELECT DISTINCT SPLIT_PART(o_orderpriority, '-', 2) AS label FROM orders ORDER BY label;
SELECT COUNT(*) AS n FROM part WHERE LENGTH(p_name) = 0;
SELECT COUNT(*) AS n FROM documents WHERE SUBSTRING(text, 1, 1) = ' ';
SELECT l_returnflag || l_linestatus AS rf_ls, COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag || l_linestatus ORDER BY rf_ls;

-- ====================== numeric / conditional edge cases ===================
SELECT COALESCE(NULL, NULL, 42) AS c1, COALESCE(7, 8) AS c2, NULLIF(3, 3) AS nf1, NULLIF(3, 4) AS nf2;
SELECT GREATEST(1, 2, 3) AS g, LEAST(1, 2, 3) AS l;
SELECT event_id, COALESCE(value, -1.0) AS v FROM events WHERE event_id <= 50 ORDER BY event_id;
SELECT event_id, CASE WHEN value IS NULL THEN 'missing' WHEN value > 50 THEN 'high' ELSE 'low' END AS band
FROM events WHERE event_id <= 50 ORDER BY event_id;
SELECT ABS(-5) AS a1, ABS(5) AS a2, FLOOR(3.7) AS f, CEIL(3.2) AS c, MOD(17, 5) AS m;
SELECT p_partkey, FLOOR(p_retailprice) AS fl, CEIL(p_retailprice) AS ce
FROM part WHERE p_partkey <= 20 ORDER BY p_partkey;
SELECT SIGN(-3.5) AS s1, SIGN(0) AS s2, SIGN(2.5) AS s3;
SELECT POWER(2, 10) AS p, SQRT(144.0) AS r;
SELECT l_orderkey, l_linenumber, l_quantity * (1 - l_discount) * (1 + l_tax) AS gross
FROM lineitem WHERE l_orderkey <= 16 ORDER BY l_orderkey, l_linenumber;
SELECT NULL IS NULL AS t1, NULL IS NOT NULL AS t2, (1 = NULL) IS NULL AS t3;
SELECT CAST(GREATEST(c_acctbal, 0.0) AS DOUBLE) AS nonneg, c_custkey
FROM customer WHERE c_custkey <= 20 ORDER BY c_custkey;

-- ====================== date/time functions ================================
SELECT EXTRACT(YEAR FROM o_orderdate) AS yr, COUNT(*) AS n
FROM orders GROUP BY EXTRACT(YEAR FROM o_orderdate) ORDER BY yr;
SELECT EXTRACT(MONTH FROM o_orderdate) AS mo, EXTRACT(DAY FROM o_orderdate) AS dy, COUNT(*) AS n
FROM orders GROUP BY 1, 2 ORDER BY mo, dy LIMIT 50;
SELECT EXTRACT(HOUR FROM ts) AS hr, COUNT(*) AS n FROM events GROUP BY 1 ORDER BY hr;
SELECT EXTRACT(MINUTE FROM ts) AS mi, COUNT(*) AS n FROM events GROUP BY 1 ORDER BY mi LIMIT 30;
SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS mon, COUNT(*) AS n
FROM orders GROUP BY 1 ORDER BY mon LIMIT 40;
SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS hr, COUNT(*) AS n
FROM events GROUP BY 1 ORDER BY hr LIMIT 40;
SELECT o_orderdate, COUNT(*) AS n FROM orders
WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
GROUP BY o_orderdate ORDER BY o_orderdate LIMIT 50;
SELECT COUNT(*) AS n FROM orders WHERE o_orderdate = DATE '1996-02-29';
SELECT MIN(o_orderdate) AS lo, MAX(o_orderdate) AS hi FROM orders;

-- ====================== window functions: frames & ranks ===================
SELECT c_custkey, c_acctbal,
       RANK() OVER (ORDER BY c_acctbal DESC, c_custkey) AS rnk,
       DENSE_RANK() OVER (ORDER BY c_acctbal DESC, c_custkey) AS drnk
FROM customer WHERE c_custkey <= 50 ORDER BY c_custkey;
SELECT c_custkey, c_nationkey,
       ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
FROM customer WHERE c_custkey <= 100 ORDER BY c_custkey;
SELECT event_id, user_id, value,
       LAG(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_id,
       LEAD(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_id
FROM events WHERE user_id <= 5 ORDER BY user_id, event_id;
SELECT event_id, user_id,
       LAG(event_id, 2, -1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev2
FROM events WHERE user_id <= 5 ORDER BY user_id, event_id;
SELECT o_orderkey, o_custkey,
       FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS first_ord,
       LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ord
FROM orders WHERE o_custkey <= 20 ORDER BY o_custkey, o_orderkey;
SELECT c_custkey, c_acctbal,
       NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
FROM customer WHERE c_custkey <= 40 ORDER BY c_custkey;
SELECT c_custkey, PERCENT_RANK() OVER (ORDER BY c_custkey) AS pr,
       CUME_DIST() OVER (ORDER BY c_custkey) AS cd
FROM customer WHERE c_custkey <= 20 ORDER BY c_custkey;
SELECT event_id, user_id,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS win3
FROM events WHERE user_id <= 5 ORDER BY user_id, event_id;
SELECT o_orderkey, o_custkey,
       COUNT(*) OVER (PARTITION BY o_custkey) AS orders_of_cust
FROM orders WHERE o_custkey <= 15 ORDER BY o_orderkey;
SELECT event_id, user_id,
       MIN(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS min_neighbor
FROM events WHERE user_id <= 5 ORDER BY user_id, event_id;
SELECT n_nationkey, NTH_VALUE(n_name, 2) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey
       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_name
FROM nation ORDER BY n_nationkey;

-- ====================== TPC-DS-shaped: rollup over star join ===============
SELECT r.r_name, n.n_name, COUNT(*) AS n_custs
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name) ORDER BY r.r_name NULLS FIRST, n.n_name NULLS FIRST;
SELECT EXTRACT(YEAR FROM o.o_orderdate) AS yr, c.c_mktsegment,
       COUNT(*) AS n,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY GROUPING SETS ((yr, c_mktsegment), (yr), ())
ORDER BY yr NULLS FIRST, c_mktsegment NULLS FIRST;
SELECT seg, rnk, custkey FROM (
  SELECT c.c_mktsegment AS seg, c.c_custkey AS custkey,
         ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment ORDER BY CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE) DESC, c.c_custkey) AS rnk
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment, c.c_custkey
) t WHERE rnk <= 3 ORDER BY seg, rnk;
SELECT l_returnflag, yr, n,
       n - LAG(n) OVER (PARTITION BY l_returnflag ORDER BY yr) AS delta
FROM (
  SELECT l_returnflag, EXTRACT(YEAR FROM l_shipdate) AS yr, COUNT(*) AS n
  FROM lineitem GROUP BY l_returnflag, EXTRACT(YEAR FROM l_shipdate)
) t ORDER BY l_returnflag, yr;

-- ====================== set operations with duplicates =====================
SELECT c_nationkey AS k FROM customer WHERE c_custkey <= 30
INTERSECT ALL
SELECT c_nationkey AS k FROM customer WHERE c_custkey BETWEEN 15 AND 45 ORDER BY k;
SELECT c_nationkey AS k FROM customer WHERE c_custkey <= 30
EXCEPT ALL
SELECT c_nationkey AS k FROM customer WHERE c_custkey BETWEEN 15 AND 45 ORDER BY k;
SELECT n_regionkey AS k FROM nation UNION SELECT r_regionkey AS k FROM region ORDER BY k;
SELECT n_regionkey AS k FROM nation UNION ALL SELECT r_regionkey AS k FROM region ORDER BY k;
SELECT 1 AS k UNION ALL SELECT 1 AS k UNION ALL SELECT 2 AS k ORDER BY k;

-- ====================== VALUES and inline tables ===========================
SELECT * FROM (VALUES (1, 'one'), (2, 'two'), (3, 'three')) AS t(num, word) ORDER BY num;
SELECT t.num * 10 AS num10 FROM (VALUES (1), (2), (3)) AS t(num) ORDER BY num10;
SELECT n.n_name FROM nation n JOIN (VALUES (0), (2)) AS keep(k) ON n.n_regionkey = keep.k
ORDER BY n.n_name;

-- ====================== aggregates: FILTER, bool, distinct =================
SELECT COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
       COUNT(*) AS n_all
FROM orders;
SELECT c_nationkey,
       COUNT(*) FILTER (WHERE c_acctbal < 0) AS n_neg,
       COUNT(*) FILTER (WHERE c_acctbal >= 0) AS n_pos
FROM customer GROUP BY c_nationkey ORDER BY c_nationkey;
SELECT BOOL_AND(p_size > 0) AS all_pos, BOOL_OR(p_size > 49) AS any_big FROM part;
SELECT o_orderstatus, COUNT(DISTINCT o_orderpriority) AS n_prios
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT COUNT(DISTINCT l_suppkey) AS n_supp, COUNT(DISTINCT l_partkey) AS n_part FROM lineitem;
SELECT MIN(n_name) AS lo, MAX(n_name) AS hi FROM nation;
SELECT MIN(o_orderdate) AS lo, MAX(o_orderdate) AS hi, COUNT(DISTINCT o_orderdate) AS n_days FROM orders;
SELECT l_linestatus, CAST(MIN(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS min_p,
       CAST(MAX(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS max_p
FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus;

-- ====================== HAVING variants ====================================
SELECT c_nationkey, COUNT(*) AS n FROM customer
GROUP BY c_nationkey HAVING COUNT(*) > 10 ORDER BY c_nationkey;
SELECT o_custkey, COUNT(*) AS n FROM orders
GROUP BY o_custkey HAVING COUNT(*) BETWEEN 5 AND 10 ORDER BY o_custkey LIMIT 100;
SELECT l_suppkey, CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS qty
FROM lineitem GROUP BY l_suppkey
HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 500 ORDER BY l_suppkey;
SELECT p_brand, COUNT(*) AS n FROM part
GROUP BY p_brand HAVING COUNT(DISTINCT p_size) > 5 ORDER BY p_brand;

-- ====================== join shapes ========================================
SELECT n_nationkey, n_name FROM nation JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE' ORDER BY n_nationkey;
SELECT a.n_name FROM nation a JOIN nation b USING (n_nationkey, n_regionkey) ORDER BY a.n_name;
SELECT COUNT(*) AS n FROM nation n LEFT JOIN customer c ON n.n_nationkey = c.c_nationkey AND c.c_acctbal < -900;
SELECT n.n_name, COUNT(c.c_custkey) AS n_custs
FROM nation n LEFT JOIN customer c ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name ORDER BY n.n_name;
SELECT COUNT(*) AS n FROM region r CROSS JOIN nation n WHERE r.r_regionkey = n.n_regionkey;
SELECT a.n_nationkey AS k1, b.n_nationkey AS k2 FROM nation a JOIN nation b
ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
ORDER BY k1, k2;
SELECT s.s_suppkey, c.c_custkey FROM supplier s JOIN customer c
ON s.s_nationkey = c.c_nationkey WHERE s.s_suppkey <= 3 AND c.c_custkey <= 50
ORDER BY s.s_suppkey, c.c_custkey;
SELECT COUNT(*) AS n FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey JOIN nation nt ON c.c_nationkey = nt.n_nationkey
JOIN region r ON nt.n_regionkey = r.r_regionkey WHERE r.r_name = 'ASIA';
SELECT o.o_orderstatus, COUNT(*) AS n
FROM orders o FULL OUTER JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_acctbal > 9000
GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus NULLS FIRST;

-- ====================== ORDER BY / LIMIT edge cases ========================
SELECT event_id, value FROM events ORDER BY value ASC NULLS FIRST, event_id LIMIT 30;
SELECT event_id, value FROM events ORDER BY value DESC NULLS LAST, event_id LIMIT 30;
SELECT c_custkey FROM customer ORDER BY c_custkey DESC LIMIT 10;
SELECT c_custkey FROM customer ORDER BY c_custkey LIMIT 0;
SELECT DISTINCT o_orderstatus FROM orders ORDER BY o_orderstatus;
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY l_returnflag, l_linestatus;

-- ====================== documents / text table =============================
SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang ORDER BY lang;
SELECT source, COUNT(*) AS n, MIN(n_chars) AS min_c, MAX(n_chars) AS max_c
FROM documents GROUP BY source ORDER BY source;
SELECT doc_id, LENGTH(text) AS len FROM documents WHERE doc_id <= 20 ORDER BY doc_id;
SELECT COUNT(*) AS n FROM documents WHERE LENGTH(text) <> n_chars;
SELECT doc_id FROM documents WHERE text LIKE '%the%' ORDER BY doc_id LIMIT 50;
SELECT lang, CAST(SUM(CAST(n_chars AS DECIMAL(38,6))) AS DOUBLE) AS total_chars
FROM documents GROUP BY lang ORDER BY lang;

-- ====================== scalar numeric functions ===========================
SELECT n_nationkey, ABS(n_nationkey - 12) AS d FROM nation;
SELECT SIGN(o_totalprice - 150000) AS s, COUNT(*) AS n FROM orders GROUP BY SIGN(o_totalprice - 150000);
SELECT GREATEST(l_linenumber, 3) AS g, COUNT(*) AS n FROM lineitem GROUP BY GREATEST(l_linenumber, 3);
SELECT LEAST(l_linenumber, 3) AS g, COUNT(*) AS n FROM lineitem GROUP BY LEAST(l_linenumber, 3);
SELECT n_nationkey % 5 AS m, COUNT(*) AS n FROM nation GROUP BY n_nationkey % 5;
SELECT FLOOR(o_totalprice / 50000) AS bucket, COUNT(*) AS n FROM orders GROUP BY FLOOR(o_totalprice / 50000);
SELECT CEIL(o_totalprice / 50000) AS bucket, COUNT(*) AS n FROM orders GROUP BY CEIL(o_totalprice / 50000);
SELECT SQRT(CAST(p_size * p_size AS DOUBLE)) AS s FROM part WHERE p_partkey <= 20 ORDER BY p_partkey;
SELECT POWER(CAST(2 AS DOUBLE), CAST(l_linenumber AS DOUBLE)) AS p, COUNT(*) AS n FROM lineitem GROUP BY POWER(CAST(2 AS DOUBLE), CAST(l_linenumber AS DOUBLE));
SELECT -n_nationkey AS neg, ABS(-n_nationkey) AS back FROM nation WHERE n_nationkey < 4;
SELECT (2 + 3 * 4 - 5) AS prec, (2 + 3) * (4 - 5) AS paren FROM region WHERE r_regionkey = 0;

-- ====================== string functions: round 2 ==========================
SELECT REPLACE(n_name, 'A', '_') AS repl FROM nation ORDER BY n_nationkey;
SELECT LPAD(n_name, 12, '.') AS lp FROM nation ORDER BY n_nationkey;
SELECT RPAD(n_name, 12, '.') AS rp FROM nation ORDER BY n_nationkey;
SELECT REPEAT(r_name, 2) AS rr FROM region ORDER BY r_regionkey;
SELECT REVERSE(n_name) AS rev FROM nation ORDER BY n_nationkey;
SELECT LEFT(c_name, 8) AS l8, RIGHT(c_name, 3) AS r3 FROM customer WHERE c_custkey <= 10 ORDER BY c_custkey;
SELECT LTRIM(CONCAT('  ', n_name)) AS lt, RTRIM(CONCAT(n_name, '  ')) AS rt FROM nation ORDER BY n_nationkey;
SELECT CONCAT_WS('-', r_name, CAST(r_regionkey AS STRING)) AS joined FROM region ORDER BY r_regionkey;
SELECT ASCII(SUBSTR(n_name, 1, 1)) AS a, COUNT(*) AS n FROM nation GROUP BY ASCII(SUBSTR(n_name, 1, 1));
SELECT POSITION('A' IN n_name) AS pos, COUNT(*) AS n FROM nation GROUP BY POSITION('A' IN n_name);
SELECT INSTR(n_name, 'AN') AS pos, COUNT(*) AS n FROM nation GROUP BY INSTR(n_name, 'AN');
SELECT n_name FROM nation WHERE n_name LIKE '%!_%' ESCAPE '!';
SELECT UPPER(LOWER(UPPER(r_name))) AS up FROM region ORDER BY r_regionkey;
SELECT LENGTH(TRIM(CONCAT(' ', r_name, ' '))) AS len FROM region ORDER BY r_regionkey;

-- ====================== conditional / null scalar ==========================
SELECT NULLIF(o_orderstatus, 'O') AS st, COUNT(*) AS n FROM orders GROUP BY NULLIF(o_orderstatus, 'O');
SELECT COALESCE(NULLIF(n_name, 'FRANCE'), 'REPLACED') AS nm FROM nation ORDER BY n_nationkey;
SELECT COUNT(*) AS n FROM orders WHERE o_orderstatus IS DISTINCT FROM 'O';
SELECT COUNT(*) AS n FROM orders WHERE o_orderstatus IS NOT DISTINCT FROM 'F';
SELECT CASE WHEN o_totalprice > 200000 THEN CASE WHEN o_orderstatus = 'O' THEN 'big-open' ELSE 'big-done' END ELSE 'small' END AS cls, COUNT(*) AS n FROM orders GROUP BY 1;
SELECT CASE o_orderpriority WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2 ELSE 9 END AS pri, COUNT(*) AS n FROM orders GROUP BY 1;

-- ====================== events: time-series shapes =========================
SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS users FROM events GROUP BY event_type;
SELECT EXTRACT(HOUR FROM ts) AS hr, COUNT(*) AS n FROM events GROUP BY EXTRACT(HOUR FROM ts);
SELECT EXTRACT(MINUTE FROM ts) AS mi, COUNT(*) AS n FROM events WHERE event_type = 'click' GROUP BY EXTRACT(MINUTE FROM ts);
SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id HAVING COUNT(*) > 25 ORDER BY n DESC, user_id;
SELECT event_type, CAST(MIN(ts) AS STRING) AS first_ts, CAST(MAX(ts) AS STRING) AS last_ts FROM events GROUP BY event_type;
SELECT COUNT(*) AS n FROM events e JOIN events e2 ON e.user_id = e2.user_id AND e.event_id < e2.event_id AND e.event_type = 'purchase' AND e2.event_type = 'purchase' AND e.user_id < 50;
SELECT event_type, CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total FROM events GROUP BY event_type;
SELECT u.user_id, u.n_click, u.n_view FROM (SELECT user_id, COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click, COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view FROM events GROUP BY user_id) u WHERE u.n_click > u.n_view AND u.user_id < 100 ORDER BY u.user_id;

-- ====================== window functions: round 3 ==========================
SELECT o_orderkey, NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile FROM orders WHERE o_custkey < 30;
SELECT o_orderkey, CAST(PERCENT_RANK() OVER (ORDER BY o_totalprice, o_orderkey) AS DOUBLE) AS pr FROM orders WHERE o_custkey < 20;
SELECT o_orderkey, CAST(CUME_DIST() OVER (ORDER BY o_totalprice, o_orderkey) AS DOUBLE) AS cd FROM orders WHERE o_custkey < 20;
SELECT o_orderkey, NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_key FROM orders WHERE o_custkey < 20;
SELECT o_orderkey, LAG(o_orderkey, 1, -1) OVER (ORDER BY o_orderkey) AS prev_key FROM orders WHERE o_custkey < 20;
SELECT o_orderkey, LEAD(o_orderkey, 2, -1) OVER (ORDER BY o_orderkey) AS next2_key FROM orders WHERE o_custkey < 20;
SELECT n_regionkey, n_name, MIN(n_name) OVER (PARTITION BY n_regionkey) AS first_in_region FROM nation;
SELECT o_orderkey, COUNT(*) OVER (PARTITION BY o_custkey) AS orders_of_cust FROM orders WHERE o_custkey < 25;

-- ====================== join shapes: round 2 ===============================
SELECT n.n_name, r.r_name FROM (SELECT n_name, n_nationkey, n_regionkey AS rk FROM nation) n JOIN (SELECT r_name, r_regionkey AS rk FROM region) r USING (rk) WHERE n.n_nationkey < 10 ORDER BY n.n_name;
SELECT COUNT(*) AS n FROM (SELECT c_nationkey AS nk FROM customer) c JOIN (SELECT n_nationkey AS nk, n_regionkey AS rk FROM nation) n USING (nk) JOIN (SELECT r_regionkey AS rk, r_name FROM region) r USING (rk) WHERE r.r_name = 'ASIA';
SELECT c.c_custkey FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'P' WHERE o.o_orderkey IS NULL AND c.c_custkey <= 30 ORDER BY c.c_custkey;
SELECT COUNT(*) AS n FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey;
SELECT r1.r_name AS a, r2.r_name AS b FROM region r1 CROSS JOIN region r2 WHERE r1.r_regionkey < r2.r_regionkey ORDER BY a, b;
SELECT COUNT(*) AS n FROM supplier s JOIN customer c ON s.s_nationkey = c.c_nationkey WHERE s.s_suppkey <= 5;
SELECT n.n_name, COUNT(o.o_orderkey) AS n_orders FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey LEFT JOIN orders o ON o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F' GROUP BY n.n_name;
SELECT COUNT(*) AS n FROM orders o JOIN customer c ON COALESCE(o.o_custkey, -1) = c.c_custkey WHERE c.c_acctbal < 0;

-- ====================== distinct / dedup shapes ============================
SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders ORDER BY o_orderstatus, o_orderpriority;
SELECT COUNT(DISTINCT CONCAT(o_orderstatus, '|', o_orderpriority)) AS combos FROM orders;
SELECT COUNT(*) AS n FROM (SELECT DISTINCT l_orderkey FROM lineitem);
SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS supps FROM lineitem GROUP BY l_returnflag;
SELECT x.o_orderstatus FROM (SELECT DISTINCT o_orderstatus FROM orders) x ORDER BY x.o_orderstatus;

-- ====================== order/limit: round 2 ===============================
SELECT o_orderkey FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 5 OFFSET 5;
SELECT n_name FROM nation ORDER BY LENGTH(n_name), n_name LIMIT 6;
SELECT c_custkey, c_acctbal FROM customer ORDER BY CASE WHEN c_acctbal < 0 THEN 0 ELSE 1 END, c_acctbal, c_custkey LIMIT 8;
SELECT p_partkey FROM part ORDER BY p_retailprice DESC NULLS LAST, p_partkey LIMIT 7;

-- ====================== documents: text round 2 ============================
SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars FROM documents GROUP BY lang;
SELECT source, COUNT(*) AS n FROM documents WHERE text LIKE '%the%' GROUP BY source;
SELECT doc_id, LENGTH(text) AS len FROM documents WHERE LENGTH(text) <> n_chars;
SELECT lang, MIN(LENGTH(text)) AS min_len, MAX(LENGTH(text)) AS max_len FROM documents GROUP BY lang;
SELECT COUNT(*) AS n FROM documents WHERE UPPER(SUBSTR(text, 1, 1)) = SUBSTR(text, 1, 1) AND n_chars > 0;
SELECT d.lang, COUNT(*) AS n FROM documents d WHERE EXISTS (SELECT 1 FROM documents d2 WHERE d2.lang = d.lang AND d2.n_chars > d.n_chars * 2) GROUP BY d.lang;

-- ====================== group by: expressions & ordinals ===================
SELECT SUBSTR(c_name, 1, 9) AS pfx, COUNT(*) AS n FROM customer GROUP BY SUBSTR(c_name, 1, 9) HAVING COUNT(*) > 1 ORDER BY pfx LIMIT 10;
SELECT EXTRACT(YEAR FROM o_orderdate) AS yr, o_orderstatus, COUNT(*) AS n FROM orders GROUP BY 1, 2 ORDER BY yr, o_orderstatus;
SELECT l_linenumber + 0 AS ln, COUNT(*) AS n FROM lineitem GROUP BY l_linenumber + 0;
SELECT COUNT(*) AS n FROM lineitem HAVING COUNT(*) > 0;
SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus HAVING MIN(o_totalprice) < 5000 ORDER BY o_orderstatus;

-- ====================== derived tables over set ops ========================
SELECT t.k, COUNT(*) AS n FROM (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O' UNION ALL SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000) t GROUP BY t.k HAVING COUNT(*) >= 3 ORDER BY t.k LIMIT 12;
SELECT MAX(u.k) AS max_k FROM (SELECT n_nationkey AS k FROM nation EXCEPT SELECT s_nationkey AS k FROM supplier) u;
SELECT COUNT(*) AS n FROM (SELECT l_orderkey FROM lineitem INTERSECT SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F');
SELECT v.cls, COUNT(*) AS n FROM (SELECT CASE WHEN l_quantity < 10 THEN 'low' WHEN l_quantity < 40 THEN 'mid' ELSE 'high' END AS cls FROM lineitem) v GROUP BY v.cls;

-- ====================== correlated: round 2 ================================
SELECT c.c_custkey FROM customer c WHERE c.c_acctbal > (SELECT COALESCE(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 0.0) / 100.0 FROM orders o WHERE o.o_custkey = c.c_custkey) AND c.c_custkey <= 40 ORDER BY c.c_custkey;
SELECT n.n_name FROM nation n WHERE (SELECT COUNT(*) FROM supplier s WHERE s.s_nationkey = n.n_nationkey) > (SELECT COUNT(*) FROM customer c WHERE c.c_nationkey = n.n_nationkey) ORDER BY n.n_name;
SELECT o.o_orderkey FROM orders o WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05) AND o.o_orderkey <= 300 ORDER BY o.o_orderkey;
SELECT p.p_partkey FROM part p WHERE p.p_retailprice > 1.5 * (SELECT COALESCE(MIN(p2.p_retailprice), 0.0) FROM part p2 WHERE p2.p_brand = p.p_brand) AND p.p_partkey <= 120 ORDER BY p.p_partkey;

-- =================== round-3 tranche (validated vs DuckDB) =================
-- ====================== greatest / least / coalesce ========================
SELECT l_orderkey, l_linenumber, GREATEST(l_quantity, l_discount * 100) AS g FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 40;
SELECT l_orderkey, l_linenumber, LEAST(l_quantity, l_extendedprice / 1000) AS l FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 40;
SELECT COUNT(*) AS n FROM events WHERE GREATEST(COALESCE(value, 0), 50) = 50;
SELECT user_id, COALESCE(MAX(value), -1) AS mx FROM events GROUP BY user_id ORDER BY user_id LIMIT 30;
SELECT COALESCE(NULL, NULL, 'z') AS c1, COALESCE(NULL, 7) AS c2;
SELECT NULLIF(GREATEST(1, 2), 2) AS a, NULLIF(LEAST(1, 2), 2) AS b;
SELECT p_partkey, GREATEST(p_size, 25, 10) AS g3 FROM part ORDER BY p_partkey LIMIT 30;
SELECT event_id, LEAST(COALESCE(value, 999), 10.5) AS lv FROM events ORDER BY event_id LIMIT 30;
-- ====================== string functions: round 3 ==========================
SELECT s_suppkey, LPAD(s_name, 25, '.') AS padded FROM supplier ORDER BY s_suppkey LIMIT 20;
SELECT s_suppkey, RPAD(s_name, 25, '*') AS padded FROM supplier ORDER BY s_suppkey LIMIT 20;
SELECT n_nationkey, REPEAT(n_name, 2) AS dbl FROM nation ORDER BY n_nationkey;

SELECT n_nationkey, TRANSLATE(n_name, 'AEI', 'aei') AS tr FROM nation ORDER BY n_nationkey;
SELECT COUNT(*) AS n FROM part WHERE POSITION('lt' IN p_name) > 0;
SELECT p_partkey, POSITION('o' IN p_name) AS pos FROM part ORDER BY p_partkey LIMIT 40;
SELECT n_name, ASCII(n_name) AS first_code FROM nation ORDER BY n_name;
SELECT CHR(65) AS a, CHR(122) AS z;
SELECT n_nationkey, LEFT(n_name, 3) AS l3, RIGHT(n_name, 2) AS r2 FROM nation ORDER BY n_nationkey;
SELECT COUNT(*) AS n FROM documents WHERE CONTAINS(text, 'the');
SELECT p_partkey, SPLIT_PART(p_name, ' ', 1) AS w1 FROM part ORDER BY p_partkey LIMIT 40;
SELECT p_partkey, SPLIT_PART(p_name, ' ', 2) AS w2 FROM part ORDER BY p_partkey LIMIT 40;
SELECT o_orderkey, MD5(o_orderpriority) AS h FROM orders ORDER BY o_orderkey LIMIT 20;
-- ====================== percentile / median ================================
SELECT PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY l_quantity) AS med_qty FROM lineitem;
SELECT l_returnflag, PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY l_quantity) AS q1 FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag;
SELECT PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY p_size) AS med_size FROM part;
SELECT MEDIAN(l_quantity) AS med FROM lineitem;
-- ====================== GROUP BY ALL =======================================
SELECT l_returnflag, l_linestatus, COUNT(*) AS n FROM lineitem GROUP BY ALL ORDER BY l_returnflag, l_linestatus;
SELECT o_orderstatus, COUNT(*) AS n, FLOOR(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)) AS tot FROM orders GROUP BY ALL ORDER BY o_orderstatus;
SELECT event_type, EXTRACT(YEAR FROM ts) AS yr, COUNT(*) AS n FROM events GROUP BY ALL ORDER BY event_type, yr;
-- ====================== statistical aggregates =============================
SELECT STDDEV_POP(c_acctbal) AS sp FROM customer;
SELECT REGR_COUNT(value, user_id) AS rc FROM events;
SELECT REGR_AVGX(l_extendedprice, l_quantity) AS ax, REGR_AVGY(l_extendedprice, l_quantity) AS ay FROM lineitem;
-- ====================== boolean aggregates =================================

SELECT l_returnflag, BOOL_AND(l_quantity < 60) AS under60 FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag;
SELECT o_orderstatus, BOOL_OR(o_totalprice > 400000) AS has_jumbo FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus;
-- ====================== lateral joins ======================================
SELECT n.n_name, t.cnt FROM nation n, LATERAL (SELECT COUNT(*) AS cnt FROM customer c WHERE c.c_nationkey = n.n_nationkey) t ORDER BY n.n_name;
SELECT r.r_name, t.mx FROM region r, LATERAL (SELECT MAX(n_nationkey) AS mx FROM nation WHERE n_regionkey = r.r_regionkey) t ORDER BY r.r_name;
SELECT c.c_custkey, t.last_price FROM customer c, LATERAL (SELECT MAX(o_totalprice) AS last_price FROM orders o WHERE o.o_custkey = c.c_custkey) t WHERE c.c_custkey <= 30 ORDER BY c.c_custkey;
-- ====================== recursive CTE ======================================
WITH RECURSIVE seq(x) AS (SELECT 1 UNION ALL SELECT x + 1 FROM seq WHERE x < 10) SELECT x FROM seq ORDER BY x;
WITH RECURSIVE fib(a, b) AS (SELECT 0, 1 UNION ALL SELECT b, a + b FROM fib WHERE b < 100) SELECT a, b FROM fib ORDER BY a;
-- ====================== window functions: round 4 ==========================
SELECT l_orderkey, l_linenumber, SUM(CAST(l_quantity AS DECIMAL(38,6))) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rsum FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 60;
SELECT o_orderkey, LAG(o_orderstatus, 2, 'NONE') OVER (ORDER BY o_orderkey) AS lag2 FROM orders ORDER BY o_orderkey LIMIT 40;
SELECT o_orderkey, LEAD(o_orderstatus, 3, '?') OVER (ORDER BY o_orderkey) AS lead3 FROM orders ORDER BY o_orderkey LIMIT 40;
SELECT event_id, FIRST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_type FROM events ORDER BY event_id LIMIT 50;
SELECT event_id, LAST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type FROM events ORDER BY event_id LIMIT 50;
SELECT l_orderkey, l_linenumber, COUNT(*) OVER (PARTITION BY l_orderkey) AS nlines FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 60;
SELECT o_orderkey, MIN(o_totalprice) OVER (ORDER BY o_orderkey ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS win_min FROM orders ORDER BY o_orderkey LIMIT 40;
SELECT o_orderkey, MAX(o_totalprice) OVER (ORDER BY o_orderkey ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS win_max FROM orders ORDER BY o_orderkey LIMIT 40;
SELECT c_custkey, RANK() OVER (PARTITION BY c_mktsegment ORDER BY FLOOR(c_acctbal / 100), c_custkey) AS rnk FROM customer ORDER BY c_custkey LIMIT 50;
-- ====================== join shapes: round 3 ===============================
SELECT n1.n_name AS nation_a, n2.n_name AS nation_b FROM nation n1 JOIN nation n2 ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey ORDER BY nation_a, nation_b;
SELECT r_name, COUNT(c_custkey) AS n_cust FROM region LEFT JOIN nation ON r_regionkey = n_regionkey LEFT JOIN customer ON n_nationkey = c_nationkey GROUP BY r_name ORDER BY r_name;
SELECT COALESCE(a.k, b.k) AS k, a.na, b.nb FROM (SELECT c_nationkey AS k, COUNT(*) AS na FROM customer GROUP BY c_nationkey) a FULL OUTER JOIN (SELECT s_nationkey AS k, COUNT(*) AS nb FROM supplier GROUP BY s_nationkey) b ON a.k = b.k ORDER BY k;
SELECT s.s_suppkey, COUNT(l.l_orderkey) AS n FROM supplier s LEFT JOIN lineitem l ON s.s_suppkey = l.l_suppkey AND l.l_quantity > 45 GROUP BY s.s_suppkey ORDER BY s.s_suppkey LIMIT 40;
SELECT o.o_orderkey FROM orders o WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05) ORDER BY o.o_orderkey LIMIT 40;
SELECT COUNT(*) AS n FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey JOIN customer c ON o.o_custkey = c.c_custkey JOIN nation n ON c.c_nationkey = n.n_nationkey JOIN region r ON n.n_regionkey = r.r_regionkey WHERE r.r_name = 'ASIA';
SELECT p.p_brand, COUNT(DISTINCT l.l_suppkey) AS n_supp FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey GROUP BY p.p_brand ORDER BY p.p_brand;
SELECT c.c_custkey FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey GROUP BY c.c_custkey HAVING COUNT(*) > 12 ORDER BY c.c_custkey;
-- ====================== EXISTS / IN: round 3 ===============================
SELECT n_name FROM nation WHERE EXISTS (SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey AND s_acctbal > 5000) ORDER BY n_name;
SELECT COUNT(*) AS n FROM part WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 49);
SELECT COUNT(*) AS n FROM part WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem);
SELECT c_custkey FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 49.5)) ORDER BY c_custkey LIMIT 40;
SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') AND o_totalprice > 300000 ORDER BY o_orderkey;
SELECT COUNT(*) AS n FROM events e WHERE EXISTS (SELECT 1 FROM events e2 WHERE e2.user_id = e.user_id AND e2.event_type = 'purchase');
-- ====================== numeric edge cases: round 2 ========================
SELECT ABS(-5.5) AS a, SIGN(-3) AS s1, SIGN(0) AS s0, SIGN(9) AS s2;
SELECT MOD(17, 5) AS m1, MOD(-17, 5) AS m2, MOD(17, -5) AS m3;
SELECT l_orderkey, l_linenumber, MOD(l_orderkey + l_linenumber, 7) AS bucket FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 50;
SELECT POWER(2, 10) AS p, SQRT(144) AS r;
SELECT EXP(0) AS e0, LN(1) AS l1;
SELECT FLOOR(-2.5) AS f, CEIL(-2.5) AS c, FLOOR(2.5) AS f2, CEIL(2.5) AS c2;
SELECT LOG10(1000) AS lg, LOG2(8) AS l2;
SELECT COUNT(*) AS n FROM lineitem WHERE MOD(l_orderkey, 2) = 0 AND MOD(l_linenumber, 2) = 1;
SELECT CAST(FLOOR(o_totalprice / 10000) AS BIGINT) AS price_bucket, COUNT(*) AS n FROM orders GROUP BY 1 ORDER BY 1;
SELECT PI() AS pi_val;
SELECT ATAN2(1, 1) AS a, SIN(0) AS s, COS(0) AS c;
-- ====================== date functions: round 2 ============================
SELECT o_orderkey, CAST(LAST_DAY(o_orderdate) AS STRING) AS eom FROM orders ORDER BY o_orderkey LIMIT 30;
SELECT DATE_PART('year', o_orderdate) AS yr, COUNT(*) AS n FROM orders GROUP BY 1 ORDER BY 1;
SELECT DATE_PART('quarter', ts) AS q, COUNT(*) AS n FROM events GROUP BY 1 ORDER BY 1;
SELECT EXTRACT(WEEK FROM o_orderdate) AS wk, COUNT(*) AS n FROM orders GROUP BY 1 ORDER BY 1;
SELECT EXTRACT(DOY FROM o_orderdate) AS doy, COUNT(*) AS n FROM orders GROUP BY 1 ORDER BY 1 LIMIT 40;
SELECT CAST(GREATEST(DATE '2020-01-01', DATE '2021-06-01') AS STRING) AS g;
SELECT COUNT(*) AS n FROM orders WHERE EXTRACT(MONTH FROM o_orderdate) IN (1, 2, 3);
SELECT EXTRACT(HOUR FROM ts) AS hr, COUNT(*) AS n FROM events GROUP BY 1 ORDER BY 1;
SELECT event_id, CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS th FROM events ORDER BY event_id LIMIT 30;
SELECT CAST(DATE_TRUNC('week', o_orderdate) AS TIMESTAMP) AS wk, COUNT(*) AS n FROM orders GROUP BY 1 ORDER BY 1 LIMIT 30;
-- ====================== grouping sets: round 2 =============================
SELECT l_returnflag, l_linestatus, GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls, COUNT(*) AS n FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ()) ORDER BY g_rf, g_ls, l_returnflag, l_linestatus;
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority) ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST;
SELECT event_type, EXTRACT(YEAR FROM ts) AS yr, COUNT(*) AS n FROM events GROUP BY ROLLUP (event_type, yr) ORDER BY event_type NULLS FIRST, yr NULLS FIRST;
SELECT c_mktsegment, c_nationkey, COUNT(*) AS n, GROUPING(c_mktsegment) + GROUPING(c_nationkey) AS lvl FROM customer GROUP BY GROUPING SETS ((c_mktsegment, c_nationkey), (c_mktsegment), ()) ORDER BY lvl, c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST;
-- ====================== set ops: 3-way chains ==============================
SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 5 UNION SELECT n_nationkey FROM nation WHERE n_nationkey BETWEEN 3 AND 8 UNION SELECT n_nationkey FROM nation WHERE n_nationkey > 20 ORDER BY k;
SELECT n_nationkey AS k FROM nation UNION ALL SELECT r_regionkey FROM region UNION ALL SELECT r_regionkey FROM region ORDER BY k;
SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 10 INTERSECT SELECT n_nationkey FROM nation WHERE n_nationkey > 3 EXCEPT SELECT n_nationkey FROM nation WHERE n_nationkey = 5 ORDER BY k;
SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier ORDER BY k;
SELECT p_brand AS b FROM part EXCEPT SELECT p_brand FROM part WHERE p_size < 25 ORDER BY b;
-- ====================== derived tables / inline round 2 ====================
SELECT v.x, v.y, n.n_name FROM (VALUES (0, 'a'), (1, 'b'), (2, 'c')) AS v(x, y) JOIN nation n ON n.n_regionkey = v.x ORDER BY v.x, n.n_name;
SELECT t.seg, t.n FROM (SELECT c_mktsegment AS seg, COUNT(*) AS n FROM customer GROUP BY c_mktsegment) t WHERE t.n > 100 ORDER BY t.seg;
SELECT a.b1, b.b2 FROM (SELECT DISTINCT p_brand AS b1 FROM part) a CROSS JOIN (SELECT DISTINCT p_brand AS b2 FROM part) b WHERE a.b1 < b.b2 ORDER BY a.b1, b.b2 LIMIT 40;
SELECT mx - mn AS spread FROM (SELECT MAX(p_retailprice) AS mx, MIN(p_retailprice) AS mn FROM part) t;
-- ====================== distinct shapes ====================================
SELECT COUNT(DISTINCT l_returnflag || l_linestatus) AS n FROM lineitem;
SELECT COUNT(DISTINCT EXTRACT(YEAR FROM o_orderdate)) AS n_years FROM orders;

SELECT DISTINCT FLOOR(c_acctbal / 1000) AS kbal FROM customer ORDER BY kbal;
SELECT COUNT(DISTINCT o_custkey) AS n FROM orders WHERE o_totalprice > 200000;
-- ====================== CASE round 2 =======================================
SELECT o_orderkey, CASE o_orderstatus WHEN 'F' THEN 'finished' WHEN 'O' THEN 'open' ELSE 'partial' END AS status_word FROM orders ORDER BY o_orderkey LIMIT 40;
SELECT SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS big_disc, SUM(CASE WHEN l_discount <= 0.05 THEN 1 ELSE 0 END) AS small_disc FROM lineitem;
SELECT event_type, CASE WHEN COUNT(*) > 5000 THEN 'hot' WHEN COUNT(*) > 1000 THEN 'warm' ELSE 'cold' END AS heat FROM events GROUP BY event_type ORDER BY event_type;
SELECT p_partkey, CASE WHEN p_size > 40 THEN CASE WHEN p_retailprice > 1500 THEN 'big-expensive' ELSE 'big-cheap' END ELSE 'small' END AS cls FROM part ORDER BY p_partkey LIMIT 40;
SELECT COUNT(CASE WHEN value IS NULL THEN 1 END) AS n_null_vals FROM events;
-- ====================== order/limit round 3 ================================
SELECT c_custkey FROM customer ORDER BY c_acctbal DESC NULLS LAST, c_custkey LIMIT 20;
SELECT s_suppkey, s_acctbal FROM supplier ORDER BY CASE WHEN s_acctbal < 0 THEN 0 ELSE 1 END, s_acctbal, s_suppkey LIMIT 25;
SELECT o_orderkey FROM orders ORDER BY o_orderkey DESC LIMIT 10 OFFSET 20;
SELECT p_partkey, p_name FROM part ORDER BY LENGTH(p_name) DESC, p_partkey LIMIT 15;
SELECT event_id FROM events ORDER BY event_id LIMIT 7 OFFSET 7;
-- ====================== documents round 3 ==================================
SELECT lang, COUNT(*) AS n, MIN(n_chars) AS shortest FROM documents GROUP BY lang ORDER BY lang;
SELECT doc_id, LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS n_words FROM documents ORDER BY doc_id LIMIT 40;
SELECT source, COUNT(DISTINCT lang) AS n_langs FROM documents GROUP BY source ORDER BY source;
SELECT doc_id FROM documents WHERE LENGTH(text) <> n_chars ORDER BY doc_id LIMIT 20;

SELECT d1.doc_id AS a, d2.doc_id AS b FROM documents d1 JOIN documents d2 ON d1.text = d2.text AND d1.doc_id < d2.doc_id ORDER BY a, b LIMIT 40;
SELECT doc_id, UPPER(SUBSTR(text, 1, 10)) AS head FROM documents ORDER BY doc_id LIMIT 30;
-- ====================== embeddings table ===================================
SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label ORDER BY label;
SELECT vec_id, label FROM embeddings WHERE label = 3 ORDER BY vec_id LIMIT 30;
SELECT COUNT(*) AS n FROM embeddings WHERE vec_id IS NOT NULL;
SELECT MIN(vec_id) AS mn, MAX(vec_id) AS mx, COUNT(DISTINCT label) AS n_labels FROM embeddings;
-- ====================== HAVING round 2 =====================================
SELECT l_suppkey, COUNT(*) AS n FROM lineitem GROUP BY l_suppkey HAVING COUNT(*) > 60 AND MIN(l_quantity) < 5 ORDER BY l_suppkey;
SELECT o_custkey FROM orders GROUP BY o_custkey HAVING MAX(o_totalprice) > 2 * MIN(o_totalprice) ORDER BY o_custkey LIMIT 40;
SELECT event_type FROM events GROUP BY event_type HAVING COUNT(DISTINCT user_id) > 400 ORDER BY event_type;
SELECT c_nationkey FROM customer GROUP BY c_nationkey HAVING AVG(CAST(c_acctbal AS DECIMAL(38,6))) > 4000 ORDER BY c_nationkey;
-- ====================== correlated round 3 =================================
SELECT p_partkey, (SELECT COUNT(*) FROM lineitem WHERE l_partkey = p_partkey) AS n_sold FROM part ORDER BY p_partkey LIMIT 40;
SELECT c_custkey FROM customer c WHERE c_acctbal > (SELECT COALESCE(AVG(o_totalprice), 0) / 100 FROM orders o WHERE o.o_custkey = c.c_custkey) ORDER BY c_custkey LIMIT 40;
SELECT n_name, (SELECT COUNT(*) FROM supplier WHERE s_nationkey = n_nationkey) AS n_supp, (SELECT COUNT(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_cust FROM nation ORDER BY n_name;
SELECT o_orderkey FROM orders o WHERE (SELECT MAX(l_quantity) FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) = 50 ORDER BY o_orderkey LIMIT 40;
-- ====================== union type coercion ================================
SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation WHERE n_nationkey < 3 UNION ALL SELECT o_orderkey FROM orders WHERE o_orderkey < 5 ORDER BY k;
SELECT 'x' AS tag, COUNT(*) AS n FROM nation UNION ALL SELECT 'y', COUNT(*) FROM region ORDER BY tag;
SELECT 1 AS a, NULL AS b UNION ALL SELECT 2, 'z' ORDER BY a;
-- stat aggregates, decimal-quantized to absorb last-ulp accumulation order
SELECT CAST(CORR(l_quantity, l_extendedprice) AS DECIMAL(18,8)) AS c FROM lineitem;
SELECT CAST(COVAR_POP(l_quantity, l_discount) AS DECIMAL(18,8)) AS cp FROM lineitem;
SELECT CAST(COVAR_SAMP(l_quantity, l_discount) AS DECIMAL(18,8)) AS cs FROM lineitem;
SELECT l_returnflag, CAST(CORR(l_quantity, l_tax) AS DECIMAL(18,8)) AS c FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag;
SELECT CAST(VAR_POP(p_size) AS DECIMAL(18,6)) AS vp, CAST(VAR_SAMP(p_size) AS DECIMAL(18,6)) AS vs FROM part;
SELECT CAST(REGR_SLOPE(l_extendedprice, l_quantity) AS DECIMAL(18,4)) AS slope, CAST(REGR_INTERCEPT(l_extendedprice, l_quantity) AS DECIMAL(18,6)) AS icept FROM lineitem;
SELECT CAST(REGR_AVGX(l_extendedprice, l_quantity) AS DECIMAL(18,8)) AS ax, CAST(REGR_AVGY(l_extendedprice, l_quantity) AS DECIMAL(18,6)) AS ay FROM lineitem;
SELECT p_partkey, CAST(SUM(CAST(p_size AS DECIMAL(38,6))) OVER (ORDER BY p_partkey RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS DOUBLE) / COUNT(*) OVER (ORDER BY p_partkey RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS smooth FROM part ORDER BY p_partkey LIMIT 50;
SELECT COUNT(*) AS n FROM lineitem WHERE l_shipdate IS NOT NULL;
SELECT l_linestatus, COUNT(*) AS n FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_linestatus ORDER BY l_linestatus;
SELECT n_regionkey, COUNT(*) AS n FROM nation GROUP BY n_regionkey HAVING COUNT(*) >= 5 ORDER BY n_regionkey;
SELECT UPPER(r_name) AS rn FROM region ORDER BY rn;
SELECT TRIM('  x  ') AS t, LTRIM('  x') AS lt, RTRIM('x  ') AS rt;

-- =================== round-3 tranche 2 (validated vs DuckDB) ===============
-- ====================== row-value / tuple predicates =======================
SELECT COUNT(*) AS n FROM lineitem WHERE (l_returnflag, l_linestatus) IN (('R', 'F'), ('A', 'F'));
SELECT o_orderkey FROM orders WHERE (o_orderstatus, o_orderpriority) = ('F', '1-URGENT') ORDER BY o_orderkey LIMIT 40;
-- ====================== subqueries in HAVING / CASE ========================
SELECT l_suppkey, COUNT(*) AS n FROM lineitem GROUP BY l_suppkey HAVING COUNT(*) > (SELECT COUNT(*) FROM lineitem) / 120 ORDER BY l_suppkey;
SELECT c_mktsegment, COUNT(*) AS n FROM customer GROUP BY c_mktsegment HAVING COUNT(*) > (SELECT COUNT(*) FROM customer) / 6 ORDER BY c_mktsegment;
SELECT o_orderkey, CASE WHEN o_totalprice > (SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) FROM orders o2) THEN 'above' ELSE 'below' END AS vs_avg FROM orders ORDER BY o_orderkey LIMIT 40;
-- ====================== set ops: ALL chains ================================
SELECT c_nationkey AS k FROM customer INTERSECT ALL SELECT s_nationkey FROM supplier ORDER BY k LIMIT 50;
SELECT l_suppkey AS k FROM lineitem WHERE l_quantity > 49 EXCEPT ALL SELECT s_suppkey FROM supplier ORDER BY k LIMIT 50;
SELECT n_regionkey AS k FROM nation EXCEPT ALL SELECT r_regionkey FROM region ORDER BY k;
-- ====================== window: range frames on values =====================
SELECT o_orderkey, o_totalprice, COUNT(*) OVER (ORDER BY o_totalprice RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING) AS near_priced FROM orders ORDER BY o_orderkey LIMIT 40;
SELECT p_partkey, p_size, COUNT(*) OVER (ORDER BY p_size RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS similar_sized FROM part ORDER BY p_partkey LIMIT 40;
SELECT c_custkey, SUM(CAST(c_acctbal AS DECIMAL(38,6))) OVER (PARTITION BY c_mktsegment ORDER BY c_custkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS roll3 FROM customer ORDER BY c_custkey LIMIT 50;
SELECT event_id, user_id, ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn FROM events ORDER BY event_id LIMIT 50;
SELECT o_orderkey, DENSE_RANK() OVER (ORDER BY EXTRACT(YEAR FROM o_orderdate)) AS yr_rank FROM orders ORDER BY o_orderkey LIMIT 40;
-- ====================== scalar subquery arithmetic =========================
SELECT p_partkey, p_retailprice - (SELECT MIN(p_retailprice) FROM part) AS above_min FROM part ORDER BY p_partkey LIMIT 40;
SELECT (SELECT COUNT(*) FROM orders) - (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS repeat_orders;
SELECT (SELECT MAX(l_quantity) FROM lineitem) * (SELECT MIN(l_discount) FROM lineitem WHERE l_discount > 0) AS cross_product;
-- ====================== join with aggregated derived tables ================
SELECT n.n_name, s.total_bal FROM nation n JOIN (SELECT s_nationkey, CAST(SUM(CAST(s_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total_bal FROM supplier GROUP BY s_nationkey) s ON n.n_nationkey = s.s_nationkey ORDER BY n.n_name;
SELECT big.o_custkey, big.n_big, c.c_mktsegment FROM (SELECT o_custkey, COUNT(*) AS n_big FROM orders WHERE o_totalprice > 250000 GROUP BY o_custkey) big JOIN customer c ON big.o_custkey = c.c_custkey ORDER BY big.o_custkey LIMIT 40;
SELECT a.l_suppkey, a.heavy, b.light FROM (SELECT l_suppkey, COUNT(*) AS heavy FROM lineitem WHERE l_quantity > 40 GROUP BY l_suppkey) a JOIN (SELECT l_suppkey, COUNT(*) AS light FROM lineitem WHERE l_quantity <= 10 GROUP BY l_suppkey) b ON a.l_suppkey = b.l_suppkey ORDER BY a.l_suppkey LIMIT 40;
-- ====================== string edge cases: round 3 =========================
SELECT REPLACE('aaa', 'a', 'ab') AS r1, REPLACE('', 'a', 'b') AS r2;
SELECT SUBSTR('hello', 2) AS s1, SUBSTR('hello', 2, 100) AS s2, SUBSTR('hello', 10, 2) AS s3;
SELECT LENGTH('') AS l0, LENGTH(' ') AS l1, TRIM('') AS t0;
SELECT CONCAT('a', '', 'b') AS c1, 'x' || '' || 'y' AS c2;
SELECT UPPER(NULL) AS u, LOWER(NULL) AS lo, LENGTH(CAST(NULL AS STRING)) AS ln;
SELECT p_partkey FROM part WHERE p_name LIKE '%' ORDER BY p_partkey LIMIT 10;
SELECT COUNT(*) AS n FROM part WHERE p_name LIKE 'red_b%';
SELECT n_nationkey FROM nation WHERE n_name LIKE '__%' ORDER BY n_nationkey LIMIT 10;
SELECT s_suppkey, REPLACE(s_name, 'Supplier', 'S') AS short_name FROM supplier ORDER BY s_suppkey LIMIT 25;
-- ====================== casts / type edges =================================
SELECT CAST('42' AS INT) AS i, CAST('3.5' AS DOUBLE) AS d, CAST(42 AS STRING) AS s;
SELECT CAST('2021-06-01' AS DATE) AS dt, CAST(CAST('2021-06-01 12:30:00' AS TIMESTAMP) AS STRING) AS ts;
SELECT CAST(TRUE AS INT) AS t, CAST(FALSE AS INT) AS f;
SELECT COUNT(*) AS n FROM orders WHERE CAST(o_orderkey AS STRING) LIKE '%7';
-- ====================== aggregates over expressions ========================
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue FROM lineitem WHERE l_returnflag = 'R';
SELECT MIN(l_extendedprice / l_quantity) AS min_unit FROM lineitem WHERE l_quantity > 0;
SELECT COUNT(DISTINCT l_orderkey) AS orders_touched, COUNT(*) AS lines FROM lineitem WHERE l_discount >= 0.08;
SELECT MAX(LENGTH(p_name)) AS longest, MIN(LENGTH(p_name)) AS shortest FROM part;
SELECT CAST(AVG(CAST(LENGTH(text) AS DECIMAL(38,6))) AS DOUBLE) AS avg_len FROM documents;
-- ====================== multi-level grouping in CTEs =======================
WITH per_order AS (SELECT l_orderkey, COUNT(*) AS n_lines, CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS qty FROM lineitem GROUP BY l_orderkey) SELECT n_lines, COUNT(*) AS n_orders, CAST(SUM(CAST(qty AS DECIMAL(38,6))) AS DOUBLE) AS total_qty FROM per_order GROUP BY n_lines ORDER BY n_lines;
WITH cust_orders AS (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey), dist AS (SELECT n, COUNT(*) AS n_cust FROM cust_orders GROUP BY n) SELECT n, n_cust FROM dist ORDER BY n;
WITH daily AS (SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS d, COUNT(*) AS n FROM events GROUP BY 1) SELECT MIN(n) AS quiet, MAX(n) AS busy, COUNT(*) AS n_days FROM daily;
-- ====================== order by aggregates / expressions ==================
SELECT l_suppkey FROM lineitem GROUP BY l_suppkey ORDER BY COUNT(*) DESC, l_suppkey LIMIT 20;
SELECT c_mktsegment FROM customer GROUP BY c_mktsegment ORDER BY CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) DESC, c_mktsegment LIMIT 5;
SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type ORDER BY n DESC, event_type;
-- ====================== NULL-aware comparisons =============================
SELECT COUNT(*) AS n FROM events WHERE value IS DISTINCT FROM NULL;
SELECT COUNT(*) AS n FROM events e1 JOIN events e2 ON e1.event_id = e2.event_id AND e1.value IS NOT DISTINCT FROM e2.value;
SELECT COALESCE(CAST(MAX(value) AS STRING), 'none') AS mx FROM events WHERE event_type = 'no_such_type';
SELECT COUNT(*) AS n FROM events WHERE NOT (value > 50) OR value IS NULL;

-- =================== round-4 tranche (validated vs DuckDB) =================
-- FULL OUTER with expressions, DISTINCT-ON via window, deeper grouping
-- sets, string/numeric/conditional function edges, FILTER clause,
-- GROUP BY ALL, VALUES tables, correlated round 4, date round 4.
SELECT COALESCE(a.k, b.k) AS k, a.n AS an, b.n AS bn FROM (SELECT n_regionkey AS k, COUNT(*) AS n FROM nation GROUP BY n_regionkey) a FULL OUTER JOIN (SELECT r_regionkey + 1 AS k, COUNT(*) AS n FROM region GROUP BY r_regionkey + 1) b ON a.k = b.k ORDER BY k;
SELECT COUNT(*) AS n FROM (SELECT s_nationkey AS k FROM supplier) s FULL OUTER JOIN (SELECT c_nationkey AS k FROM customer WHERE c_acctbal < 0) c ON s.k = c.k;
SELECT r_name, n_name FROM region FULL OUTER JOIN nation ON r_regionkey = n_regionkey AND n_nationkey < 10 ORDER BY r_name NULLS FIRST, n_name NULLS FIRST;
SELECT COALESCE(s.k, c.k, -1) AS k, COALESCE(s.n, 0) + COALESCE(c.n, 0) AS total FROM (SELECT s_nationkey AS k, COUNT(*) AS n FROM supplier GROUP BY s_nationkey) s FULL OUTER JOIN (SELECT c_nationkey AS k, COUNT(*) AS n FROM customer GROUP BY c_nationkey) c ON s.k = c.k ORDER BY k;
SELECT CASE WHEN a.k IS NULL THEN 'right_only' WHEN b.k IS NULL THEN 'left_only' ELSE 'both' END AS side, COUNT(*) AS n FROM (SELECT DISTINCT o_custkey AS k FROM orders) a FULL OUTER JOIN (SELECT DISTINCT c_custkey AS k FROM customer) b ON a.k = b.k GROUP BY 1 ORDER BY side;
SELECT COUNT(*) AS n FROM nation n1 FULL OUTER JOIN nation n2 ON n1.n_nationkey = 25 - n2.n_nationkey;
SELECT o_custkey, o_orderkey FROM (SELECT o_custkey, o_orderkey, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) t WHERE rn = 1 ORDER BY o_custkey LIMIT 40;
SELECT n_regionkey, n_name FROM (SELECT n_regionkey, n_name, ROW_NUMBER() OVER (PARTITION BY n_regionkey ORDER BY n_name) AS rn FROM nation) t WHERE rn = 1 ORDER BY n_regionkey;
SELECT l_orderkey, l_linenumber FROM (SELECT l_orderkey, l_linenumber, ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_extendedprice DESC, l_linenumber) AS rn FROM lineitem) t WHERE rn = 1 ORDER BY l_orderkey LIMIT 50;
SELECT event_type, event_id FROM (SELECT event_type, event_id, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY CAST(ts AS STRING), event_id) AS rn FROM events) t WHERE rn = 1 ORDER BY event_type;
SELECT s_nationkey, s_name FROM (SELECT s_nationkey, s_name, ROW_NUMBER() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS rn FROM supplier) t WHERE rn = 1 ORDER BY s_nationkey LIMIT 25;
SELECT n_regionkey, n_nationkey, COUNT(*) AS n FROM nation GROUP BY GROUPING SETS ((n_regionkey), (n_nationkey), (n_regionkey, n_nationkey), ()) ORDER BY n_regionkey NULLS FIRST, n_nationkey NULLS FIRST;
SELECT l_returnflag, l_linestatus, GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls, COUNT(*) AS n FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus) ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST;
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority) HAVING COUNT(*) > 10 ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST;
SELECT c_mktsegment, c_nationkey, COUNT(*) AS n FROM customer GROUP BY GROUPING SETS ((c_mktsegment, c_nationkey), (c_mktsegment), ()) ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST;
SELECT l_returnflag, GROUPING(l_returnflag) AS g, COUNT(*) AS n FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (), (l_returnflag)) ORDER BY l_returnflag NULLS FIRST, g;
SELECT event_type, CAST(value IS NULL AS INT) AS has_null, COUNT(*) AS n FROM events GROUP BY ROLLUP (event_type, CAST(value IS NULL AS INT)) ORDER BY event_type NULLS FIRST, has_null NULLS FIRST;
SELECT TRIM('  x  ') AS t1, LTRIM('  x  ') AS t2, RTRIM('  x  ') AS t3;
SELECT TRIM(BOTH 'x' FROM 'xxhixx') AS t1, TRIM(LEADING 'x' FROM 'xxhixx') AS t2, TRIM(TRAILING 'x' FROM 'xxhixx') AS t3;
SELECT LPAD(n_name, 20, '.') AS padded FROM nation ORDER BY n_nationkey LIMIT 5;
SELECT RPAD(r_name, 12, '-') AS padded FROM region ORDER BY r_regionkey;
SELECT REPLACE(n_name, 'A', '@') AS rep FROM nation ORDER BY n_nationkey LIMIT 10;
SELECT REVERSE(n_name) AS rev FROM nation ORDER BY n_nationkey LIMIT 10;
SELECT REPEAT('ab', 3) AS r1, REPEAT('', 5) AS r2, REPEAT('x', 0) AS r3;
SELECT POSITION('BA' IN n_name) AS pos, n_name FROM nation ORDER BY n_nationkey LIMIT 10;
SELECT ASCII(n_name) AS a FROM nation ORDER BY n_nationkey LIMIT 10;
SELECT n_name, LENGTH(n_name) AS len, UPPER(LOWER(n_name)) AS roundtrip FROM nation WHERE LENGTH(n_name) > 6 ORDER BY n_name;
SELECT SUBSTR(p_name, 1, 3) AS pre, COUNT(*) AS n FROM part GROUP BY SUBSTR(p_name, 1, 3) ORDER BY pre LIMIT 30;
SELECT SUBSTR(n_name, -3) AS tail FROM nation ORDER BY n_nationkey LIMIT 10;
SELECT CONCAT_WS('-', n_name, CAST(n_nationkey AS STRING)) AS cw FROM nation ORDER BY n_nationkey LIMIT 5;
SELECT n_name FROM nation WHERE n_name LIKE '__A%' ORDER BY n_name;
SELECT COUNT(*) AS n FROM part WHERE LOWER(p_name) = p_name;
SELECT c_name FROM customer WHERE c_name LIKE '%_9' ORDER BY c_name LIMIT 10;
SELECT BOOL_AND(l_quantity > 0) AS all_pos, BOOL_OR(l_discount > 0.09) AS any_big FROM lineitem;
SELECT MIN_BY(n_name, n_nationkey) AS first_nation, MAX_BY(n_name, n_nationkey) AS last_nation FROM nation;
SELECT o_orderstatus, MIN_BY(o_orderkey, o_totalprice) AS cheapest, MAX_BY(o_orderkey, o_totalprice) AS priciest FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT COUNT(*) - COUNT(value) AS n_nulls, COUNT(DISTINCT event_type) AS n_types FROM events;
SELECT event_type, COUNT(value) AS non_null, COUNT(*) AS total FROM events GROUP BY event_type ORDER BY event_type;
SELECT l_returnflag, MIN(l_shipdate) AS first_ship, MAX(l_shipdate) AS last_ship FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag;
SELECT SUM(CASE WHEN l_discount = 0 THEN 1 ELSE 0 END) AS no_disc, SUM(CASE WHEN l_discount > 0 THEN 1 ELSE 0 END) AS disc FROM lineitem;
SELECT ABS(-5) AS a, ABS(5) AS b, SIGN(-2.5) AS s1, SIGN(0) AS s2, SIGN(7) AS s3;
SELECT MOD(17, 5) AS m1, MOD(-17, 5) AS m2, 17 % 5 AS m3;
SELECT GREATEST(1, 2, 3) AS g, LEAST(1, 2, 3) AS l, GREATEST(-1, -2) AS g2;
SELECT GREATEST(l_tax, l_discount) AS g, COUNT(*) AS n FROM lineitem GROUP BY GREATEST(l_tax, l_discount) ORDER BY g LIMIT 20;
SELECT FLOOR(o_totalprice / 10000) AS bucket, COUNT(*) AS n FROM orders GROUP BY FLOOR(o_totalprice / 10000) ORDER BY bucket;
SELECT CEIL(l_quantity / 10) AS bucket, COUNT(*) AS n FROM lineitem GROUP BY CEIL(l_quantity / 10) ORDER BY bucket;
SELECT SQRT(4.0) AS s1, SQRT(2.25) AS s2, POWER(2.0, 10.0) AS p;
SELECT MIN(ABS(value - 50)) AS closest FROM events WHERE value IS NOT NULL;
SELECT NULLIF(1, 1) AS a, NULLIF(1, 2) AS b, NULLIF('x', 'x') AS c;
SELECT IFNULL(NULL, 'fallback') AS a, IFNULL('present', 'fallback') AS b;
SELECT COUNT(*) AS n FROM events WHERE NULLIF(event_type, 'error') IS NULL;
SELECT event_type, COALESCE(CAST(MIN(value) AS STRING), 'all-null') AS mn FROM events GROUP BY event_type ORDER BY event_type;
SELECT CASE WHEN value IS NULL THEN 'missing' WHEN value < 33 THEN 'low' WHEN value < 66 THEN 'mid' ELSE 'high' END AS band, COUNT(*) AS n FROM events GROUP BY 1 ORDER BY band;
SELECT n_nationkey, SUM(n_regionkey) OVER (ORDER BY n_nationkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS win FROM nation ORDER BY n_nationkey;
SELECT n_nationkey, SUM(n_regionkey) OVER (ORDER BY n_nationkey ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS win FROM nation ORDER BY n_nationkey;
SELECT n_nationkey, COUNT(*) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS sz FROM nation ORDER BY n_nationkey;
SELECT o_orderkey, LAG(o_totalprice, 1, 0.0) OVER (ORDER BY o_orderkey) AS prev_price FROM orders ORDER BY o_orderkey LIMIT 30;
SELECT o_orderkey, LEAD(o_orderstatus, 2, 'none') OVER (ORDER BY o_orderkey) AS nxt FROM orders ORDER BY o_orderkey LIMIT 30;
SELECT n_nationkey, FIRST_VALUE(n_name) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS first_in_region FROM nation ORDER BY n_nationkey;
SELECT n_nationkey, LAST_VALUE(n_name) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_in_region FROM nation ORDER BY n_nationkey;
SELECT n_nationkey, CUME_DIST() OVER (ORDER BY n_nationkey) AS cd FROM nation ORDER BY n_nationkey;
SELECT l_orderkey, l_linenumber, SUM(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS neighborhood FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 50;
SELECT event_type, event_id, AVG(value) OVER (PARTITION BY event_type ORDER BY event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS moving FROM events WHERE value IS NOT NULL ORDER BY event_type, event_id LIMIT 40;
SELECT * FROM (VALUES (1, 'a'), (2, 'b'), (3, 'c')) AS t(id, label) ORDER BY id;
SELECT t.id, n.n_name FROM (VALUES (0), (1), (2)) AS t(id) JOIN nation n ON n.n_nationkey = t.id ORDER BY t.id;
SELECT COUNT(*) AS n FROM nation WHERE n_regionkey IN (SELECT * FROM (VALUES (0), (2)) AS v(k));
SELECT r_name FROM region r WHERE EXISTS (SELECT 1 FROM nation n WHERE n.n_regionkey = r.r_regionkey AND n.n_name LIKE 'A%') ORDER BY r_name;
SELECT COUNT(*) AS n FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F');
SELECT n_name FROM nation n WHERE (SELECT COUNT(*) FROM supplier s WHERE s.s_nationkey = n.n_nationkey) > (SELECT COUNT(*) FROM customer c WHERE c.c_nationkey = n.n_nationkey) ORDER BY n_name;
SELECT o_orderpriority, COUNT(*) AS n FROM orders o WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45) GROUP BY o_orderpriority ORDER BY o_orderpriority;
SELECT c_custkey FROM customer c WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_nationkey = c.c_nationkey) ORDER BY c_custkey LIMIT 40;
SELECT n.n_name, top_s.s_name FROM nation n JOIN (SELECT s_nationkey, MAX(s_name) AS s_name FROM supplier GROUP BY s_nationkey) top_s ON top_s.s_nationkey = n.n_nationkey ORDER BY n.n_name;
SELECT o.o_orderkey, lc.n_lines FROM orders o JOIN (SELECT l_orderkey, COUNT(*) AS n_lines FROM lineitem GROUP BY l_orderkey) lc ON lc.l_orderkey = o.o_orderkey WHERE lc.n_lines = 7 ORDER BY o.o_orderkey LIMIT 25;
SELECT lang, COUNT(*) AS n, MAX(LENGTH(text)) AS longest FROM documents GROUP BY lang ORDER BY lang;
SELECT doc_id, LENGTH(text) AS len FROM documents ORDER BY LENGTH(text) DESC, doc_id LIMIT 15;
SELECT COUNT(*) AS n FROM documents WHERE text LIKE '%the%' AND lang = 'en';
SELECT k, COUNT(*) AS n FROM (SELECT n_regionkey AS k FROM nation UNION ALL SELECT r_regionkey AS k FROM region) u GROUP BY k ORDER BY k;
SELECT COUNT(*) AS n FROM (SELECT c_nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier) t;
SELECT COUNT(*) AS n FROM (SELECT n_nationkey FROM nation EXCEPT SELECT c_nationkey FROM customer) t;
SELECT MAX(k) AS mx FROM (SELECT o_custkey AS k FROM orders EXCEPT SELECT c_custkey AS k FROM customer WHERE c_acctbal > 0) t;
SELECT EXTRACT(YEAR FROM o_orderdate) AS y, EXTRACT(QUARTER FROM o_orderdate) AS q, COUNT(*) AS n FROM orders GROUP BY 1, 2 ORDER BY y, q;
SELECT EXTRACT(DAY FROM l_shipdate) AS d, COUNT(*) AS n FROM lineitem WHERE EXTRACT(YEAR FROM l_shipdate) = 1994 AND EXTRACT(MONTH FROM l_shipdate) = 1 GROUP BY 1 ORDER BY d;
SELECT COUNT(*) AS n FROM orders WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-01-01' + INTERVAL '3' MONTH;
SELECT CAST(MIN(o_orderdate) AS STRING) AS first_day, CAST(MAX(o_orderdate) AS STRING) AS last_day FROM orders;
SELECT EXTRACT(YEAR FROM ts) AS y, EXTRACT(HOUR FROM ts) AS h, COUNT(*) AS n FROM events GROUP BY 1, 2 ORDER BY y, h LIMIT 30;
SELECT event_id, value FROM events ORDER BY value ASC NULLS FIRST, event_id LIMIT 20;
SELECT event_id, value FROM events ORDER BY value DESC NULLS LAST, event_id LIMIT 20;
SELECT event_type, value FROM events ORDER BY event_type, value NULLS LAST, event_id LIMIT 25;
SELECT 7 / 2 AS int_div, 7.0 / 2 AS dec_div, CAST(7 AS DOUBLE) / 2 AS dbl_div;
SELECT CAST(1 AS BIGINT) + CAST(2147483647 AS INT) AS big_sum;
SELECT -n_nationkey AS neg, n_nationkey AS pos FROM nation ORDER BY n_nationkey LIMIT 5;
SELECT COUNT(*) AS n FROM lineitem WHERE l_extendedprice * (1 - l_discount) * (1 + l_tax) > 50000;
SELECT l_linenumber, COUNT(*) AS n FROM lineitem WHERE MOD(l_orderkey, 2) = 0 GROUP BY l_linenumber ORDER BY l_linenumber;
SELECT COUNT(*) AS n FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) t;
SELECT c_mktsegment FROM customer GROUP BY c_mktsegment HAVING COUNT(DISTINCT c_nationkey) >= 20 ORDER BY c_mktsegment;
SELECT x.n_name FROM nation x, nation y WHERE x.n_nationkey = y.n_regionkey AND y.n_name = 'JAPAN' ORDER BY x.n_name;
SELECT COUNT(*) AS n FROM lineitem l, orders o WHERE l.l_orderkey = o.o_orderkey AND o.o_orderstatus = 'P' AND l.l_returnflag = 'N';
SELECT o_orderstatus, o_orderpriority, n FROM (SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY COUNT(*) DESC, o_orderpriority) AS rn FROM orders GROUP BY o_orderstatus, o_orderpriority) t WHERE rn <= 2 ORDER BY o_orderstatus, o_orderpriority;
SELECT c_nationkey, MAX(LENGTH(c_name)) AS longest FROM customer GROUP BY c_nationkey HAVING MAX(LENGTH(c_name)) > 15 ORDER BY c_nationkey;
SELECT SUBSTR(CAST(doc_id AS STRING), 1, 2) AS prefix, COUNT(*) AS n FROM documents GROUP BY SUBSTR(CAST(doc_id AS STRING), 1, 2) ORDER BY prefix LIMIT 20;
SELECT d.lang, COUNT(*) AS n FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id GROUP BY d.lang ORDER BY d.lang;
SELECT COUNT(*) AS n FROM embeddings e WHERE NOT EXISTS (SELECT 1 FROM documents d WHERE d.doc_id = e.vec_id);
SELECT EXTRACT(WEEK FROM o_orderdate) AS wk, COUNT(*) AS n FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1995 GROUP BY 1 ORDER BY wk LIMIT 20;
SELECT SPLIT_PART('alpha,beta,gamma', ',', 2) AS p1, SPLIT_PART('a-b', '-', 1) AS p2;
SELECT LEFT(n_name, 3) AS l3, RIGHT(n_name, 2) AS r2 FROM nation ORDER BY n_nationkey LIMIT 8;
SELECT COUNT(*) FILTER (WHERE value IS NULL) AS n_null, COUNT(*) FILTER (WHERE value > 50) AS n_big, COUNT(*) AS total FROM events;
SELECT event_type, COUNT(*) FILTER (WHERE value IS NOT NULL) AS measured FROM events GROUP BY event_type ORDER BY event_type;
SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY ALL ORDER BY o_orderstatus;
SELECT c_mktsegment, c_nationkey, COUNT(*) AS n FROM customer GROUP BY ALL ORDER BY c_mktsegment, c_nationkey LIMIT 30;
SELECT n_name FROM nation WHERE n_name BETWEEN 'C' AND 'K' ORDER BY n_name;
SELECT COUNT(*) AS n FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH');
SELECT CASE WHEN n_regionkey IN (0, 1) THEN CASE WHEN n_nationkey < 10 THEN 'low-west' ELSE 'high-west' END ELSE 'east' END AS zone, COUNT(*) AS n FROM nation GROUP BY 1 ORDER BY zone;
SELECT l_returnflag FROM lineitem GROUP BY l_returnflag HAVING COUNT(*) > 100 OR MAX(l_quantity) = 50 ORDER BY l_returnflag;
SELECT s_name FROM supplier WHERE s_suppkey <= 3 UNION ALL SELECT c_name FROM customer WHERE c_custkey <= 3 ORDER BY 1;
SELECT e1.event_type, COUNT(*) AS n FROM events e1 JOIN events e2 ON e1.event_id = e2.event_id + 1 AND e1.event_type = e2.event_type GROUP BY e1.event_type ORDER BY e1.event_type;
SELECT UPPER(SUBSTR(r_name, 1, 1)) AS initial, COUNT(*) AS n FROM region GROUP BY 1 ORDER BY initial;
SELECT COUNT(*) AS n FROM documents WHERE LENGTH(text) BETWEEN 100 AND 1000;
SELECT lang, MIN(n_chars) AS shortest, MAX(n_chars) AS longest FROM documents GROUP BY lang HAVING MIN(n_chars) < 500 ORDER BY lang;
SELECT t.bucket, COUNT(*) AS n FROM (SELECT FLOOR(value / 20) AS bucket FROM events WHERE value IS NOT NULL) t GROUP BY t.bucket ORDER BY t.bucket;
SELECT r.r_name, agg.n_nations, agg.n_supp FROM region r JOIN (SELECT n.n_regionkey, COUNT(DISTINCT n.n_nationkey) AS n_nations, COUNT(s.s_suppkey) AS n_supp FROM nation n LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey GROUP BY n.n_regionkey) agg ON agg.n_regionkey = r.r_regionkey ORDER BY r.r_name;

-- ======================= round-5 additions =======================
-- correlated EXISTS x set-ops, derived-table shapes, decimal/interval
-- edges, NULL-ordering across window frames, grouping sets, agg mixes
-- (validated pre-merge by scripts/validate_sweep_candidates.py)
SELECT n_nationkey, n_name FROM nation n
WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey)
  AND EXISTS (SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey)
ORDER BY n_nationkey;
SELECT n_nationkey FROM nation n
WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey)
UNION
SELECT n_nationkey FROM nation n
WHERE EXISTS (SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey)
ORDER BY n_nationkey;
SELECT n_nationkey FROM nation n
WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey)
INTERSECT
SELECT n_nationkey FROM nation n
WHERE EXISTS (SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey)
ORDER BY n_nationkey;
SELECT n_nationkey FROM nation n
WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey)
EXCEPT
SELECT n_nationkey FROM nation n
WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey)
ORDER BY n_nationkey;
SELECT COUNT(*) AS n FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45);
SELECT COUNT(*) AS n FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05);
SELECT COUNT(*) AS n FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
  AND NOT EXISTS (SELECT 1 FROM orders o2 WHERE o2.o_custkey = c.c_custkey AND o2.o_orderpriority = '1-URGENT');
SELECT c_mktsegment, COUNT(*) AS n FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_mktsegment ORDER BY c_mktsegment;
SELECT p_brand, COUNT(*) AS n FROM part p
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey AND l.l_returnflag = 'R')
GROUP BY p_brand ORDER BY p_brand;
SELECT s_suppkey, s_name FROM supplier s
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49)
ORDER BY s_suppkey;
SELECT r_regionkey FROM region r
WHERE EXISTS (SELECT 1 FROM nation n WHERE n.n_regionkey = r.r_regionkey
              AND EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal < 0))
ORDER BY r_regionkey;
SELECT COUNT(*) AS n FROM nation n
WHERE n.n_nationkey IN (SELECT c_nationkey FROM customer UNION SELECT s_nationkey FROM supplier);
SELECT COUNT(*) AS n FROM nation n
WHERE n.n_nationkey IN (SELECT c_nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier);
SELECT COUNT(*) AS n FROM nation n
WHERE n.n_nationkey NOT IN (SELECT c_nationkey FROM customer WHERE c_nationkey IS NOT NULL);
SELECT t.c_nationkey, t.n FROM
  (SELECT c_nationkey, COUNT(*) AS n FROM customer GROUP BY c_nationkey) t
WHERE t.n > 3 ORDER BY t.c_nationkey;
SELECT a.c_mktsegment, a.n_cust, b.n_ord FROM
  (SELECT c_mktsegment, COUNT(*) AS n_cust FROM customer GROUP BY c_mktsegment) a
  JOIN (SELECT c.c_mktsegment, COUNT(*) AS n_ord
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment) b
  ON a.c_mktsegment = b.c_mktsegment
ORDER BY a.c_mktsegment;
SELECT d.o_orderstatus, COUNT(*) AS n FROM
  (SELECT o_orderstatus, o_totalprice FROM orders WHERE o_totalprice > 50000) d
GROUP BY d.o_orderstatus ORDER BY d.o_orderstatus;
SELECT x.l_returnflag, x.mx FROM
  (SELECT l_returnflag, MAX(l_quantity) AS mx FROM lineitem GROUP BY l_returnflag) x
ORDER BY x.l_returnflag;
SELECT t2.bucket, COUNT(*) AS n FROM
  (SELECT CASE WHEN t1.total > 200000 THEN 'hi' WHEN t1.total > 100000 THEN 'mid' ELSE 'lo' END AS bucket
   FROM (SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
         FROM orders GROUP BY o_custkey) t1) t2
GROUP BY t2.bucket ORDER BY t2.bucket;
SELECT n.n_name, t.n_orders FROM nation n
  JOIN (SELECT c.c_nationkey, COUNT(*) AS n_orders
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey) t
  ON t.c_nationkey = n.n_nationkey
ORDER BY n.n_name;
SELECT AVG(t.n) AS avg_items FROM
  (SELECT l_orderkey, COUNT(*) AS n FROM lineitem GROUP BY l_orderkey) t;
SELECT MAX(t.n_parts) AS mx FROM
  (SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS n_parts FROM lineitem GROUP BY l_suppkey) t;
SELECT t.l_linenumber, t.n FROM
  (SELECT l_linenumber, COUNT(*) AS n FROM lineitem GROUP BY l_linenumber) t
WHERE t.n > 100 ORDER BY t.l_linenumber;
SELECT o.o_orderpriority, COUNT(*) AS n
FROM orders o JOIN (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_quantity > 48) big
  ON big.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority;
SELECT u.src, COUNT(*) AS n FROM
  (SELECT 'cust' AS src, c_nationkey AS k FROM customer
   UNION ALL
   SELECT 'supp' AS src, s_nationkey AS k FROM supplier) u
GROUP BY u.src ORDER BY u.src;
SELECT t.k, t.n FROM
  (SELECT c_nationkey AS k, COUNT(*) AS n FROM customer GROUP BY c_nationkey
   UNION ALL
   SELECT s_nationkey AS k, COUNT(*) AS n FROM supplier GROUP BY s_nationkey) t
WHERE t.k < 3 ORDER BY t.k, t.n;
SELECT q.event_type, q.n FROM
  (SELECT event_type, COUNT(*) AS n FROM events WHERE value IS NOT NULL GROUP BY event_type) q
ORDER BY q.event_type;
SELECT w.lang, w.longest FROM
  (SELECT lang, MAX(n_chars) AS longest FROM documents GROUP BY lang) w
ORDER BY w.lang;
SELECT t.sz_band, COUNT(*) AS n FROM
  (SELECT p_partkey, CASE WHEN p_size >= 25 THEN 'big' ELSE 'small' END AS sz_band FROM part) t
GROUP BY t.sz_band ORDER BY t.sz_band;
SELECT CAST(CAST(1.25 AS DECIMAL(10,2)) AS DOUBLE) AS d1,
       CAST(CAST(2.50 AS DECIMAL(10,1)) AS DOUBLE) AS d2,
       CAST(CAST(-3.75 AS DECIMAL(10,2)) AS DOUBLE) AS d3;
SELECT CAST(CAST(123456789.984375 AS DECIMAL(38,6)) AS DOUBLE) AS big,
       CAST(CAST(0.000001 AS DECIMAL(38,6)) AS DOUBLE) AS tiny;
SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS bal_sum,
       CAST(AVG(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS bal_avg
FROM customer WHERE c_nationkey = 3;
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS rev
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag;
SELECT l_linestatus,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS s4,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE) AS s2
FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus;
SELECT CAST(CAST(o_totalprice AS DECIMAL(18,1)) AS DOUBLE) AS p1
FROM orders WHERE o_orderkey = 1;
SELECT o_orderkey, CAST(o_orderdate + INTERVAL 30 DAY AS STRING) AS due
FROM orders WHERE o_orderkey % 500 = 0 ORDER BY o_orderkey;
SELECT o_orderkey, CAST(o_orderdate - INTERVAL 1 DAY AS STRING) AS prev_day
FROM orders WHERE o_orderkey % 500 = 0 ORDER BY o_orderkey;
SELECT o_orderkey, CAST(o_orderdate + INTERVAL 2 HOUR AS STRING) AS plus2h,
       CAST(o_orderdate + INTERVAL 90 MINUTE AS STRING) AS plus90m
FROM orders WHERE o_orderkey % 500 = 0 ORDER BY o_orderkey;
SELECT COUNT(*) AS n FROM orders
WHERE o_orderdate + INTERVAL 7 DAY < CAST('1996-01-01 00:00:00' AS TIMESTAMP);
SELECT COUNT(*) AS n FROM lineitem
WHERE l_shipdate >= CAST('1995-06-01 00:00:00' AS TIMESTAMP) - INTERVAL 90 DAY
  AND l_shipdate < CAST('1995-06-01 00:00:00' AS TIMESTAMP);
SELECT EXTRACT(YEAR FROM o_orderdate + INTERVAL 45 DAY) AS y, COUNT(*) AS n
FROM orders GROUP BY y ORDER BY y;
SELECT event_id, CAST(ts + INTERVAL 1 SECOND AS STRING) AS t1
FROM events WHERE event_id % 997 = 0 ORDER BY event_id;
SELECT CAST(CAST('2000-02-29 12:00:00' AS TIMESTAMP) + INTERVAL 1 DAY AS STRING) AS leap_next;
SELECT CAST(GREATEST(CAST(1.5 AS DECIMAL(10,2)), CAST(2.25 AS DECIMAL(10,2))) AS DOUBLE) AS g,
       CAST(LEAST(CAST(1.5 AS DECIMAL(10,2)), CAST(2.25 AS DECIMAL(10,2))) AS DOUBLE) AS l;
SELECT event_id, value,
       ROW_NUMBER() OVER (ORDER BY value ASC NULLS FIRST, event_id) AS rn
FROM events WHERE event_id < 40 ORDER BY rn;
SELECT event_id, value,
       ROW_NUMBER() OVER (ORDER BY value ASC NULLS LAST, event_id) AS rn
FROM events WHERE event_id < 40 ORDER BY rn;
SELECT event_id, value,
       ROW_NUMBER() OVER (ORDER BY value DESC NULLS FIRST, event_id) AS rn
FROM events WHERE event_id < 40 ORDER BY rn;
SELECT event_id, value,
       ROW_NUMBER() OVER (ORDER BY value DESC NULLS LAST, event_id) AS rn
FROM events WHERE event_id < 40 ORDER BY rn;
SELECT event_id,
       FIRST_VALUE(value) OVER (PARTITION BY event_type ORDER BY value ASC NULLS LAST, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS fv
FROM events WHERE event_id < 60 ORDER BY event_id;
SELECT event_id,
       LAST_VALUE(value) OVER (PARTITION BY event_type ORDER BY value ASC NULLS FIRST, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv
FROM events WHERE event_id < 60 ORDER BY event_id;
SELECT event_id, value,
       LAG(value) OVER (PARTITION BY event_type ORDER BY value ASC NULLS FIRST, event_id) AS prev_v
FROM events WHERE event_id < 60 ORDER BY event_id;
SELECT event_id, value,
       LEAD(value) OVER (PARTITION BY event_type ORDER BY value ASC NULLS LAST, event_id) AS next_v
FROM events WHERE event_id < 60 ORDER BY event_id;
SELECT event_id,
       COUNT(value) OVER (PARTITION BY event_type ORDER BY event_id
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS cnt_nonnull
FROM events WHERE event_id < 60 ORDER BY event_id;
SELECT event_id,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (PARTITION BY event_type ORDER BY event_id
                          ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS DOUBLE) AS wsum
FROM events WHERE event_id < 60 ORDER BY event_id;
SELECT event_id,
       MIN(value) OVER (PARTITION BY event_type ORDER BY event_id
                        ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS wmin
FROM events WHERE event_id < 60 ORDER BY event_id;
SELECT o_orderkey,
       NTILE(4) OVER (ORDER BY o_totalprice ASC, o_orderkey) AS quartile
FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey;
SELECT l_orderkey, l_linenumber,
       RANK() OVER (PARTITION BY l_orderkey ORDER BY l_quantity DESC, l_linenumber) AS r,
       DENSE_RANK() OVER (PARTITION BY l_orderkey ORDER BY l_quantity DESC, l_linenumber) AS dr
FROM lineitem WHERE l_orderkey < 50 ORDER BY l_orderkey, l_linenumber;
SELECT event_id, value,
       NTH_VALUE(value, 2) OVER (PARTITION BY event_type ORDER BY value ASC NULLS LAST, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_v
FROM events WHERE event_id < 60 ORDER BY event_id;
SELECT user_id,
       MAX(value) OVER (PARTITION BY user_id) AS umax,
       MIN(value) OVER (PARTITION BY user_id) AS umin
FROM events WHERE event_id < 80 ORDER BY user_id, umax NULLS FIRST;
SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
FROM customer
GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST;
SELECT l_returnflag, l_linestatus, COUNT(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST;
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST;
SELECT l_returnflag, l_linestatus, GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls, COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST;
SELECT p_partkey, REPLACE(p_name, ' ', '_') AS snake
FROM part WHERE p_partkey <= 20 ORDER BY p_partkey;
SELECT p_partkey, LPAD(CAST(p_size AS STRING), 4, '0') AS padded,
       RPAD(p_brand, 12, '.') AS rpadded
FROM part WHERE p_partkey <= 20 ORDER BY p_partkey;
SELECT c_custkey, POSITION('0' IN c_name) AS pos0
FROM customer WHERE c_custkey <= 20 ORDER BY c_custkey;
SELECT doc_id, TRIM(SUBSTR(text, 1, 10)) AS head10
FROM documents WHERE doc_id < 15 ORDER BY doc_id;
SELECT doc_id, UPPER(lang) AS lang_u, LOWER(source) AS src_l
FROM documents WHERE doc_id < 15 ORDER BY doc_id;
SELECT event_id, COALESCE(value, -1) AS v_filled,
       NULLIF(event_type, 'error') AS non_err
FROM events WHERE event_id < 30 ORDER BY event_id;
SELECT event_id, CASE WHEN value IS NULL THEN 'missing'
                      WHEN value > 50 THEN 'high' ELSE 'low' END AS band
FROM events WHERE event_id < 30 ORDER BY event_id;
SELECT o_orderkey, CONCAT(o_orderstatus, '/', o_orderpriority) AS tag
FROM orders WHERE o_orderkey <= 40 ORDER BY o_orderkey;
SELECT n_name, LENGTH(n_name) AS len, REVERSE(n_name) AS rev FROM nation ORDER BY n_nationkey;
SELECT source, COUNT(*) AS n FROM documents WHERE text LIKE '%and%' GROUP BY source ORDER BY source;
SELECT lang, COUNT(*) AS n FROM documents WHERE n_chars BETWEEN 100 AND 400 GROUP BY lang ORDER BY lang;
SELECT GREATEST(p_size, 10) AS g, LEAST(p_size, 10) AS l, COUNT(*) AS n
FROM part GROUP BY GREATEST(p_size, 10), LEAST(p_size, 10) ORDER BY g, l;
SELECT COUNT(DISTINCT o_custkey) AS custs, COUNT(*) AS orders_n FROM orders;
SELECT o_orderstatus,
       COUNT(DISTINCT o_orderpriority) AS prios,
       MIN(o_orderdate) AS first_dt
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT l_returnflag,
       CAST(SUM(CAST(CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0 END AS DECIMAL(38,6))) AS DOUBLE) AS disc_rev
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag;
SELECT event_type,
       COUNT(*) AS n_all,
       COUNT(value) AS n_vals,
       COUNT(*) - COUNT(value) AS n_nulls
FROM events GROUP BY event_type ORDER BY event_type;
SELECT c_nationkey, MIN(c_acctbal) AS lo, MAX(c_acctbal) AS hi
FROM customer GROUP BY c_nationkey
HAVING MIN(c_acctbal) < 0 AND MAX(c_acctbal) > 5000
ORDER BY c_nationkey;
SELECT s_nationkey, COUNT(*) AS n FROM supplier
GROUP BY s_nationkey HAVING COUNT(*) >= 2 ORDER BY s_nationkey;
SELECT o_orderkey, o_totalprice FROM orders
WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.9 FROM orders)
ORDER BY o_orderkey;
SELECT c_custkey, c_acctbal,
       (SELECT MAX(s_acctbal) FROM supplier) AS best_supp_bal
FROM customer WHERE c_custkey <= 10 ORDER BY c_custkey;
SELECT c_nationkey, COUNT(*) AS n FROM customer
GROUP BY c_nationkey
HAVING COUNT(*) > (SELECT COUNT(*) FROM customer) / 30
ORDER BY c_nationkey;
SELECT n_name FROM nation
WHERE n_regionkey = (SELECT MIN(r_regionkey) FROM region)
ORDER BY n_name;
SELECT p_partkey, p_retailprice FROM part
WHERE p_retailprice = (SELECT MAX(p_retailprice) FROM part);
SELECT l_orderkey, COUNT(*) AS n FROM lineitem
GROUP BY l_orderkey
HAVING COUNT(*) = (SELECT MAX(cnt) FROM (SELECT COUNT(*) AS cnt FROM lineitem GROUP BY l_orderkey) t)
ORDER BY l_orderkey;
SELECT c_nationkey AS k FROM customer WHERE c_nationkey < 4
EXCEPT ALL
SELECT s_nationkey AS k FROM supplier WHERE s_nationkey < 4
ORDER BY k;
SELECT c_nationkey AS k FROM customer WHERE c_nationkey < 4
INTERSECT ALL
SELECT s_nationkey AS k FROM supplier WHERE s_nationkey < 4
ORDER BY k;
SELECT n_regionkey AS k FROM nation WHERE n_nationkey < 10
UNION ALL
SELECT r_regionkey AS k FROM region WHERE r_regionkey > 1
ORDER BY k;
SELECT a.n_nationkey AS nk_a, b.n_nationkey AS nk_b FROM nation a
JOIN nation b ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
ORDER BY nk_a, nk_b;
SELECT COUNT(*) AS n FROM lineitem a
JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
WHERE a.l_quantity = b.l_quantity;
SELECT COUNT(*) AS n FROM orders a JOIN orders b
ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
WHERE a.o_orderstatus <> b.o_orderstatus;
SELECT DISTINCT EXTRACT(YEAR FROM o_orderdate) AS y FROM orders ORDER BY y;
SELECT DISTINCT c_mktsegment, c_nationkey FROM customer WHERE c_nationkey < 5 ORDER BY c_mktsegment, c_nationkey;
SELECT p_partkey FROM part WHERE p_partkey <= 30 ORDER BY p_partkey % 7, p_partkey;
SELECT event_type, MIN(CAST(ts AS STRING)) AS first_ts, MAX(CAST(ts AS STRING)) AS last_ts
FROM events GROUP BY event_type ORDER BY event_type;
SELECT l_returnflag, COUNT(*) AS n,
       CAST(STDDEV_SAMP(l_quantity) AS DOUBLE) AS sd
FROM lineitem GROUP BY l_returnflag HAVING COUNT(*) > 10 ORDER BY l_returnflag;
SELECT o_orderstatus,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE) AS urgent_rev
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT COUNT(*) FILTER (WHERE value IS NULL) AS n_null,
       COUNT(*) FILTER (WHERE value > 50) AS n_high
FROM events;
SELECT c.c_mktsegment, n.n_name, COUNT(*) AS n
FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE n.n_regionkey <= 2
GROUP BY c.c_mktsegment, n.n_name
HAVING COUNT(*) >= 2
ORDER BY c.c_mktsegment, n.n_name;
SELECT s.s_name, COALESCE(t.n, 0) AS n_ship
FROM supplier s LEFT JOIN
  (SELECT l_suppkey, COUNT(*) AS n FROM lineitem WHERE l_quantity > 40 GROUP BY l_suppkey) t
  ON t.l_suppkey = s.s_suppkey
ORDER BY s.s_name;
SELECT event_type, user_id, COUNT(*) AS n
FROM events
WHERE user_id IN (SELECT user_id FROM events GROUP BY user_id HAVING COUNT(*) > 25)
GROUP BY event_type, user_id
ORDER BY event_type, user_id;

-- round-5 tranche: recursive CTEs, GROUPING()/grouping-set HAVING, correlated
-- scalar subqueries, nth_value/range-frames, TRY_CAST, bitwise ops, standard
-- string forms (POSITION/TRIM variants/ILIKE/TRANSLATE), ordinals, VALUES,
-- IS [NOT] DISTINCT FROM, EXCEPT/INTERSECT ALL, lateral aggregates
WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 10)
SELECT CAST(SUM(n) AS BIGINT) AS s, COUNT(*) AS c FROM t;
WITH RECURSIVE f(n, fib, prev) AS (
  SELECT 1, 1, 0
  UNION ALL
  SELECT n + 1, fib + prev, fib FROM f WHERE n < 15
)
SELECT n, fib FROM f ORDER BY n;
SELECT c_mktsegment, GROUPING(c_mktsegment) AS g, COUNT(*) AS n
FROM customer GROUP BY ROLLUP(c_mktsegment) ORDER BY g, c_mktsegment;
SELECT n_regionkey, n_nationkey, GROUPING(n_regionkey) AS g1, GROUPING(n_nationkey) AS g2, COUNT(*) AS n
FROM nation GROUP BY GROUPING SETS ((n_regionkey), (n_nationkey), ())
ORDER BY g1, g2, n_regionkey, n_nationkey;
SELECT r_name, (SELECT COUNT(*) FROM nation n WHERE n.n_regionkey = r.r_regionkey) AS n_nations
FROM region r ORDER BY r_name;
SELECT s_name, (SELECT MAX(n_name) FROM nation n WHERE n.n_nationkey = s.s_nationkey) AS nat
FROM supplier s WHERE s_suppkey <= 10 ORDER BY s_name;
SELECT p_size, NTH_VALUE(p_name, 2) OVER (PARTITION BY p_size ORDER BY p_partkey
  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_name, p_partkey
FROM part WHERE p_size <= 5 ORDER BY p_size, p_partkey;
SELECT p_partkey, p_size,
  CAST(SUM(CAST(p_size AS BIGINT)) OVER (ORDER BY p_size RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS rsum
FROM part WHERE p_partkey <= 40 ORDER BY p_partkey;
SELECT p_partkey, p_retailprice,
  COUNT(*) OVER (ORDER BY p_partkey ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS prev3
FROM part WHERE p_partkey <= 25 ORDER BY p_partkey;
SELECT TRY_CAST(p_brand AS INTEGER) AS bad_int, COUNT(*) AS n
FROM part GROUP BY bad_int ORDER BY bad_int NULLS FIRST;
SELECT TRY_CAST(SUBSTRING(p_brand, 7, 2) AS INTEGER) AS brand_num, COUNT(*) AS n
FROM part GROUP BY brand_num ORDER BY brand_num;
SELECT p_partkey & 7 AS b_and, p_partkey | 8 AS b_or, COUNT(*) AS n
FROM part WHERE p_partkey <= 32 GROUP BY b_and, b_or ORDER BY b_and, b_or;
SELECT CAST(n_nationkey << 2 AS BIGINT) AS shl, CAST(n_nationkey >> 1 AS BIGINT) AS shr
FROM nation ORDER BY shl;
SELECT c_custkey, POSITION('0' IN c_name) AS pos
FROM customer WHERE c_custkey <= 20 ORDER BY c_custkey;
SELECT TRIM(LEADING 'C' FROM c_mktsegment) AS trimmed, COUNT(*) AS n
FROM customer GROUP BY trimmed ORDER BY trimmed;
SELECT TRIM(BOTH 'AE' FROM r_name) AS t, r_name FROM region ORDER BY r_name;
SELECT c_custkey FROM customer WHERE c_name ILIKE 'customer%0001%' ORDER BY c_custkey;
SELECT SUBSTRING(c_name FROM 1 FOR 8) AS pfx, COUNT(*) AS n
FROM customer GROUP BY pfx ORDER BY pfx;
SELECT c_mktsegment, COUNT(*) AS n FROM customer GROUP BY 1 ORDER BY 1;
SELECT n_regionkey, n_name FROM nation ORDER BY 1, 2;
SELECT COUNT(*) AS n FROM orders HAVING COUNT(*) > 0;
SELECT CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sd
FROM lineitem WHERE l_orderkey <= 100;
SELECT l_returnflag, CAST(AVG(DISTINCT CAST(l_tax AS DECIMAL(38,6))) AS DOUBLE) AS ad
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag;
SELECT p_size, CAST(POWER(2, p_size % 5) AS DOUBLE) AS pw, ABS(p_size - 25) AS ab, SIGN(p_size - 25) AS sg
FROM part WHERE p_partkey <= 10 ORDER BY p_partkey;
SELECT FLOOR(c_acctbal) AS fl, CEIL(c_acctbal) AS ce, ROUND(c_acctbal, 1) AS rd
FROM customer WHERE c_custkey <= 15 ORDER BY c_custkey;
SELECT CAST(SQRT(CAST(p_size AS DOUBLE)) AS DOUBLE) AS sq FROM part WHERE p_partkey <= 12 ORDER BY p_partkey;
SELECT GREATEST(c_acctbal, 0.0) AS g, LEAST(c_acctbal, 1000.0) AS l
FROM customer WHERE c_custkey <= 12 ORDER BY c_custkey;
SELECT GREATEST(n_nationkey, n_regionkey, 3) AS g FROM nation ORDER BY n_nationkey;
WITH seg AS (SELECT c_mktsegment, COUNT(*) AS n FROM customer GROUP BY c_mktsegment)
SELECT a.c_mktsegment AS seg_a, b.c_mktsegment AS seg_b
FROM seg a JOIN seg b ON a.n = b.n AND a.c_mktsegment < b.c_mktsegment
ORDER BY seg_a, seg_b;
WITH big AS (SELECT o_custkey FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 3)
SELECT COUNT(*) AS n_big, (SELECT COUNT(*) FROM big) AS n_again FROM big;
SELECT r_name FROM region r
WHERE EXISTS (SELECT 1 FROM nation n WHERE n.n_regionkey = r.r_regionkey AND n.n_nationkey > 20)
ORDER BY r_name;
SELECT n_name FROM nation n
WHERE EXISTS (SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey)
  AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal < -900)
ORDER BY n_name;
SELECT CASE c_mktsegment WHEN 'BUILDING' THEN 'B' WHEN 'MACHINERY' THEN 'M' ELSE 'other' END AS tag,
       COUNT(*) AS n
FROM customer GROUP BY tag ORDER BY tag;
SELECT COALESCE(NULLIF(l_returnflag, 'N'), 'neutral') AS flag, COUNT(*) AS n
FROM lineitem GROUP BY flag ORDER BY flag;
SELECT IFNULL(NULLIF(o_orderstatus, 'O'), 'open') AS st, COUNT(*) AS n
FROM orders GROUP BY st ORDER BY st;
SELECT o_orderkey, CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due
FROM orders WHERE o_orderkey <= 20 ORDER BY o_orderkey;
SELECT CAST(DATE_TRUNC('quarter', o_orderdate) AS DATE) AS q, COUNT(*) AS n
FROM orders GROUP BY q ORDER BY q;
SELECT * FROM (VALUES (1, 'a'), (2, 'b'), (3, 'c')) AS t(id, s) ORDER BY id;
SELECT v.id, n.n_name FROM (VALUES (0), (1), (2)) AS v(id)
JOIN nation n ON n.n_regionkey = v.id
ORDER BY v.id, n.n_name;
SELECT x.n_regionkey AS k, COUNT(*) AS n FROM (
  SELECT n_regionkey FROM nation WHERE n_nationkey < 10
  UNION ALL
  SELECT r_regionkey FROM region
) x GROUP BY x.n_regionkey ORDER BY k;
SELECT l_linestatus FROM lineitem WHERE l_orderkey <= 50
EXCEPT ALL
SELECT o_orderstatus FROM orders WHERE o_orderkey <= 50
ORDER BY l_linestatus;
SELECT n_regionkey FROM nation
INTERSECT ALL
SELECT r_regionkey FROM region
ORDER BY n_regionkey;
SELECT ranked.o_orderkey, ranked.rnk FROM (
  SELECT o_orderkey, DENSE_RANK() OVER (ORDER BY o_totalprice DESC) AS rnk FROM orders
) ranked WHERE ranked.rnk <= 5 ORDER BY ranked.rnk, ranked.o_orderkey;
SELECT event_type,
       LEAD(event_id, 2, -1) OVER (PARTITION BY event_type ORDER BY event_id) AS nxt2,
       event_id
FROM events WHERE event_id <= 40 ORDER BY event_type, event_id;
SELECT user_id, CAST(PERCENT_RANK() OVER (ORDER BY user_id) AS DOUBLE) AS pr
FROM (SELECT DISTINCT user_id FROM events WHERE user_id <= 20) u ORDER BY user_id;
SELECT REPLACE(c_mktsegment, 'A', '@') AS repl, COUNT(*) AS n
FROM customer GROUP BY repl ORDER BY repl;
SELECT REVERSE(r_name) AS rev FROM region ORDER BY rev;
SELECT REPEAT(SUBSTRING(r_name, 1, 2), 3) AS rep FROM region ORDER BY rep;
SELECT TRANSLATE(c_mktsegment, 'AEIOU', 'aeiou') AS tr, COUNT(*) AS n
FROM customer GROUP BY tr ORDER BY tr;
SELECT MOD(p_partkey, 7) AS m, COUNT(*) AS n FROM part GROUP BY m ORDER BY m;
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus))
HAVING COUNT(*) > 1
ORDER BY o_orderstatus, o_orderpriority NULLS LAST, n;
SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS STRING) AS price_str
FROM orders WHERE o_orderkey <= 10 ORDER BY o_orderkey;
SELECT c.c_custkey, o.n_orders
FROM customer c,
LATERAL (SELECT COUNT(*) AS n_orders FROM orders o WHERE o.o_custkey = c.c_custkey) o
WHERE c.c_custkey <= 15 ORDER BY c.c_custkey;
SELECT CONCAT_WS('-', r_name, CAST(r_regionkey AS STRING)) AS tag FROM region ORDER BY tag;
SELECT c_custkey FROM customer
WHERE c_acctbal IS NOT DISTINCT FROM (SELECT MAX(c_acctbal) FROM customer)
ORDER BY c_custkey;
SELECT COUNT(*) AS n FROM events e1 JOIN events e2
ON e1.user_id IS NOT DISTINCT FROM e2.user_id AND e1.event_id = e2.event_id - 1
WHERE e1.event_id <= 100;
SELECT event_type, COUNT(*) FILTER (WHERE value IS DISTINCT FROM NULL) AS n_set
FROM events GROUP BY event_type ORDER BY event_type;
SELECT UPPER(SUBSTRING(p_type, 1, 6)) AS t6, MIN(p_partkey) AS first_pk
FROM part GROUP BY t6 ORDER BY t6;
SELECT LOWER(r_name) AS lo, LENGTH(r_name) AS len FROM region ORDER BY lo;
SELECT l_returnflag || '/' || l_linestatus AS combo, COUNT(*) AS n
FROM lineitem GROUP BY combo ORDER BY combo;
SELECT o_orderkey FROM orders
WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00' AND TIMESTAMP '1995-03-31 23:59:59'
  AND o_orderkey <= 200
ORDER BY o_orderkey;
SELECT CAST(EXTRACT(MONTH FROM l_shipdate) AS BIGINT) AS m,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS rev
FROM lineitem WHERE EXTRACT(YEAR FROM l_shipdate) = 1995
GROUP BY m ORDER BY m;
SELECT s_nationkey, COUNT(*) AS n_sup,
       CAST(MIN(s_acctbal) AS DOUBLE) AS min_bal,
       CAST(MAX(s_acctbal) AS DOUBLE) AS max_bal
FROM supplier GROUP BY s_nationkey HAVING COUNT(*) >= 2 ORDER BY s_nationkey;
SELECT a.r_name, b.r_name AS other_name
FROM region a CROSS JOIN region b
WHERE a.r_regionkey + b.r_regionkey = 4
ORDER BY a.r_name, b.r_name;
SELECT o_orderpriority, MIN(o_orderkey) AS first_ok, MAX(o_orderkey) AS last_ok
FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderpriority ORDER BY o_orderpriority;
SELECT COUNT(DISTINCT o_custkey) AS n_custs FROM orders WHERE o_totalprice > 100000;
SELECT c_nationkey, COUNT(*) AS n
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY c_nationkey ORDER BY c_nationkey;
SELECT l_orderkey, COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty
FROM lineitem
GROUP BY l_orderkey
HAVING COUNT(*) = (SELECT MAX(cnt) FROM (SELECT COUNT(*) AS cnt FROM lineitem GROUP BY l_orderkey) m)
ORDER BY l_orderkey;
SELECT CAST(value AS DECIMAL(10,2)) AS v2, COUNT(*) AS n
FROM events WHERE value IS NOT NULL AND event_id <= 50
GROUP BY v2 ORDER BY v2;
SELECT event_type, CAST(MIN(ts) AS STRING) AS first_ts
FROM events
WHERE EXTRACT(HOUR FROM ts) BETWEEN 6 AND 18
GROUP BY event_type ORDER BY event_type;
SELECT doc_id, n_chars FROM documents WHERE n_chars > (SELECT CAST(AVG(CAST(n_chars AS DECIMAL(38,6))) AS DOUBLE) FROM documents) AND doc_id <= 100 ORDER BY doc_id;
SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY CUBE(lang, source)
ORDER BY lang NULLS LAST, source NULLS LAST;
SELECT vec_id, label FROM embeddings WHERE label IS NULL OR label < 2 ORDER BY vec_id LIMIT 20;
SELECT label, COUNT(*) AS n, MIN(vec_id) AS min_vec FROM embeddings GROUP BY label ORDER BY label NULLS FIRST;
SELECT t.seg, t.n, CAST(t.n * CAST(100 AS DOUBLE) / SUM(t.n) OVER () AS DOUBLE) AS pct
FROM (SELECT c_mktsegment AS seg, COUNT(*) AS n FROM customer GROUP BY c_mktsegment) t
ORDER BY t.seg;
SELECT n_name FROM nation n
WHERE EXISTS (SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey)
INTERSECT
SELECT n_name FROM nation n
WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey)
ORDER BY n_name;
SELECT n_nationkey FROM nation n
WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 9000)
EXCEPT
SELECT n_nationkey FROM nation n
WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey)
ORDER BY n_nationkey;
SELECT o_orderpriority, COUNT(*) AS n FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05)
  AND NOT EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = o.o_orderkey AND l2.l_tax > 0.07)
GROUP BY o_orderpriority ORDER BY o_orderpriority;
SELECT c_mktsegment FROM customer
EXCEPT ALL
SELECT c_mktsegment FROM customer WHERE c_custkey <= 500
ORDER BY c_mktsegment LIMIT 25;
SELECT n_regionkey FROM nation WHERE n_nationkey > 5
INTERSECT ALL
SELECT CAST(o_orderkey % 5 AS BIGINT) FROM orders WHERE o_orderkey <= 40
ORDER BY n_regionkey;
SELECT c.c_mktsegment, t.n_orders, t.max_price
FROM (SELECT o_custkey, COUNT(*) AS n_orders,
             CAST(MAX(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS max_price
      FROM orders GROUP BY o_custkey) t
JOIN customer c ON c.c_custkey = t.o_custkey
WHERE t.n_orders >= 3
ORDER BY c.c_mktsegment, t.n_orders DESC, t.max_price DESC LIMIT 30;
SELECT a.o_orderpriority, a.n, b.total_n,
       CAST(a.n * CAST(100 AS DOUBLE) / b.total_n AS DOUBLE) AS pct
FROM (SELECT o_orderpriority, COUNT(*) AS n FROM orders GROUP BY o_orderpriority) a
CROSS JOIN (SELECT COUNT(*) AS total_n FROM orders) b
ORDER BY a.o_orderpriority;
SELECT s.s_nationkey, s.n_supp, c.n_cust
FROM (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey) s
FULL OUTER JOIN (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) c
  ON s.s_nationkey = c.c_nationkey
ORDER BY s.s_nationkey NULLS LAST, c.n_cust NULLS LAST;
SELECT x.l_orderkey, x.n_lines, y.o_totalprice
FROM (SELECT l_orderkey, COUNT(*) AS n_lines FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) >= 5) x
JOIN (SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice FROM orders WHERE o_orderstatus = 'O') y
  ON x.l_orderkey = y.o_orderkey
ORDER BY x.n_lines DESC, x.l_orderkey LIMIT 20;
SELECT event_id, value,
       RANK() OVER (ORDER BY value DESC NULLS LAST, event_id) AS rk
FROM events WHERE event_id <= 60 ORDER BY rk, event_id;
SELECT event_id, value,
       DENSE_RANK() OVER (ORDER BY value ASC NULLS FIRST, event_id) AS drk
FROM events WHERE event_id <= 60 ORDER BY drk, event_id;
SELECT user_id, event_id,
       CAST(FIRST_VALUE(value) OVER (PARTITION BY user_id ORDER BY value ASC NULLS LAST, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE) AS smallest_value
FROM events WHERE user_id <= 5 ORDER BY user_id, event_id;
SELECT user_id, event_id,
       CAST(LAST_VALUE(value) OVER (PARTITION BY user_id ORDER BY value DESC NULLS FIRST, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE) AS smallest_or_null
FROM events WHERE user_id <= 5 ORDER BY user_id, event_id;
SELECT event_id, value,
       COUNT(value) OVER (ORDER BY event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS nonnull_window
FROM events WHERE event_id <= 80 ORDER BY event_id;
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
       COUNT(*) AS n_all
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority;
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS qty_discounted,
       COUNT(*) FILTER (WHERE l_tax = 0) AS n_taxfree
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag;
SELECT c_nationkey,
       MIN(c_acctbal) FILTER (WHERE c_acctbal > 0) AS min_pos_bal,
       COUNT(*) FILTER (WHERE c_acctbal < 0) AS n_neg
FROM customer GROUP BY c_nationkey ORDER BY c_nationkey;
SELECT l_linenumber,
       CAST(ROUND(CAST(AVG(CAST(l_extendedprice AS DECIMAL(38,6))) AS DECIMAL(38,6)), 2) AS DOUBLE) AS avg_price_2dp
FROM lineitem GROUP BY l_linenumber ORDER BY l_linenumber;
SELECT o_orderstatus,
       CAST(FLOOR(CAST(o_totalprice AS DOUBLE) / 10000) AS BIGINT) AS price_bucket,
       COUNT(*) AS n
FROM orders GROUP BY o_orderstatus, price_bucket
ORDER BY o_orderstatus, price_bucket;
SELECT CAST(CEIL(CAST(p_retailprice AS DOUBLE) / 100) AS BIGINT) AS price_ceil, COUNT(*) AS n
FROM part WHERE p_partkey <= 200 GROUP BY price_ceil ORDER BY price_ceil;
SELECT p_size, CAST(MOD(p_partkey, 7) AS BIGINT) AS k7, COUNT(*) AS n
FROM part WHERE p_size <= 10 GROUP BY p_size, k7 ORDER BY p_size, k7;
SELECT event_type,
       CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DECIMAL(38,6)), 1) AS DOUBLE) AS v1dp
FROM events WHERE value IS NOT NULL GROUP BY event_type ORDER BY event_type;
SELECT lang, source, GROUPING(lang) AS g_lang, GROUPING(source) AS g_source, COUNT(*) AS n
FROM documents GROUP BY ROLLUP(lang, source)
ORDER BY g_lang, g_source, lang NULLS LAST, source NULLS LAST;
SELECT o_orderstatus, o_orderpriority, GROUPING(o_orderstatus) AS gs, COUNT(*) AS n
FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY gs, o_orderstatus NULLS LAST, o_orderpriority NULLS LAST;
SELECT n_name, NULLIF(n_regionkey, 2) AS rk_or_null,
       COALESCE(NULLIF(n_regionkey, 2), -1) AS rk_defaulted
FROM nation ORDER BY n_nationkey;
SELECT p_partkey, GREATEST(p_size, 25) AS hi, LEAST(p_size, 25) AS lo
FROM part WHERE p_partkey <= 60 ORDER BY p_partkey;
SELECT s_suppkey, LPAD(CAST(s_suppkey AS STRING), 8, '0') AS padded,
       RPAD(s_name, 30, '.') AS dotted
FROM supplier WHERE s_suppkey <= 30 ORDER BY s_suppkey;
SELECT c_custkey, REPLACE(c_name, 'Customer', 'Cst') AS short_name,
       REVERSE(c_mktsegment) AS rseg
FROM customer WHERE c_custkey <= 25 ORDER BY c_custkey;
SELECT doc_id, SUBSTR(text, 1, 12) AS head12, LENGTH(text) AS n
FROM documents WHERE doc_id <= 40 ORDER BY doc_id;
SELECT event_type, REPEAT(event_type, 2) AS doubled, COUNT(*) AS n
FROM events GROUP BY event_type ORDER BY event_type;
SELECT o_orderkey, CAST(o_orderdate AS STRING) AS od,
       CAST(o_orderdate + INTERVAL '90' DAY AS STRING) AS due
FROM orders WHERE o_orderkey <= 120 ORDER BY o_orderkey;
SELECT EXTRACT(YEAR FROM o_orderdate) AS yr, EXTRACT(QUARTER FROM o_orderdate) AS qtr, COUNT(*) AS n
FROM orders GROUP BY yr, qtr ORDER BY yr, qtr;
SELECT event_type, EXTRACT(MINUTE FROM ts) AS minute_of_hour, COUNT(*) AS n
FROM events WHERE event_id <= 400 GROUP BY event_type, minute_of_hour
ORDER BY event_type, minute_of_hour;
SELECT DISTINCT n_regionkey AS k FROM nation
UNION
SELECT DISTINCT CAST(p_size AS BIGINT) AS k FROM part WHERE p_size <= 4
ORDER BY k;
SELECT 'cust' AS src, COUNT(*) AS n FROM customer
UNION ALL
SELECT 'supp' AS src, COUNT(*) AS n FROM supplier
UNION ALL
SELECT 'part' AS src, COUNT(*) AS n FROM part
ORDER BY src;
SELECT seg, n,
       CAST(SUM(n) OVER (ORDER BY seg ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_total
FROM (SELECT c_mktsegment AS seg, COUNT(*) AS n FROM customer GROUP BY c_mktsegment) t
ORDER BY seg;
SELECT o_orderpriority, yr, n,
       CAST(LAG(n) OVER (PARTITION BY o_orderpriority ORDER BY yr) AS BIGINT) AS prev_yr_n
FROM (SELECT o_orderpriority, EXTRACT(YEAR FROM o_orderdate) AS yr, COUNT(*) AS n
      FROM orders GROUP BY o_orderpriority, yr) t
ORDER BY o_orderpriority, yr;
SELECT lang, NTILE(3) OVER (ORDER BY n DESC, lang) AS tertile, n
FROM (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang) t
ORDER BY tertile, lang;
SELECT doc_id, LENGTH(text) - LENGTH(REPLACE(text, chr(10), '')) + 1 AS n_raw_lines
FROM documents WHERE doc_id <= 50 ORDER BY doc_id;
SELECT n_name, n_regionkey IN (0, 2, 4) AS in_even_region
FROM nation ORDER BY n_nationkey;
SELECT event_id, CAST(value AS DOUBLE) AS v
FROM events WHERE event_id IN (1, 3, 5, 7, 9, 11) ORDER BY event_id;
SELECT o_orderpriority, COUNT(*) AS n
FROM orders
WHERE o_custkey IN (
  SELECT c_custkey FROM customer
  WHERE c_nationkey IN (
    SELECT n_nationkey FROM nation WHERE n_regionkey =
      (SELECT MIN(r_regionkey) FROM region)))
GROUP BY o_orderpriority ORDER BY o_orderpriority;
SELECT c_mktsegment, COUNT(*) AS n_rich
FROM customer
WHERE c_acctbal > (SELECT CAST(AVG(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) FROM customer
                   WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey <= 2))
GROUP BY c_mktsegment ORDER BY c_mktsegment;
SELECT l_returnflag, COUNT(*) AS n
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                     WHERE o_totalprice > (SELECT CAST(AVG(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) FROM orders))
GROUP BY l_returnflag ORDER BY l_returnflag;
SELECT a.n_nationkey, b.n_nationkey AS partner
FROM nation a JOIN nation b ON a.n_nationkey + 1 = b.n_nationkey
ORDER BY a.n_nationkey;
SELECT n.n_name, COUNT(*) AS n_matches
FROM nation n JOIN customer c ON c.c_nationkey % 5 = n.n_regionkey
WHERE c.c_custkey <= 200
GROUP BY n.n_name ORDER BY n.n_name;
SELECT e1.event_id, e2.event_id AS next_id
FROM events e1 JOIN events e2 ON e2.event_id = e1.event_id + 1 AND e1.user_id = e2.user_id
WHERE e1.event_id <= 100
ORDER BY e1.event_id;
SELECT c_custkey,
       CAST(PERCENT_RANK() OVER (ORDER BY c_acctbal, c_custkey) AS DOUBLE) AS pr
FROM customer WHERE c_custkey <= 40 ORDER BY c_custkey;
SELECT c_custkey,
       CAST(CUME_DIST() OVER (ORDER BY c_acctbal, c_custkey) AS DOUBLE) AS cd
FROM customer WHERE c_custkey <= 40 ORDER BY c_custkey;
SELECT user_id, event_id,
       CAST(NTH_VALUE(value, 2) OVER (PARTITION BY user_id ORDER BY event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE) AS second_value
FROM events WHERE user_id <= 4 ORDER BY user_id, event_id;
SELECT o_orderkey, o_orderstatus,
       CAST(LEAD(o_totalprice, 2) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS DOUBLE) AS price_2ahead
FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderstatus, o_orderkey;
SELECT o_orderkey,
       CAST(LAG(o_totalprice, 1) OVER (ORDER BY o_orderkey) AS DOUBLE) AS prev_price,
       CAST(o_totalprice AS DOUBLE) AS price
FROM orders WHERE o_orderkey <= 80 ORDER BY o_orderkey;
SELECT p_partkey, p_size,
       COUNT(*) OVER (ORDER BY p_size RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS similar_size_n
FROM part WHERE p_partkey <= 100 ORDER BY p_partkey;
SELECT event_id, user_id,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY event_id RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS recent_n
FROM events WHERE user_id <= 3 ORDER BY user_id, event_id;
SELECT doc_id, UPPER(SUBSTR(lang, 1, 1)) || LOWER(SUBSTR(lang, 2)) AS lang_title
FROM documents WHERE doc_id <= 30 ORDER BY doc_id;
SELECT s_suppkey, TRIM(s_name) AS name_trim, LENGTH(s_name) - LENGTH(TRIM(s_name)) AS pad_chars
FROM supplier WHERE s_suppkey <= 40 ORDER BY s_suppkey;
SELECT n_name, CONCAT_WS('-', n_name, CAST(n_regionkey AS STRING)) AS tagged
FROM nation ORDER BY n_nationkey;
SELECT event_type, SPLIT_PART(event_type, 'e', 1) AS before_e
FROM events GROUP BY event_type ORDER BY event_type;
SELECT doc_id, CONTAINS(text, 'def ') AS has_def, CONTAINS(text, 'class ') AS has_class
FROM documents WHERE doc_id <= 60 ORDER BY doc_id;
SELECT o_orderstatus,
       SUM(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) AS n_big,
       SUM(CASE WHEN o_totalprice <= 150000 THEN 1 ELSE 0 END) AS n_small
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT l_linestatus,
       CAST(MAX(CASE WHEN l_returnflag = 'R' THEN l_quantity END) AS DOUBLE) AS max_returned_qty
FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus;
SELECT c_nationkey,
       CAST(SUM(CASE WHEN c_acctbal < 0 THEN CAST(c_acctbal AS DECIMAL(38,6)) ELSE 0 END) AS DOUBLE) AS neg_total
FROM customer GROUP BY c_nationkey ORDER BY c_nationkey;
SELECT event_type, BOOL_AND(value IS NOT NULL) AS all_valued, BOOL_OR(value > 90) AS any_high
FROM events GROUP BY event_type ORDER BY event_type;
SELECT vec_id, label, label IS NULL AS unlabeled
FROM embeddings WHERE vec_id <= 20 ORDER BY vec_id;
SELECT label, COUNT(*) AS n, MIN(vec_id) AS first_vec, MAX(vec_id) AS last_vec
FROM embeddings WHERE label IS NOT NULL GROUP BY label ORDER BY label;
SELECT source, lang, MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
FROM documents GROUP BY source, lang ORDER BY source, lang;
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars
FROM documents GROUP BY lang HAVING COUNT(*) > 5 ORDER BY lang;
SELECT n_nationkey, n_name,
       CASE WHEN EXISTS (SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey)
            THEN 'has_supplier' ELSE 'no_supplier' END AS supplier_status
FROM nation n ORDER BY n_nationkey;
SELECT r_regionkey, r_name,
       (SELECT COUNT(*) FROM nation n WHERE n.n_regionkey = r.r_regionkey) AS n_nations
FROM region r ORDER BY r_regionkey;
SELECT c_custkey,
       (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F') AS n_finished
FROM customer c WHERE c_custkey <= 50 ORDER BY c_custkey;
SELECT user_id, event_id, event_type FROM (
  SELECT user_id, event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events) t
WHERE rn = 1 AND user_id <= 20 ORDER BY user_id;
SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS price FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders) t
WHERE rk = 1 AND o_custkey <= 60 ORDER BY o_custkey;
SELECT c_custkey FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
  AND c_custkey <= 120
ORDER BY c_custkey;
SELECT n_nationkey FROM nation
WHERE n_nationkey NOT IN (SELECT s_nationkey FROM supplier WHERE s_nationkey IS NOT NULL)
ORDER BY n_nationkey;
SELECT l_suppkey, COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS total
FROM lineitem GROUP BY l_suppkey
HAVING COUNT(*) > 10 AND SUM(CAST(l_extendedprice AS DECIMAL(38,6))) > 500000
ORDER BY l_suppkey;
SELECT o_custkey, MIN(o_orderkey) AS first_ok, MAX(o_orderkey) AS last_ok
FROM orders GROUP BY o_custkey
HAVING MAX(o_orderkey) - MIN(o_orderkey) > 10000
ORDER BY o_custkey LIMIT 40;
SELECT event_id, CAST(value AS DOUBLE) / NULLIF(CAST(event_id AS DOUBLE), 0) AS ratio
FROM events WHERE event_id BETWEEN 1 AND 30 ORDER BY event_id;
SELECT p_partkey, CAST(p_retailprice AS DOUBLE) - CAST(p_size AS DOUBLE) * 10 AS adjusted
FROM part WHERE p_partkey <= 50 ORDER BY p_partkey;
SELECT ABS(CAST(c_acctbal AS DOUBLE)) AS abs_bal, c_custkey
FROM customer WHERE c_acctbal < 0 ORDER BY abs_bal DESC, c_custkey LIMIT 20;

-- ===== tranche r5b: grouping sets, agg FILTER, window ntile/nth/cume, string fns, =====
-- EXCEPT/INTERSECT ALL, VALUES, lateral-style derived tables, NULL ordering.

-- ===== GROUPING SETS / ROLLUP / CUBE =====
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST;
SELECT l_returnflag, l_linestatus, COUNT(*) AS n, GROUPING(l_returnflag) AS g_rf
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST;
SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
FROM customer GROUP BY CUBE (c_mktsegment, c_nationkey)
ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST;
SELECT event_type, COUNT(*) AS n, GROUPING(event_type) AS g
FROM events GROUP BY ROLLUP (event_type)
ORDER BY event_type NULLS FIRST;
SELECT source, lang, MIN(n_chars) AS mn
FROM documents GROUP BY GROUPING SETS ((source, lang), (source), ())
ORDER BY source NULLS FIRST, lang NULLS FIRST;

-- ===== aggregate FILTER clause =====
SELECT o_orderstatus,
       COUNT(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
       COUNT(*) FILTER (WHERE o_totalprice <= 100000) AS n_small
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT l_linestatus,
       MIN(l_quantity) FILTER (WHERE l_returnflag = 'R') AS min_ret,
       MAX(l_quantity) FILTER (WHERE l_returnflag = 'N') AS max_noret
FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus;
SELECT event_type,
       COUNT(*) FILTER (WHERE value IS NULL) AS n_null,
       SUM(CAST(value AS DECIMAL(38,6))) FILTER (WHERE value > 50) AS high_sum_dec
FROM events GROUP BY event_type ORDER BY event_type;
SELECT c_nationkey, COUNT(*) FILTER (WHERE c_acctbal < 0) AS n_neg
FROM customer GROUP BY c_nationkey HAVING COUNT(*) FILTER (WHERE c_acctbal < 0) > 0
ORDER BY c_nationkey;

-- ===== windows: ntile / nth_value / cume_dist / percent_rank / lead-lag defaults =====
SELECT c_custkey, NTILE(4) OVER (ORDER BY c_custkey) AS quartile
FROM customer WHERE c_custkey <= 40 ORDER BY c_custkey;
SELECT o_orderkey, o_custkey,
       NTILE(3) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS bucket
FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey;
SELECT event_id, user_id,
       NTH_VALUE(event_id, 2) OVER (PARTITION BY user_id ORDER BY event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_event
FROM events WHERE user_id <= 10 ORDER BY user_id, event_id;
SELECT c_custkey, CUME_DIST() OVER (ORDER BY c_custkey) AS cd
FROM customer WHERE c_custkey <= 25 ORDER BY c_custkey;
SELECT c_custkey, PERCENT_RANK() OVER (ORDER BY c_custkey) AS pr
FROM customer WHERE c_custkey <= 25 ORDER BY c_custkey;
SELECT event_id, user_id,
       LAG(event_id, 2, -1) OVER (PARTITION BY user_id ORDER BY event_id) AS lag2,
       LEAD(event_id, 3, -1) OVER (PARTITION BY user_id ORDER BY event_id) AS lead3
FROM events WHERE user_id <= 8 ORDER BY user_id, event_id;
SELECT o_orderkey,
       FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS fv,
       LAST_VALUE(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey
         ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS lv
FROM orders WHERE o_orderkey <= 150 ORDER BY o_orderkey;
SELECT event_id, DENSE_RANK() OVER (ORDER BY event_type) AS dr, event_type
FROM events WHERE event_id <= 30 ORDER BY event_id;
SELECT user_id, event_id,
       COUNT(*) OVER (PARTITION BY user_id) AS n_user_events,
       MIN(event_id) OVER (PARTITION BY user_id
         ORDER BY event_id RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_min
FROM events WHERE user_id <= 6 ORDER BY user_id, event_id;

-- ===== string functions (shared dialect) =====
SELECT n_nationkey, LPAD(n_name, 20, '.') AS padded FROM nation ORDER BY n_nationkey;
SELECT n_nationkey, RPAD(n_name, 20, '*') AS padded FROM nation ORDER BY n_nationkey;
SELECT p_partkey, REVERSE(p_type) AS rev FROM part WHERE p_partkey <= 20 ORDER BY p_partkey;
SELECT n_nationkey, REPLACE(n_name, 'A', '@') AS repl FROM nation ORDER BY n_nationkey;
SELECT n_nationkey, REPEAT(SUBSTR(n_name, 1, 2), 3) AS rep3 FROM nation ORDER BY n_nationkey;
SELECT r_regionkey, SPLIT_PART(r_name, 'E', 1) AS first_piece FROM region ORDER BY r_regionkey;
SELECT n_nationkey, POSITION('AN' IN n_name) AS pos FROM nation ORDER BY n_nationkey;
SELECT n_nationkey, LEFT(n_name, 3) AS l3, RIGHT(n_name, 3) AS r3 FROM nation ORDER BY n_nationkey;
SELECT n_nationkey, TRIM(LEADING 'A' FROM n_name) AS trimmed FROM nation ORDER BY n_nationkey;
SELECT p_partkey, CONCAT(p_brand, '#', p_type) AS tag
FROM part WHERE p_partkey <= 30 ORDER BY p_partkey;
SELECT c_custkey, LENGTH(TRIM(c_name)) AS name_len
FROM customer WHERE c_custkey <= 30 ORDER BY c_custkey;
SELECT doc_id, UPPER(lang) AS lang_up, LOWER(source) AS src_lo
FROM documents WHERE doc_id <= 25 ORDER BY doc_id;

-- ===== EXCEPT ALL / INTERSECT ALL / set-op + correlated EXISTS =====
SELECT c_nationkey AS k FROM customer WHERE c_custkey <= 200
EXCEPT ALL
SELECT s_nationkey AS k FROM supplier
ORDER BY k;
SELECT c_nationkey AS k FROM customer WHERE c_custkey <= 200
INTERSECT ALL
SELECT s_nationkey AS k FROM supplier
ORDER BY k;
SELECT n_nationkey AS k FROM nation
WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = nation.n_nationkey)
INTERSECT
SELECT s_nationkey AS k FROM supplier
ORDER BY k;
SELECT n_nationkey AS k FROM nation
WHERE EXISTS (SELECT 1 FROM supplier s WHERE s.s_nationkey = nation.n_nationkey)
EXCEPT
SELECT c_nationkey AS k FROM customer WHERE c_acctbal < -900
ORDER BY k;
SELECT o_orderstatus AS s FROM orders WHERE o_orderkey <= 500
UNION
SELECT l_linestatus AS s FROM lineitem WHERE l_orderkey <= 500
ORDER BY s;

-- ===== VALUES lists and inline tables =====
SELECT t.k, t.v FROM (VALUES (1, 'one'), (2, 'two'), (3, 'three')) AS t(k, v) ORDER BY t.k;
SELECT n.n_name, t.tier FROM nation n
JOIN (VALUES (0, 'low'), (1, 'mid'), (2, 'high'), (3, 'top'), (4, 'max')) AS t(rk, tier)
  ON n.n_regionkey = t.rk
ORDER BY n.n_nationkey;
SELECT v.x + 1 AS y FROM (VALUES (10), (20), (30)) AS v(x) ORDER BY y;

-- ===== derived tables / nested CTEs / CTE used twice =====
WITH agg AS (
  SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
)
SELECT a.n_orders, COUNT(*) AS n_custs FROM agg a GROUP BY a.n_orders ORDER BY a.n_orders;
WITH big AS (
  SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_totalprice > 150000
), cnt AS (
  SELECT o_custkey, COUNT(*) AS n FROM big GROUP BY o_custkey
)
SELECT b.o_orderkey, c.n FROM big b JOIN cnt c ON b.o_custkey = c.o_custkey
WHERE c.n >= 2 ORDER BY b.o_orderkey;
WITH nk AS (SELECT n_nationkey, n_name FROM nation)
SELECT a.n_name AS name_a, b.n_name AS name_b
FROM nk a JOIN nk b ON a.n_nationkey = b.n_nationkey - 12
ORDER BY a.n_nationkey;
SELECT x.o_orderstatus, x.avg_price FROM (
  SELECT o_orderstatus,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_price
  FROM orders GROUP BY o_orderstatus
) x WHERE x.avg_price > 100000 ORDER BY x.o_orderstatus;

-- ===== NULL ordering variants =====
SELECT event_id, value FROM events WHERE event_id <= 40
ORDER BY value ASC NULLS LAST, event_id;
SELECT event_id, value FROM events WHERE event_id <= 40
ORDER BY value DESC NULLS FIRST, event_id;
SELECT event_id, value FROM events WHERE event_id <= 40
ORDER BY value DESC NULLS LAST, event_id;
SELECT label, vec_id FROM embeddings WHERE vec_id <= 60
ORDER BY label ASC NULLS FIRST, vec_id;

-- ===== math / conditional edges =====
SELECT event_id, SIGN(CAST(value AS DOUBLE) - 50) AS sgn
FROM events WHERE event_id <= 30 AND value IS NOT NULL ORDER BY event_id;
SELECT l_orderkey, l_linenumber, MOD(l_orderkey, 7) AS m
FROM lineitem WHERE l_orderkey <= 40 ORDER BY l_orderkey, l_linenumber;
SELECT c_custkey, SQRT(ABS(CAST(c_acctbal AS DOUBLE))) AS sq
FROM customer WHERE c_custkey <= 30 ORDER BY c_custkey;
SELECT event_id, IFNULL(value, -1) AS v FROM events WHERE event_id <= 30 ORDER BY event_id;
SELECT event_id, NULLIF(event_type, 'click') AS nt FROM events WHERE event_id <= 30 ORDER BY event_id;
SELECT event_id, COALESCE(value, CAST(event_id AS DOUBLE), 0.0) AS v
FROM events WHERE event_id <= 30 ORDER BY event_id;
SELECT p_partkey, GREATEST(p_size, 25) AS g, LEAST(p_size, 25) AS l
FROM part WHERE p_partkey <= 30 ORDER BY p_partkey;
SELECT event_id, CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2 END AS code
FROM events WHERE event_id <= 30 ORDER BY event_id;
SELECT o_orderkey, FLOOR(CAST(o_totalprice AS DOUBLE) / 1000) AS kilo,
       CEIL(CAST(o_totalprice AS DOUBLE) / 1000) AS kilo_up
FROM orders WHERE o_orderkey <= 60 ORDER BY o_orderkey;

-- ===== date/time shared surface =====
SELECT o_orderkey, CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mo
FROM orders WHERE o_orderkey <= 40 ORDER BY o_orderkey;
SELECT EXTRACT(YEAR FROM o_orderdate) AS yr, EXTRACT(QUARTER FROM o_orderdate) AS qtr, COUNT(*) AS n
FROM orders GROUP BY 1, 2 ORDER BY yr, qtr;
SELECT event_id, EXTRACT(HOUR FROM ts) AS hh, EXTRACT(MINUTE FROM ts) AS mi
FROM events WHERE event_id <= 25 ORDER BY event_id;
SELECT EXTRACT(YEAR FROM ts) AS yr, event_type, COUNT(*) AS n
FROM events GROUP BY 1, 2 ORDER BY yr, event_type;
SELECT o_orderkey FROM orders
WHERE o_orderdate >= CAST('1995-01-01' AS DATE) + INTERVAL '6' MONTH
  AND o_orderkey <= 300
ORDER BY o_orderkey;

-- ===== joins: three-way + mixed conditions =====
SELECT n.n_name, COUNT(DISTINCT s.s_suppkey) AS n_supp, COUNT(DISTINCT c.c_custkey) AS n_cust
FROM nation n
LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey
LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name ORDER BY n.n_name;
SELECT r.r_name, COUNT(*) AS n_line_supplied
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN supplier s ON s.s_nationkey = n.n_nationkey
JOIN lineitem l ON l.l_suppkey = s.s_suppkey
GROUP BY r.r_name ORDER BY r.r_name;
SELECT c.c_custkey, o.o_orderkey
FROM customer c JOIN orders o
  ON c.c_custkey = o.o_custkey AND o.o_totalprice > 250000 AND c.c_acctbal > 0
WHERE c.c_custkey <= 400
ORDER BY c.c_custkey, o.o_orderkey;
SELECT s.s_suppkey, l.l_orderkey, l.l_linenumber
FROM supplier s JOIN lineitem l ON l.l_suppkey = s.s_suppkey
WHERE l.l_quantity < 2 ORDER BY s.s_suppkey, l.l_orderkey, l.l_linenumber;

-- ===== scalar subqueries in new spots =====
SELECT o_orderkey, o_totalprice > (SELECT CAST(AVG(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) FROM orders) AS above_avg
FROM orders WHERE o_orderkey <= 50 ORDER BY o_orderkey;
SELECT (SELECT COUNT(*) FROM nation) AS n_nations,
       (SELECT COUNT(*) FROM region) AS n_regions,
       (SELECT MAX(s_suppkey) FROM supplier) AS max_supp;
SELECT c_custkey FROM customer c
WHERE c_acctbal > (SELECT CAST(AVG(CAST(c2.c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                   FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
  AND c_custkey <= 100
ORDER BY c_custkey;

-- Tranche r5c: multi-col distinct, expression joins, self-joins, CASE in
-- GROUP BY, date BETWEEN, boolean aggregates, correlated HAVING shapes.
SELECT COUNT(DISTINCT o_orderstatus || '|' || o_orderpriority) AS n_combos FROM orders;
SELECT COUNT(DISTINCT l_returnflag || '|' || l_linestatus) AS n_rl FROM lineitem;
SELECT c_nationkey, COUNT(DISTINCT c_mktsegment) AS n_seg
FROM customer GROUP BY c_nationkey ORDER BY c_nationkey;
SELECT a.s_suppkey AS k1, b.s_suppkey AS k2
FROM supplier a JOIN supplier b
  ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
ORDER BY k1, k2;
SELECT a.o_orderkey, b.o_orderkey AS later_order
FROM orders a JOIN orders b
  ON a.o_custkey = b.o_custkey AND b.o_orderkey = a.o_orderkey + 1
WHERE a.o_orderkey <= 2000
ORDER BY a.o_orderkey, later_order;
SELECT n_regionkey + 1 AS rk1, COUNT(*) AS n FROM nation GROUP BY n_regionkey + 1 ORDER BY rk1;
SELECT CASE WHEN o_totalprice > 200000 THEN 'high' WHEN o_totalprice > 100000 THEN 'mid' ELSE 'low' END AS tier,
       COUNT(*) AS n
FROM orders GROUP BY 1 ORDER BY tier;
SELECT SUBSTR(o_orderpriority, 1, 1) AS pri_code, COUNT(*) AS n
FROM orders GROUP BY SUBSTR(o_orderpriority, 1, 1) ORDER BY pri_code;
SELECT o_orderkey FROM orders
WHERE o_orderdate BETWEEN CAST('1994-03-01' AS DATE) AND CAST('1994-03-31' AS DATE)
ORDER BY o_orderkey;
SELECT COUNT(*) AS n FROM orders
WHERE o_orderdate NOT BETWEEN CAST('1993-01-01' AS DATE) AND CAST('1996-12-31' AS DATE);
SELECT l_orderkey, COUNT(*) AS n_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderstatus = 'P' GROUP BY l_orderkey
ORDER BY l_orderkey LIMIT 30;
SELECT s_nationkey, BOOL_AND(s_acctbal > 0) AS all_positive
FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey;
SELECT event_type, BOOL_OR(value IS NULL) AS has_nulls, COUNT(*) AS n
FROM events GROUP BY event_type ORDER BY event_type;
SELECT o_custkey FROM orders GROUP BY o_custkey
HAVING MIN(o_totalprice) > 50000 AND COUNT(*) >= 3
ORDER BY o_custkey;
SELECT c.c_nationkey, COUNT(*) AS n_rich
FROM customer c
WHERE c.c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) FROM customer c2)
GROUP BY c.c_nationkey ORDER BY c.c_nationkey;
SELECT n_name FROM nation WHERE n_nationkey IN (
  SELECT c_nationkey FROM customer GROUP BY c_nationkey HAVING COUNT(*) > 40)
ORDER BY n_name;
SELECT r_name FROM region WHERE r_regionkey IN (
  SELECT n_regionkey FROM nation WHERE n_nationkey IN (
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000))
ORDER BY r_name;
SELECT l_returnflag || '/' || l_linestatus AS flag_status, COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag || '/' || l_linestatus ORDER BY flag_status;
SELECT event_id, CONCAT(event_type, COALESCE(CAST(NULL AS STRING), '')) AS et
FROM events WHERE event_id <= 20 ORDER BY event_id;
SELECT doc_id, n_chars FROM documents WHERE lang IN ('en', 'de') AND n_chars > 400
ORDER BY doc_id;
SELECT lang, source, COUNT(*) AS n FROM documents
WHERE source IS NOT NULL GROUP BY lang, source
HAVING COUNT(*) BETWEEN 2 AND 100
ORDER BY lang, source;
SELECT vec_id FROM embeddings WHERE label IS NULL ORDER BY vec_id LIMIT 25;
SELECT e1.event_id, e2.event_id AS next_id
FROM events e1 JOIN events e2
  ON e1.user_id = e2.user_id AND e2.event_id = e1.event_id + 1
WHERE e1.user_id <= 5
ORDER BY e1.event_id;
SELECT user_id, CAST(MIN(ts) AS STRING) AS first_ts, CAST(MAX(ts) AS STRING) AS last_ts
FROM events WHERE user_id <= 12 GROUP BY user_id ORDER BY user_id;
SELECT user_id, CAST(MAX(ts) AS STRING) AS last_s
FROM events GROUP BY user_id HAVING COUNT(*) > 20 ORDER BY user_id;
SELECT o_orderstatus, o_orderpriority, n FROM (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
  FROM orders GROUP BY o_orderstatus, o_orderpriority) t
WHERE rn = 1 ORDER BY o_orderstatus;
SELECT c_mktsegment,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS seg_bal,
       CAST(SUM(SUM(CAST(c_acctbal AS DECIMAL(38,6)))) OVER () AS DOUBLE) AS total_bal
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment;
SELECT p_brand, p_size FROM part WHERE (p_brand, p_size) IN (('Brand#1', 10), ('Brand#2', 20))
ORDER BY p_brand, p_size;
SELECT o_orderkey, o_orderstatus = 'F' AS finished, o_totalprice < 50000 AS cheap
FROM orders WHERE o_orderkey <= 80 ORDER BY o_orderkey;
SELECT COUNT(*) AS n_pairs FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) t;
SELECT n_nationkey, EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal < -999) AS has_broke
FROM nation n ORDER BY n_nationkey;
SELECT EXTRACT(MONTH FROM l_shipdate) AS ship_mo, COUNT(*) AS n FROM lineitem
WHERE l_returnflag IN ('A', 'R') GROUP BY 1 ORDER BY ship_mo;
SELECT t.grp, CAST(SUM(t.cnt) AS BIGINT) AS total FROM (
  SELECT o_orderstatus AS grp, COUNT(*) AS cnt FROM orders GROUP BY o_orderstatus
  UNION ALL
  SELECT l_linestatus AS grp, COUNT(*) AS cnt FROM lineitem GROUP BY l_linestatus
) t GROUP BY t.grp ORDER BY t.grp;
SELECT user_id, event_type, n, SUM(n) OVER (PARTITION BY user_id ORDER BY event_type
  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_n
FROM (SELECT user_id, event_type, COUNT(*) AS n FROM events WHERE user_id <= 8
      GROUP BY user_id, event_type) t
ORDER BY user_id, event_type;

-- Tranche r5d: EXISTS combinations, HAVING-without-GROUP-BY, IN with NULLs,
-- LIKE ESCAPE, negative modulo, CASE NULL branches, window-in-CTE reuse.
SELECT n_nationkey, n_name FROM nation n
WHERE EXISTS (SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey AND s.s_acctbal > 9000)
   OR EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal < -900)
ORDER BY n_nationkey;
SELECT n_nationkey FROM nation n
WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey)
  AND NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey AND s.s_acctbal < 0)
ORDER BY n_nationkey;
SELECT COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
FROM orders HAVING COUNT(*) > 0;
SELECT MAX(l_quantity) AS max_qty FROM lineitem HAVING MAX(l_quantity) > 10;
SELECT event_id FROM events WHERE event_type IN ('click', 'view') AND event_id <= 40 ORDER BY event_id;
SELECT COUNT(*) AS n FROM part WHERE p_name LIKE '%!_%' ESCAPE '!';
SELECT l_orderkey, l_linenumber, l_orderkey % 3 AS m3, (0 - l_orderkey) % 3 AS neg_m3
FROM lineitem WHERE l_orderkey <= 20 ORDER BY l_orderkey, l_linenumber;
SELECT event_id,
       CASE WHEN value > 90 THEN 'high' WHEN value > 50 THEN NULL ELSE 'low' END AS tier
FROM events WHERE event_id <= 30 ORDER BY event_id;
WITH ranked AS (
  SELECT c_custkey, c_mktsegment, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
)
SELECT a.c_mktsegment, a.c_custkey AS top1, b.c_custkey AS top2
FROM ranked a JOIN ranked b
  ON a.c_mktsegment = b.c_mktsegment AND a.rn = 1 AND b.rn = 2
ORDER BY a.c_mktsegment;
SELECT o_orderstatus, COUNT(*) AS n
FROM orders GROUP BY o_orderstatus ORDER BY COUNT(*) DESC, o_orderstatus;
SELECT c_nationkey, CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS bal
FROM customer GROUP BY c_nationkey ORDER BY bal DESC, c_nationkey LIMIT 10;
SELECT DISTINCT o_orderpriority FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
ORDER BY o_orderpriority;
SELECT user_id, COUNT(DISTINCT event_type) AS n_types
FROM events GROUP BY user_id
HAVING COUNT(DISTINCT event_type) >= 3
ORDER BY user_id;
SELECT s_suppkey, s_acctbal,
       CASE WHEN s_acctbal < 0 THEN 'debt'
            WHEN s_acctbal = 0 THEN 'zero'
            ELSE 'credit' END AS standing
FROM supplier WHERE s_suppkey <= 30 ORDER BY s_suppkey;
SELECT r_regionkey, (SELECT MIN(n_name) FROM nation WHERE n_regionkey = r_regionkey) AS first_nation
FROM region ORDER BY r_regionkey;
SELECT o_orderkey, o_totalprice
FROM orders o
WHERE o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
  AND o.o_custkey <= 50
ORDER BY o_orderkey;
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS disc_rev
FROM lineitem WHERE l_quantity BETWEEN 5 AND 45
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus;
SELECT p_size, COUNT(DISTINCT p_brand) AS n_brands
FROM part GROUP BY p_size HAVING COUNT(DISTINCT p_brand) > 3 ORDER BY p_size;
SELECT event_type, MIN(value) AS mn, MAX(value) AS mx
FROM events WHERE value IS NOT NULL GROUP BY event_type ORDER BY event_type;
SELECT c_custkey FROM customer
WHERE c_custkey BETWEEN 10 AND 60 AND c_custkey NOT BETWEEN 25 AND 40
ORDER BY c_custkey;
SELECT doc_id, n_chars,
       CASE WHEN n_chars >= 1000 THEN 'long' WHEN n_chars >= 300 THEN 'mid' ELSE 'short' END AS size_band
FROM documents WHERE doc_id <= 40 ORDER BY doc_id;
SELECT lang, COUNT(*) AS n,
       CAST(MIN(n_chars) AS BIGINT) AS mn, CAST(MAX(n_chars) AS BIGINT) AS mx
FROM documents GROUP BY lang ORDER BY lang;
SELECT a.vec_id AS v1, b.vec_id AS v2
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE a.label IS NOT NULL AND a.vec_id <= 20
ORDER BY v1, v2;
SELECT user_id,
       SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicks,
       SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS views
FROM events GROUP BY user_id
HAVING SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
     > SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
ORDER BY user_id;
SELECT o_orderkey FROM orders
WHERE EXTRACT(YEAR FROM o_orderdate) = 1997 AND o_orderstatus <> 'F' AND o_orderkey <= 5000
ORDER BY o_orderkey;
SELECT event_id, CAST(ts AS STRING) AS ts_s FROM events WHERE event_id <= 5 ORDER BY event_id;
SELECT user_id, event_id,
       COUNT(value) OVER (PARTITION BY user_id ORDER BY event_id
         ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS n_neighbors
FROM events WHERE user_id <= 4 AND value IS NOT NULL ORDER BY user_id, event_id;

-- tranche r5c: grouping sets/cube, window variants (ntile/percent_rank/
-- cume_dist/nth_value/lag-lead defaults/range frames), VALUES inline tables,
-- INTERSECT/EXCEPT ALL, string+numeric+date scalar functions, correlated
-- subquery shapes, boolean aggregates, derived-table set-op combos
SELECT o_orderstatus, o_orderpriority, GROUPING(o_orderstatus) AS g1, GROUPING(o_orderpriority) AS g2, COUNT(*) AS n
FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), (o_orderstatus, o_orderpriority), ())
ORDER BY g1, g2, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST;
SELECT l_returnflag, l_linestatus, GROUPING(l_returnflag) + GROUPING(l_linestatus) AS lvl, COUNT(*) AS n
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY lvl, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST;
SELECT event_type, GROUPING(event_type) AS g, COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS total
FROM events WHERE value IS NOT NULL GROUP BY ROLLUP (event_type)
ORDER BY g, event_type NULLS FIRST;
SELECT o_orderstatus, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr, GROUPING(o_orderstatus) AS gs, COUNT(*) AS n
FROM orders GROUP BY GROUPING SETS ((o_orderstatus, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)), (CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)))
ORDER BY gs, yr, o_orderstatus NULLS FIRST;
SELECT o_orderkey, NTILE(4) OVER (ORDER BY o_orderkey) AS quartile FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey;
SELECT o_orderkey, o_orderstatus, PERCENT_RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS pr
FROM orders WHERE o_orderkey <= 120 ORDER BY o_orderstatus, o_orderkey;
SELECT o_orderkey, CUME_DIST() OVER (ORDER BY o_orderkey) AS cd FROM orders WHERE o_orderkey <= 60 ORDER BY o_orderkey;
SELECT user_id, event_id, NTH_VALUE(event_id, 2) OVER (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_ev
FROM events WHERE user_id <= 3 ORDER BY user_id, event_id;
SELECT user_id, event_id, LAG(event_id, 2, -1) OVER (PARTITION BY user_id ORDER BY event_id) AS lag2
FROM events WHERE user_id <= 3 ORDER BY user_id, event_id;
SELECT user_id, event_id, LEAD(event_id, 3, 0) OVER (PARTITION BY user_id ORDER BY event_id) AS lead3
FROM events WHERE user_id <= 3 ORDER BY user_id, event_id;
SELECT o_orderkey, COUNT(*) OVER (ORDER BY o_orderkey RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS near_n
FROM orders WHERE o_orderkey <= 80 ORDER BY o_orderkey;
SELECT o_orderkey, MIN(o_orderkey) OVER (ORDER BY o_orderkey RANGE BETWEEN CURRENT ROW AND 10 FOLLOWING) AS next_min
FROM orders WHERE o_orderkey <= 80 ORDER BY o_orderkey;
SELECT user_id, event_id, FIRST_VALUE(event_id) OVER (PARTITION BY user_id ORDER BY event_id DESC) AS latest
FROM events WHERE user_id <= 4 ORDER BY user_id, event_id;
SELECT user_id, event_id, DENSE_RANK() OVER (PARTITION BY user_id ORDER BY event_type) AS type_rank
FROM events WHERE user_id <= 3 ORDER BY user_id, event_id;
SELECT t.k, t.v FROM (VALUES (1, 'a'), (2, 'b'), (3, 'c')) AS t(k, v) ORDER BY t.k;
SELECT n.n_name, t.code FROM nation n JOIN (VALUES (0, 'zero'), (1, 'one'), (2, 'two')) AS t(rk, code) ON n.n_regionkey = t.rk
ORDER BY n.n_name;
SELECT v.grp, COUNT(*) AS n FROM orders o JOIN (VALUES ('O', 'open'), ('F', 'final')) AS v(st, grp) ON o.o_orderstatus = v.st
GROUP BY v.grp ORDER BY v.grp;
SELECT k FROM (VALUES (1), (2), (2), (3)) AS t(k) GROUP BY k HAVING COUNT(*) = 1 ORDER BY k;
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' INTERSECT ALL SELECT o_custkey FROM orders WHERE o_totalprice > 1000 ORDER BY o_custkey;
SELECT o_custkey FROM orders EXCEPT ALL SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' ORDER BY o_custkey;
SELECT l_orderkey FROM lineitem WHERE l_linenumber = 1 EXCEPT ALL SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F' ORDER BY l_orderkey LIMIT 20;
SELECT n_name, LPAD(n_name, 12, '.') AS padded FROM nation ORDER BY n_name;
SELECT n_name, RPAD(n_name, 12, '-') AS padded FROM nation ORDER BY n_name;
SELECT r_name, REPEAT(r_name, 2) AS doubled FROM region ORDER BY r_name;
SELECT n_name, REVERSE(n_name) AS rev FROM nation ORDER BY n_name;
SELECT n_name, REPLACE(n_name, 'A', '@') AS repl FROM nation ORDER BY n_name;
SELECT n_name, TRANSLATE(n_name, 'AEIOU', 'aeiou') AS tr FROM nation ORDER BY n_name;
SELECT n_name, POSITION('A' IN n_name) AS pos_a FROM nation ORDER BY n_name;
SELECT CHR(65 + n_regionkey) AS letter, COUNT(*) AS n FROM nation GROUP BY CHR(65 + n_regionkey) ORDER BY letter;
SELECT n_name, MD5(n_name) AS h FROM nation ORDER BY n_name;
SELECT n_name, LEFT(n_name, 3) AS pfx, RIGHT(n_name, 3) AS sfx FROM nation ORDER BY n_name;
SELECT c_mktsegment, COUNT(*) AS n FROM customer WHERE POSITION('E' IN c_mktsegment) > 0 GROUP BY c_mktsegment ORDER BY c_mktsegment;
SELECT o_orderkey, ROUND(o_totalprice, -2) AS rounded_hundreds FROM orders WHERE o_orderkey <= 40 ORDER BY o_orderkey;
SELECT l_orderkey, l_linenumber, SIGN(l_extendedprice - 1000.0) AS sgn FROM lineitem WHERE l_orderkey <= 20 ORDER BY l_orderkey, l_linenumber;
SELECT n_nationkey, POWER(CAST(n_nationkey AS DOUBLE), 2.0) AS sq FROM nation ORDER BY n_nationkey;
SELECT n_nationkey, SQRT(CAST(n_nationkey AS DOUBLE)) AS rt FROM nation ORDER BY n_nationkey;
SELECT o_orderkey, LN(o_totalprice) AS ln_price, LOG10(o_totalprice) AS log_price FROM orders WHERE o_orderkey <= 30 AND o_totalprice > 0 ORDER BY o_orderkey;
SELECT o_orderkey, MOD(o_orderkey, 7) AS m7, ABS(MOD(o_orderkey, 7) - 3) AS dist3 FROM orders WHERE o_orderkey <= 50 ORDER BY o_orderkey;
SELECT FLOOR(o_totalprice / 10000.0) AS bucket, COUNT(*) AS n FROM orders GROUP BY FLOOR(o_totalprice / 10000.0) ORDER BY bucket;
SELECT CEIL(o_totalprice / 25000.0) AS bucket, COUNT(*) AS n FROM orders GROUP BY CEIL(o_totalprice / 25000.0) ORDER BY bucket;
SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS mo, COUNT(*) AS n FROM orders GROUP BY DATE_TRUNC('month', o_orderdate) ORDER BY mo;
SELECT CAST(DATE_TRUNC('quarter', o_orderdate) AS DATE) AS qtr, COUNT(*) AS n FROM orders GROUP BY DATE_TRUNC('quarter', o_orderdate) ORDER BY qtr;
SELECT o_orderkey, CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS DATE) AS month_end FROM orders WHERE o_orderkey <= 30 ORDER BY o_orderkey;
SELECT CAST(DATE_PART('year', o_orderdate) AS BIGINT) AS yr, CAST(DATE_PART('month', o_orderdate) AS BIGINT) AS mo, COUNT(*) AS n
FROM orders WHERE o_orderkey <= 500 GROUP BY DATE_PART('year', o_orderdate), DATE_PART('month', o_orderdate) ORDER BY yr, mo;
SELECT event_id, CAST(DATE_PART('hour', ts) AS BIGINT) AS hr FROM events WHERE event_id <= 30 ORDER BY event_id;
SELECT COUNT(*) AS n FROM orders WHERE o_orderdate + INTERVAL '90' DAY < TIMESTAMP '1999-01-01 00:00:00';
SELECT c_custkey, c_name FROM customer c
WHERE (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) >= 3 ORDER BY c_custkey LIMIT 25;
SELECT o_orderkey, o_totalprice FROM orders o
WHERE o_totalprice > (SELECT COALESCE(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
ORDER BY o_orderkey LIMIT 25;
SELECT n_name FROM nation n WHERE EXISTS (
  SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal < 0) ORDER BY n_name;
SELECT p_partkey, p_brand FROM part p WHERE NOT EXISTS (
  SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45) ORDER BY p_partkey LIMIT 30;
SELECT c_custkey FROM customer c WHERE c_acctbal > (
  SELECT COALESCE(MAX(o_totalprice), 0.0) FROM orders o WHERE o.o_custkey = c.c_custkey) / 100.0
ORDER BY c_custkey LIMIT 30;
SELECT s_suppkey, s_name FROM supplier s WHERE (
  SELECT COUNT(DISTINCT l_orderkey) FROM lineitem l WHERE l.l_suppkey = s.s_suppkey) BETWEEN 1 AND 50
ORDER BY s_suppkey LIMIT 30;
SELECT o_orderkey, CASE WHEN o_totalprice > 200000 THEN 'high' WHEN o_totalprice > 50000 THEN 'mid' ELSE 'low' END AS band
FROM orders WHERE o_orderkey <= 60 ORDER BY o_orderkey;
SELECT event_id, COALESCE(value, -1.0) AS v, NULLIF(event_type, 'click') AS et FROM events WHERE event_id <= 40 ORDER BY event_id;
SELECT user_id, COUNT(*) AS n, COUNT(CASE WHEN value IS NULL THEN 1 END) AS n_null_value
FROM events GROUP BY user_id HAVING COUNT(*) > 5 ORDER BY user_id;
SELECT o_orderstatus, CAST(SUM(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
       CAST(SUM(CASE WHEN o_totalprice <= 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_small
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT user_id, BOOL_AND(value IS NOT NULL) AS all_valued, BOOL_OR(event_type = 'click') AS any_click
FROM events WHERE user_id <= 10 GROUP BY user_id ORDER BY user_id;
SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp, COUNT(DISTINCT l_partkey) AS n_part
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag;
SELECT o_orderstatus, CAST(SUM(DISTINCT o_custkey) AS BIGINT) AS sum_distinct_cust FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT MIN(n_name) AS first_name, MAX(n_name) AS last_name, MIN(CAST(o_orderdate AS DATE)) AS first_dt, MAX(CAST(o_orderdate AS DATE)) AS last_dt
FROM nation, orders;
SELECT event_type, MIN(ts) AS first_ts, MAX(ts) AS last_ts FROM events GROUP BY event_type ORDER BY event_type;
SELECT d.yr, COUNT(*) AS n FROM (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr FROM orders WHERE o_orderstatus = 'O'
  UNION ALL
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr FROM orders WHERE o_orderstatus = 'F'
) d GROUP BY d.yr ORDER BY d.yr;
SELECT x.o_custkey FROM (
  SELECT o_custkey FROM orders WHERE o_totalprice > 150000
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
) x WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = x.o_custkey AND c.c_acctbal > 0)
ORDER BY x.o_custkey LIMIT 25;
SELECT t.band, COUNT(*) AS n FROM (
  SELECT CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS band FROM customer
) t GROUP BY t.band ORDER BY t.band;
SELECT a.n_name, b.n_name AS peer FROM nation a JOIN nation b
ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
WHERE a.n_regionkey <= 1 ORDER BY a.n_name, b.n_name;
SELECT u.user_id, u.n_events FROM (
  SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id
) u WHERE u.n_events > (SELECT CAST(COUNT(*) AS DOUBLE) FROM events) / (SELECT CAST(COUNT(DISTINCT user_id) AS DOUBLE) FROM events)
ORDER BY u.user_id LIMIT 30;
-- round-5 continuation tranche: FILTER-clause aggregates, grouping sets,
-- split_part/lpad string shapes, date_trunc ladders, frame-bounded windows
-- over integer sums, null-ordering + set-op compositions, documents/events
-- breadth. Shared Spark∩DuckDB dialect only.
SELECT o_orderpriority,
  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
  MAX(o_totalprice) FILTER (WHERE o_orderstatus = 'F') AS max_finished
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority;
SELECT l_returnflag,
  SUM(l_quantity) FILTER (WHERE l_discount > 0.05) AS qty_disc,
  SUM(l_quantity) FILTER (WHERE l_discount <= 0.05) AS qty_nodisc
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag;
SELECT c_mktsegment, COUNT(*) FILTER (WHERE c_acctbal < 0) AS n_neg,
  MIN(c_acctbal) AS min_bal
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment;
SELECT n_regionkey, n_name, COUNT(*) AS n FROM nation
GROUP BY GROUPING SETS ((n_regionkey, n_name), (n_regionkey), ())
ORDER BY n_regionkey NULLS LAST, n_name NULLS LAST;
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS LAST, o_orderpriority NULLS LAST;
SELECT l_returnflag, l_linestatus, COUNT(*) AS n
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST;
SELECT split_part(p_type, ' ', 1) AS head_word, COUNT(*) AS n
FROM part GROUP BY split_part(p_type, ' ', 1) ORDER BY head_word;
SELECT split_part(p_type, ' ', 3) AS tail_word, COUNT(*) AS n
FROM part GROUP BY split_part(p_type, ' ', 3) ORDER BY tail_word;
SELECT n_nationkey, lpad(n_name, 20, '_') AS padded
FROM nation ORDER BY n_nationkey;
SELECT s_suppkey, rpad(s_name, 30, '.') AS dotted
FROM supplier WHERE s_acctbal < 0 ORDER BY s_suppkey LIMIT 40;
SELECT p_brand, MIN(length(replace(p_type, ' ', ''))) AS min_squash,
  MAX(length(replace(p_type, ' ', ''))) AS max_squash
FROM part GROUP BY p_brand ORDER BY p_brand;
SELECT reverse(n_name) AS rev, n_nationkey FROM nation ORDER BY rev;
SELECT repeat(o_orderstatus, 3) AS tripled, COUNT(*) AS n
FROM orders GROUP BY o_orderstatus ORDER BY tripled;
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mo,
  COUNT(*) AS n_orders
FROM orders WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1998-01-01'
GROUP BY date_trunc('month', o_orderdate) ORDER BY mo;
SELECT CAST(date_trunc('quarter', o_orderdate) AS DATE) AS q, COUNT(*) AS n
FROM orders WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
GROUP BY date_trunc('quarter', o_orderdate) ORDER BY q;
SELECT CAST(last_day(o_orderdate) AS DATE) AS eom, COUNT(*) AS n
FROM orders WHERE o_orderdate >= DATE '1997-06-01' AND o_orderdate < DATE '1997-09-01'
GROUP BY last_day(o_orderdate) ORDER BY eom;
SELECT CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS yr,
  CAST(EXTRACT(month FROM l_shipdate) AS BIGINT) AS mo,
  SUM(l_quantity) AS qty
FROM lineitem WHERE l_shipdate >= DATE '1999-01-01' AND l_shipdate < DATE '1999-07-01'
GROUP BY EXTRACT(year FROM l_shipdate), EXTRACT(month FROM l_shipdate)
ORDER BY yr, mo;
SELECT o_orderkey, o_totalprice,
  ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile
FROM orders WHERE o_custkey < 50 ORDER BY o_orderkey LIMIT 60;
SELECT c_custkey, c_acctbal,
  cume_dist() OVER (ORDER BY c_acctbal, c_custkey) AS cd,
  percent_rank() OVER (ORDER BY c_acctbal, c_custkey) AS pr
FROM customer WHERE c_nationkey = 3 ORDER BY c_custkey LIMIT 50;
SELECT o_custkey, o_orderkey,
  lag(o_orderkey, 1, CAST(-1 AS BIGINT)) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_key,
  lead(o_orderkey, 2, CAST(-1 AS BIGINT)) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS next2_key
FROM orders WHERE o_custkey < 30 ORDER BY o_custkey, o_orderkey;
SELECT l_orderkey, l_linenumber,
  SUM(CAST(l_quantity AS BIGINT)) OVER (
    PARTITION BY l_orderkey ORDER BY l_linenumber
    ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS qty_win
FROM lineitem WHERE l_orderkey < 200 ORDER BY l_orderkey, l_linenumber;
SELECT l_orderkey, l_linenumber,
  MIN(l_linenumber) OVER (
    PARTITION BY l_orderkey ORDER BY l_linenumber
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_ln,
  MAX(l_linenumber) OVER (
    PARTITION BY l_orderkey ORDER BY l_linenumber
    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS last_ln
FROM lineitem WHERE l_orderkey < 150 ORDER BY l_orderkey, l_linenumber;
SELECT user_id, event_type, n FROM (
  SELECT user_id, event_type, COUNT(*) AS n,
    row_number() OVER (PARTITION BY user_id ORDER BY COUNT(*) DESC, event_type) AS rk
  FROM events GROUP BY user_id, event_type
) t WHERE rk = 1 AND user_id < 40 ORDER BY user_id;
SELECT event_type,
  COUNT(*) FILTER (WHERE value > CAST(50 AS DOUBLE)) AS n_hi,
  COUNT(*) FILTER (WHERE value <= CAST(50 AS DOUBLE)) AS n_lo
FROM events GROUP BY event_type ORDER BY event_type;
SELECT CAST(date_trunc('day', ts) AS DATE) AS d, COUNT(DISTINCT user_id) AS dau
FROM events GROUP BY date_trunc('day', ts) ORDER BY d LIMIT 40;
SELECT lang, source, COUNT(*) AS n, SUM(n_chars) AS chars
FROM documents GROUP BY ROLLUP (lang, source)
ORDER BY lang NULLS LAST, source NULLS LAST;
SELECT source, MIN(n_chars) AS mn, MAX(n_chars) AS mx,
  COUNT(*) FILTER (WHERE n_chars > 500) AS n_long
FROM documents GROUP BY source ORDER BY source;
SELECT d.lang, COUNT(*) AS n FROM documents d
WHERE EXISTS (SELECT 1 FROM documents e
              WHERE e.lang = d.lang AND e.n_chars > d.n_chars)
GROUP BY d.lang ORDER BY d.lang;
SELECT doc_id, n_chars FROM documents d
WHERE n_chars = (SELECT MAX(e.n_chars) FROM documents e WHERE e.lang = d.lang)
ORDER BY doc_id;
SELECT label, MIN(vec_id) AS lo, MAX(vec_id) AS hi,
  COUNT(*) FILTER (WHERE vec_id % 2 = 0) AS n_even
FROM embeddings GROUP BY label ORDER BY label;
SELECT label, COUNT(*) AS n, MIN(vec_id) AS first_vec
FROM embeddings GROUP BY label ORDER BY label;
SELECT r_name, t.n_nations FROM region r JOIN (
  SELECT n_regionkey, COUNT(*) AS n_nations FROM nation GROUP BY n_regionkey
) t ON t.n_regionkey = r.r_regionkey ORDER BY r_name;
SELECT c.c_custkey FROM customer c
WHERE c.c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 50000)
  AND c.c_custkey < 200
ORDER BY c.c_custkey;
SELECT o_orderpriority, COUNT(*) AS n FROM orders o
WHERE o.o_orderdate >= DATE '1997-03-01' AND o.o_orderdate < DATE '1997-06-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.08)
GROUP BY o_orderpriority ORDER BY o_orderpriority;
SELECT x.o_custkey, x.n FROM (
  SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey
  EXCEPT
  SELECT o_custkey, COUNT(*) AS n FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey
) x WHERE x.o_custkey < 100 ORDER BY x.o_custkey, x.n;
SELECT y.s_suppkey FROM (
  SELECT s_suppkey FROM supplier WHERE s_acctbal > 0
  INTERSECT
  SELECT s_suppkey FROM supplier WHERE s_nationkey < 13
) y ORDER BY y.s_suppkey LIMIT 50;
SELECT COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_alias, COUNT(*) AS n
FROM orders GROUP BY COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN')
ORDER BY status_alias;
SELECT p_brand,
  SUM(CASE WHEN p_size BETWEEN 1 AND 15 THEN 1 ELSE 0 END) AS n_small,
  SUM(CASE WHEN p_size BETWEEN 16 AND 35 THEN 1 ELSE 0 END) AS n_mid,
  SUM(CASE WHEN p_size > 35 THEN 1 ELSE 0 END) AS n_large
FROM part GROUP BY p_brand ORDER BY p_brand;
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, COUNT(*) AS n_pairs
FROM supplier s JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN customer c ON c.c_nationkey < 5
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE s.s_suppkey < 20
GROUP BY n1.n_name, n2.n_name ORDER BY supp_nation, cust_nation;
SELECT t.grp, SUM(t.cnt) AS total FROM (
  SELECT CASE WHEN o_totalprice < CAST(75000 AS DOUBLE) THEN 'lo'
              WHEN o_totalprice < CAST(150000 AS DOUBLE) THEN 'mid'
              ELSE 'hi' END AS grp, 1 AS cnt
  FROM orders
) t GROUP BY t.grp ORDER BY t.grp;
SELECT o_custkey,
  MAX(o_totalprice) - MIN(o_totalprice) AS price_span
FROM orders GROUP BY o_custkey
HAVING COUNT(*) >= 3 AND MAX(o_totalprice) - MIN(o_totalprice) > CAST(100000 AS DOUBLE)
ORDER BY o_custkey LIMIT 60;
SELECT a.p_brand, a.avg_sz FROM (
  SELECT p_brand, SUM(CAST(p_size AS BIGINT)) AS sum_sz,
         COUNT(*) AS n,
         CAST(SUM(CAST(p_size AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_sz
  FROM part GROUP BY p_brand
) a WHERE a.avg_sz > (
  SELECT CAST(SUM(CAST(p_size AS BIGINT)) AS DOUBLE) / COUNT(*) FROM part
) ORDER BY a.p_brand;
SELECT s.s_suppkey, s.s_name FROM supplier s
LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey AND n.n_regionkey = 2
WHERE n.n_nationkey IS NULL ORDER BY s.s_suppkey LIMIT 50;
SELECT c.c_mktsegment, COUNT(DISTINCT c.c_nationkey) AS n_nations
FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
WHERE o.o_orderdate >= DATE '1998-01-01'
GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment;
SELECT l_suppkey, COUNT(DISTINCT l_orderkey) AS n_orders
FROM lineitem WHERE l_shipdate >= DATE '2000-06-01'
GROUP BY l_suppkey HAVING COUNT(DISTINCT l_orderkey) > 5
ORDER BY n_orders DESC, l_suppkey LIMIT 40;
SELECT substr(c_name, 1, 9) AS name_head, COUNT(*) AS n
FROM customer GROUP BY substr(c_name, 1, 9) ORDER BY name_head LIMIT 30;
SELECT p_partkey FROM part
WHERE p_type LIKE '%BRASS%' OR p_type LIKE '%COPPER%'
ORDER BY p_partkey LIMIT 50;
SELECT d1.doc_id, d1.lang FROM documents d1
JOIN documents d2 ON d1.lang = d2.lang AND d1.doc_id < d2.doc_id
WHERE d1.n_chars = d2.n_chars ORDER BY d1.doc_id, d1.lang LIMIT 40;
SELECT u.event_type, u.mx - u.mn AS span FROM (
  SELECT event_type, MAX(value) AS mx, MIN(value) AS mn FROM events GROUP BY event_type
) u ORDER BY u.event_type;
SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hr, COUNT(*) AS n
FROM events GROUP BY EXTRACT(hour FROM ts) ORDER BY hr;
-- round-5 continuation tranche #2: correlated aggregates over derived
-- tables, anti/semi compositions with set ops, string-date hybrids,
-- multi-level HAVING, windowed gaps-and-islands lite, events/documents
-- cross-table shapes. Shared Spark∩DuckDB dialect only.
SELECT o.o_orderstatus, COUNT(*) AS n FROM orders o
WHERE o.o_totalprice > (
  SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(38,6))) / COUNT(*) AS DOUBLE)
  FROM orders i WHERE i.o_orderstatus = o.o_orderstatus
) GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus;
SELECT c.c_mktsegment, COUNT(*) AS n_above FROM customer c
WHERE c.c_acctbal > (
  SELECT CAST(SUM(CAST(i.c_acctbal AS DECIMAL(38,6))) / COUNT(*) AS DOUBLE)
  FROM customer i WHERE i.c_nationkey = c.c_nationkey
) GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment;
SELECT s.s_suppkey, s.s_acctbal FROM supplier s
WHERE s.s_acctbal > (SELECT MAX(i.s_acctbal) FROM supplier i
                     WHERE i.s_nationkey = s.s_nationkey AND i.s_suppkey <> s.s_suppkey)
ORDER BY s.s_suppkey;
SELECT t.n_name, t.n_cust FROM (
  SELECT n.n_name, COUNT(*) AS n_cust
  FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name
) t WHERE t.n_cust > (SELECT COUNT(*) FROM customer) / 30
ORDER BY t.n_name;
SELECT x.o_custkey FROM (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'P'
  EXCEPT
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
) x WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = x.o_custkey)
ORDER BY x.o_custkey LIMIT 40;
SELECT c.c_custkey FROM customer c
WHERE c.c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderdate >= DATE '1999-01-01')
  AND c.c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderdate < DATE '1996-01-01')
  AND c.c_custkey < 300
ORDER BY c.c_custkey;
SELECT upper(substr(n_name, 1, 3)) AS code, COUNT(*) AS n
FROM nation GROUP BY upper(substr(n_name, 1, 3)) ORDER BY code;
SELECT lower(trim(p_brand)) AS b, MIN(p_size) AS mn
FROM part GROUP BY lower(trim(p_brand)) ORDER BY b LIMIT 20;
SELECT length(c_name) AS name_len, COUNT(*) AS n
FROM customer GROUP BY length(c_name) ORDER BY name_len;
SELECT CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS dom, COUNT(*) AS n
FROM orders WHERE o_orderdate >= DATE '1997-05-01' AND o_orderdate < DATE '1997-06-01'
GROUP BY EXTRACT(day FROM o_orderdate) ORDER BY dom;
SELECT t.yr, t.n, t.n - lag(t.n, 1, CAST(0 AS BIGINT)) OVER (ORDER BY t.yr) AS delta
FROM (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY EXTRACT(year FROM o_orderdate)
) t ORDER BY t.yr;
SELECT u.user_id, u.first_ts, u.last_ts FROM (
  SELECT user_id, MIN(ts) AS first_ts, MAX(ts) AS last_ts FROM events GROUP BY user_id
) u WHERE u.user_id < 25 ORDER BY u.user_id;
SELECT e.event_type, COUNT(DISTINCT e.user_id) AS n_users,
  CAST(SUM(CAST(e.value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
FROM events e GROUP BY e.event_type
HAVING COUNT(DISTINCT e.user_id) > 10 ORDER BY e.event_type;
SELECT a.event_type AS et_a, b.event_type AS et_b, COUNT(*) AS n_users_both
FROM (SELECT DISTINCT user_id, event_type FROM events) a
JOIN (SELECT DISTINCT user_id, event_type FROM events) b
  ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY a.event_type, b.event_type ORDER BY et_a, et_b;
SELECT d.source, COUNT(*) AS n_docs,
  CAST(SUM(d.n_chars) AS BIGINT) AS chars,
  MIN(length(d.text)) AS shortest
FROM documents d WHERE d.lang = 'en'
GROUP BY d.source ORDER BY d.source;
SELECT d.doc_id FROM documents d
WHERE length(d.text) <> d.n_chars ORDER BY d.doc_id LIMIT 10;
SELECT t.lang, t.mx FROM (
  SELECT lang, MAX(n_chars) AS mx FROM documents GROUP BY lang
) t JOIN documents d ON d.lang = t.lang AND d.n_chars = t.mx
ORDER BY t.lang, t.mx;
SELECT o_orderkey, o_orderdate FROM orders
WHERE o_orderdate = DATE '1997-07-04' ORDER BY o_orderkey;
SELECT COUNT(*) AS n_leap FROM orders
WHERE EXTRACT(month FROM o_orderdate) = 2 AND EXTRACT(day FROM o_orderdate) = 29;
SELECT l_linestatus, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
       / CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS price_per_unit
FROM lineitem WHERE l_quantity > 0 GROUP BY l_linestatus ORDER BY l_linestatus;
SELECT r.r_name, COUNT(DISTINCT s.s_suppkey) AS n_supp,
  COUNT(DISTINCT c.c_custkey) AS n_cust
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey
LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
GROUP BY r.r_name ORDER BY r.r_name;
SELECT t.bucket, COUNT(*) AS n FROM (
  SELECT CASE WHEN length(p_name) < 20 THEN 'short'
              WHEN length(p_name) < 30 THEN 'mid' ELSE 'long' END AS bucket
  FROM part
) t GROUP BY t.bucket ORDER BY t.bucket;
SELECT p.p_brand, x.top_price FROM (
  SELECT p_brand AS b, MAX(p_retailprice) AS top_price FROM part GROUP BY p_brand
) x JOIN part p ON p.p_brand = x.b AND p.p_retailprice = x.top_price
ORDER BY p.p_brand, x.top_price;
SELECT o_orderstatus,
  MIN(o_orderdate) AS first_d, MAX(o_orderdate) AS last_d,
  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT w.o_custkey, w.rk FROM (
  SELECT o_custkey, o_orderkey,
    dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
) w WHERE w.rk = 2 AND w.o_custkey < 60 ORDER BY w.o_custkey, w.rk;
SELECT s.s_nationkey, COUNT(*) AS n FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name LIKE '%A%' GROUP BY s.s_nationkey
HAVING COUNT(*) BETWEEN 2 AND 100 ORDER BY s.s_nationkey;
SELECT x.et, x.hr, x.n FROM (
  SELECT event_type AS et, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hr,
         CAST(COUNT(*) AS BIGINT) AS n,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY COUNT(*) DESC, EXTRACT(hour FROM ts)) AS rk
  FROM events GROUP BY event_type, EXTRACT(hour FROM ts)
) x WHERE x.rk <= 2 ORDER BY x.et, x.n DESC, x.hr;
SELECT c_nationkey,
  CAST(SUM(CASE WHEN c_acctbal >= 0 THEN CAST(c_acctbal AS DECIMAL(38,6))
                ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) AS pos_bal,
  CAST(SUM(CASE WHEN c_acctbal < 0 THEN CAST(c_acctbal AS DECIMAL(38,6))
                ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) AS neg_bal
FROM customer GROUP BY c_nationkey ORDER BY c_nationkey;
SELECT t.od, t.n FROM (
  SELECT o_orderdate AS od, COUNT(*) AS n FROM orders GROUP BY o_orderdate
) t WHERE t.n >= 3 ORDER BY t.od LIMIT 40;
SELECT l_orderkey, COUNT(*) AS n_lines,
  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
FROM lineitem GROUP BY l_orderkey
HAVING COUNT(*) = 7 ORDER BY l_orderkey LIMIT 30;
SELECT n.n_name FROM nation n
WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey
                  AND s.s_acctbal < 0)
ORDER BY n.n_name;
SELECT p_type, COUNT(*) AS n FROM part
WHERE p_type LIKE 'STANDARD%' OR p_type LIKE 'SMALL%'
GROUP BY p_type ORDER BY p_type;
SELECT c.c_custkey, o.n_orders FROM customer c
JOIN (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY o_custkey) o ON o.o_custkey = c.c_custkey
WHERE c.c_acctbal < 0 AND o.n_orders > 20 ORDER BY c.c_custkey;
SELECT t.seg, t.band, t.n FROM (
  SELECT c_mktsegment AS seg,
         CASE WHEN c_acctbal < 0 THEN 'neg'
              WHEN c_acctbal < 4500 THEN 'low' ELSE 'high' END AS band,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM customer GROUP BY c_mktsegment,
    CASE WHEN c_acctbal < 0 THEN 'neg'
         WHEN c_acctbal < 4500 THEN 'low' ELSE 'high' END
) t ORDER BY t.seg, t.band;
SELECT COALESCE(t.lang, 'ALL') AS lang_group, t.n FROM (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY ROLLUP (lang)
) t ORDER BY lang_group;
SELECT d.doc_id, d.n_chars,
  CAST(SUM(d.n_chars) OVER (PARTITION BY d.lang ORDER BY d.doc_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_chars
FROM documents d WHERE d.lang = 'de' ORDER BY d.doc_id LIMIT 50;
SELECT a.n_name, COUNT(DISTINCT s.s_suppkey) AS n FROM nation a
JOIN supplier s ON s.s_nationkey = a.n_nationkey
JOIN lineitem l ON l.l_suppkey = s.s_suppkey
WHERE l.l_shipdate >= DATE '2001-01-01'
GROUP BY a.n_name ORDER BY a.n_name;
SELECT t.q, CAST(COUNT(*) AS BIGINT) AS n FROM (
  SELECT CAST(EXTRACT(quarter FROM ts) AS BIGINT) AS q FROM events
) t GROUP BY t.q ORDER BY t.q;
SELECT o.o_orderkey FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderkey, o.o_totalprice
HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) > o.o_totalprice
ORDER BY o.o_orderkey LIMIT 40;
SELECT p.p_size, s.n_supp FROM (SELECT DISTINCT p_size FROM part) p
LEFT JOIN (
  SELECT ps.p_size, CAST(COUNT(*) AS BIGINT) AS n_supp
  FROM part ps JOIN supplier su ON su.s_suppkey = ps.p_partkey % 100 + 1
  GROUP BY ps.p_size
) s ON s.p_size = p.p_size
ORDER BY p.p_size LIMIT 30;
SELECT x.user_id FROM (
  SELECT user_id FROM events WHERE event_type = 'click'
  INTERSECT
  SELECT user_id FROM events WHERE event_type = 'view'
) x ORDER BY x.user_id LIMIT 50;
-- round-5 continuation tranche #3: nested set-ops, HAVING-over-window-free
-- rollups, multi-join chains with selective dims, CASE-in-join residuals,
-- COALESCE/NULLIF arithmetic, string concat groupings, timestamp ladders.
SELECT t.k, t.n FROM (
  SELECT o_custkey AS k, COUNT(*) AS n FROM orders GROUP BY o_custkey
  UNION ALL
  SELECT c_custkey AS k, 0 AS n FROM customer
  WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
) t WHERE t.k < 80 ORDER BY t.k, t.n;
SELECT x.seg FROM (
  SELECT DISTINCT c_mktsegment AS seg FROM customer
  INTERSECT
  SELECT DISTINCT c_mktsegment FROM customer WHERE c_acctbal < 0
) x ORDER BY x.seg;
SELECT n.n_name, COALESCE(s.total, CAST(0 AS DOUBLE)) AS supp_bal
FROM nation n LEFT JOIN (
  SELECT s_nationkey, CAST(SUM(CAST(s_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total
  FROM supplier GROUP BY s_nationkey
) s ON s.s_nationkey = n.n_nationkey
ORDER BY n.n_name;
SELECT c_nationkey, COUNT(NULLIF(c_mktsegment, 'BUILDING')) AS n_nonbuilding,
  COUNT(*) AS n_all
FROM customer GROUP BY c_nationkey ORDER BY c_nationkey;
SELECT CONCAT(o_orderstatus, '-', o_orderpriority) AS tag, COUNT(*) AS n
FROM orders GROUP BY CONCAT(o_orderstatus, '-', o_orderpriority)
ORDER BY tag;
SELECT r.r_name || '/' || n.n_name AS rn, COUNT(s.s_suppkey) AS n_supp
FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey
GROUP BY r.r_name || '/' || n.n_name ORDER BY rn;
SELECT l.l_returnflag, o.o_orderstatus,
  CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderdate >= DATE '1998-06-01' AND o.o_orderdate < DATE '1998-09-01'
GROUP BY l.l_returnflag, o.o_orderstatus
ORDER BY l.l_returnflag, o.o_orderstatus;
SELECT p.p_brand, COUNT(DISTINCT l.l_orderkey) AS n_orders
FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
WHERE p.p_size <= 5 GROUP BY p.p_brand
ORDER BY n_orders DESC, p.p_brand LIMIT 15;
SELECT t.pri, t.half, t.n FROM (
  SELECT o_orderpriority AS pri,
         CASE WHEN EXTRACT(month FROM o_orderdate) <= 6 THEN 'H1' ELSE 'H2' END AS half,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1998
  GROUP BY o_orderpriority,
    CASE WHEN EXTRACT(month FROM o_orderdate) <= 6 THEN 'H1' ELSE 'H2' END
) t ORDER BY t.pri, t.half;
SELECT o_custkey FROM orders GROUP BY o_custkey
HAVING MIN(o_orderdate) >= DATE '1998-01-01' ORDER BY o_custkey LIMIT 50;
SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey
HAVING MAX(o_totalprice) < CAST(50000 AS DOUBLE) AND COUNT(*) >= 2
ORDER BY o_custkey LIMIT 40;
SELECT CAST(date_trunc('week', ts) AS DATE) AS wk,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  COUNT(DISTINCT user_id) AS wau
FROM events GROUP BY date_trunc('week', ts) ORDER BY wk LIMIT 30;
SELECT user_id,
  CAST(MIN(EXTRACT(hour FROM ts)) AS BIGINT) AS first_hr,
  CAST(MAX(EXTRACT(hour FROM ts)) AS BIGINT) AS last_hr
FROM events WHERE user_id < 20 GROUP BY user_id ORDER BY user_id;
SELECT e.user_id, e.n_types FROM (
  SELECT user_id, COUNT(DISTINCT event_type) AS n_types FROM events GROUP BY user_id
) e JOIN (SELECT COUNT(DISTINCT event_type) AS total FROM events) t
ON e.n_types = t.total
ORDER BY e.user_id LIMIT 40;
SELECT d.lang, CAST(SUM(CASE WHEN d.n_chars > 1000 THEN 1 ELSE 0 END) AS BIGINT) AS n_long,
  CAST(SUM(CASE WHEN d.n_chars <= 1000 THEN 1 ELSE 0 END) AS BIGINT) AS n_short
FROM documents d GROUP BY d.lang ORDER BY d.lang;
SELECT t.src, t.p90_len FROM (
  SELECT source AS src, MAX(n_chars) AS p90_len,
         row_number() OVER (ORDER BY MAX(n_chars) DESC, source) AS rk
  FROM documents GROUP BY source
) t WHERE t.rk <= 3 ORDER BY t.src;
SELECT s.s_suppkey FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA' AND s.s_acctbal > (
  SELECT CAST(SUM(CAST(i.s_acctbal AS DECIMAL(38,6))) / COUNT(*) AS DOUBLE)
  FROM supplier i
) ORDER BY s.s_suppkey LIMIT 40;
SELECT a.p_size, b.p_size AS peer_size, COUNT(*) AS n
FROM part a JOIN part b
ON a.p_brand = b.p_brand AND a.p_size = b.p_size - 1
WHERE a.p_brand = 'Brand#11'
GROUP BY a.p_size, b.p_size ORDER BY a.p_size;
SELECT x.status_pair, x.n FROM (
  SELECT CONCAT(l_returnflag, l_linestatus) AS status_pair, CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem GROUP BY CONCAT(l_returnflag, l_linestatus)
) x WHERE x.n > 100 ORDER BY x.status_pair;
SELECT o.yr, o.top_pri FROM (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
         MAX(o_orderpriority) AS top_pri
  FROM orders GROUP BY EXTRACT(year FROM o_orderdate)
) o ORDER BY o.yr;
SELECT l_suppkey, l_returnflag,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS net
FROM lineitem WHERE l_suppkey < 10
GROUP BY l_suppkey, l_returnflag ORDER BY l_suppkey, l_returnflag;
SELECT c.c_custkey, c.c_acctbal FROM customer c
WHERE c.c_acctbal BETWEEN CAST(-10 AS DOUBLE) AND CAST(10 AS DOUBLE)
ORDER BY c.c_custkey;
SELECT t.b, COUNT(*) AS n FROM (
  SELECT CAST(floor(o_totalprice) AS BIGINT) % 10 AS b FROM orders
) t GROUP BY t.b ORDER BY t.b;
SELECT d.doc_id FROM documents d
WHERE d.text LIKE '%the%' AND d.text LIKE '%and%' AND d.lang = 'en'
ORDER BY d.doc_id LIMIT 60;
SELECT u.od FROM (
  SELECT DISTINCT o_orderdate AS od FROM orders WHERE o_orderstatus = 'P'
  EXCEPT
  SELECT DISTINCT o_orderdate FROM orders WHERE o_orderstatus = 'O'
) u ORDER BY u.od LIMIT 30;
SELECT n_regionkey, COUNT(*) AS n,
  CAST(SUM(length(n_name)) AS BIGINT) AS name_chars
FROM nation GROUP BY n_regionkey
HAVING COUNT(*) = 5 ORDER BY n_regionkey;
SELECT t.custband, t.n FROM (
  SELECT CASE WHEN o_custkey % 100 < 10 THEN 'low-id'
              WHEN o_custkey % 100 < 50 THEN 'mid-id' ELSE 'high-id' END AS custband,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY CASE WHEN o_custkey % 100 < 10 THEN 'low-id'
                            WHEN o_custkey % 100 < 50 THEN 'mid-id' ELSE 'high-id' END
) t ORDER BY t.custband;
SELECT p_type, MIN(p_retailprice) AS mn, MAX(p_retailprice) AS mx
FROM part GROUP BY p_type
HAVING MAX(p_retailprice) - MIN(p_retailprice) > CAST(500 AS DOUBLE)
ORDER BY p_type LIMIT 25;
SELECT w.user_id, w.ts, w.nxt FROM (
  SELECT user_id, ts, lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
) w WHERE w.user_id < 8 AND w.nxt IS NOT NULL ORDER BY w.user_id, w.ts LIMIT 60;
SELECT v.vec_id FROM embeddings v
WHERE v.label = (SELECT MIN(label) FROM embeddings)
ORDER BY v.vec_id LIMIT 40;
-- round-5 continuation tranche #4: numeric functions (abs/greatest/least/
-- sign/mod), string search (instr/ltrim/rtrim/ascii), date inequality
-- self-joins, EXISTS-with-aggregate correlations, UNION typed literals.
SELECT n_nationkey, abs(n_nationkey - 12) AS dist FROM nation ORDER BY dist, n_nationkey;
SELECT o_orderkey, greatest(o_totalprice, CAST(100000 AS DOUBLE)) AS floor_px,
  least(o_totalprice, CAST(200000 AS DOUBLE)) AS cap_px
FROM orders WHERE o_custkey = 7 ORDER BY o_orderkey;
SELECT sign(c_acctbal) AS sgn, COUNT(*) AS n FROM customer GROUP BY sign(c_acctbal) ORDER BY sgn;
SELECT p_partkey % 7 AS m, COUNT(*) AS n FROM part GROUP BY p_partkey % 7 ORDER BY m;
SELECT s_suppkey, instr(s_name, '#') AS hash_pos FROM supplier
WHERE s_suppkey <= 30 ORDER BY s_suppkey;
SELECT ltrim(rtrim(n_name)) AS nm, length(n_name) AS raw_len FROM nation ORDER BY nm;
SELECT ascii(substr(c_name, 1, 1)) AS first_cp, COUNT(*) AS n
FROM customer GROUP BY ascii(substr(c_name, 1, 1)) ORDER BY first_cp;
SELECT a.o_orderkey, b.o_orderkey AS later_key FROM orders a JOIN orders b
ON a.o_custkey = b.o_custkey AND a.o_orderdate < b.o_orderdate
WHERE a.o_custkey = 5 ORDER BY a.o_orderkey, later_key;
SELECT o.o_custkey, COUNT(*) AS n FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
  GROUP BY l.l_orderkey HAVING COUNT(*) >= 6
) GROUP BY o.o_custkey ORDER BY n DESC, o.o_custkey LIMIT 30;
SELECT t.tag, t.v FROM (
  SELECT 'max_price' AS tag, CAST(MAX(o_totalprice) AS DOUBLE) AS v FROM orders
  UNION ALL
  SELECT 'min_price' AS tag, CAST(MIN(o_totalprice) AS DOUBLE) AS v FROM orders
  UNION ALL
  SELECT 'n_orders' AS tag, CAST(COUNT(*) AS DOUBLE) AS v FROM orders
) t ORDER BY t.tag;
SELECT c.c_nationkey, x.mx FROM customer c JOIN (
  SELECT c_nationkey AS nk, MAX(c_acctbal) AS mx FROM customer GROUP BY c_nationkey
) x ON x.nk = c.c_nationkey AND x.mx = c.c_acctbal
ORDER BY c.c_nationkey, x.mx;
SELECT l_orderkey, MAX(l_linenumber) AS n_lines FROM lineitem
GROUP BY l_orderkey HAVING MAX(l_linenumber) <> COUNT(*)
ORDER BY l_orderkey LIMIT 10;
SELECT d.lang, MIN(d.doc_id) AS first_doc, MAX(d.doc_id) AS last_doc
FROM documents d GROUP BY d.lang ORDER BY d.lang;
SELECT e.event_type, CAST(MIN(e.value) AS DOUBLE) AS mn
FROM events e WHERE e.value > CAST(0 AS DOUBLE)
GROUP BY e.event_type ORDER BY e.event_type;
SELECT u.b, COUNT(*) AS n FROM (
  SELECT CASE WHEN value < CAST(10 AS DOUBLE) THEN 0
              WHEN value < CAST(100 AS DOUBLE) THEN 1 ELSE 2 END AS b
  FROM events
) u GROUP BY u.b ORDER BY u.b;
SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n FROM orders
WHERE o_orderdate BETWEEN DATE '1996-03-01' AND DATE '1996-03-31'
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
ORDER BY o_orderpriority NULLS LAST, o_orderstatus NULLS LAST, n;
SELECT x.rng, COUNT(*) AS n FROM (
  SELECT CAST(floor(s_acctbal / 1000) AS BIGINT) AS rng FROM supplier
) x GROUP BY x.rng ORDER BY x.rng;
SELECT p_brand, p_type, p_size FROM part
WHERE p_brand = 'Brand#23' AND p_size IN (1, 14, 23, 45)
ORDER BY p_type, p_size LIMIT 30;
SELECT c_mktsegment, MIN(length(c_name)) AS mn_len, MAX(length(c_name)) AS mx_len
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment;
SELECT t.yr, t.pri, t.n, rank() OVER (PARTITION BY t.yr ORDER BY t.n DESC, t.pri) AS rk
FROM (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
         o_orderpriority AS pri, CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY EXTRACT(year FROM o_orderdate), o_orderpriority
) t ORDER BY t.yr, rk LIMIT 60;

-- round-5 tranche (continuation g): correlated EXISTS x set ops,
-- correlated scalar subqueries, window variants (dense_rank/lead-lag
-- defaults/first-last-nth value/frames/percent_rank), nested derived
-- tables, ROLLUP/CUBE/GROUPING SETS with GROUPING() flags, string
-- compositions, NULL-ordering sorts, set ops over aggregates,
-- quarter/day/date_trunc date shapes, join diversity, numeric edges,
-- IN/NOT-IN subqueries, documents/events corpus shapes
SELECT c_custkey, c_mktsegment FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT')
EXCEPT
SELECT c_custkey, c_mktsegment FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
              AND o.o_orderstatus = 'F')
ORDER BY c_custkey LIMIT 40;
SELECT n_name FROM nation n
WHERE EXISTS (SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey)
INTERSECT
SELECT n_name FROM nation n
WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey
              AND c.c_acctbal > CAST(9000 AS DOUBLE))
ORDER BY n_name;
SELECT o_orderkey FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
                  AND l.l_discount > CAST(0.05 AS DOUBLE))
  AND o.o_orderstatus = 'O'
ORDER BY o_orderkey LIMIT 50;
SELECT c.c_custkey,
       (SELECT CAST(MAX(o.o_totalprice) AS DOUBLE) FROM orders o
        WHERE o.o_custkey = c.c_custkey) AS max_spend
FROM customer c WHERE c.c_acctbal < CAST(0 AS DOUBLE)
ORDER BY c.c_custkey LIMIT 60;
SELECT l_orderkey, l_linenumber,
       dense_rank() OVER (PARTITION BY l_orderkey ORDER BY l_quantity DESC, l_linenumber) AS dr
FROM lineitem WHERE l_orderkey < 200 ORDER BY l_orderkey, l_linenumber;
SELECT o_custkey, o_orderkey,
       lead(o_orderkey, 1, CAST(-1 AS BIGINT)) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS next_key,
       lag(o_orderkey, 2, CAST(-1 AS BIGINT)) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev2_key
FROM orders WHERE o_custkey < 100 ORDER BY o_custkey, o_orderkey;
SELECT t.o_custkey, t.o_orderkey, t.fv, t.lv FROM (
  SELECT o_custkey, o_orderkey,
         first_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS fv,
         last_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv
  FROM orders WHERE o_custkey < 80
) t ORDER BY t.o_custkey, t.o_orderkey;
SELECT t.o_custkey, t.o_orderkey, t.nv FROM (
  SELECT o_custkey, o_orderkey,
         nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS nv
  FROM orders WHERE o_custkey < 80
) t ORDER BY t.o_custkey, t.o_orderkey;
SELECT x.grp, x.k, x.cume FROM (
  SELECT o_orderstatus AS grp, o_orderkey AS k,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
           PARTITION BY o_orderstatus ORDER BY o_orderkey
           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS cume
  FROM orders WHERE o_orderkey < 400
) x ORDER BY x.grp, x.k;
SELECT y.pri, y.k, y.pr FROM (
  SELECT o_orderpriority AS pri, o_orderkey AS k,
         percent_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey) AS pr
  FROM orders WHERE o_orderkey < 300
) y ORDER BY y.pri, y.k;
SELECT z.seg, CAST(z.n AS BIGINT) AS n, CAST(z.tot AS DOUBLE) AS tot FROM (
  SELECT seg, COUNT(*) AS n, SUM(per_cust) AS tot FROM (
    SELECT c.c_mktsegment AS seg, c.c_custkey,
           SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS per_cust
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment, c.c_custkey
  ) inner_t GROUP BY seg
) z ORDER BY z.seg;
SELECT w.brand, w.mx - w.mn AS spread FROM (
  SELECT p_brand AS brand, MIN(p_retailprice) AS mn, MAX(p_retailprice) AS mx
  FROM part GROUP BY p_brand
) w WHERE w.mx - w.mn > CAST(500 AS DOUBLE) ORDER BY w.brand;
SELECT v.rf, v.ls, v.q25ish FROM (
  SELECT l_returnflag AS rf, l_linestatus AS ls,
         CAST(MIN(CASE WHEN l_quantity > CAST(25 AS DOUBLE) THEN l_quantity END) AS DOUBLE) AS q25ish
  FROM lineitem GROUP BY l_returnflag, l_linestatus
) v ORDER BY v.rf, v.ls;
SELECT coalesce(o_orderstatus, 'ALL') AS st, coalesce(o_orderpriority, 'ALL') AS pri,
       CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_st,
       CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_pri,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY st, pri, g_st, g_pri;
SELECT coalesce(n_name, 'ALL') AS nname, coalesce(r_name, 'ALL') AS rname,
       CAST(COUNT(*) AS BIGINT) AS n
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((n_name), (r_name), ())
ORDER BY nname, rname;
SELECT c_custkey, upper(substr(c_name, 1, 8)) AS pfx,
       lpad(CAST(c_custkey AS STRING), 8, '0') AS padded,
       reverse(lower(c_mktsegment)) AS rseg
FROM customer WHERE c_custkey <= 40 ORDER BY c_custkey;
SELECT s_suppkey, concat(s_name, ':', CAST(s_nationkey AS STRING)) AS tag,
       repeat('-', CAST(s_suppkey % 4 AS INTEGER)) AS dashes
FROM supplier WHERE s_suppkey <= 30 ORDER BY s_suppkey;
SELECT n_name, rpad(n_name, 20, '.') AS padded, substr(n_name, 2) AS tail_s
FROM nation ORDER BY n_name;
SELECT o_orderkey,
       nullif(o_orderstatus, 'O') AS status_or_null,
       coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_label
FROM orders WHERE o_orderkey < 120 ORDER BY o_orderkey;
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_discount = CAST(0 AS DOUBLE) THEN 'none'
            WHEN l_discount < CAST(0.05 AS DOUBLE) THEN 'low'
            WHEN l_discount < CAST(0.08 AS DOUBLE) THEN 'mid'
            ELSE 'high' END AS disc_band
FROM lineitem WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber;
SELECT e.event_type,
       CAST(SUM(CASE WHEN e.value > CAST(500 AS DOUBLE) THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
       CAST(SUM(CASE WHEN e.value <= CAST(500 AS DOUBLE) THEN 1 ELSE 0 END) AS BIGINT) AS n_small
FROM events e GROUP BY e.event_type ORDER BY e.event_type;
SELECT t.k, t.v FROM (
  SELECT o_orderkey AS k, nullif(o_orderpriority, '3-MEDIUM') AS v
  FROM orders WHERE o_orderkey < 150
) t ORDER BY t.v ASC NULLS FIRST, t.k LIMIT 60;
SELECT t.k, t.v FROM (
  SELECT o_orderkey AS k, nullif(o_orderpriority, '3-MEDIUM') AS v
  FROM orders WHERE o_orderkey < 150
) t ORDER BY t.v DESC NULLS LAST, t.k LIMIT 60;
SELECT o_orderpriority AS k, CAST(COUNT(*) AS BIGINT) AS n FROM orders
WHERE o_orderstatus = 'O' GROUP BY o_orderpriority
UNION ALL
SELECT o_orderpriority AS k, CAST(COUNT(*) AS BIGINT) AS n FROM orders
WHERE o_orderstatus = 'F' GROUP BY o_orderpriority
ORDER BY k, n;
SELECT c_nationkey FROM customer
EXCEPT ALL
SELECT s_nationkey FROM supplier
ORDER BY c_nationkey LIMIT 80;
SELECT CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS q,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS rev
FROM orders GROUP BY EXTRACT(quarter FROM o_orderdate) ORDER BY q;
SELECT CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS yr,
       CAST(EXTRACT(month FROM l_shipdate) AS BIGINT) AS mo,
       CAST(MIN(l_quantity) AS DOUBLE) AS mn_qty
FROM lineitem WHERE l_orderkey < 2000
GROUP BY EXTRACT(year FROM l_shipdate), EXTRACT(month FROM l_shipdate)
ORDER BY yr, mo;
SELECT CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS dom,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders WHERE o_orderdate >= TIMESTAMP '1997-06-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
GROUP BY EXTRACT(day FROM o_orderdate) ORDER BY dom;
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, CAST(COUNT(*) AS BIGINT) AS n
FROM supplier s JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN customer c ON c.c_nationkey <> s.s_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE s.s_suppkey < 5 AND c.c_custkey < 40
GROUP BY n1.n_name, n2.n_name ORDER BY supp_nation, cust_nation;
SELECT r.r_name, CAST(COUNT(DISTINCT s.s_suppkey) AS BIGINT) AS n_supp
FROM region r LEFT JOIN nation n ON n.n_regionkey = r.r_regionkey
LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey
GROUP BY r.r_name ORDER BY r.r_name;
SELECT o.o_orderkey, l.l_linenumber
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  AND l.l_quantity > CAST(49 AS DOUBLE)
WHERE o.o_orderkey < 3000
ORDER BY o.o_orderkey, l.l_linenumber LIMIT 80;
SELECT c.c_custkey FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
WHERE o.o_orderkey IS NULL AND c.c_custkey < 300 ORDER BY c.c_custkey;
SELECT l_orderkey, l_linenumber,
       CAST(l_extendedprice AS DECIMAL(38,6)) * CAST(1 - l_discount AS DECIMAL(38,6)) AS disc_price_dec
FROM lineitem WHERE l_orderkey < 60 ORDER BY l_orderkey, l_linenumber;
SELECT p_partkey, p_retailprice,
       CAST(round(p_retailprice, 1) AS DOUBLE) AS r1,
       CAST(floor(p_retailprice) AS DOUBLE) AS fl,
       CAST(ceil(p_retailprice) AS DOUBLE) AS ce
FROM part WHERE p_partkey <= 40 ORDER BY p_partkey;
SELECT o_orderkey, o_orderkey % 7 AS m7, abs(o_orderkey - 500) AS dist
FROM orders WHERE o_orderkey < 220 ORDER BY o_orderkey;
SELECT greatest(l_quantity, CAST(25 AS DOUBLE)) AS g25,
       least(l_discount, CAST(0.05 AS DOUBLE)) AS l5,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem WHERE l_orderkey < 500
GROUP BY greatest(l_quantity, CAST(25 AS DOUBLE)), least(l_discount, CAST(0.05 AS DOUBLE))
ORDER BY g25, l5;
SELECT n_nationkey, n_name FROM nation
WHERE n_nationkey NOT IN (SELECT DISTINCT s_nationkey FROM supplier)
ORDER BY n_nationkey;
SELECT o_orderkey FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
  AND o_orderstatus = 'P'
ORDER BY o_orderkey LIMIT 60;
SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(d.n_chars) AS BIGINT) AS mn_chars,
       CAST(MAX(d.n_chars) AS BIGINT) AS mx_chars
FROM documents d GROUP BY d.source ORDER BY d.source;
SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN d.n_chars > 400 THEN 1 ELSE 0 END) AS BIGINT) AS n_long
FROM documents d GROUP BY d.lang ORDER BY d.lang;
SELECT u.hour_part, CAST(COUNT(*) AS BIGINT) AS n FROM (
  SELECT CAST(EXTRACT(hour FROM e.ts) AS BIGINT) AS hour_part FROM events e
) u GROUP BY u.hour_part ORDER BY u.hour_part;
SELECT e.user_id, CAST(COUNT(DISTINCT e.event_type) AS BIGINT) AS n_types
FROM events e GROUP BY e.user_id HAVING COUNT(DISTINCT e.event_type) >= 4
ORDER BY e.user_id LIMIT 60;
SELECT p.p_partkey, p.p_brand,
       (SELECT CAST(MIN(l.l_extendedprice) AS DOUBLE) FROM lineitem l
        WHERE l.l_partkey = p.p_partkey) AS min_price
FROM part p WHERE p.p_size = 14 ORDER BY p.p_partkey LIMIT 40;
SELECT s.s_suppkey, s.s_name,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
        WHERE l.l_suppkey = s.s_suppkey) AS n_items
FROM supplier s ORDER BY s.s_suppkey LIMIT 40;
SELECT l_returnflag FROM lineitem WHERE l_quantity > CAST(45 AS DOUBLE)
INTERSECT
SELECT l_returnflag FROM lineitem WHERE l_discount > CAST(0.09 AS DOUBLE)
ORDER BY l_returnflag;
SELECT p_partkey, replace(p_type, ' ', '_') AS t_u,
       instr(p_type, 'BRASS') AS brass_at,
       CAST(length(trim(p_name)) AS BIGINT) AS c_len
FROM part WHERE p_partkey <= 50 ORDER BY p_partkey;
SELECT coalesce(l_returnflag, '?') AS rf, coalesce(l_linestatus, '?') AS ls2,
       CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
       CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS rev
FROM lineitem WHERE l_orderkey < 1000
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY rf, ls2, g_rf, g_ls;
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m, CAST(COUNT(*) AS BIGINT) AS n
FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
GROUP BY date_trunc('month', o_orderdate) ORDER BY m;
SELECT p_partkey, p_brand FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_extendedprice < CAST(1200 AS DOUBLE))
ORDER BY p_partkey LIMIT 50;

-- round-5 tranche (continuation h): anti-join/existence composition,
-- HAVING over composed aggregates, CASE-in-aggregate splits, multi-way
-- UNION dedup, windows partitioned by derived expressions, expression
-- joins, distinct-count over join chains, string predicate composition,
-- documents text functions, nested scalar subqueries, events shapes
SELECT s.s_suppkey, s.s_name FROM supplier s
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey
                  AND l.l_returnflag = 'R')
ORDER BY s.s_suppkey LIMIT 40;
SELECT c.c_custkey FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_totalprice > CAST(200000 AS DOUBLE))
ORDER BY c.c_custkey LIMIT 70;
SELECT p.p_brand, CAST(COUNT(*) AS BIGINT) AS n FROM part p
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey
              AND l.l_quantity >= CAST(48 AS DOUBLE))
GROUP BY p.p_brand ORDER BY p.p_brand;
SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS spend
FROM orders GROUP BY o_custkey
HAVING COUNT(*) >= 25 AND SUM(CAST(o_totalprice AS DECIMAL(38,6))) > CAST(2000000 AS DECIMAL(38,6))
ORDER BY o_custkey;
SELECT l_suppkey, CAST(MIN(l_quantity) AS DOUBLE) AS mn, CAST(MAX(l_quantity) AS DOUBLE) AS mx
FROM lineitem GROUP BY l_suppkey
HAVING MAX(l_quantity) - MIN(l_quantity) >= CAST(48 AS DOUBLE)
ORDER BY l_suppkey LIMIT 80;
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n FROM customer
GROUP BY c_nationkey
HAVING COUNT(*) > (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) / 50
ORDER BY c_nationkey;
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_discount > CAST(0.05 AS DOUBLE)
                     THEN CAST(l_extendedprice AS DECIMAL(38,6))
                     ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) AS disc_rev,
       CAST(SUM(CASE WHEN l_discount <= CAST(0.05 AS DOUBLE)
                     THEN CAST(l_extendedprice AS DECIMAL(38,6))
                     ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) AS reg_rev
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag;
SELECT o_orderstatus,
       CAST(COUNT(CASE WHEN o_orderpriority LIKE '1%' THEN 1 END) AS BIGINT) AS n_p1,
       CAST(COUNT(CASE WHEN o_orderpriority LIKE '2%' THEN 1 END) AS BIGINT) AS n_p2
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT n_nationkey AS k FROM nation WHERE n_regionkey = 0
UNION
SELECT n_nationkey AS k FROM nation WHERE n_regionkey = 1
UNION
SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 3
ORDER BY k;
SELECT DISTINCT t.b FROM (
  SELECT CAST(o_orderkey % 11 AS BIGINT) AS b FROM orders WHERE o_orderkey < 500
  UNION ALL
  SELECT CAST(o_orderkey % 13 AS BIGINT) AS b FROM orders WHERE o_orderkey < 500
) t ORDER BY t.b;
SELECT x.bucket, x.k, x.rn FROM (
  SELECT CAST(o_orderkey % 5 AS BIGINT) AS bucket, o_orderkey AS k,
         row_number() OVER (PARTITION BY o_orderkey % 5 ORDER BY o_orderkey) AS rn
  FROM orders WHERE o_orderkey < 300
) x ORDER BY x.bucket, x.k;
SELECT y.yr, y.k, y.mx_run FROM (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr, o_orderkey AS k,
         CAST(MAX(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
           PARTITION BY EXTRACT(year FROM o_orderdate)
           ORDER BY o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS mx_run
  FROM orders WHERE o_orderkey < 400
) y ORDER BY y.yr, y.k;
SELECT z.seg, z.k, z.cnt_win FROM (
  SELECT c_mktsegment AS seg, c_custkey AS k,
         CAST(COUNT(*) OVER (PARTITION BY c_mktsegment
           ORDER BY c_custkey ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS BIGINT) AS cnt_win
  FROM customer WHERE c_custkey < 120
) z ORDER BY z.seg, z.k;
SELECT a.o_orderkey AS k1, b.o_orderkey AS k2
FROM orders a JOIN orders b
  ON a.o_orderkey + 1 = b.o_orderkey AND a.o_orderstatus <> b.o_orderstatus
WHERE a.o_orderkey < 400 ORDER BY k1, k2;
SELECT n.n_name, s.s_suppkey
FROM nation n JOIN supplier s
  ON s.s_nationkey = n.n_nationkey AND s.s_acctbal > CAST(n.n_nationkey * 100 AS DOUBLE)
ORDER BY n.n_name, s.s_suppkey LIMIT 60;
SELECT r.r_name,
       CAST(COUNT(DISTINCT n.n_nationkey) AS BIGINT) AS n_nations,
       CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_custs
FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
GROUP BY r.r_name ORDER BY r.r_name;
SELECT l.l_returnflag,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS n_supps,
       CAST(COUNT(DISTINCT l.l_partkey) AS BIGINT) AS n_parts
FROM lineitem l WHERE l.l_orderkey < 4000
GROUP BY l.l_returnflag ORDER BY l.l_returnflag;
SELECT p_partkey, p_name FROM part
WHERE p_name LIKE '%green%' AND p_name NOT LIKE '%dark%'
ORDER BY p_partkey LIMIT 50;
SELECT c_custkey, c_name FROM customer
WHERE substr(c_name, 1, 9) = 'Customer#' AND c_custkey % 97 = 0
ORDER BY c_custkey;
SELECT s_suppkey FROM supplier
WHERE lower(s_name) <> s_name AND upper(s_name) <> s_name
ORDER BY s_suppkey LIMIT 40;
SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars2,
       CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_nonspace
FROM documents WHERE doc_id < 30 ORDER BY doc_id;
SELECT d.source, CAST(SUM(length(d.text)) AS BIGINT) AS total_chars
FROM documents d GROUP BY d.source ORDER BY d.source;
SELECT doc_id, upper(substr(text, 1, 12)) AS head_up
FROM documents WHERE doc_id < 25 ORDER BY doc_id;
SELECT o_orderkey, o_totalprice FROM orders
WHERE o_totalprice > (SELECT CAST(MAX(t.mx) AS DOUBLE) FROM (
  SELECT AVG(CAST(o_totalprice AS DOUBLE)) AS mx FROM orders GROUP BY o_orderstatus
) t)
ORDER BY o_orderkey LIMIT 60;
SELECT c_custkey FROM customer
WHERE c_acctbal > (SELECT CAST(AVG(CAST(c_acctbal AS DOUBLE)) AS DOUBLE) FROM customer)
  AND c_nationkey = (SELECT MIN(n_nationkey) FROM nation WHERE n_regionkey = 2)
ORDER BY c_custkey LIMIT 50;
SELECT e.event_type,
       CAST(SUM(CAST(e.value AS DECIMAL(38,6))) AS DOUBLE) AS total_v,
       CAST(MAX(e.value) AS DOUBLE) AS mx_v
FROM events e WHERE e.user_id % 3 = 0
GROUP BY e.event_type ORDER BY e.event_type;
SELECT u.user_id, u.n FROM (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY user_id
) u WHERE u.n > 70 ORDER BY u.user_id;
SELECT CAST(EXTRACT(year FROM e.ts) AS BIGINT) AS yr,
       CAST(EXTRACT(month FROM e.ts) AS BIGINT) AS mo,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events e GROUP BY EXTRACT(year FROM e.ts), EXTRACT(month FROM e.ts)
ORDER BY yr, mo;

-- round-5 tranche (continuation i): INTERVAL arithmetic, LATERAL
-- correlated derived tables, try_cast, positional GROUP/ORDER BY,
-- coalesce/nullif chains, nested CASE, string BETWEEN, EXCEPT over
-- expressions, windows over joins, double-nested EXISTS, precedence,
-- documents/events join shapes
SELECT o_orderkey FROM orders
WHERE o_orderdate + INTERVAL 3 MONTH < TIMESTAMP '1995-06-01 00:00:00'
ORDER BY o_orderkey LIMIT 40;
SELECT CAST(EXTRACT(year FROM o_orderdate + INTERVAL 1 YEAR) AS BIGINT) AS y2,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY EXTRACT(year FROM o_orderdate + INTERVAL 1 YEAR) ORDER BY y2;
SELECT c.c_custkey, t.mx FROM customer c,
LATERAL (SELECT CAST(MAX(o.o_totalprice) AS DOUBLE) AS mx FROM orders o
         WHERE o.o_custkey = c.c_custkey) t
WHERE c.c_custkey <= 60 ORDER BY c.c_custkey;
SELECT o_orderkey, try_cast(o_orderpriority AS INTEGER) AS pri_int
FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey;
SELECT try_cast(substr(o_orderpriority, 1, 1) AS INTEGER) AS pri_digit,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY try_cast(substr(o_orderpriority, 1, 1) AS INTEGER)
ORDER BY pri_digit;
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n FROM orders GROUP BY 1 ORDER BY 1;
SELECT l_returnflag, l_linestatus, CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS q
FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2;
SELECT o_orderkey,
       coalesce(nullif(o_orderstatus, 'O'), nullif(o_orderpriority, '1-URGENT'), 'both-default') AS pick
FROM orders WHERE o_orderkey < 150 ORDER BY o_orderkey;
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_quantity > CAST(25 AS DOUBLE)
            THEN CASE WHEN l_discount > CAST(0.05 AS DOUBLE) THEN 'big-disc'
                      ELSE 'big-reg' END
            ELSE CASE WHEN l_tax > CAST(0.04 AS DOUBLE) THEN 'small-tax'
                      ELSE 'small-reg' END END AS quad
FROM lineitem WHERE l_orderkey < 120 ORDER BY l_orderkey, l_linenumber;
SELECT n_name FROM nation WHERE n_name BETWEEN 'E' AND 'M' ORDER BY n_name;
SELECT p_partkey, p_brand FROM part
WHERE p_brand >= 'Brand#30' AND p_brand < 'Brand#40'
ORDER BY p_partkey LIMIT 60;
SELECT CAST(o_orderkey % 100 AS BIGINT) AS b FROM orders WHERE o_orderstatus = 'O'
EXCEPT
SELECT CAST(o_orderkey % 100 AS BIGINT) AS b FROM orders WHERE o_orderstatus = 'F'
ORDER BY b;
SELECT t.r_name, t.n_name, t.rk FROM (
  SELECT r.r_name, n.n_name,
         row_number() OVER (PARTITION BY r.r_name ORDER BY n.n_name) AS rk
  FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
) t WHERE t.rk <= 3 ORDER BY t.r_name, t.rk;
SELECT v.seg, CAST(MAX(v.rk) AS BIGINT) AS n_ranked FROM (
  SELECT c_mktsegment AS seg,
         row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_custkey) AS rk
  FROM customer
) v GROUP BY v.seg ORDER BY v.seg;
SELECT DISTINCT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr, o_orderstatus
FROM orders ORDER BY yr, o_orderstatus;
SELECT n.n_name FROM nation n
WHERE EXISTS (
  SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey
  AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey
              AND l.l_quantity = CAST(50 AS DOUBLE)))
ORDER BY n.n_name;
SELECT o_orderkey, -o_totalprice AS neg_price,
       CAST(o_orderkey * 2 + 3 % 2 AS BIGINT) AS prec_check
FROM orders WHERE o_orderkey < 80 ORDER BY o_orderkey;
SELECT a.lang, CAST(a.n AS BIGINT) AS n_docs, CAST(b.n AS BIGINT) AS n_long
FROM (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang) a
LEFT JOIN (SELECT lang, COUNT(*) AS n FROM documents WHERE n_chars > 300 GROUP BY lang) b
ON a.lang = b.lang ORDER BY a.lang;
SELECT d.lang, d.source, CAST(COUNT(*) AS BIGINT) AS n
FROM documents d WHERE d.doc_id % 2 = 0
GROUP BY d.lang, d.source
HAVING COUNT(*) >= 2
ORDER BY d.lang, d.source;
SELECT DISTINCT e.user_id FROM events e
WHERE e.user_id NOT IN (SELECT user_id FROM events WHERE event_type = 'error')
ORDER BY e.user_id;
SELECT e1.user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM events e1 JOIN events e2
  ON e1.user_id = e2.user_id AND e1.event_type = 'view' AND e2.event_type = 'purchase'
  AND e2.ts > e1.ts
GROUP BY e1.user_id ORDER BY e1.user_id LIMIT 50;

-- ================== r5 tranche: joins/bit-aggs/regexp/edit-fns ==========
-- (validated: DuckDB regexp_replace is first-match-only vs Spark global —
--  only single-match patterns below; no NATURAL/USING joins, TPC-H column
--  prefixes leave no shared names; DuckDB lacks overlay())
SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey WHERE n_nationkey < 5 ORDER BY n_name;
SELECT c_custkey, n_name FROM customer JOIN nation ON c_nationkey = n_nationkey WHERE c_custkey <= 10 ORDER BY c_custkey;
SELECT o_orderstatus, COUNT(*) AS n FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT BIT_AND(n_nationkey) AS b FROM nation;
SELECT BIT_OR(n_nationkey) AS b FROM nation;
SELECT BIT_XOR(n_nationkey) AS b FROM nation;
SELECT n_regionkey, BIT_OR(n_nationkey) AS b, BIT_AND(n_nationkey) AS a FROM nation GROUP BY n_regionkey ORDER BY n_regionkey;
SELECT o_orderstatus, BIT_XOR(o_orderkey) AS x FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT p_partkey, regexp_extract(p_name, '([a-z]+)', 1) AS first_word FROM part WHERE p_partkey <= 20 ORDER BY p_partkey;
SELECT COUNT(*) AS n FROM part WHERE regexp_extract(p_type, '(STANDARD|ECONOMY)', 1) <> '';
SELECT l_returnflag, COUNT(*) AS n FROM lineitem WHERE regexp_replace(l_linestatus, 'O', 'X') = 'X' GROUP BY l_returnflag ORDER BY l_returnflag;
SELECT source, regexp_replace(source, '[0-9]+', '#') AS fam, COUNT(*) AS n FROM documents GROUP BY source ORDER BY source;
SELECT c_custkey, levenshtein(c_mktsegment, 'BUILDING') AS d FROM customer WHERE c_custkey <= 15 ORDER BY c_custkey;
SELECT levenshtein('kitten', 'sitting') AS d;
SELECT n_name, translate(n_name, 'AEIOU', 'aeiou') AS tl FROM nation ORDER BY n_nationkey;
SELECT o_orderpriority, translate(o_orderpriority, '-', '_') AS t, COUNT(*) AS n FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority;
SELECT try_cast('12x' AS INTEGER) AS a, try_cast('' AS INTEGER) AS b, try_cast(' 7' AS INTEGER) AS c;
SELECT COUNT(*) AS n FROM documents WHERE try_cast(substr(source, 4, 2) AS INTEGER) IS NOT NULL;
SELECT try_cast(lang AS INTEGER) AS li, COUNT(*) AS n FROM documents GROUP BY li ORDER BY n;
SELECT event_type, COUNT(*) AS n FROM events WHERE try_cast(event_type AS DOUBLE) IS NULL GROUP BY event_type ORDER BY event_type;
SELECT n_regionkey, COUNT(*) FILTER (WHERE n_nationkey > 10) AS hi, COUNT(*) AS n FROM nation GROUP BY GROUPING SETS ((n_regionkey), ()) ORDER BY n_regionkey NULLS FIRST;
SELECT o_orderstatus, o_orderpriority, COUNT(*) FILTER (WHERE o_totalprice > 100000) AS big, COUNT(*) AS n FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority) ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST;
SELECT l_returnflag, SUM(l_quantity) FILTER (WHERE l_discount > 0.05) AS disc_qty FROM lineitem GROUP BY ROLLUP (l_returnflag) ORDER BY l_returnflag NULLS FIRST;
SELECT n_name FROM nation n WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 9000) INTERSECT SELECT n_name FROM nation WHERE n_regionkey IN (0, 1) ORDER BY n_name;
SELECT s_suppkey FROM supplier s WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 49) EXCEPT SELECT s_suppkey FROM supplier WHERE s_acctbal < 0 ORDER BY s_suppkey;
SELECT n_name, t.max_bal FROM nation n, LATERAL (SELECT MAX(c_acctbal) AS max_bal FROM customer c WHERE c.c_nationkey = n.n_nationkey) t WHERE n_nationkey < 8 ORDER BY n_name;
SELECT o.o_orderkey, t.n_items FROM orders o, LATERAL (SELECT COUNT(*) AS n_items FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) t WHERE o.o_orderkey <= 20 ORDER BY o.o_orderkey;
SELECT c_custkey, NTILE(7) OVER (ORDER BY c_custkey) AS tile FROM customer WHERE c_custkey <= 30 ORDER BY c_custkey;
SELECT o_orderkey, LAG(o_totalprice, 2, CAST(0 AS DOUBLE)) OVER (ORDER BY o_orderkey) AS lag2 FROM orders WHERE o_orderkey <= 25 ORDER BY o_orderkey;
SELECT o_orderkey, LEAD(o_orderstatus, 1, 'NONE') OVER (ORDER BY o_orderkey) AS nxt FROM orders WHERE o_orderkey <= 25 ORDER BY o_orderkey;
SELECT l_orderkey, l_linenumber, COUNT(*) OVER (PARTITION BY l_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW ) AS rc FROM lineitem WHERE l_orderkey <= 12 ORDER BY l_orderkey, l_linenumber;
SELECT v.k, COUNT(o.o_orderkey) AS n FROM (VALUES (1), (2), (3)) AS v(k) LEFT JOIN orders o ON o.o_custkey = v.k GROUP BY v.k ORDER BY v.k;
SELECT t.seg FROM (VALUES ('BUILDING'), ('NOSEG')) AS t(seg) WHERE t.seg NOT IN (SELECT DISTINCT c_mktsegment FROM customer);
SELECT GREATEST(NULL, 5, 3) AS g, LEAST(NULL, 5, 3) AS l;
SELECT NULLIF(o_orderstatus, 'F') AS s, COUNT(*) AS n FROM orders GROUP BY NULLIF(o_orderstatus, 'F') ORDER BY s NULLS FIRST;
SELECT MOD(n_nationkey, 4) AS m, COUNT(*) AS n FROM nation GROUP BY MOD(n_nationkey, 4) ORDER BY m;
SELECT p_partkey, SIGN(p_size - 25) AS sg FROM part WHERE p_partkey <= 20 ORDER BY p_partkey;
SELECT FLOOR(SQRT(CAST(144 AS DOUBLE))) AS r, CEIL(SQRT(CAST(2 AS DOUBLE)) * 0) AS z;

-- ============ r5 tranche 2: RANGE frames / GROUP BY ALL / edges =========
SELECT o_orderkey, SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (ORDER BY o_orderkey RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS win_sum FROM orders WHERE o_orderkey <= 30 ORDER BY o_orderkey;
SELECT l_orderkey, COUNT(*) OVER (ORDER BY l_orderkey RANGE BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fwd FROM lineitem WHERE l_orderkey <= 15 ORDER BY l_orderkey, l_linenumber;
SELECT n_regionkey, COUNT(*) AS n FROM nation GROUP BY ALL ORDER BY n_regionkey;
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n FROM orders GROUP BY ALL ORDER BY o_orderstatus, o_orderpriority;
SELECT n_name, CASE WHEN EXISTS (SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey) THEN 'has_supp' ELSE 'none' END AS flag FROM nation n ORDER BY n_name;
SELECT c_custkey, CASE WHEN c_acctbal > (SELECT AVG(CAST(c_acctbal AS DOUBLE)) FROM customer) THEN 'above' ELSE 'below' END AS band FROM customer WHERE c_custkey <= 25 ORDER BY c_custkey;
SELECT MOD(-7, 3) AS a, MOD(7, -3) AS b, MOD(-7, -3) AS c;
SELECT SIGN(-5) AS a, SIGN(0) AS b, SIGN(12) AS c;
WITH r AS (SELECT r_regionkey FROM region WHERE r_regionkey < 3), n AS (SELECT n_nationkey, n_regionkey FROM nation) SELECT COUNT(*) AS c FROM n JOIN r ON n.n_regionkey = r.r_regionkey;
WITH lvl1 AS (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey), lvl2 AS (SELECT n, COUNT(*) AS n_cust FROM lvl1 GROUP BY n) SELECT n, n_cust FROM lvl2 ORDER BY n;
SELECT COUNT(*) AS n FROM customer WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0 UNION SELECT n_nationkey FROM nation WHERE n_regionkey = 1);
SELECT COUNT(*) AS n FROM supplier WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2 INTERSECT SELECT n_nationkey FROM nation);
SELECT p_brand, MIN(p_size) AS mn, MAX(p_size) AS mx FROM part GROUP BY p_brand HAVING MIN(p_size) < (SELECT CAST(AVG(CAST(p_size AS DOUBLE)) AS DOUBLE) FROM part) ORDER BY p_brand;
SELECT l_returnflag, l_linestatus, COUNT(*) AS n FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F') GROUP BY ALL ORDER BY l_returnflag, l_linestatus;
SELECT e1.user_id, COUNT(*) AS n_pairs FROM events e1 JOIN events e2 ON e1.user_id = e2.user_id AND e1.event_type = 'view' AND e2.event_type = 'purchase' AND e1.ts < e2.ts GROUP BY e1.user_id HAVING COUNT(*) >= 5 ORDER BY e1.user_id;
SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nations, COUNT(*) AS n FROM customer GROUP BY c_mktsegment HAVING COUNT(DISTINCT c_nationkey) > 5 ORDER BY c_mktsegment;
SELECT event_type, MIN(EXTRACT(HOUR FROM ts)) AS h0, MAX(EXTRACT(HOUR FROM ts)) AS h1 FROM events GROUP BY event_type ORDER BY event_type;
SELECT EXTRACT(DAY FROM ts) AS d, COUNT(*) FILTER (WHERE event_type = 'error') AS errs, COUNT(*) AS n FROM events GROUP BY EXTRACT(DAY FROM ts) HAVING COUNT(*) > 20 ORDER BY d;
SELECT t.b AS bucket, COUNT(*) AS n FROM (SELECT CAST(floor(CAST(o_totalprice AS DOUBLE) / CAST(50000 AS DOUBLE)) AS BIGINT) AS b FROM orders) t GROUP BY t.b ORDER BY t.b;
SELECT s_suppkey FROM supplier WHERE s_acctbal = (SELECT MAX(s_acctbal) FROM supplier);
SELECT n_nationkey, (SELECT COUNT(*) FROM customer c WHERE c.c_nationkey = n.n_nationkey) AS n_cust, (SELECT COUNT(*) FROM supplier s WHERE s.s_nationkey = n.n_nationkey) AS n_supp FROM nation n WHERE n_nationkey < 10 ORDER BY n_nationkey;
SELECT l_returnflag, SUM(l_quantity * (1 - l_discount)) AS eff_qty FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag;

-- ====== r5 tranche 3: trim/split_part/date_part/filters (validated:
--  DuckDB lacks btrim; VAR_POP double accumulation differs cross-engine;
--  CAST(x AS VARCHAR) is DuckDB-only — use STRING in shared dialect) ====
SELECT LTRIM(' pad ') AS a, RTRIM(' pad ') AS b, TRIM(' pad ') AS c;
SELECT split_part('a|b|c', '|', 2) AS p2, split_part('a|b|c', '|', 4) AS p4;
SELECT p_partkey, split_part(p_type, ' ', 1) AS klass FROM part WHERE p_partkey <= 20 ORDER BY p_partkey;
SELECT date_part('year', o_orderdate) AS y, COUNT(*) AS n FROM orders GROUP BY date_part('year', o_orderdate) ORDER BY y;
SELECT date_part('month', ts) AS m, COUNT(*) AS n FROM events GROUP BY date_part('month', ts) ORDER BY m;
SELECT VAR_POP(CAST(n_nationkey AS DOUBLE)) AS vp FROM nation;
SELECT l_returnflag, MIN(l_shipdate) AS d0, MAX(l_shipdate) AS d1 FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag;
SELECT o_orderkey, SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) OVER (PARTITION BY l_orderkey) AS n_disc FROM lineitem l JOIN orders o ON l_orderkey = o_orderkey WHERE o_orderkey <= 10 ORDER BY o_orderkey, n_disc;
SELECT c_mktsegment, COUNT(*) FILTER (WHERE c_acctbal < 0) AS negs, MIN(c_acctbal) AS worst FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment;
SELECT upper(n_name) AS u, lower(n_name) AS l FROM nation WHERE n_nationkey < 5 ORDER BY n_nationkey;
SELECT length(p_name) AS ln, COUNT(*) AS n FROM part GROUP BY length(p_name) ORDER BY ln;
SELECT substr(p_name, 1, 3) AS pre, COUNT(*) AS n FROM part GROUP BY substr(p_name, 1, 3) HAVING COUNT(*) >= 3 ORDER BY pre;
SELECT COUNT(*) AS n FROM lineitem WHERE l_quantity IN (1, 5, 10, 25, 50);
SELECT event_type, COUNT(DISTINCT user_id) AS u FROM events WHERE EXTRACT(DAY FROM ts) BETWEEN 10 AND 20 GROUP BY event_type ORDER BY event_type;
SELECT o_orderstatus, CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS tot FROM orders WHERE o_orderdate >= CAST('1998-01-01' AS TIMESTAMP) GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT COUNT(*) AS n FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_acctbal > 5000 WHERE c.c_custkey IS NULL;

-- ====== r5 tranche 4: value-windows/bitops/md5/GROUPING()/OFFSET/row-values
--  (validated via scripts/validate_sweep_candidates.py; dropped as DuckDB
--  gaps: trailing IGNORE NULLS after window fns, width_bucket,
--  octet_length/bit_length on VARCHAR, row-value IN <subquery>) ======
SELECT o_orderkey, FIRST_VALUE(o_orderstatus) OVER (ORDER BY o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS fv FROM orders WHERE o_orderkey <= 20 ORDER BY o_orderkey;
SELECT o_orderkey, LAST_VALUE(o_orderstatus) OVER (ORDER BY o_orderkey ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS lv FROM orders WHERE o_orderkey <= 20 ORDER BY o_orderkey;
SELECT n_nationkey, n_nationkey & 7 AS lo3, n_nationkey | 16 AS hi FROM nation ORDER BY n_nationkey;
SELECT o_orderkey & 255 AS b, COUNT(*) AS n FROM orders GROUP BY o_orderkey & 255 HAVING COUNT(*) > 3 ORDER BY b;
SELECT position('N' IN n_name) AS p, n_name FROM nation WHERE n_nationkey < 8 ORDER BY n_nationkey;
SELECT left(p_name, 4) AS pre, right(p_name, 3) AS suf FROM part WHERE p_partkey <= 15 ORDER BY p_partkey;
SELECT left(c_mktsegment, 3) AS seg3, COUNT(*) AS n FROM customer GROUP BY left(c_mktsegment, 3) ORDER BY seg3;
SELECT md5('abc') AS h;
SELECT n_name, md5(n_name) AS h FROM nation WHERE n_nationkey < 5 ORDER BY n_nationkey;
SELECT COUNT(DISTINCT md5(text)) AS n_unique FROM documents;
SELECT make_date(1998, 7, 14) AS d;
SELECT COUNT(*) AS n FROM orders WHERE o_orderdate >= CAST(make_date(1997, 1, 1) AS TIMESTAMP);
SELECT n_regionkey, GROUPING(n_regionkey) AS g, COUNT(*) AS n FROM nation GROUP BY ROLLUP (n_regionkey) ORDER BY g, n_regionkey NULLS FIRST;
SELECT o_orderstatus, o_orderpriority, GROUPING(o_orderstatus) AS gs, GROUPING(o_orderpriority) AS gp, COUNT(*) AS n FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority) ORDER BY gs, gp, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST;
SELECT c_custkey FROM customer ORDER BY c_custkey LIMIT 5 OFFSET 10;
SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 7 OFFSET 3;
SELECT COUNT(*) AS n FROM nation WHERE (n_regionkey, n_nationkey) = (0, 0);
SELECT COUNT(*) AS n FROM nation WHERE (n_regionkey, n_nationkey) IN ((0, 0), (1, 1), (2, 99));
SELECT r_name, EXISTS (SELECT 1 FROM nation n WHERE n.n_regionkey = r.r_regionkey AND n.n_nationkey > 20) AS has_late FROM region r ORDER BY r_name;
SELECT n_nationkey, n_nationkey IN (SELECT c_nationkey FROM customer WHERE c_acctbal > 9900) AS rich FROM nation ORDER BY n_nationkey;
SELECT ascii('A') AS a, chr(66) AS b;
SELECT ascii(substr(c_mktsegment, 1, 1)) AS a0, COUNT(*) AS n FROM customer GROUP BY ascii(substr(c_mktsegment, 1, 1)) ORDER BY a0;
SELECT repeat('ab', 3) AS r, reverse('spark') AS v;
SELECT lpad(CAST(n_nationkey AS STRING), 4, '0') AS padded FROM nation ORDER BY n_nationkey;
SELECT rpad(n_name, 12, '.') AS padded FROM nation WHERE n_nationkey < 5 ORDER BY n_nationkey;
SELECT COUNT(*) AS n FROM lineitem HAVING COUNT(*) > 100;
SELECT SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS tot FROM orders HAVING COUNT(*) > 0;
SELECT COUNT(c.c_custkey) AS matched, COUNT(*) AS total FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_acctbal > 9000;
SELECT n.n_name, COUNT(s.s_suppkey) AS n_supp FROM nation n LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey GROUP BY n.n_name ORDER BY n.n_name;
SELECT ABS(-42) AS a, ABS(c_acctbal) AS b FROM customer WHERE c_custkey = 1;
SELECT POWER(CAST(2 AS DOUBLE), CAST(10 AS DOUBLE)) AS p;
SELECT MIN(o_orderkey * 2 - 1) AS mn, MAX(o_orderkey * 2 - 1) AS mx FROM orders;
SELECT COUNT(*) AS n FROM supplier WHERE s_acctbal > (SELECT MIN(s_acctbal) FROM supplier) + 1000;
SELECT COUNT(*) AS n FROM part WHERE p_size < (SELECT MAX(p_size) FROM part) - (SELECT MIN(p_size) FROM part);
SELECT o_orderkey FROM orders o WHERE o_totalprice > (SELECT COALESCE(SUM(CAST(l_extendedprice AS DECIMAL(38,6))), 0) * 0.9 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) AND o_orderkey <= 200 ORDER BY o_orderkey;
SELECT x FROM (SELECT RANK() OVER (ORDER BY n_nationkey) AS x FROM nation WHERE n_regionkey = 0) a UNION SELECT x FROM (SELECT RANK() OVER (ORDER BY n_nationkey) AS x FROM nation WHERE n_regionkey = 1) b ORDER BY x;
SELECT r_name, COUNT(DISTINCT c_custkey) AS n_cust FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey JOIN customer c ON c.c_nationkey = n.n_nationkey WHERE c_acctbal > 0 GROUP BY r_name ORDER BY r_name;
SELECT r_name, n_name, COUNT(*) AS n FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey JOIN supplier s ON s.s_nationkey = n.n_nationkey GROUP BY r_name, n_name HAVING COUNT(*) >= 2 ORDER BY r_name, n_name;

-- ====== r5 tranche 5: quarter/week/doy extracts, DISTINCT aggs, ILIKE,
--  LIKE ESCAPE (non-backslash: Spark string literals eat '\'), instr,
--  concat_ws, last_day, date_trunc month/quarter, nullif guards, 3-col
--  rollup, FILTER fan-out, ordered-subquery shapes (validated; dropped
--  as dialect gaps: EXTRACT(DAYOFYEAR) spelling, initcap, > ALL) ======
SELECT EXTRACT(QUARTER FROM o_orderdate) AS q, COUNT(*) AS n FROM orders GROUP BY EXTRACT(QUARTER FROM o_orderdate) ORDER BY q;
SELECT EXTRACT(DOY FROM ts) AS d, COUNT(*) AS n FROM events GROUP BY EXTRACT(DOY FROM ts) HAVING COUNT(*) > 30 ORDER BY d;
SELECT EXTRACT(WEEK FROM o_orderdate) AS w, COUNT(*) AS n FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1997 GROUP BY EXTRACT(WEEK FROM o_orderdate) ORDER BY w;
SELECT SUM(DISTINCT n_regionkey) AS s FROM nation;
SELECT o_orderstatus, SUM(DISTINCT o_custkey) AS s, COUNT(DISTINCT o_custkey) AS n FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT AVG(DISTINCT CAST(p_size AS DOUBLE)) AS a FROM part;
SELECT COUNT(*) AS n FROM part WHERE p_type LIKE 'STANDARD!%%' ESCAPE '!';
SELECT COUNT(*) AS n FROM part WHERE p_name ILIKE 'RED%';
SELECT COUNT(*) AS n FROM part WHERE p_name NOT ILIKE '%GREEN%';
SELECT instr(n_name, 'AN') AS p, n_name FROM nation WHERE n_nationkey < 10 ORDER BY n_nationkey;
SELECT concat_ws('-', n_name, CAST(n_regionkey AS STRING)) AS tag FROM nation ORDER BY n_nationkey;
SELECT concat_ws('|', 'a', NULL, 'b') AS joined;
SELECT last_day(o_orderdate) AS ld, COUNT(*) AS n FROM orders WHERE o_orderkey <= 200 GROUP BY last_day(o_orderdate) ORDER BY ld;
SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS m, COUNT(*) AS n FROM orders GROUP BY CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) ORDER BY m;
SELECT CAST(date_trunc('quarter', ts) AS TIMESTAMP) AS q, COUNT(*) AS n FROM events GROUP BY CAST(date_trunc('quarter', ts) AS TIMESTAMP) ORDER BY q;
SELECT p_partkey, p_size / nullif(p_size - p_size, 0) AS guarded FROM part WHERE p_partkey <= 10 ORDER BY p_partkey;
SELECT COUNT(*) AS n FROM lineitem WHERE l_quantity / nullif(l_linenumber, 0) > 10;
SELECT n_regionkey, o_orderstatus, o_orderpriority, COUNT(*) AS n FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey JOIN nation nt ON c.c_nationkey = nt.n_nationkey GROUP BY ROLLUP (n_regionkey, o_orderstatus, o_orderpriority) HAVING COUNT(*) > 500 ORDER BY n_regionkey NULLS FIRST, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST;
SELECT floor(pi()) AS f, ceil(pi()) AS c;
SELECT log2(CAST(8 AS DOUBLE)) AS l3, log2(CAST(1024 AS DOUBLE)) AS l10;
SELECT factorial(5) AS f;
SELECT COUNT(*) AS n FROM (SELECT o_orderkey FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100) t;
SELECT MAX(price) AS worst FROM (SELECT o_totalprice AS price FROM orders ORDER BY o_totalprice ASC, o_orderkey LIMIT 50) t;
SELECT t.k, COUNT(*) AS n FROM (SELECT CAST(c_custkey % 10 AS BIGINT) AS k FROM customer) t GROUP BY t.k ORDER BY t.k;
SELECT r_name FROM region CROSS JOIN (SELECT MAX(n_regionkey) AS m FROM nation) t WHERE r_regionkey = t.m;
SELECT ifnull(NULL, 'fallback') AS a, ifnull('x', 'fallback') AS b;
SELECT c_custkey, ifnull(CAST(NULL AS STRING), c_mktsegment) AS seg FROM customer WHERE c_custkey <= 5 ORDER BY c_custkey;
SELECT o_orderstatus, MIN(CAST(o_orderdate AS STRING)) AS first_d, MAX(CAST(o_orderdate AS STRING)) AS last_d FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT user_id, CAST(MIN(ts) AS STRING) AS first_seen FROM events GROUP BY user_id HAVING COUNT(*) > 30 ORDER BY user_id;
SELECT n_name FROM nation ORDER BY CASE WHEN n_regionkey = 0 THEN 0 ELSE 1 END, n_name LIMIT 10;
SELECT p_brand FROM part GROUP BY p_brand ORDER BY COUNT(*) DESC, p_brand LIMIT 5;
SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders ORDER BY c_custkey LIMIT 20;
SELECT x.n_name, y.n_name AS peer FROM nation x JOIN nation y ON x.n_regionkey = y.n_regionkey AND x.n_nationkey < y.n_nationkey WHERE x.n_regionkey = 2 ORDER BY x.n_name, peer;
SELECT e1.user_id, COUNT(*) AS n FROM events e1 JOIN events e2 ON e1.user_id = e2.user_id AND e2.ts > e1.ts AND e1.event_type = 'signup' GROUP BY e1.user_id HAVING COUNT(*) > 40 ORDER BY e1.user_id;
SELECT repeat(n_name, 2) AS twice FROM nation WHERE n_nationkey < 4 ORDER BY n_nationkey;
SELECT upper(concat(substr(n_name, 1, 1), lower(substr(n_name, 2, 30)))) AS cased FROM nation ORDER BY n_nationkey;
SELECT COUNT(*) AS n, COUNT(DISTINCT l_orderkey) AS orders_n, COUNT(DISTINCT l_partkey) AS parts_n FROM lineitem WHERE l_quantity = 1;
SELECT o_orderpriority, COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f_n, COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS o_n, COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS p_n FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority;
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) FILTER (WHERE l_returnflag = 'R') AS DOUBLE) AS returned_rev FROM lineitem;
SELECT g, COUNT(*) AS n FROM (SELECT CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS g FROM customer) t GROUP BY g ORDER BY g;
SELECT event_type, COUNT(*) AS n FROM events WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL '7' DAY GROUP BY event_type ORDER BY event_type;
SELECT COUNT(*) AS n FROM orders WHERE o_orderdate = (SELECT MIN(o_orderdate) FROM orders);

-- ====== r5 tranche 6: min_by/max_by, any_value/mode on unique-mode data,
--  USING over derived tables, GROUP BY ordinals, ORDER BY ALL, recursive
--  CTEs (fibonacci, doubling), substring FROM/FOR, TRIM LEADING/TRAILING/
--  BOTH, lpad/rpad truncation, decimal arithmetic, string BETWEEN,
--  parenthesized set-op branches with inner ORDER BY+LIMIT (validated) ======
SELECT max_by(n_name, n_nationkey) AS last_nation FROM nation;
SELECT min_by(n_name, n_nationkey) AS first_nation FROM nation;
SELECT n_regionkey, max_by(n_name, n_nationkey) AS latest FROM nation GROUP BY n_regionkey ORDER BY n_regionkey;
SELECT o_orderstatus, max_by(o_orderkey, o_totalprice) AS priciest FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT any_value(n_name) AS nm FROM nation GROUP BY n_nationkey ORDER BY nm;
SELECT mode(o_orderstatus) AS m FROM orders;
SELECT a.k, a.n_name, b.n FROM (SELECT n_nationkey AS k, n_name FROM nation) a JOIN (SELECT c_nationkey AS k, COUNT(*) AS n FROM customer GROUP BY 1) b USING (k) ORDER BY a.k;
SELECT k, SUM(n) AS total FROM (SELECT o_orderstatus AS k, COUNT(*) AS n FROM orders GROUP BY 1) t GROUP BY 1 ORDER BY 1;
SELECT n_regionkey, COUNT(*) AS n FROM nation GROUP BY ALL ORDER BY ALL;
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n FROM orders GROUP BY ALL ORDER BY ALL;
WITH RECURSIVE fib(a, b, i) AS (SELECT 0, 1, 1 UNION ALL SELECT b, a + b, i + 1 FROM fib WHERE i < 20) SELECT MAX(a) AS f20 FROM fib;
WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n * 2 FROM t WHERE n < 500) SELECT SUM(n) AS s, COUNT(*) AS c FROM t;
SELECT substring(n_name FROM 2 FOR 3) AS mid FROM nation WHERE n_nationkey < 6 ORDER BY n_nationkey;
SELECT substring('abcdefgh' FROM 4) AS tail_s;
SELECT TRIM(LEADING '0' FROM '00012') AS a, TRIM(TRAILING 'x' FROM '12xx') AS b;
SELECT TRIM(BOTH '*' FROM '**star**') AS s;
SELECT lpad('abcdef', 3, 'x') AS trunc_l, rpad('abcdef', 3, 'x') AS trunc_r;
SELECT CAST(CAST(1.10 AS DECIMAL(10,2)) + CAST(2.05 AS DECIMAL(10,2)) AS DOUBLE) AS s;
SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DOUBLE) AS doubled FROM orders WHERE o_orderkey <= 10 ORDER BY o_orderkey;
SELECT COUNT(*) AS n FROM orders WHERE o_orderdate >= CAST(CAST('1997-03-05' AS DATE) AS TIMESTAMP);
SELECT n_name FROM nation WHERE n_name BETWEEN 'A' AND 'D' ORDER BY n_name;
SELECT COUNT(*) AS n FROM part WHERE p_brand BETWEEN 'Brand#21' AND 'Brand#33';
SELECT * FROM (SELECT n_name FROM nation ORDER BY n_nationkey LIMIT 3) a UNION ALL SELECT * FROM (SELECT n_name FROM nation ORDER BY n_nationkey DESC LIMIT 3) b ORDER BY n_name;
SELECT CAST(1e3 AS BIGINT) AS k, CAST(0.5 * 4 AS BIGINT) AS two;
SELECT c_mktsegment, COUNT(*) AS n FROM customer GROUP BY c_mktsegment ORDER BY n DESC NULLS LAST, c_mktsegment;
SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey IN (1, 2, 3) OR o_orderkey BETWEEN 30 AND 33 ORDER BY o_orderkey;
SELECT stddev_pop(CAST(n_nationkey AS DOUBLE)) AS sp FROM nation;
SELECT l_returnflag, MIN(l_quantity + 0) AS mn, MAX(l_quantity * 1) AS mx FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag;
SELECT COUNT(*) AS n FROM supplier s JOIN nation nt ON s.s_nationkey = nt.n_nationkey WHERE nt.n_name BETWEEN 'E' AND 'N';
SELECT EXTRACT(YEAR FROM o_orderdate) AS y, o_orderstatus, COUNT(*) AS n FROM orders GROUP BY 1, 2 ORDER BY 1, 2;
SELECT t.lang, t.n FROM (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang) t WHERE t.n > 10 ORDER BY t.lang;
SELECT doc_id, length(text) - length(replace(text, ' ', '')) AS n_spaces FROM documents WHERE doc_id < 10 ORDER BY doc_id;
SELECT source, MIN(n_chars) AS mn, MAX(n_chars) AS mx, COUNT(*) AS n FROM documents GROUP BY source ORDER BY source;
SELECT COUNT(*) AS n FROM embeddings;
SELECT t.b, COUNT(*) AS n FROM (SELECT CAST(vec_id % 16 AS BIGINT) AS b FROM embeddings) t GROUP BY t.b ORDER BY t.b;
SELECT e.event_type, COUNT(DISTINCT EXTRACT(HOUR FROM e.ts)) AS hours FROM events e GROUP BY e.event_type ORDER BY e.event_type;

-- ====== r5 tranche 7: multi-window selects, bool->int casts,
--  COUNT(DISTINCT CASE), left-join chains with coalesce defaults,
--  composite-key EXCEPT, date-scalar-subquery BETWEEN windows, HAVING
--  with OR of aggregates, CASE reused in GROUP BY+select, EXISTS AND
--  NOT EXISTS pairs, grouping sets over documents (validated; dropped:
--  GROUPS window frames do not parse in Spark SQL) ======
SELECT o_orderkey, ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn, SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run, COUNT(*) OVER (PARTITION BY o_orderpriority) AS prio_n FROM orders WHERE o_orderkey <= 15 ORDER BY o_orderkey;
SELECT l_orderkey, l_linenumber, SUM(l_quantity) OVER (PARTITION BY l_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS order_qty FROM lineitem WHERE l_orderkey <= 8 ORDER BY l_orderkey, l_linenumber;
SELECT CAST(o_totalprice > 100000 AS INTEGER) AS big, COUNT(*) AS n FROM orders GROUP BY CAST(o_totalprice > 100000 AS INTEGER) ORDER BY big;
SELECT n_name, CAST(n_regionkey = 0 AS INTEGER) AS in_r0 FROM nation ORDER BY in_r0 DESC, n_name LIMIT 10;
SELECT COUNT(DISTINCT CASE WHEN o_orderstatus = 'F' THEN o_custkey END) AS f_custs, COUNT(DISTINCT o_custkey) AS all_custs FROM orders;
SELECT c_mktsegment, COUNT(DISTINCT CASE WHEN c_acctbal > 5000 THEN c_nationkey END) AS rich_nations FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment;
SELECT o.o_orderkey, coalesce(c.c_mktsegment, 'NO_CUST') AS seg, coalesce(n.n_name, 'NO_NATION') AS nat FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_acctbal > 9000 LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey WHERE o.o_orderkey <= 30 ORDER BY o.o_orderkey;
SELECT coalesce(seg, 'total') AS seg2, SUM(n) AS n FROM (SELECT c_mktsegment AS seg, COUNT(*) AS n FROM customer GROUP BY ROLLUP (c_mktsegment)) t GROUP BY coalesce(seg, 'total') ORDER BY seg2;
SELECT n_regionkey, n_nationkey FROM nation EXCEPT SELECT n_regionkey, n_nationkey FROM nation WHERE n_nationkey < 10 ORDER BY n_regionkey, n_nationkey;
SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_orderkey <= 50 EXCEPT SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_returnflag = 'R' ORDER BY l_orderkey, l_linenumber;
SELECT COUNT(*) AS n FROM orders WHERE o_orderdate BETWEEN (SELECT MIN(o_orderdate) FROM orders) AND (SELECT MIN(o_orderdate) FROM orders) + INTERVAL '30' DAY;
SELECT event_type, COUNT(*) AS n FROM events WHERE ts BETWEEN (SELECT MIN(ts) FROM events) AND (SELECT MIN(ts) FROM events) + INTERVAL '2' DAY GROUP BY event_type ORDER BY event_type;
SELECT p_brand, COUNT(*) AS n, MIN(p_size) AS mn FROM part GROUP BY p_brand HAVING COUNT(*) > 12 OR MIN(p_size) <= 2 ORDER BY p_brand;
SELECT o_orderpriority, COUNT(*) AS n FROM orders GROUP BY o_orderpriority HAVING COUNT(*) > 1000 OR MAX(o_totalprice) > 400000 ORDER BY o_orderpriority;
SELECT CASE WHEN p_size < 10 THEN 'S' WHEN p_size < 30 THEN 'M' ELSE 'L' END AS sz, COUNT(*) AS n, MIN(p_size) AS mn FROM part GROUP BY CASE WHEN p_size < 10 THEN 'S' WHEN p_size < 30 THEN 'M' ELSE 'L' END ORDER BY sz;
SELECT r_name, MIN(n_name) AS a, MAX(n_name) AS z FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey GROUP BY r_name ORDER BY r_name;
SELECT EXTRACT(YEAR FROM o_orderdate) * 100 + EXTRACT(MONTH FROM o_orderdate) AS ym, COUNT(*) AS n FROM orders WHERE o_orderkey <= 500 GROUP BY EXTRACT(YEAR FROM o_orderdate) * 100 + EXTRACT(MONTH FROM o_orderdate) ORDER BY ym;
SELECT (n_nationkey + 3) % 5 AS m, COUNT(*) AS n FROM nation GROUP BY (n_nationkey + 3) % 5 ORDER BY m;
SELECT 'x' AS tag, 1 AS v UNION ALL SELECT 'y', 2 UNION ALL SELECT 'z', 3 UNION ALL SELECT 'w', 4 ORDER BY tag;
SELECT s_suppkey FROM supplier WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s_suppkey AND (l.l_quantity > 45 OR l.l_discount > 0.09)) ORDER BY s_suppkey LIMIT 15;
SELECT user_id FROM (SELECT user_id, COUNT(*) OVER (PARTITION BY user_id) AS n FROM events WHERE event_type = 'purchase') t WHERE n >= 10 GROUP BY user_id ORDER BY user_id;
SELECT dense_rank_v, COUNT(*) AS n FROM (SELECT DENSE_RANK() OVER (ORDER BY p_size) AS dense_rank_v FROM part) t GROUP BY dense_rank_v ORDER BY dense_rank_v;
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS rev, l_linestatus FROM lineitem WHERE l_shipdate < CAST('1998-09-01' AS TIMESTAMP) GROUP BY l_linestatus ORDER BY l_linestatus;
SELECT c_custkey FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F') ORDER BY c_custkey LIMIT 20;
SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY GROUPING SETS ((lang), (source), (lang, source)) ORDER BY lang NULLS FIRST, source NULLS FIRST;
SELECT doc_id FROM documents WHERE length(text) > (SELECT CAST(AVG(CAST(length(text) AS DOUBLE)) AS DOUBLE) FROM documents) * 1.5 ORDER BY doc_id LIMIT 25;
SELECT upper(substr(source, 1, 3)) AS pre, COUNT(DISTINCT lang) AS langs FROM documents GROUP BY upper(substr(source, 1, 3)) ORDER BY pre;

-- ====== r5 tranche 8: NULL semantics in set ops and grouping (NULLs
--  compare equal for UNION/INTERSECT/GROUP BY distinctness), count_if,
--  OFFSET without LIMIT, EXISTS with inner ORDER BY+LIMIT, 3-level
--  nested derived tables, CASE over IN lists, DESC NULLS FIRST, share-
--  of-total via CROSS JOIN of a 1-row aggregate (validated; dropped as
--  gaps: EXTRACT(EPOCH) is DuckDB-only, l_shipmode/p_container absent
--  from this testdata schema) ======
SELECT value FROM events WHERE value IS NULL UNION SELECT value FROM events WHERE value IS NULL;
SELECT value FROM events WHERE value IS NULL INTERSECT SELECT value FROM events WHERE value IS NULL;
SELECT v, COUNT(*) AS n FROM (SELECT CASE WHEN value IS NULL THEN NULL ELSE floor(value / 25) END AS v FROM events) t GROUP BY v ORDER BY v NULLS FIRST;
SELECT user_id, value FROM events WHERE user_id <= 2 ORDER BY value DESC NULLS FIRST, ts LIMIT 10;
SELECT count_if(o_totalprice > 100000) AS big, COUNT(*) AS n FROM orders;
SELECT o_orderstatus, count_if(o_orderpriority = '1-URGENT') AS urgent FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT n_name FROM nation ORDER BY n_nationkey OFFSET 20;
SELECT c_custkey FROM customer ORDER BY c_custkey OFFSET 495;
SELECT r_name FROM region r WHERE EXISTS (SELECT 1 FROM nation n WHERE n.n_regionkey = r.r_regionkey ORDER BY n.n_nationkey LIMIT 1) ORDER BY r_name;
SELECT t3.seg, t3.n FROM (SELECT t2.seg, COUNT(*) AS n FROM (SELECT t1.c_mktsegment AS seg FROM (SELECT c_mktsegment, c_acctbal FROM customer WHERE c_acctbal > 0) t1) t2 GROUP BY t2.seg) t3 ORDER BY t3.seg;
SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'fast' WHEN o_orderpriority IN ('3-MEDIUM') THEN 'mid' ELSE 'slow' END AS sp, COUNT(*) AS n FROM orders GROUP BY 1 ORDER BY sp;
SELECT MIN(value) AS mn, MAX(value) AS mx, COUNT(value) AS non_null, COUNT(*) AS total FROM events;
SELECT event_type, SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS nulls, COUNT(*) AS n FROM events GROUP BY event_type ORDER BY event_type;
SELECT a.n_nationkey, b.mx FROM nation a JOIN (SELECT n_regionkey, MAX(n_nationkey) AS mx FROM nation GROUP BY n_regionkey) b ON a.n_regionkey = b.n_regionkey AND a.n_nationkey = b.mx ORDER BY a.n_nationkey;
SELECT o_orderstatus, COUNT(*) AS n FROM orders WHERE o_custkey IN (SELECT DISTINCT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT coalesce((SELECT MAX(s_acctbal) FROM supplier WHERE s_nationkey = 999), CAST(-1 AS DECIMAL(15,2))) AS fallback;
SELECT l_linestatus, l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY l_linestatus, l_returnflag HAVING NOT (COUNT(*) < 100) ORDER BY l_linestatus, l_returnflag;
SELECT x.event_type, x.n, y.total, CAST(x.n AS DOUBLE) / y.total AS frac FROM (SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type) x CROSS JOIN (SELECT CAST(COUNT(*) AS DOUBLE) AS total FROM events) y ORDER BY x.event_type;
SELECT n_regionkey, COUNT(*) AS n FROM nation WHERE n_name > 'M' GROUP BY n_regionkey ORDER BY n_regionkey DESC;
SELECT source, lang, n_chars FROM documents WHERE doc_id IN (0, 1, 2) ORDER BY doc_id;

-- ====== r5 tranche 9: TPC-H-adjacent analytic shapes on this schema —
--  order-count distribution via LEFT JOIN (Q13-style), IN over grouped
--  HAVING sums (Q18-style), OR-of-conjunction part scans (Q19-style),
--  conditional revenue share with a double division of exact decimal
--  sums (Q14-style), group sum vs scaled global scalar (Q11-style),
--  correlated per-segment averages, rank-over-aggregate windows, and
--  tax/discount revenue ladders (validated, 15/15 first pass) ======
SELECT c_count, COUNT(*) AS custdist FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey GROUP BY c.c_custkey) t GROUP BY c_count ORDER BY custdist DESC, c_count DESC;
SELECT o.o_orderkey, o.o_orderdate, CAST(SUM(CAST(l.l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150) GROUP BY o.o_orderkey, o.o_orderdate ORDER BY o.o_orderkey;
SELECT COUNT(*) AS n FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey WHERE (p.p_brand = 'Brand#12' AND l.l_quantity BETWEEN 1 AND 11 AND p.p_size BETWEEN 1 AND 5) OR (p.p_brand = 'Brand#23' AND l.l_quantity BETWEEN 10 AND 20 AND p.p_size BETWEEN 1 AND 10) OR (p.p_brand = 'Brand#34' AND l.l_quantity BETWEEN 20 AND 30 AND p.p_size BETWEEN 1 AND 15);
SELECT CAST(100.00 * SUM(CASE WHEN p.p_type LIKE 'PROMO%' THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6)) ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS promo_share FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey WHERE l.l_shipdate >= CAST('1997-01-01' AS TIMESTAMP) AND l.l_shipdate < CAST('1997-02-01' AS TIMESTAMP);
SELECT l_partkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS value FROM lineitem GROUP BY l_partkey HAVING SUM(CAST(l_extendedprice AS DECIMAL(38,6))) > (SELECT SUM(CAST(l_extendedprice AS DECIMAL(38,6))) * 0.001 FROM lineitem) ORDER BY value DESC, l_partkey;
SELECT s.s_suppkey, COUNT(DISTINCT l.l_partkey) AS parts FROM supplier s JOIN lineitem l ON s.s_suppkey = l.l_suppkey GROUP BY s.s_suppkey HAVING COUNT(DISTINCT l.l_partkey) >= (SELECT MAX(cnt) FROM (SELECT COUNT(DISTINCT l2.l_partkey) AS cnt FROM lineitem l2 GROUP BY l2.l_suppkey) m) ORDER BY s.s_suppkey;
SELECT r_name, CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS rev FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey JOIN supplier s ON s.s_nationkey = n.n_nationkey JOIN lineitem l ON l.l_suppkey = s.s_suppkey GROUP BY r_name ORDER BY r_name;
SELECT yr, CAST(SUM(CASE WHEN n_name = 'FRANCE' THEN vol ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) AS france_vol, CAST(SUM(vol) AS DOUBLE) AS total_vol FROM (SELECT EXTRACT(YEAR FROM l.l_shipdate) AS yr, n.n_name, CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6)) AS vol FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey JOIN nation n ON s.s_nationkey = n.n_nationkey) t GROUP BY yr ORDER BY yr;
SELECT p_type, COUNT(*) AS n, MIN(ps) AS min_size, MAX(ps) AS max_size FROM (SELECT p_type, p_size AS ps FROM part) t GROUP BY p_type HAVING COUNT(*) >= 5 ORDER BY p_type;
SELECT c.c_custkey FROM customer c WHERE c.c_acctbal > (SELECT CAST(AVG(CAST(c2.c_acctbal AS DOUBLE)) AS DOUBLE) FROM customer c2 WHERE c2.c_mktsegment = c.c_mktsegment) AND c.c_custkey <= 100 ORDER BY c.c_custkey;
SELECT seg, CAST(big AS DOUBLE) / CAST(n AS DOUBLE) AS big_frac FROM (SELECT c_mktsegment AS seg, COUNT(*) AS n, COUNT(*) FILTER (WHERE c_acctbal > 5000) AS big FROM customer GROUP BY c_mktsegment) t ORDER BY seg;
SELECT o_orderstatus, o_orderpriority, CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS tot, RANK() OVER (PARTITION BY o_orderstatus ORDER BY CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) DESC) AS rnk FROM orders GROUP BY o_orderstatus, o_orderpriority ORDER BY o_orderstatus, rnk;
SELECT n_name, cnt FROM (SELECT n.n_name, COUNT(*) AS cnt, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, n.n_name) AS rn FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey GROUP BY n.n_name) t WHERE rn <= 5 ORDER BY cnt DESC, n_name;
SELECT l_returnflag, CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS gross, CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS net, CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS charged FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag;
SELECT t1.d AS ship_day, t1.n AS shipped, t2.n AS ordered FROM (SELECT EXTRACT(DAY FROM l_shipdate) AS d, COUNT(*) AS n FROM lineitem GROUP BY 1) t1 JOIN (SELECT EXTRACT(DAY FROM o_orderdate) AS d, COUNT(*) AS n FROM orders GROUP BY 1) t2 ON t1.d = t2.d ORDER BY t1.d;

-- ====== r5 tranche 10: empty/degenerate-input semantics — aggregates
--  over zero rows (SUM/MAX NULL, COUNT 0), all-NULL inputs, empty
--  set-op/join/cross sides, scalar subqueries returning no row (NULL),
--  correlated empty lookups, LIMIT 0, OFFSET past the end, IN / NOT IN
--  / EXISTS over provably-empty subqueries, single-row windows
--  (validated; dropped as dialect gaps: GROUP BY (), every(),
--  string_agg with in-aggregate ORDER BY) ======
SELECT SUM(n_nationkey) AS s, COUNT(*) AS n, MAX(n_name) AS mx FROM nation WHERE 1 = 0;
SELECT AVG(CAST(o_totalprice AS DOUBLE)) AS a FROM orders WHERE o_orderkey < 0;
SELECT SUM(value) AS s, COUNT(value) AS nn, COUNT(*) AS n FROM events WHERE value IS NULL;
SELECT o_orderstatus, COUNT(*) AS n FROM orders WHERE o_orderkey < 0 GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT n_name FROM nation WHERE 1 = 0 UNION SELECT r_name FROM region ORDER BY n_name;
SELECT n_name FROM nation WHERE n_regionkey = 0 EXCEPT SELECT n_name FROM nation ORDER BY n_name;
SELECT COUNT(*) AS n FROM region r CROSS JOIN (SELECT n_nationkey FROM nation WHERE 1 = 0) t;
SELECT r.r_name, t.k FROM region r LEFT JOIN (SELECT n_regionkey AS k FROM nation WHERE 1 = 0) t ON r.r_regionkey = t.k ORDER BY r.r_name;
SELECT (SELECT MAX(s_acctbal) FROM supplier WHERE s_suppkey < 0) AS missing;
SELECT c_custkey, (SELECT MIN(o_totalprice) FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderkey < 0) AS none_found FROM customer c WHERE c_custkey <= 5 ORDER BY c_custkey;
SELECT n_name FROM nation ORDER BY n_nationkey LIMIT 0;
SELECT n_name FROM nation ORDER BY n_nationkey LIMIT 5 OFFSET 1000;
SELECT COUNT(*) AS n FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE 1 = 0);
SELECT COUNT(*) AS n FROM customer WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE 1 = 0);
SELECT COUNT(*) AS n FROM nation n WHERE EXISTS (SELECT 1 FROM region r WHERE 1 = 0);
SELECT o_orderkey, ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn FROM orders WHERE o_orderkey = 1;
SELECT MIN(x) AS mn, MAX(x) AS mx FROM (SELECT CAST(NULL AS INTEGER) AS x FROM nation) t;

-- ====== r5 tranche 11: IS [NOT] DISTINCT FROM null-safe comparisons
--  (scans, join conditions, FILTER clauses, LAG-change detection),
--  bit_count / bin / shift operators, exact transcendental identities
--  (validated; dropped: char_length is Spark-only) ======
SELECT COUNT(*) AS n FROM events WHERE value IS DISTINCT FROM 50;
SELECT COUNT(*) AS n FROM events WHERE value IS NOT DISTINCT FROM NULL;
SELECT e1.user_id, COUNT(*) AS n FROM events e1 JOIN events e2 ON e1.user_id = e2.user_id AND e1.ts < e2.ts AND e1.value IS NOT DISTINCT FROM e2.value WHERE e1.user_id <= 3 GROUP BY e1.user_id ORDER BY e1.user_id;
SELECT n_nationkey, n_regionkey IS DISTINCT FROM 0 AS not_r0 FROM nation ORDER BY n_nationkey;
SELECT bit_count(255) AS a, bit_count(0) AS b, bit_count(1024) AS c;
SELECT n_nationkey, bit_count(n_nationkey) AS pop FROM nation ORDER BY n_nationkey;
SELECT bin(10) AS b10, bin(255) AS b255;
SELECT 1 << 10 AS kb, 3 << 2 AS twelve;
SELECT 1024 >> 3 AS v128, n_nationkey >> 1 AS halved FROM nation WHERE n_nationkey < 6 ORDER BY n_nationkey;
SELECT exp(0) AS one, ln(1) AS zero;
SELECT o_orderstatus, COUNT(*) FILTER (WHERE o_totalprice IS DISTINCT FROM o_totalprice) AS always_zero, COUNT(*) AS n FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT v1 IS DISTINCT FROM v2 AS diff, COUNT(*) AS n FROM (SELECT value AS v1, LAG(value) OVER (PARTITION BY user_id ORDER BY ts) AS v2 FROM events) t GROUP BY v1 IS DISTINCT FROM v2 ORDER BY diff;
SELECT (n_nationkey & 1) << 2 AS mixed FROM nation WHERE n_nationkey < 8 ORDER BY n_nationkey;
SELECT bit_count(o_orderkey) AS pop, COUNT(*) AS n FROM orders GROUP BY bit_count(o_orderkey) ORDER BY pop;

-- ====== r5 tranche 12: percentile_disc WITHIN GROUP, recursive CTEs
--  (series + fibonacci), scalar-subquery HAVING, funnel/gap self-joins,
--  BOOL_AND/OR, distinct-FILTER combos, rank-of-aggregate, quarter truncs, make_date, max_by/min_by, ntile-of-count
--  (validated; dropped: overlay / quantified ALL-ANY / STRING_AGG
--  ORDER BY / per-agg SUM ORDER BY / BETWEEN SYMMETRIC / array_agg subscript / QUALIFY —
--  dialect gaps) ======
SELECT o_orderstatus, percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS med_price FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity) AS q1, percentile_disc(0.75) WITHIN GROUP (ORDER BY l_quantity) AS q3 FROM lineitem;
SELECT user_id, percentile_disc(0.9) WITHIN GROUP (ORDER BY value) AS p90 FROM events WHERE user_id <= 5 GROUP BY user_id ORDER BY user_id;
WITH a AS (SELECT n_regionkey AS rk, COUNT(*) AS n FROM nation GROUP BY n_regionkey), b AS (SELECT rk, n * 2 AS n2 FROM a), c AS (SELECT rk, n2 + 1 AS n3 FROM b) SELECT c.rk, a.n, c.n3 FROM c JOIN a ON a.rk = c.rk ORDER BY c.rk;
WITH RECURSIVE seq(i) AS (SELECT 1 UNION ALL SELECT i + 1 FROM seq WHERE i < 10) SELECT SUM(i) AS s, COUNT(*) AS n FROM seq;
WITH RECURSIVE fib(a, b, i) AS (SELECT 0, 1, 1 UNION ALL SELECT b, a + b, i + 1 FROM fib WHERE i < 15) SELECT MAX(b) AS f15 FROM fib;
SELECT c_mktsegment, COUNT(*) AS n FROM customer GROUP BY c_mktsegment HAVING COUNT(*) > (SELECT COUNT(*) FROM customer) / 10 ORDER BY c_mktsegment;
SELECT o_orderstatus, AVG(o_totalprice) AS avg_p FROM orders GROUP BY o_orderstatus HAVING AVG(o_totalprice) > (SELECT AVG(o_totalprice) FROM orders) ORDER BY o_orderstatus;
SELECT e1.user_id, COUNT(*) AS view_then_click FROM events e1 JOIN events e2 ON e1.user_id = e2.user_id AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 1 HOUR WHERE e1.event_type = 'view' AND e2.event_type = 'click' AND e1.user_id <= 4 GROUP BY e1.user_id ORDER BY e1.user_id;
SELECT r_name, (SELECT COUNT(*) FROM nation n WHERE n.n_regionkey = r.r_regionkey AND n.n_name > r.r_name) AS n_later FROM region r ORDER BY r_name;
SELECT n_nationkey % 4 AS bucket, BOOL_AND(n_regionkey < 5) AS all_small, BOOL_OR(n_regionkey = 0) AS any_r0 FROM nation GROUP BY n_nationkey % 4 ORDER BY bucket;
SELECT o_orderstatus, BOOL_AND(o_totalprice > 0) AS pos FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT event_type, COUNT(DISTINCT user_id) FILTER (WHERE value > 50) AS hi, COUNT(DISTINCT user_id) FILTER (WHERE value <= 50) AS lo FROM events GROUP BY event_type ORDER BY event_type;
SELECT t.grp, t.n FROM (SELECT n_regionkey AS grp, COUNT(*) AS n, RANK() OVER (ORDER BY COUNT(*) DESC, n_regionkey) AS rk FROM nation GROUP BY n_regionkey) t WHERE t.rk = 1 ORDER BY t.grp;
SELECT COUNT(*) AS n FROM lineitem WHERE l_shipdate BETWEEN DATE '1994-01-01' AND DATE '1994-12-31' AND l_discount BETWEEN 0.05 AND 0.07;
SELECT CAST(date_trunc('month', DATE '1995-07-17') AS DATE) AS m, CAST(date_trunc('year', DATE '1995-07-17') AS DATE) AS y;
SELECT CAST(date_trunc('quarter', o_orderdate) AS DATE) AS q, COUNT(*) AS n FROM orders WHERE o_orderdate < DATE '1993-01-01' GROUP BY date_trunc('quarter', o_orderdate) ORDER BY q;
SELECT make_date(1999, 12, 31) AS d1, make_date(2000, 2, 29) AS d2;
SELECT MAX_BY(n_name, n_nationkey) AS last_nation, MIN_BY(n_name, n_nationkey) AS first_nation FROM nation;
SELECT COUNT(*) AS n, COUNT(DISTINCT o_orderdate) AS days FROM orders WHERE EXTRACT(MONTH FROM o_orderdate) = 2 AND EXTRACT(DAY FROM o_orderdate) = 29;
SELECT p_brand, NTILE(3) OVER (ORDER BY COUNT(*) DESC, p_brand) AS tier, COUNT(*) AS n FROM part GROUP BY p_brand ORDER BY p_brand;
SELECT s_nationkey, SUM(s_acctbal) AS bal, RANK() OVER (ORDER BY SUM(s_acctbal) DESC) AS rk FROM supplier GROUP BY s_nationkey ORDER BY rk, s_nationkey LIMIT 5;

-- tranche: LATERAL joins, GROUPING SETS/CUBE + GROUPING(), window-function
-- edges (nth_value/cume_dist/lag defaults), EXCEPT/INTERSECT ALL, TRY_CAST,
-- percentile_cont WITHIN GROUP, ILIKE, split_part/translate/instr parity
SELECT r_name, n_name FROM region, LATERAL (SELECT n_name FROM nation WHERE n_regionkey = r_regionkey ORDER BY n_nationkey LIMIT 2) t ORDER BY r_name, n_name;
SELECT r.r_name, t.n FROM region r, LATERAL (SELECT COUNT(*) AS n FROM nation WHERE n_regionkey = r.r_regionkey) t ORDER BY r.r_name;
SELECT n_regionkey, n_nationkey % 2 AS par, COUNT(*) AS n, GROUPING(n_regionkey) AS g_r, GROUPING(n_nationkey % 2) AS g_p FROM nation GROUP BY GROUPING SETS ((n_regionkey), (n_nationkey % 2), ()) ORDER BY g_r, g_p, n_regionkey, par;
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n FROM orders GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ()) ORDER BY o_orderstatus NULLS LAST, o_orderpriority NULLS LAST;
SELECT n_regionkey, COUNT(*) AS n, GROUPING(n_regionkey) AS g FROM nation GROUP BY CUBE (n_regionkey) ORDER BY g, n_regionkey NULLS LAST;
SELECT n_name, NTH_VALUE(n_name, 2) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_name FROM nation ORDER BY n_name;
SELECT n_nationkey, CUME_DIST() OVER (ORDER BY n_nationkey) AS cd, PERCENT_RANK() OVER (ORDER BY n_nationkey) AS pr FROM nation ORDER BY n_nationkey;
SELECT s_suppkey, LAG(s_acctbal, 2, -1.0) OVER (ORDER BY s_suppkey) AS lag2, LEAD(s_acctbal, 3, -1.0) OVER (ORDER BY s_suppkey) AS lead3 FROM supplier ORDER BY s_suppkey LIMIT 20;
SELECT n_regionkey, n_name, FIRST_VALUE(n_name) OVER (PARTITION BY n_regionkey ORDER BY n_name DESC ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS fv FROM nation ORDER BY n_regionkey, n_name;
SELECT x FROM (SELECT n_regionkey AS x FROM nation) a EXCEPT ALL SELECT r_regionkey AS x FROM region ORDER BY x;
SELECT n_regionkey AS x FROM nation INTERSECT ALL SELECT n_regionkey FROM nation WHERE n_nationkey < 10 ORDER BY x;
SELECT split_part(p_type, ' ', 1) AS w1, split_part(p_type, ' ', 3) AS w3, COUNT(*) AS n FROM part GROUP BY 1, 2 ORDER BY 1, 2;
SELECT translate(n_name, 'AEIOU', 'aeiou') AS tr FROM nation ORDER BY tr LIMIT 10;
SELECT repeat(substr(n_name, 1, 2), 3) AS rep, lpad(n_name, 12, '.') AS lp, rpad(n_name, 12, '.') AS rp FROM nation ORDER BY n_nationkey LIMIT 8;
SELECT ascii(n_name) AS a, chr(CAST(65 + n_nationkey % 26 AS INTEGER)) AS c FROM nation ORDER BY n_nationkey LIMIT 10;
SELECT TRY_CAST('123' AS INTEGER) AS ok, TRY_CAST('12x' AS INTEGER) AS bad, TRY_CAST('' AS INTEGER) AS empty;
SELECT TRY_CAST('2020-02-30' AS DATE) AS bad_date, TRY_CAST('2020-02-29' AS DATE) AS good_date;
SELECT r_name, (SELECT COUNT(*) FROM nation WHERE n_regionkey = r_regionkey) AS n_nations FROM region ORDER BY r_name;
SELECT r_name, (SELECT MAX(n_name) FROM nation WHERE n_regionkey = r_regionkey) AS top_name FROM region ORDER BY r_name;
WITH a AS (SELECT n_regionkey, COUNT(*) AS n FROM nation GROUP BY n_regionkey), b AS (SELECT MAX(n) AS mx FROM a) SELECT a.n_regionkey FROM a, b WHERE a.n = b.mx ORDER BY a.n_regionkey;
WITH big AS (SELECT * FROM orders WHERE o_totalprice > 100000) SELECT o_orderstatus, COUNT(*) AS n, (SELECT COUNT(*) FROM big) AS total FROM big GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT v.a, v.b, n_name FROM (VALUES (0, 'x'), (1, 'y'), (2, 'z')) AS v(a, b) JOIN nation ON n_regionkey = v.a WHERE n_nationkey < 6 ORDER BY v.a, n_name;
SELECT IFNULL(NULL, 'fb') AS f1, NULLIF('a', 'a') AS n1, NULLIF('a', 'b') AS n2, COALESCE(NULL, NULL, 7) AS c1;
SELECT o_orderpriority FROM orders GROUP BY o_orderpriority HAVING COUNT(DISTINCT o_custkey) > 10 ORDER BY o_orderpriority;
SELECT PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY n_nationkey) AS med, PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY n_nationkey) AS q1 FROM nation;
SELECT n_regionkey, PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY CAST(n_nationkey AS DOUBLE)) AS med FROM nation GROUP BY n_regionkey ORDER BY n_regionkey;
SELECT last_day(DATE '2000-02-01') AS ld1, last_day(DATE '1999-12-31') AS ld2;
SELECT o_orderdate, COUNT(*) AS n FROM orders WHERE o_orderdate = last_day(o_orderdate) GROUP BY o_orderdate ORDER BY o_orderdate LIMIT 5;
SELECT n_name ILIKE '%a%' AS has_a, COUNT(*) AS n FROM nation GROUP BY 1 ORDER BY 1;
SELECT p_name FROM part WHERE p_name ILIKE '%BLUSH%' ORDER BY p_name LIMIT 5;
SELECT GREATEST(1, NULL, 3) AS g, LEAST(2, NULL, 0) AS l;
SELECT GREATEST(o_orderdate, DATE '1995-01-01') AS g, COUNT(*) AS n FROM orders GROUP BY 1 ORDER BY 1 LIMIT 5;
SELECT c_mktsegment, SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS neg, SUM(CASE WHEN c_acctbal >= 0 THEN 1 ELSE 0 END) AS nonneg FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment;
SELECT s_suppkey % 5 AS b, MIN(s_name) AS mn FROM supplier GROUP BY s_suppkey % 5 HAVING MIN(s_acctbal) < MAX(s_acctbal) ORDER BY b;
SELECT EXISTS (SELECT 1 FROM nation WHERE n_regionkey = 99) AS none_there, EXISTS (SELECT 1 FROM nation WHERE n_regionkey = 0) AS some_there;
SELECT r_name FROM region WHERE EXISTS (SELECT 1 FROM nation WHERE n_regionkey = r_regionkey GROUP BY n_regionkey HAVING COUNT(*) >= 5) ORDER BY r_name;
SELECT n_nationkey & 3 AS band, n_nationkey | 16 AS bor, COUNT(*) AS n FROM nation GROUP BY 1, 2 ORDER BY 1, 2;
SELECT CAST(position('E' IN n_name) AS INTEGER) AS pos, COUNT(*) AS n FROM nation GROUP BY 1 ORDER BY 1;
SELECT n_name, instr(n_name, 'AN') AS i FROM nation WHERE instr(n_name, 'AN') > 0 ORDER BY n_name;
SELECT reverse(n_name) AS rv FROM nation ORDER BY rv LIMIT 6;
SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders WHERE o_totalprice > 300000 ORDER BY o_orderstatus, o_orderpriority;
SELECT c_nationkey, COUNT(*) AS n FROM customer GROUP BY c_nationkey ORDER BY n DESC, c_nationkey LIMIT 3;
SELECT a.n_name AS n1, b.n_name AS n2 FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey WHERE a.n_regionkey = 2 ORDER BY n1, n2;
SELECT CAST(o_totalprice AS DECIMAL(12,2)) % 10 AS m, COUNT(*) AS n FROM orders WHERE o_orderkey < 100 GROUP BY 1 ORDER BY 1;
SELECT user_id, COUNT(*) AS n FROM events WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' GROUP BY user_id ORDER BY n DESC, user_id LIMIT 5;
SELECT date_part('hour', ts) AS h, COUNT(*) AS n FROM events GROUP BY 1 ORDER BY 1 LIMIT 10;
SELECT c_mktsegment, MEDIAN(c_acctbal) AS med FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment;
SELECT regexp_extract(p_type, '^([A-Z]+)', 1) AS head, COUNT(*) AS n FROM part GROUP BY 1 ORDER BY 1;
SELECT CAST(AVG(DISTINCT n_regionkey) AS DOUBLE) AS ad, SUM(DISTINCT n_regionkey) AS sd FROM nation;
SELECT o_orderstatus, COUNT(*) FILTER (WHERE o_orderpriority LIKE '1%') AS urgent FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT s_nationkey, ROUND(SUM(s_acctbal), 2) AS bal FROM supplier GROUP BY s_nationkey HAVING SUM(s_acctbal) BETWEEN 0 AND 50000 ORDER BY s_nationkey;

-- tranche: hash/string-function parity (md5/hex/trim-both), null concat,
-- interval arithmetic, modulo/rounding sign edges, named WINDOW clause,
-- RANGE frames, LIMIT OFFSET, empty-input aggregates, EXISTS-in-CASE
SELECT md5(n_name) AS h FROM nation ORDER BY n_nationkey LIMIT 5;
SELECT hex(255) AS h1, hex(CAST(n_nationkey AS BIGINT)) AS h2 FROM nation ORDER BY n_nationkey LIMIT 5;
SELECT TRIM(BOTH 'A' FROM n_name) AS t FROM nation WHERE n_name LIKE 'A%' ORDER BY n_name;
SELECT 'a' || NULL AS c1, NULL || 'b' AS c2, 'x' || 'y' AS c3;
SELECT o_orderdate + INTERVAL '3' MONTH AS d3, COUNT(*) AS n FROM orders WHERE o_orderkey < 40 GROUP BY 1 ORDER BY 1;
SELECT CAST(date_trunc('week', DATE '1995-07-17') AS DATE) AS wk;
SELECT -7 % 3 AS m1, 7 % -3 AS m2, -7 % -3 AS m3;
SELECT ROUND(2.5) AS r1, ROUND(-2.5) AS r2, ROUND(3.14159, 3) AS r3;
SELECT FLOOR(-1.5) AS f, CEIL(-1.5) AS c, ABS(-4) AS a, SIGN(-9) AS s;
SELECT POWER(2, 10) AS p, SQRT(144.0) AS q;
SELECT CAST('2021-06-01' AS DATE) AS d, CAST('2021-06-01 12:30:00' AS TIMESTAMP) AS t;
SELECT n_name FROM nation WHERE n_name LIKE '%I_IA' ORDER BY n_name;
SELECT n_name FROM nation WHERE n_name LIKE '%!_%' ESCAPE '!' ORDER BY n_name;
SELECT n_nationkey IN (1, 2, 3) AS in_list, COUNT(*) AS n FROM nation GROUP BY 1 ORDER BY 1;
SELECT COUNT(*) AS n FROM nation WHERE (n_nationkey IN (1, NULL)) IS NULL;
SELECT o_orderkey FROM orders ORDER BY o_totalprice DESC LIMIT 5 OFFSET 10;
SELECT n_name, SUM(n_nationkey) OVER w AS s, AVG(n_nationkey) OVER w AS a FROM nation WINDOW w AS (PARTITION BY n_regionkey ORDER BY n_nationkey) ORDER BY n_name;
SELECT s_suppkey, AVG(s_acctbal) OVER (ORDER BY s_suppkey ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING) AS trail FROM supplier ORDER BY s_suppkey LIMIT 10;
SELECT n_nationkey, SUM(n_regionkey) OVER (ORDER BY n_nationkey RANGE BETWEEN 3 PRECEDING AND CURRENT ROW) AS rsum FROM nation ORDER BY n_nationkey;
SELECT n_regionkey, DENSE_RANK() OVER (ORDER BY n_regionkey) AS dr, COUNT(*) AS n FROM nation GROUP BY n_regionkey ORDER BY n_regionkey;
SELECT o_orderstatus, COUNT(*) AS n, CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER () AS frac FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT c_mktsegment, ANY_VALUE(c_mktsegment) AS av FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment;
SELECT SUM(l_quantity) AS s, AVG(l_discount) AS a, COUNT(*) AS n FROM lineitem WHERE l_orderkey < 0;
SELECT o_orderstatus, SUM(o_totalprice) AS s FROM orders WHERE o_orderkey < 0 GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT CASE WHEN EXISTS (SELECT 1 FROM nation WHERE n_regionkey = 9) THEN 'yes' ELSE 'no' END AS has_r9;
SELECT r_name, CASE WHEN (SELECT COUNT(*) FROM nation WHERE n_regionkey = r_regionkey) >= 5 THEN 'full' ELSE 'partial' END AS fill FROM region ORDER BY r_name;
SELECT x, COUNT(*) AS n FROM (SELECT CAST(n_nationkey AS DOUBLE) AS x FROM nation UNION ALL SELECT CAST(r_regionkey AS DOUBLE) FROM region) u GROUP BY x HAVING COUNT(*) > 1 ORDER BY x;
SELECT s_name FROM supplier s WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s.s_suppkey AND l_returnflag = 'R') ORDER BY s_name LIMIT 5;
SELECT p_brand FROM part GROUP BY p_brand HAVING SUM(p_retailprice) > (SELECT AVG(p_retailprice) * 30 FROM part) ORDER BY p_brand;
SELECT n1.n_name AS a, n2.n_name AS b, n3.n_name AS c FROM nation n1 JOIN nation n2 ON n2.n_nationkey = n1.n_nationkey + 1 JOIN nation n3 ON n3.n_nationkey = n2.n_nationkey + 1 WHERE n1.n_regionkey = n2.n_regionkey AND n2.n_regionkey = n3.n_regionkey ORDER BY a;
SELECT COUNT(*) AS n FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity > 45) t;
SELECT q, COUNT(*) AS n FROM (SELECT NTILE(4) OVER (ORDER BY o_totalprice) AS q FROM orders) t GROUP BY q ORDER BY q;
SELECT o_orderpriority, MIN(o_orderdate) AS first_d FROM orders GROUP BY o_orderpriority HAVING MIN(o_orderdate) < DATE '1992-06-01' ORDER BY o_orderpriority;
SELECT c_nationkey, MAX(length(c_name)) AS ml FROM customer GROUP BY c_nationkey HAVING COUNT(*) BETWEEN 5 AND 50 ORDER BY c_nationkey LIMIT 10;
SELECT upper(lower(r_name)) AS u FROM region ORDER BY u;
SELECT replace(p_type, ' ', '_') AS t, COUNT(*) AS n FROM part WHERE p_partkey < 50 GROUP BY 1 ORDER BY 1;
SELECT l_returnflag, l_linestatus, SUM(l_quantity * (1 - l_discount)) AS disc_qty FROM lineitem WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1995-04-01' GROUP BY l_returnflag, l_linestatus ORDER BY 1, 2;
SELECT t.b, COUNT(*) AS n FROM (SELECT CASE WHEN o_totalprice < 50000 THEN 'low' WHEN o_totalprice < 150000 THEN 'mid' ELSE 'high' END AS b FROM orders) t GROUP BY t.b ORDER BY t.b;
SELECT COALESCE(NULLIF(o_orderstatus, 'O'), 'open?') AS st, COUNT(*) AS n FROM orders GROUP BY 1 ORDER BY 1;
SELECT MIN(o_orderdate) AS mn, MAX(o_orderdate) AS mx, COUNT(DISTINCT EXTRACT(YEAR FROM o_orderdate)) AS yrs FROM orders;
SELECT EXTRACT(YEAR FROM o_orderdate) AS y, EXTRACT(QUARTER FROM o_orderdate) AS q, COUNT(*) AS n FROM orders WHERE o_orderkey < 400 GROUP BY 1, 2 ORDER BY 1, 2;
SELECT s_nationkey, COUNT(*) FILTER (WHERE s_acctbal > 0) AS pos, COUNT(*) FILTER (WHERE s_acctbal <= 0) AS nonpos FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey LIMIT 10;
SELECT CAST(SUM(CASE WHEN l_discount = 0 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS zero_disc_frac FROM lineitem;
SELECT g, SUM(cnt) AS total FROM (SELECT n_regionkey AS g, COUNT(*) AS cnt FROM nation GROUP BY n_regionkey UNION ALL SELECT r_regionkey, 1 FROM region) u GROUP BY g ORDER BY g;
SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey HAVING COUNT(*) = (SELECT MAX(c) FROM (SELECT COUNT(*) AS c FROM orders GROUP BY o_custkey) m) ORDER BY o_custkey LIMIT 5;
SELECT STDDEV_SAMP(CAST(n_nationkey AS DOUBLE)) IS NOT NULL AS sd_ok, VAR_SAMP(CAST(n_nationkey AS DOUBLE)) IS NOT NULL AS var_ok FROM nation;

-- tranche r5-j: grouping sets / date trunc / string+math builtins /
-- frames / multiset ops / try_cast / VALUES / recursion (validated)
SELECT n_regionkey, COUNT(*) AS n, grouping(n_regionkey) AS g FROM nation GROUP BY GROUPING SETS ((n_regionkey), ()) ORDER BY g, n_regionkey;
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n FROM orders WHERE o_orderkey < 2000 GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority)) ORDER BY 1 NULLS FIRST, 2 NULLS FIRST;
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m, COUNT(*) AS n FROM orders WHERE o_orderkey < 3000 GROUP BY 1 ORDER BY 1 LIMIT 12;
SELECT CAST(date_trunc('quarter', l_shipdate) AS DATE) AS q, SUM(l_quantity) AS qty FROM lineitem WHERE l_orderkey < 500 GROUP BY 1 ORDER BY 1;
SELECT last_day(o_orderdate) AS ld, COUNT(*) AS n FROM orders WHERE o_orderkey < 800 GROUP BY 1 ORDER BY 1 LIMIT 10;
SELECT translate(r_name, 'AE', 'ae') AS t FROM region ORDER BY t;
SELECT lpad(n_name, 20, '.') AS p FROM nation WHERE n_nationkey < 5 ORDER BY p;
SELECT rpad(r_name, 12, '-') AS p FROM region ORDER BY p;
SELECT repeat(substr(r_name, 1, 2), 3) AS rp FROM region ORDER BY rp;
SELECT reverse(n_name) AS rv FROM nation WHERE n_nationkey BETWEEN 3 AND 9 ORDER BY rv;
SELECT split_part(p_type, ' ', 1) AS w1, COUNT(*) AS n FROM part GROUP BY 1 ORDER BY 1;
SELECT split_part(p_type, ' ', 3) AS w3, COUNT(DISTINCT p_brand) AS nb FROM part WHERE p_partkey < 400 GROUP BY 1 ORDER BY 1;
SELECT greatest(n_nationkey, n_regionkey * 5) AS g, least(n_nationkey, n_regionkey * 5) AS l FROM nation ORDER BY n_nationkey LIMIT 10;
SELECT MOD(o_orderkey, 7) AS m, COUNT(*) AS n FROM orders WHERE o_orderkey < 5000 GROUP BY 1 ORDER BY 1;
SELECT SUM(CAST(power(l_linenumber, 2) AS BIGINT)) AS sq FROM lineitem WHERE l_orderkey < 300;
SELECT ROUND(AVG(sqrt(CAST(p_retailprice AS DOUBLE))), 4) AS r FROM part;
SELECT SIGN(s_acctbal) AS sg, COUNT(*) AS n FROM supplier GROUP BY 1 ORDER BY 1;
SELECT n_nationkey & 3 AS a, n_nationkey | 8 AS o FROM nation WHERE n_nationkey < 6 ORDER BY n_nationkey;
SELECT COUNT(*) AS n FROM orders o WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey GROUP BY l.l_orderkey HAVING SUM(l.l_quantity) > 150);
SELECT l_linenumber, SUM(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s FROM lineitem WHERE l_orderkey = 1 ORDER BY l_linenumber;
SELECT o_orderkey, lag(o_totalprice, 1, 0.0) OVER (ORDER BY o_orderkey) AS prev_p FROM orders WHERE o_orderkey < 40 ORDER BY o_orderkey;
SELECT o_orderkey, lead(o_orderstatus, 2, 'NA') OVER (ORDER BY o_orderkey) AS nx FROM orders WHERE o_orderkey < 40 ORDER BY o_orderkey;
SELECT DISTINCT first_value(n_name) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS f FROM nation ORDER BY f;
SELECT n_nationkey, ROUND(percent_rank() OVER (ORDER BY n_nationkey), 6) AS pr FROM nation WHERE n_nationkey < 10 ORDER BY n_nationkey;
SELECT n_nationkey, ROUND(cume_dist() OVER (ORDER BY n_nationkey), 6) AS cd FROM nation WHERE n_nationkey < 8 ORDER BY n_nationkey;
SELECT x FROM (SELECT n_regionkey AS x FROM nation EXCEPT ALL SELECT r_regionkey FROM region) t ORDER BY x;
SELECT x, COUNT(*) AS n FROM (SELECT l_suppkey AS x FROM lineitem WHERE l_orderkey < 200 INTERSECT ALL SELECT l_suppkey FROM lineitem WHERE l_orderkey BETWEEN 100 AND 400) t GROUP BY x ORDER BY x LIMIT 10;
SELECT t.k, t.v, n.n_name FROM (VALUES (0, 'zero'), (1, 'one'), (2, 'two')) AS t(k, v) JOIN nation n ON n.n_nationkey = t.k ORDER BY t.k;
SELECT v.tag, COUNT(*) AS n FROM (VALUES ('F'), ('O'), ('P')) AS v(tag) JOIN orders o ON o.o_orderstatus = v.tag WHERE o.o_orderkey < 4000 GROUP BY v.tag ORDER BY v.tag;
WITH RECURSIVE seq(i) AS (SELECT 0 UNION ALL SELECT i + 1 FROM seq WHERE i < 4) SELECT s.i, COUNT(*) AS n FROM seq s JOIN nation n ON n.n_regionkey = s.i GROUP BY s.i ORDER BY s.i;
WITH RECURSIVE f(i, v) AS (SELECT 1, 1 UNION ALL SELECT i + 1, v * (i + 1) FROM f WHERE i < 8) SELECT i, v FROM f ORDER BY i;
SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS med FROM orders WHERE o_orderkey < 1000;
SELECT o_orderstatus, percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS q1 FROM orders WHERE o_orderkey < 2000 GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT bool_and(o_totalprice > 0) AS all_pos, bool_or(o_orderstatus = 'F') AS any_f FROM orders WHERE o_orderkey < 100;
SELECT c_mktsegment, bool_and(c_acctbal > -1000) AS floor_ok FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment;
SELECT regexp_extract(p_type, '^([A-Z]+)', 1) AS head, COUNT(*) AS n FROM part WHERE p_partkey < 300 GROUP BY 1 ORDER BY 1;
SELECT c_custkey FROM customer WHERE c_nationkey IN (1, 3, 5) AND c_custkey < 60 ORDER BY c_custkey;
SELECT COALESCE(NULLIF(COALESCE(NULLIF(o_orderstatus, 'O'), 'x'), 'F'), 'y') AS chain, COUNT(*) AS n FROM orders GROUP BY 1 ORDER BY 1;
SELECT CASE WHEN SUM(l_quantity) > 1000 THEN 'big' WHEN SUM(l_quantity) > 100 THEN 'mid' ELSE 'small' END AS bucket FROM lineitem WHERE l_orderkey < 50;
SELECT s_nationkey FROM supplier GROUP BY s_nationkey HAVING AVG(s_acctbal) > (SELECT AVG(s_acctbal) FROM supplier) ORDER BY s_nationkey;
SELECT a.n_name FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey WHERE b.n_name LIKE 'U%' ORDER BY a.n_name;
SELECT COUNT(*) AS n FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL);
SELECT (SELECT COUNT(*) FROM nation WHERE n_regionkey = r.r_regionkey) AS nn, r_name FROM region r ORDER BY r_name;
SELECT o_orderstatus, CASE WHEN o_orderstatus = 'F' THEN CASE WHEN o_totalprice > 100000 THEN 'F-hi' ELSE 'F-lo' END ELSE 'other' END AS tag, COUNT(*) AS n FROM orders WHERE o_orderkey < 3000 GROUP BY 1, 2 ORDER BY 1, 2;
SELECT n_name FROM nation WHERE n_regionkey = 0 INTERSECT SELECT n_name FROM nation WHERE n_nationkey < 15 ORDER BY n_name;
SELECT COUNT(*) AS n FROM orders o WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING') AND NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R');
SELECT o_orderpriority, any_value(len5) AS l5 FROM (SELECT o_orderpriority, length(o_orderpriority) AS len5 FROM orders WHERE o_orderkey < 2000) t GROUP BY o_orderpriority ORDER BY o_orderpriority;
SELECT c_mktsegment, COUNT(*) FILTER (WHERE c_acctbal > 5000) AS rich, COUNT(*) FILTER (WHERE c_acctbal < 0) AS neg, COUNT(*) AS total FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment;
SELECT ROUND(VAR_SAMP(CAST(o_totalprice AS DOUBLE)) / 1e9, 6) AS v9 FROM orders WHERE o_orderkey < 500;
SELECT p_brand, ROUND(STDDEV_SAMP(CAST(p_retailprice AS DOUBLE)), 6) AS sd FROM part WHERE p_partkey < 1200 GROUP BY p_brand ORDER BY p_brand;
SELECT COUNT(*) AS n FROM part WHERE p_type LIKE 'SM%' OR p_type NOT LIKE '%STEEL';
SELECT try_cast(substr(p_brand, 7, 2) AS INTEGER) AS brand_num, COUNT(*) AS n FROM part WHERE p_partkey < 200 GROUP BY 1 ORDER BY 1 NULLS FIRST;
SELECT n_regionkey, min_by(n_name, n_nationkey) AS first_by_key FROM nation GROUP BY n_regionkey ORDER BY n_regionkey;
SELECT o_orderstatus, COUNT(DISTINCT o_orderpriority) AS np FROM orders WHERE o_orderkey < 2500 GROUP BY ROLLUP (o_orderstatus) ORDER BY o_orderstatus NULLS FIRST;
SELECT c_mktsegment, SUM(c_acctbal) AS s FROM customer GROUP BY c_mktsegment HAVING SUM(c_acctbal) > 0 ORDER BY c_mktsegment;
SELECT x.w AS w, COUNT(*) AS n FROM (SELECT split_part(p_type, ' ', 2) AS w FROM part WHERE p_partkey < 600) x GROUP BY x.w ORDER BY x.w;
SELECT s_suppkey, ntile(3) OVER (ORDER BY s_suppkey) AS t FROM supplier WHERE s_suppkey < 13 ORDER BY s_suppkey;
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS rev FROM lineitem WHERE l_quantity < 10 AND l_orderkey < 4000;

-- tranche r5-k: documents/events cross-table shapes, nested
-- windows, conditional aggregation, correlated scalars (validated)
SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars FROM documents GROUP BY lang ORDER BY lang;
SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY ROLLUP (source, lang) ORDER BY 1 NULLS FIRST, 2 NULLS FIRST;
SELECT d.lang, MAX(length(d.text)) AS mx FROM documents d WHERE d.doc_id % 3 = 0 GROUP BY d.lang HAVING COUNT(*) > 2 ORDER BY d.lang;
SELECT event_type, COUNT(DISTINCT user_id) AS nu FROM events GROUP BY event_type ORDER BY event_type;
SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id HAVING COUNT(*) >= 8 ORDER BY user_id LIMIT 10;
SELECT event_type, ROUND(SUM(value), 3) AS sv FROM events WHERE value > 0 GROUP BY event_type ORDER BY event_type;
SELECT CAST(date_trunc('day', ts) AS DATE) AS d, COUNT(*) AS n FROM events GROUP BY 1 ORDER BY 1 LIMIT 7;
SELECT u.user_id FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase') u WHERE u.user_id NOT IN (SELECT user_id FROM events WHERE event_type = 'view' AND user_id IS NOT NULL) ORDER BY u.user_id LIMIT 5;
SELECT doc_id, length(text) AS lt FROM documents WHERE length(text) = (SELECT MAX(length(text)) FROM documents) ORDER BY doc_id;
SELECT lang, src_rank FROM (SELECT lang, source, dense_rank() OVER (PARTITION BY lang ORDER BY source) AS src_rank FROM documents) t WHERE src_rank = 1 GROUP BY lang, src_rank ORDER BY lang;
SELECT o_orderstatus, o_orderpriority, n, rank() OVER (PARTITION BY o_orderstatus ORDER BY n DESC, o_orderpriority) AS r FROM (SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n FROM orders GROUP BY 1, 2) t ORDER BY o_orderstatus, r LIMIT 12;
SELECT s1.s_suppkey, s1.s_acctbal FROM supplier s1 WHERE s1.s_acctbal > (SELECT AVG(s2.s_acctbal) FROM supplier s2 WHERE s2.s_nationkey = s1.s_nationkey) ORDER BY s1.s_suppkey LIMIT 15;
SELECT p_size, p_brand FROM part GROUP BY p_size, p_brand HAVING COUNT(*) > 2 AND p_size < 15 ORDER BY p_size, p_brand LIMIT 15;
SELECT l_returnflag, SUM(CASE WHEN l_discount > 0.05 THEN l_quantity ELSE 0 END) AS hi_disc_qty, SUM(CASE WHEN l_tax > 0.04 THEN l_quantity ELSE 0 END) AS hi_tax_qty FROM lineitem WHERE l_orderkey < 2000 GROUP BY l_returnflag ORDER BY l_returnflag;
SELECT COUNT(*) AS n FROM (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING COUNT(DISTINCT l_suppkey) = COUNT(*)) t;
SELECT n_name, (SELECT r_name FROM region WHERE r_regionkey = n_regionkey) AS rn FROM nation WHERE n_nationkey < 8 ORDER BY n_name;
SELECT o_orderdate, o_orderkey FROM orders WHERE o_orderdate IN (SELECT MIN(o_orderdate) FROM orders) ORDER BY o_orderkey LIMIT 5;
SELECT x.g, x.n FROM (SELECT n_regionkey AS g, COUNT(*) AS n FROM nation GROUP BY n_regionkey) x JOIN (SELECT r_regionkey FROM region WHERE r_name <> 'ASIA') y ON x.g = y.r_regionkey ORDER BY x.g;
SELECT SUM(l_extendedprice * l_discount * (1 + l_tax)) AS taxed_disc FROM lineitem WHERE l_orderkey < 1500 AND l_quantity BETWEEN 5 AND 15;
SELECT l_linestatus, MIN(l_shipdate) AS mn, MAX(l_shipdate) AS mx FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus;
SELECT c_mktsegment, MIN(c_name) AS first_name FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment;
SELECT COUNT(*) AS n FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey WHERE c.c_acctbal < 0 AND o.o_orderstatus = 'F';
SELECT s_nationkey, COUNT(*) AS n FROM supplier WHERE s_name LIKE '%#000000__' ESCAPE '!' GROUP BY s_nationkey ORDER BY s_nationkey LIMIT 8;
SELECT doc_id % 10 AS bucket, COUNT(*) AS n, CAST(SUM(length(text)) AS BIGINT) AS chars FROM documents GROUP BY 1 ORDER BY 1;
SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY CUBE (lang, source) ORDER BY 1 NULLS FIRST, 2 NULLS FIRST LIMIT 25;
SELECT t.half, COUNT(*) AS n FROM (SELECT CASE WHEN doc_id % 2 = 0 THEN 'even' ELSE 'odd' END AS half FROM documents) t GROUP BY t.half ORDER BY t.half;
SELECT event_type, ROUND(MIN(value), 3) AS mn, ROUND(MAX(value), 3) AS mx FROM events WHERE value IS NOT NULL GROUP BY event_type ORDER BY event_type;
SELECT user_id, event_type, COUNT(*) AS n FROM events WHERE user_id < 20 GROUP BY user_id, event_type ORDER BY user_id, event_type LIMIT 20;
SELECT COUNT(*) AS n FROM events e1 JOIN events e2 ON e1.user_id = e2.user_id AND e1.event_type = 'view' AND e2.event_type = 'purchase' AND e2.ts > e1.ts WHERE e1.user_id < 12;
SELECT vec_id, label FROM embeddings WHERE vec_id < 8 ORDER BY vec_id;
SELECT r1.r_name FROM region r1 CROSS JOIN region r2 WHERE r1.r_regionkey = r2.r_regionkey + 1 ORDER BY r1.r_name;
SELECT o_orderpriority, bool_or(o_totalprice > 300000) AS has_big FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority;
SELECT percentile_disc(0.9) WITHIN GROUP (ORDER BY length(text)) AS p90 FROM documents;
SELECT source, percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars) AS med FROM documents GROUP BY source ORDER BY source;
SELECT o_orderkey FROM orders WHERE o_orderkey BETWEEN 32 AND 70 AND o_orderkey NOT BETWEEN 40 AND 60 ORDER BY o_orderkey;
SELECT p_brand, SUM(p_size) FILTER (WHERE p_size > 25) AS big_sz FROM part WHERE p_partkey < 500 GROUP BY p_brand ORDER BY p_brand;
SELECT substr(p_name, 1, 5) AS pre, COUNT(*) AS n FROM part WHERE p_partkey < 150 GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY 1;
SELECT lower(c_mktsegment) AS seg, length(c_mktsegment) AS ln FROM customer GROUP BY c_mktsegment ORDER BY seg;
SELECT CAST(AVG(CAST(n_chars AS DOUBLE)) AS DOUBLE) / 100.0 AS avg_h FROM documents WHERE lang = 'en';
SELECT l_returnflag || '/' || l_linestatus AS fl, COUNT(*) AS n FROM lineitem WHERE l_orderkey < 1000 GROUP BY 1 ORDER BY 1;
WITH big AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 250000), cnt AS (SELECT COUNT(*) AS nb FROM big) SELECT nb, (SELECT COUNT(*) FROM big WHERE o_orderkey % 2 = 0) AS nb_even FROM cnt;
WITH RECURSIVE pow2(i, v) AS (SELECT 0, 1 UNION ALL SELECT i + 1, v * 2 FROM pow2 WHERE i < 12) SELECT v FROM pow2 WHERE i = 12;
SELECT COALESCE(MAX(o_totalprice), 0.0) AS mx FROM orders WHERE o_orderkey < 0;
SELECT COUNT(*) AS n, COUNT(value) AS nv, COUNT(DISTINCT event_type) AS nt FROM events;
SELECT doc_id FROM documents WHERE text LIKE '%the%' AND text NOT LIKE '%xyzzy%' AND doc_id < 25 ORDER BY doc_id;
SELECT o_orderstatus, ROUND(SUM(o_totalprice) / SUM(SUM(o_totalprice)) OVER (), 6) AS share FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT l_suppkey, SUM(l_quantity) AS q, ROW_NUMBER() OVER (ORDER BY SUM(l_quantity) DESC, l_suppkey) AS rn FROM lineitem WHERE l_orderkey < 800 GROUP BY l_suppkey ORDER BY rn LIMIT 10;

-- tranche r5-l: expression group-bys, scalar-subquery arithmetic,
-- window frame edges, null-ordering, anti-join spellings (validated)
SELECT length(n_name) AS ln, COUNT(*) AS n FROM nation GROUP BY length(n_name) ORDER BY ln;
SELECT upper(substr(r_name, 2, 3)) AS mid FROM region ORDER BY mid;
SELECT (SELECT COUNT(*) FROM nation) + (SELECT COUNT(*) FROM region) AS total;
SELECT (SELECT MAX(o_totalprice) FROM orders) - (SELECT MIN(o_totalprice) FROM orders) AS price_range;
SELECT o_orderstatus, COUNT(*) AS n FROM orders WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000) GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT c_custkey FROM customer WHERE c_custkey < 40 EXCEPT SELECT o_custkey FROM orders ORDER BY c_custkey LIMIT 10;
SELECT n_regionkey, n_name FROM nation WHERE NOT EXISTS (SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey) ORDER BY n_regionkey, n_name LIMIT 8;
SELECT p_brand, FLOOR(AVG(p_size)) AS avg_sz FROM part GROUP BY p_brand HAVING FLOOR(AVG(p_size)) >= 25 ORDER BY p_brand;
SELECT l_orderkey, SUM(l_extendedprice) AS rev FROM lineitem GROUP BY l_orderkey HAVING SUM(l_extendedprice) > 400000 ORDER BY rev DESC, l_orderkey LIMIT 5;
SELECT trim(BOTH ' ' FROM '  ' || r_name || ' ') AS t FROM region ORDER BY t;
SELECT o_orderkey, o_totalprice, SUM(o_totalprice) OVER (ORDER BY o_orderkey ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING) AS prev2 FROM orders WHERE o_orderkey < 35 ORDER BY o_orderkey;
SELECT o_orderkey, AVG(o_totalprice) OVER (ORDER BY o_orderkey ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS fwd3 FROM orders WHERE o_orderkey < 30 ORDER BY o_orderkey;
SELECT n_regionkey, n_name, LAST_VALUE(n_name) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_in_region FROM nation ORDER BY n_regionkey, n_name;
SELECT s_suppkey, s_acctbal, CASE WHEN s_acctbal IS NULL THEN 'null' WHEN s_acctbal < 0 THEN 'neg' ELSE 'pos' END AS tag FROM supplier WHERE s_suppkey < 12 ORDER BY s_suppkey;
SELECT COUNT(*) AS n FROM lineitem WHERE l_quantity * l_extendedprice > 2000000 AND l_orderkey < 5000;
SELECT event_type, COUNT(*) FILTER (WHERE value > 50) AS hi, COUNT(*) FILTER (WHERE value <= 50) AS lo FROM events WHERE value IS NOT NULL GROUP BY event_type HAVING COUNT(*) FILTER (WHERE value > 50) > 0 ORDER BY event_type;
SELECT user_id, lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_et, event_type FROM events WHERE user_id < 4 ORDER BY user_id, ts, event_id LIMIT 20;
SELECT doc_id, n_chars, n_chars - LAG(n_chars, 1, 0) OVER (ORDER BY doc_id) AS delta FROM documents WHERE doc_id < 12 ORDER BY doc_id;
SELECT source, MAX(n_chars) - MIN(n_chars) AS spread FROM documents GROUP BY source ORDER BY source;
SELECT ABS(MIN(s_acctbal)) AS a, ROUND(ABS(AVG(s_acctbal)), 4) AS b FROM supplier WHERE s_nationkey = 3;
SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket, COUNT(*) AS n FROM orders GROUP BY 1 ORDER BY 1;
SELECT x FROM (SELECT n_name AS x FROM nation UNION SELECT r_name FROM region) u WHERE x LIKE 'A%' ORDER BY x;
SELECT COUNT(DISTINCT o_orderdate) AS nd FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1994 AND EXTRACT(MONTH FROM o_orderdate) IN (1, 2, 3);
SELECT c_mktsegment, COUNT(*) AS n, DENSE_RANK() OVER (ORDER BY COUNT(*) DESC) AS dr FROM customer GROUP BY c_mktsegment ORDER BY dr, c_mktsegment;
SELECT a.r_name, b.r_name AS other FROM region a JOIN region b ON b.r_regionkey = (a.r_regionkey + 2) % 5 ORDER BY a.r_name;
SELECT COALESCE(SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 0) AS r_qty FROM lineitem WHERE l_orderkey < 100;
SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n FROM orders WHERE o_orderkey < 4000 GROUP BY o_orderpriority, o_orderstatus HAVING COUNT(*) > 10 ORDER BY o_orderpriority, o_orderstatus;
SELECT p_type, p_size FROM part WHERE p_partkey IN (SELECT MIN(p_partkey) FROM part GROUP BY p_brand) ORDER BY p_type, p_size LIMIT 10;
SELECT s_nationkey, COUNT(*) AS n FROM supplier GROUP BY s_nationkey HAVING COUNT(*) > (SELECT COUNT(*) FROM supplier) / 30 ORDER BY s_nationkey;
SELECT l_linenumber, COUNT(*) AS n, SUM(CAST(l_quantity AS BIGINT)) AS q FROM lineitem WHERE l_orderkey < 2000 GROUP BY l_linenumber ORDER BY l_linenumber;
SELECT 'const' AS k, COUNT(*) AS n, MIN(n_nationkey) AS mn, MAX(n_nationkey) AS mx FROM nation;
SELECT d1.lang FROM documents d1 GROUP BY d1.lang HAVING COUNT(*) = (SELECT MAX(cnt) FROM (SELECT COUNT(*) AS cnt FROM documents GROUP BY lang) m) ORDER BY d1.lang;
SELECT doc_id FROM documents WHERE n_chars > (SELECT AVG(CAST(n_chars AS DOUBLE)) FROM documents) * 1.5 ORDER BY doc_id LIMIT 10;
SELECT event_type, ts FROM events WHERE ts = (SELECT MIN(ts) FROM events) ORDER BY event_type;
SELECT user_id FROM events GROUP BY user_id HAVING COUNT(DISTINCT event_type) >= 3 ORDER BY user_id LIMIT 10;
SELECT o_orderstatus, o_orderdate FROM orders WHERE o_orderkey = (SELECT MIN(o_orderkey) FROM orders);
SELECT r_name, (SELECT COUNT(*) FROM nation WHERE n_regionkey = r_regionkey AND n_nationkey % 2 = 0) AS even_nations FROM region ORDER BY r_name;
SELECT GREATEST(l_discount, l_tax) AS g, COUNT(*) AS n FROM lineitem WHERE l_orderkey < 300 GROUP BY 1 ORDER BY 1 LIMIT 10;
SELECT NULLIF(n_regionkey, 2) AS nr, COUNT(*) AS n FROM nation GROUP BY 1 ORDER BY 1 NULLS FIRST;
SELECT doc_id % 7 AS g, MIN(doc_id) AS mn, MAX(doc_id) AS mx, COUNT(*) AS n FROM documents GROUP BY 1 ORDER BY 1;
SELECT source, lang FROM documents GROUP BY source, lang HAVING COUNT(*) >= 10 ORDER BY source, lang;
SELECT SUM(CAST(n_chars AS BIGINT) * CAST(doc_id % 3 AS BIGINT)) AS weighted FROM documents;
SELECT l_returnflag, VAR_POP(CAST(l_quantity AS DOUBLE)) IS NOT NULL AS has_var FROM lineitem WHERE l_orderkey < 500 GROUP BY l_returnflag ORDER BY l_returnflag;
SELECT COUNT(*) AS n FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem WHERE l_orderkey < 600) t;
SELECT CASE WHEN COUNT(*) > 0 THEN 'yes' ELSE 'no' END AS any_rows FROM orders WHERE o_totalprice < 0;
SELECT c_nationkey, STRING_AGG(DISTINCT c_mktsegment, ',') IS NOT NULL AS has_segs FROM customer WHERE c_custkey < 30 GROUP BY c_nationkey ORDER BY c_nationkey;

-- tranche r5-m: concat_ws, exists-in-case, window counts,
-- mixed-predicate joins, union-of-aggregates (validated)
SELECT concat_ws('/', n_name, r_name) AS path FROM nation JOIN region ON n_regionkey = r_regionkey WHERE n_nationkey < 6 ORDER BY path;
SELECT o_orderkey, CASE WHEN EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R') THEN 'returned' ELSE 'clean' END AS status FROM orders WHERE o_orderkey < 40 ORDER BY o_orderkey;
SELECT n_regionkey, COUNT(*) OVER (PARTITION BY n_regionkey) AS region_n, n_name FROM nation WHERE n_nationkey < 10 ORDER BY n_regionkey, n_name;
SELECT kind, total FROM (SELECT 'orders' AS kind, COUNT(*) AS total FROM orders UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem UNION ALL SELECT 'customer', COUNT(*) FROM customer) u ORDER BY kind;
SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority;
SELECT c.c_custkey, o.o_orderkey FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey AND o.o_totalprice > c.c_acctbal * 100 WHERE c.c_custkey < 10 ORDER BY c.c_custkey, o.o_orderkey LIMIT 12;
SELECT s.s_suppkey, COUNT(l.l_orderkey) AS n FROM supplier s LEFT JOIN lineitem l ON l.l_suppkey = s.s_suppkey AND l.l_quantity > 48 GROUP BY s.s_suppkey ORDER BY s.s_suppkey LIMIT 12;
SELECT p_size, COUNT(*) AS n FROM part WHERE p_size IN (1, 5, 10, 25, 50) GROUP BY p_size HAVING COUNT(*) > 1 OR MIN(p_retailprice) > 1000 ORDER BY p_size;
SELECT t.seg, t.n, t.r FROM (SELECT c_mktsegment AS seg, COUNT(*) AS n, RANK() OVER (ORDER BY COUNT(*) DESC) AS r FROM customer GROUP BY c_mktsegment) t WHERE t.r <= 3 ORDER BY t.r, t.seg;
SELECT o_orderstatus, SUM(o_totalprice) AS s FROM orders GROUP BY o_orderstatus UNION ALL SELECT 'ALL', SUM(o_totalprice) FROM orders ORDER BY 1;
SELECT source, COUNT(*) AS n, MIN(doc_id) AS first_doc FROM documents WHERE lang <> 'en' GROUP BY source ORDER BY source;
SELECT e.event_type, COUNT(*) AS n FROM events e WHERE e.ts BETWEEN (SELECT MIN(ts) FROM events) AND (SELECT MIN(ts) FROM events) + INTERVAL 2 DAY GROUP BY e.event_type ORDER BY e.event_type;
SELECT user_id, MIN(ts) AS first_ts, MAX(ts) AS last_ts, COUNT(*) AS n FROM events WHERE user_id < 6 GROUP BY user_id ORDER BY user_id;
SELECT doc_id, lang FROM documents WHERE lang IN (SELECT lang FROM documents GROUP BY lang HAVING COUNT(*) < 50) ORDER BY doc_id LIMIT 10;
SELECT COUNT(*) AS n_pairs FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey WHERE a.n_nationkey < b.n_nationkey;
SELECT r_name, COALESCE((SELECT MAX(n_name) FROM nation WHERE n_regionkey = r_regionkey AND n_nationkey > 20), 'none') AS top_n FROM region ORDER BY r_name;
SELECT p_brand, MAX(length(p_name)) AS ml FROM part GROUP BY p_brand HAVING MAX(length(p_name)) >= (SELECT MAX(length(p_name)) - 3 FROM part) ORDER BY p_brand;
SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS no, COUNT(*) AS nl FROM lineitem WHERE l_shipdate >= DATE '1996-01-01' GROUP BY l_returnflag ORDER BY l_returnflag;
SELECT y, n FROM (SELECT EXTRACT(YEAR FROM o_orderdate) AS y, COUNT(*) AS n FROM orders GROUP BY 1) t WHERE n > 100 ORDER BY y;
SELECT o_orderkey FROM orders o WHERE (SELECT COUNT(*) FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) = 7 ORDER BY o_orderkey LIMIT 8;
SELECT s_nationkey, SUM(CASE WHEN s_acctbal > 5000 THEN 1 ELSE 0 END) * 100 / COUNT(*) AS pct_rich FROM supplier GROUP BY s_nationkey HAVING COUNT(*) >= 2 ORDER BY s_nationkey LIMIT 12;
SELECT c_mktsegment, n_name FROM customer JOIN nation ON c_nationkey = n_nationkey WHERE c_custkey = (SELECT MIN(c_custkey) FROM customer);
SELECT doc_id, length(text) - length(replace(text, ' ', '')) AS n_spaces FROM documents WHERE doc_id < 8 ORDER BY doc_id;
SELECT lang, SUM(length(text)) AS chars, COUNT(*) AS docs, CAST(SUM(length(text)) AS DOUBLE) / COUNT(*) AS avg_chars FROM documents GROUP BY lang ORDER BY lang;
SELECT event_type, value FROM events WHERE value = (SELECT MAX(value) FROM events WHERE value IS NOT NULL) ORDER BY event_type LIMIT 3;
SELECT a.event_type AS et1, b.event_type AS et2, COUNT(*) AS n FROM events a JOIN events b ON a.user_id = b.user_id AND b.event_id = a.event_id + 1 WHERE a.user_id < 5 GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 15;
SELECT part_bucket, COUNT(*) AS n FROM (SELECT p_partkey % 5 AS part_bucket FROM part WHERE p_retailprice > 1500) t GROUP BY part_bucket ORDER BY part_bucket;
SELECT o_orderpriority, MIN(o_orderkey) AS mn FROM orders WHERE o_orderdate >= DATE '1997-01-01' GROUP BY o_orderpriority HAVING MIN(o_orderkey) > 100 ORDER BY o_orderpriority;
SELECT 'x' || repeat('y', 3) || 'z' AS s, length('x' || repeat('y', 3) || 'z') AS l;
SELECT n_name FROM nation WHERE length(n_name) = (SELECT MIN(length(n_name)) FROM nation) ORDER BY n_name;
SELECT SUM(q1) AS tq FROM (SELECT SUM(l_quantity) AS q1 FROM lineitem WHERE l_orderkey < 500 GROUP BY l_orderkey) t;
SELECT COUNT(*) AS n, SUM(CASE WHEN c_acctbal BETWEEN 0 AND 1000 THEN 1 ELSE 0 END) AS low_band FROM customer WHERE c_mktsegment = 'HOUSEHOLD';
SELECT l_suppkey FROM lineitem WHERE l_orderkey < 100 GROUP BY l_suppkey HAVING SUM(l_quantity) > 2 * AVG(l_quantity) ORDER BY l_suppkey LIMIT 10;
SELECT r_regionkey * 2 + 1 AS odd_key, upper(r_name) AS uname FROM region WHERE r_regionkey % 2 = 0 ORDER BY odd_key;
SELECT source, lang, n, SUM(n) OVER (PARTITION BY source) AS src_total FROM (SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY source, lang) t ORDER BY source, lang;
SELECT user_id, event_type, ts, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM events WHERE user_id IN (1, 2) ORDER BY user_id, rn LIMIT 10;
SELECT MAX(mx) AS overall FROM (SELECT MAX(l_extendedprice) AS mx FROM lineitem GROUP BY l_returnflag) t;

-- tranche r5-n: offsets, multi-CTE chains, directional sorts,
-- date ranges, percent math, nested windows (validated)
SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 5 OFFSET 10;
SELECT n_name FROM nation ORDER BY n_name DESC LIMIT 4 OFFSET 2;
WITH a AS (SELECT n_regionkey, COUNT(*) AS n FROM nation GROUP BY n_regionkey), b AS (SELECT r_regionkey, r_name FROM region), c AS (SELECT b.r_name, a.n FROM a JOIN b ON a.n_regionkey = b.r_regionkey) SELECT * FROM c ORDER BY r_name;
WITH q AS (SELECT l_orderkey, SUM(l_quantity) AS tq FROM lineitem WHERE l_orderkey < 1000 GROUP BY l_orderkey) SELECT CAST(AVG(tq) AS DOUBLE) AS avg_q, MAX(tq) AS max_q FROM q;
SELECT o_orderdate FROM orders WHERE o_orderdate BETWEEN DATE '1993-01-01' AND DATE '1993-01-31' GROUP BY o_orderdate ORDER BY o_orderdate LIMIT 10;
SELECT l_shipdate, COUNT(*) AS n FROM lineitem WHERE l_shipdate IN (DATE '1994-01-01', DATE '1995-01-01', DATE '1996-01-01') GROUP BY l_shipdate ORDER BY l_shipdate;
SELECT c_mktsegment, ROUND(100.0 * COUNT(*) / (SELECT COUNT(*) FROM customer), 4) AS pct FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment;
SELECT p_brand, ROUND(100.0 * SUM(CASE WHEN p_size > 25 THEN 1 ELSE 0 END) / COUNT(*), 4) AS pct_big FROM part GROUP BY p_brand HAVING COUNT(*) >= 5 ORDER BY p_brand LIMIT 12;
SELECT seg, n, SUM(n) OVER (ORDER BY seg ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running FROM (SELECT c_mktsegment AS seg, COUNT(*) AS n FROM customer GROUP BY c_mktsegment) t ORDER BY seg;
SELECT y, n, n - LAG(n) OVER (ORDER BY y) AS yoy FROM (SELECT EXTRACT(YEAR FROM o_orderdate) AS y, COUNT(*) AS n FROM orders GROUP BY 1) t ORDER BY y;
SELECT o_orderstatus, MAX(o_totalprice) AS mx FROM orders GROUP BY o_orderstatus ORDER BY mx DESC, o_orderstatus ASC;
SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS q FROM lineitem GROUP BY 1, 2 ORDER BY 1 ASC, 2 DESC;
SELECT s_name FROM supplier WHERE s_suppkey BETWEEN 5 AND 9 OR s_suppkey BETWEEN 20 AND 22 ORDER BY s_name;
SELECT COUNT(*) AS n FROM orders WHERE o_orderdate >= DATE '1995-01-01' - INTERVAL 30 DAY AND o_orderdate < DATE '1995-01-01';
SELECT doc_id, substr(text, 1, 12) AS head FROM documents WHERE doc_id IN (0, 1, 2) ORDER BY doc_id;
SELECT lang, MIN(length(text)) AS mn, MAX(length(text)) AS mx FROM documents GROUP BY lang HAVING MIN(length(text)) < MAX(length(text)) ORDER BY lang;
SELECT user_id, COUNT(*) AS n, COUNT(DISTINCT event_type) AS nt FROM events GROUP BY user_id HAVING COUNT(*) > 2 * COUNT(DISTINCT event_type) ORDER BY user_id LIMIT 10;
SELECT event_type, CAST(SUM(value) AS DOUBLE) / NULLIF(COUNT(value), 0) AS mean_v FROM events GROUP BY event_type ORDER BY event_type;
SELECT t.k, COUNT(*) AS n FROM (SELECT event_id % 16 AS k FROM events) t GROUP BY t.k HAVING COUNT(*) > 5 ORDER BY t.k;
SELECT a.n_name AS x, COUNT(s.s_suppkey) AS ns, COUNT(c.c_custkey) AS ncust FROM nation a LEFT JOIN supplier s ON s.s_nationkey = a.n_nationkey LEFT JOIN customer c ON c.c_nationkey = a.n_nationkey AND c.c_custkey < 30 GROUP BY a.n_name ORDER BY a.n_name LIMIT 10;
SELECT r_name, SUM(n_cnt) AS nations FROM region LEFT JOIN (SELECT n_regionkey, COUNT(*) AS n_cnt FROM nation GROUP BY n_regionkey) n ON n_regionkey = r_regionkey GROUP BY r_name ORDER BY r_name;
SELECT CASE WHEN o_totalprice >= 200000 THEN 'high' ELSE 'low' END AS band, o_orderstatus, COUNT(*) AS n FROM orders GROUP BY 1, 2 ORDER BY 1, 2;
SELECT COUNT(*) AS n FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F') AND l.l_orderkey < 2000;
SELECT p_type FROM part GROUP BY p_type HAVING COUNT(*) = 1 ORDER BY p_type LIMIT 12;
SELECT x, y FROM (VALUES (1, 'a'), (2, 'b'), (3, 'c'), (4, 'd')) t(x, y) WHERE x % 2 = 0 ORDER BY x;
SELECT v.x + n.n_nationkey AS s FROM (VALUES (100), (200)) v(x) CROSS JOIN nation n WHERE n.n_nationkey < 3 ORDER BY s;
SELECT MAX(len) AS longest FROM (SELECT length(p_name) AS len FROM part UNION ALL SELECT length(s_name) FROM supplier UNION ALL SELECT length(c_name) FROM customer) t;
SELECT o_orderpriority, COUNT(*) AS n FROM orders WHERE o_orderkey % 10 = 0 GROUP BY o_orderpriority ORDER BY n DESC, o_orderpriority LIMIT 3;
SELECT l_partkey FROM lineitem GROUP BY l_partkey HAVING COUNT(DISTINCT l_returnflag) = 3 ORDER BY l_partkey LIMIT 10;
SELECT n1.n_name, n2.n_name AS peer FROM nation n1 JOIN nation n2 ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey <> n2.n_nationkey WHERE n1.n_name = 'BRAZIL' ORDER BY peer;
SELECT source, CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS p75 FROM documents GROUP BY source ORDER BY source;
SELECT COUNT(*) FILTER (WHERE text LIKE '%data%') AS with_data, COUNT(*) AS total FROM documents;
SELECT doc_id FROM documents WHERE length(trim(text)) = 0 ORDER BY doc_id LIMIT 5;
SELECT lang, bool_and(n_chars > 0) AS all_nonempty FROM documents GROUP BY lang ORDER BY lang;
SELECT event_type, MIN(event_id) AS mn FROM events WHERE user_id IN (SELECT user_id FROM events GROUP BY user_id HAVING COUNT(*) >= 10) GROUP BY event_type ORDER BY event_type;
SELECT o_custkey, n FROM (SELECT o_custkey, COUNT(*) AS n, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, o_custkey) AS rn FROM orders GROUP BY o_custkey) t WHERE rn <= 5 ORDER BY rn;
SELECT SUM(CASE WHEN l_discount BETWEEN 0.05 AND 0.07 THEN l_extendedprice * l_discount ELSE 0 END) AS q6ish FROM lineitem WHERE l_shipdate >= DATE '1994-01-01' AND l_shipdate < DATE '1995-01-01';
SELECT c_nationkey FROM customer GROUP BY c_nationkey HAVING SUM(c_acctbal) < 0 ORDER BY c_nationkey LIMIT 10;
SELECT p_size + 0 AS sz, COUNT(DISTINCT p_brand) AS nb FROM part WHERE p_size <= 10 GROUP BY p_size ORDER BY sz;
SELECT upper(r_name) || '_' || lower(r_name) AS mixed FROM region ORDER BY mixed;

-- tranche r5-o: grouping() markers, position math, nth_value,
-- correlated double-nesting, cross-schema unions (validated)
SELECT o_orderstatus, grouping(o_orderstatus) AS g, COUNT(*) AS n FROM orders GROUP BY ROLLUP (o_orderstatus) ORDER BY g, o_orderstatus;
SELECT p_brand, p_size, grouping(p_brand) + grouping(p_size) AS lvl, COUNT(*) AS n FROM part WHERE p_partkey < 300 GROUP BY GROUPING SETS ((p_brand, p_size), (p_brand), ()) ORDER BY lvl, p_brand NULLS FIRST, p_size NULLS FIRST LIMIT 25;
SELECT c_custkey FROM customer c WHERE c_acctbal > (SELECT AVG(o_totalprice) / 100 FROM orders o WHERE o.o_custkey = c.c_custkey) AND c_custkey < 50 ORDER BY c_custkey;
SELECT n_name, position('A' IN n_name) AS pa FROM nation WHERE n_nationkey < 10 ORDER BY n_name;
SELECT p_type, position('BRUSHED' IN p_type) AS pos, COUNT(*) AS n FROM part WHERE position('BRUSHED' IN p_type) > 0 GROUP BY 1, 2 ORDER BY 1;
SELECT x, COUNT(*) AS n FROM (SELECT c_nationkey AS x FROM customer UNION ALL SELECT s_nationkey FROM supplier UNION ALL SELECT n_nationkey FROM nation) u GROUP BY x ORDER BY x LIMIT 12;
SELECT l_orderkey, MAX(l_extendedprice) OVER (PARTITION BY l_orderkey) - l_extendedprice AS below_max FROM lineitem WHERE l_orderkey < 8 ORDER BY l_orderkey, below_max;
SELECT o_orderkey, NTH_VALUE(o_totalprice, 2) OVER (ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_p FROM orders WHERE o_orderkey < 20 ORDER BY o_orderkey;
SELECT doc_id FROM documents d WHERE EXISTS (SELECT 1 FROM documents e WHERE e.lang = d.lang AND e.doc_id = d.doc_id + 1) AND d.doc_id < 15 ORDER BY doc_id;
SELECT lang, COUNT(*) AS n FROM documents WHERE source = (SELECT MIN(source) FROM documents) GROUP BY lang ORDER BY lang;
SELECT event_type, COUNT(*) AS n, MIN(event_id) AS mn, MAX(event_id) AS mx FROM events GROUP BY event_type HAVING MAX(event_id) - MIN(event_id) > 100 ORDER BY event_type;
SELECT a.p_brand, COUNT(*) AS n FROM part a JOIN part b ON a.p_size = b.p_size AND a.p_partkey < b.p_partkey WHERE a.p_size > 45 GROUP BY a.p_brand ORDER BY a.p_brand LIMIT 10;
SELECT COUNT(*) AS n FROM customer WHERE c_name LIKE '%#000000001%' OR c_name LIKE '%#000000002%';
SELECT r_regionkey, CASE r_regionkey WHEN 0 THEN 'zero' WHEN 1 THEN 'one' ELSE 'many' END AS word FROM region ORDER BY r_regionkey;
SELECT MIN(o_orderdate) AS first_order, MAX(o_orderdate) AS last_order, COUNT(*) AS n FROM orders WHERE o_orderstatus = 'P';
SELECT l_returnflag, SUM(l_quantity * l_extendedprice) / SUM(l_quantity) AS weighted_price FROM lineitem WHERE l_orderkey < 400 GROUP BY l_returnflag ORDER BY l_returnflag;
SELECT source, COUNT(CASE WHEN lang = 'en' THEN 1 END) AS en_docs, COUNT(CASE WHEN lang <> 'en' THEN 1 END) AS other_docs FROM documents GROUP BY source ORDER BY source;
SELECT t.tot FROM (SELECT SUM(n_chars) AS tot FROM documents GROUP BY lang) t ORDER BY t.tot LIMIT 3;
SELECT COUNT(DISTINCT o_orderdate) AS nd, COUNT(DISTINCT o_custkey) AS nc FROM orders WHERE o_orderkey < 5000;
SELECT n_regionkey, COUNT(*) AS n FROM nation WHERE n_name > 'J' GROUP BY n_regionkey ORDER BY n_regionkey;
SELECT o_orderpriority FROM orders GROUP BY o_orderpriority HAVING COUNT(*) BETWEEN 100 AND 100000 ORDER BY o_orderpriority;
SELECT event_id, user_id FROM events WHERE event_id IN (SELECT MIN(event_id) FROM events GROUP BY user_id) ORDER BY event_id LIMIT 10;
SELECT d1.source, COUNT(*) AS n FROM documents d1 JOIN documents d2 ON d1.doc_id = d2.doc_id + 250 WHERE d1.lang = d2.lang GROUP BY d1.source ORDER BY d1.source;
SELECT p_brand, MIN(p_retailprice) AS mn FROM part GROUP BY p_brand HAVING MIN(p_retailprice) > (SELECT MIN(p_retailprice) + 50 FROM part) ORDER BY p_brand LIMIT 10;
SELECT CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS a_cnt, CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n_cnt, CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS r_cnt FROM lineitem;
SELECT c_nationkey, MAX(c_acctbal) AS mx FROM customer WHERE c_custkey % 3 = 0 GROUP BY c_nationkey HAVING MAX(c_acctbal) > 9500 ORDER BY c_nationkey;
SELECT repeat(r_name, 2) AS dbl, length(repeat(r_name, 2)) AS l FROM region ORDER BY dbl;
SELECT COALESCE((SELECT n_name FROM nation WHERE n_nationkey = 999), 'missing') AS fallback;

-- tranche r5-p: exists chains, windowed mins, string census
-- shapes, three-way joins (validated)
SELECT COUNT(*) AS n FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 49));
SELECT n_name, s_cnt, c_cnt FROM (SELECT n_nationkey, n_name FROM nation) n JOIN (SELECT s_nationkey, COUNT(*) AS s_cnt FROM supplier GROUP BY s_nationkey) s ON s.s_nationkey = n.n_nationkey JOIN (SELECT c_nationkey, COUNT(*) AS c_cnt FROM customer GROUP BY c_nationkey) c ON c.c_nationkey = n.n_nationkey ORDER BY n_name LIMIT 10;
SELECT l_orderkey, MIN(l_extendedprice) OVER (PARTITION BY l_orderkey) AS cheapest FROM lineitem WHERE l_orderkey < 10 ORDER BY l_orderkey, cheapest;
SELECT o_orderstatus, COUNT(*) AS n, CAST(COUNT(*) AS DOUBLE) / 7.0 AS weekly_rate FROM orders WHERE o_orderkey < 700 GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT substr(n_name, 1, 1) AS initial, COUNT(*) AS n FROM nation GROUP BY 1 ORDER BY 1;
SELECT length(p_type) AS lt, COUNT(DISTINCT p_type) AS nt FROM part GROUP BY 1 ORDER BY 1;
SELECT CAST(l_quantity AS BIGINT) AS q, COUNT(*) AS n FROM lineitem WHERE l_orderkey < 1200 GROUP BY 1 ORDER BY 1 LIMIT 15;
SELECT o_orderkey % 100 AS residue, COUNT(*) AS n FROM orders WHERE o_orderkey < 10000 GROUP BY 1 HAVING COUNT(*) > 20 ORDER BY 1 LIMIT 10;
SELECT c_mktsegment, MAX(length(c_name)) AS ml, MIN(length(c_name)) AS mnl FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment;
SELECT event_type, EXTRACT(HOUR FROM ts) AS h, COUNT(*) AS n FROM events WHERE user_id < 8 GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 20;
SELECT doc_id, CASE WHEN n_chars > 1000 THEN 'long' WHEN n_chars > 100 THEN 'mid' ELSE 'short' END AS bucket FROM documents WHERE doc_id < 10 ORDER BY doc_id;
SELECT bucket, COUNT(*) AS n FROM (SELECT CASE WHEN n_chars > 1000 THEN 'long' WHEN n_chars > 100 THEN 'mid' ELSE 'short' END AS bucket FROM documents) t GROUP BY bucket ORDER BY bucket;
SELECT s.s_name FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey JOIN region r ON n.n_regionkey = r.r_regionkey WHERE r.r_name = 'EUROPE' AND s.s_acctbal > 9000 ORDER BY s.s_name LIMIT 8;
SELECT r_name, COUNT(DISTINCT n_nationkey) AS nn, COUNT(DISTINCT s_suppkey) AS ns FROM region LEFT JOIN nation ON n_regionkey = r_regionkey LEFT JOIN supplier ON s_nationkey = n_nationkey GROUP BY r_name ORDER BY r_name;
SELECT MAX(d) AS max_gap FROM (SELECT o_orderdate - LAG(o_orderdate) OVER (ORDER BY o_orderdate, o_orderkey) AS d FROM orders WHERE o_orderkey < 200) t;
SELECT COUNT(*) AS n FROM (SELECT user_id FROM events GROUP BY user_id HAVING MIN(ts) < (SELECT MIN(ts) + INTERVAL 1 DAY FROM events)) t;
SELECT p_brand FROM part WHERE p_brand NOT IN (SELECT p_brand FROM part WHERE p_size > 40) GROUP BY p_brand ORDER BY p_brand LIMIT 10;
SELECT o_orderpriority, SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END) / NULLIF(SUM(o_totalprice), 0) AS f_share FROM orders WHERE o_orderkey < 3000 GROUP BY o_orderpriority ORDER BY o_orderpriority;
SELECT t1.lang, t1.n AS docs, t2.n AS en_docs FROM (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang) t1 LEFT JOIN (SELECT lang, COUNT(*) AS n FROM documents WHERE source = 'web' GROUP BY lang) t2 ON t1.lang = t2.lang ORDER BY t1.lang;
SELECT COUNT(*) AS n, SUM(length(text)) AS total_chars FROM documents WHERE doc_id BETWEEN 100 AND 199;

-- tranche r5-q: FILTER clause, GROUP BY ALL, CUBE/ROLLUP+GROUPING,
-- VALUES join, twice-referenced CTEs, date_trunc-as-DATE, floor-cast
-- integer surfaces (validated; 6 dialect-trap redrafts)
SELECT o_orderstatus, COUNT(*) FILTER (WHERE o_totalprice > 200000) AS big, COUNT(*) FILTER (WHERE o_totalprice <= 200000) AS small FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT l_returnflag, l_linestatus, COUNT(*) AS n FROM lineitem WHERE l_orderkey < 2000 GROUP BY ALL ORDER BY l_returnflag, l_linestatus;
SELECT c_mktsegment, c_nationkey, COUNT(*) AS n, GROUPING(c_mktsegment) AS g1, GROUPING(c_nationkey) AS g2 FROM customer WHERE c_custkey < 200 GROUP BY CUBE (c_mktsegment, c_nationkey) ORDER BY g1, g2, c_mktsegment, c_nationkey;
SELECT v.grp, COUNT(*) AS n FROM orders o JOIN (VALUES ('F', 'final'), ('O', 'open'), ('P', 'pending')) AS v(st, grp) ON o.o_orderstatus = v.st GROUP BY v.grp ORDER BY v.grp;
WITH seg AS (SELECT c_mktsegment AS s, COUNT(*) AS n FROM customer GROUP BY c_mktsegment) SELECT a.s, a.n, CAST(SUM(b.n) AS BIGINT) AS n_smaller FROM seg a JOIN seg b ON b.n < a.n OR (b.n = a.n AND b.s <= a.s) GROUP BY a.s, a.n ORDER BY a.s;
SELECT n_name, (SELECT COUNT(*) FROM supplier s WHERE s.s_nationkey = n.n_nationkey) AS ns, (SELECT COUNT(*) FROM customer c WHERE c.c_nationkey = n.n_nationkey) AS nc FROM nation n ORDER BY n_name LIMIT 10;
SELECT p_brand, ntile(4) OVER (ORDER BY p_retailprice, p_partkey) AS quartile FROM part WHERE p_partkey < 30 ORDER BY p_partkey LIMIT 12;
SELECT s_name, dense_rank() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS r FROM supplier WHERE s_suppkey < 40 ORDER BY r LIMIT 10;
SELECT upper(lpad(r_name, 10, '.')) AS padded, reverse(r_name) AS rev FROM region ORDER BY r_name;
SELECT replace(p_type, ' ', '_') AS slug, COUNT(*) AS n FROM part WHERE p_partkey < 150 GROUP BY 1 ORDER BY 1 LIMIT 12;
SELECT trim(BOTH 'S' FROM c_mktsegment) AS trimmed, COUNT(*) AS n FROM customer GROUP BY 1 ORDER BY 1;
SELECT o_orderpriority, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS nc FROM orders GROUP BY o_orderpriority HAVING COUNT(DISTINCT o_custkey) > 10 ORDER BY o_orderpriority;
SELECT x.l_orderkey, x.items FROM (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS items FROM lineitem GROUP BY l_orderkey) x WHERE x.items = (SELECT MAX(cnt) FROM (SELECT COUNT(*) AS cnt FROM lineitem GROUP BY l_orderkey) m) ORDER BY x.l_orderkey LIMIT 10;
SELECT n_name FROM nation WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name LIKE 'A%') EXCEPT SELECT n_name FROM nation WHERE n_name LIKE 'I%' ORDER BY n_name;
SELECT least(l_quantity, l_discount * 100, l_tax * 100) AS lo, COUNT(*) AS n FROM lineitem WHERE l_orderkey < 300 GROUP BY 1 ORDER BY 1 LIMIT 10;
SELECT greatest(length(c_name), c_nationkey, 10) AS g, COUNT(*) AS n FROM customer WHERE c_custkey < 400 GROUP BY 1 ORDER BY 1;
SELECT CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'pos' END AS sign, c_mktsegment, COUNT(*) AS n FROM customer GROUP BY ALL ORDER BY sign, c_mktsegment;
SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey < 500 ORDER BY CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END, o_totalprice DESC, o_orderkey LIMIT 10;
WITH big AS (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 3) SELECT CAST(COUNT(*) AS BIGINT) AS n_cust, CAST(SUM(n) AS BIGINT) AS n_orders FROM big;
SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY ROLLUP (lang, source) ORDER BY GROUPING(lang), GROUPING(source), lang, source LIMIT 25;
SELECT d.lang, COUNT(*) AS n FROM documents d WHERE NOT EXISTS (SELECT 1 FROM documents e WHERE e.lang = d.lang AND e.n_chars > 5000) GROUP BY d.lang ORDER BY d.lang;
SELECT l_linenumber, CAST(COUNT(*) AS BIGINT) AS n, CAST(MIN(l_orderkey) AS BIGINT) AS first_ok FROM lineitem GROUP BY l_linenumber ORDER BY l_linenumber;
SELECT c.c_mktsegment, o.o_orderpriority, COUNT(*) AS n FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey WHERE c.c_custkey < 300 GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 20;
SELECT t.initial, CAST(SUM(t.n) AS BIGINT) AS total FROM (SELECT substr(s_name, 1, 2) AS initial, COUNT(*) AS n FROM supplier GROUP BY 1 UNION ALL SELECT substr(c_name, 1, 2) AS initial, COUNT(*) AS n FROM customer GROUP BY 1) t GROUP BY t.initial ORDER BY t.initial LIMIT 15;
SELECT o_orderstatus, MIN(o_orderdate) AS first_d, MAX(o_orderdate) AS last_d FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT user_id, CAST(COUNT(DISTINCT event_type) AS BIGINT) AS kinds FROM events WHERE user_id < 12 GROUP BY user_id HAVING COUNT(DISTINCT event_type) >= 3 ORDER BY user_id;
SELECT a.r_name, b.r_name AS other FROM region a JOIN region b ON a.r_regionkey < b.r_regionkey ORDER BY a.r_name, b.r_name LIMIT 12;
SELECT doc_id, n_chars FROM documents WHERE n_chars BETWEEN (SELECT MIN(n_chars) FROM documents) AND (SELECT MIN(n_chars) + 20 FROM documents) ORDER BY doc_id LIMIT 10;
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mo, COUNT(*) AS n FROM orders WHERE o_orderkey < 3000 GROUP BY 1 ORDER BY 1 LIMIT 12;
SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n FROM events WHERE user_id < 5 GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 20;
SELECT event_type, CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT) AS v1000 FROM events WHERE user_id < 10 GROUP BY event_type ORDER BY event_type;
SELECT p_size, p_brand FROM part WHERE p_size = (SELECT MIN(p_size) FROM part) AND p_brand = (SELECT MIN(p_brand) FROM part WHERE p_size = (SELECT MIN(p_size) FROM part)) ORDER BY p_partkey LIMIT 5;
SELECT source, CAST(FLOOR(AVG(n_chars)) AS BIGINT) AS avg_chars_floor FROM documents GROUP BY source ORDER BY source;
SELECT vec_id, label FROM embeddings WHERE label = (SELECT MIN(label) FROM embeddings) ORDER BY vec_id LIMIT 8;

-- tranche r5-r: percentile_disc WITHIN GROUP, bool_and/or,
-- max_by/min_by unique keys, RECURSIVE CTEs, window frames with
-- lead/lag defaults, GROUPING SETS + HAVING GROUPING() (validated)
SELECT o_orderstatus, percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS med FROM orders WHERE o_orderkey < 2000 GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT l_returnflag, bool_and(l_quantity > 0) AS all_pos, bool_or(l_discount > 0.09) AS any_big_disc FROM lineitem WHERE l_orderkey < 500 GROUP BY l_returnflag ORDER BY l_returnflag;
SELECT c_mktsegment, max_by(c_name, c_custkey) AS latest_name, min_by(c_name, c_custkey) AS first_name FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment;
WITH RECURSIVE seq(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM seq WHERE n < 10) SELECT CAST(SUM(n) AS BIGINT) AS total, COUNT(*) AS cnt FROM seq;
SELECT o_orderkey, o_totalprice, SUM(o_totalprice) OVER (ORDER BY o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS win3 FROM orders WHERE o_orderkey < 40 ORDER BY o_orderkey;
SELECT o_orderkey, lead(o_orderstatus, 1, 'none') OVER (ORDER BY o_orderkey) AS nxt, lag(o_orderstatus, 2, 'none') OVER (ORDER BY o_orderkey) AS prv2 FROM orders WHERE o_orderkey < 30 ORDER BY o_orderkey;
SELECT l_orderkey, first_value(l_linenumber) OVER (PARTITION BY l_orderkey ORDER BY l_extendedprice DESC, l_linenumber ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS priciest_line FROM lineitem WHERE l_orderkey < 20 ORDER BY l_orderkey, priciest_line;
SELECT n_name FROM nation WHERE n_regionkey = 0 INTERSECT ALL SELECT n_name FROM nation WHERE n_nationkey < 20 ORDER BY n_name;
SELECT n_regionkey FROM nation EXCEPT ALL SELECT r_regionkey FROM region ORDER BY n_regionkey LIMIT 10;
SELECT position('BRASS' IN p_type) AS pos, COUNT(*) AS n FROM part WHERE p_partkey < 300 GROUP BY 1 ORDER BY 1;
SELECT contains(p_name, 'red') AS has_red, COUNT(*) AS n FROM part GROUP BY 1 ORDER BY 1;
SELECT abs(c_acctbal) > c_acctbal AS was_negative, COUNT(*) AS n FROM customer GROUP BY 1 ORDER BY 1;
SELECT c_nationkey, COUNT(*) AS n FROM customer GROUP BY GROUPING SETS ((c_nationkey), ()) ORDER BY GROUPING(c_nationkey), c_nationkey LIMIT 15;
SELECT lang, source, COUNT(*) AS n, GROUPING(lang) + GROUPING(source) AS lvl FROM documents GROUP BY GROUPING SETS ((lang, source), (lang), ()) HAVING GROUPING(source) = 1 ORDER BY lvl, lang;
SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'hot' ELSE 'cold' END AS heat, o_orderstatus, COUNT(*) AS n FROM orders GROUP BY 1, 2 ORDER BY 1, 2;
SELECT s_nationkey, CAST(SUM(CASE WHEN s_acctbal > 5000 THEN 1 WHEN s_acctbal > 0 THEN 0 ELSE -1 END) AS BIGINT) AS score FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey LIMIT 15;
SELECT user_id, COUNT(*) AS n FROM events WHERE props IS NOT NULL AND user_id < 15 GROUP BY user_id HAVING bool_or(event_type = 'purchase') ORDER BY user_id;
SELECT t.k, t.n FROM (SELECT nullif(l_returnflag, 'N') AS k, COUNT(*) AS n FROM lineitem WHERE l_orderkey < 800 GROUP BY 1) t ORDER BY t.k NULLS FIRST;
SELECT coalesce(nullif(o_orderstatus, 'O'), 'open') AS st, COUNT(*) AS n FROM orders WHERE o_orderkey < 2500 GROUP BY 1 ORDER BY 1;
WITH RECURSIVE fib(a, b, i) AS (SELECT 0, 1, 1 UNION ALL SELECT b, a + b, i + 1 FROM fib WHERE i < 15) SELECT CAST(MAX(b) AS BIGINT) AS fib15 FROM fib;
SELECT x.lang, x.med_chars FROM (SELECT lang, percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars) AS med_chars FROM documents GROUP BY lang) x ORDER BY x.lang;
SELECT r_name, CAST((SELECT COUNT(*) FROM nation WHERE n_regionkey = r_regionkey) AS BIGINT) AS nn FROM region ORDER BY r_name;
SELECT p_brand, min_by(p_name, p_retailprice * 1000 + p_partkey) AS cheapest FROM part WHERE p_partkey < 400 GROUP BY p_brand ORDER BY p_brand LIMIT 10;
SELECT event_type, COUNT(*) FILTER (WHERE value > 50) AS hi, COUNT(*) FILTER (WHERE value <= 50) AS lo, COUNT(*) FILTER (WHERE value IS NULL) AS missing FROM events GROUP BY event_type ORDER BY event_type;
SELECT doc_id % 10 AS bucket, bool_and(n_chars > 10) AS all_nontrivial FROM documents GROUP BY 1 ORDER BY 1;
SELECT o.o_orderpriority, CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS n_supp FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey < 1500 GROUP BY 1 ORDER BY 1;
SELECT s_suppkey, s_name FROM supplier WHERE s_acctbal = (SELECT max(s_acctbal) FROM supplier) ORDER BY s_suppkey;
SELECT lang, CAST(SUM(length(replace(text, ' ', ''))) AS BIGINT) AS nonspace_chars FROM documents WHERE doc_id < 60 GROUP BY lang ORDER BY lang;
SELECT r.r_name, bool_or(s.s_acctbal > 9900) AS has_rich FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey JOIN supplier s ON s.s_nationkey = n.n_nationkey GROUP BY r.r_name ORDER BY r.r_name;

-- tranche r5-s: levenshtein, regexp_extract, make_date/last_day,
-- count_if, nth_value, cume_dist, IS DISTINCT FROM, LIMIT..OFFSET,
-- translate/ascii/chr/concat_ws cross-engine pairs (validated)
SELECT levenshtein(r_name, 'EUROPE') AS d, r_name FROM region ORDER BY d, r_name;
SELECT regexp_extract(p_type, '([A-Z]+)$', 1) AS last_word, COUNT(*) AS n FROM part WHERE p_partkey < 200 GROUP BY 1 ORDER BY 1;
SELECT make_date(2024, CAST(o_orderkey % 12 + 1 AS INTEGER), 15) AS d, COUNT(*) AS n FROM orders WHERE o_orderkey < 600 GROUP BY 1 ORDER BY 1;
SELECT count_if(c_acctbal > 5000) AS rich, count_if(c_acctbal < 0) AS debt FROM customer;
SELECT o_orderkey, nth_value(l_linenumber, 2) OVER (PARTITION BY l_orderkey ORDER BY l_extendedprice DESC, l_linenumber ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_priciest FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey WHERE o.o_orderkey < 15 ORDER BY o_orderkey, second_priciest;
SELECT COUNT(*) AS n FROM events e1 JOIN events e2 ON e1.event_id = e2.event_id WHERE e1.props IS DISTINCT FROM e2.props;
SELECT event_type, COUNT(*) AS n FROM events WHERE props IS NULL GROUP BY event_type ORDER BY event_type;
SELECT n_name FROM nation ORDER BY n_name LIMIT 5 OFFSET 10;
SELECT translate(r_name, 'AEIOU', 'aeiou') AS lowered_vowels FROM region ORDER BY r_name;
SELECT ascii(substr(c_mktsegment, 1, 1)) AS first_byte, COUNT(*) AS n FROM customer GROUP BY 1 ORDER BY 1;
SELECT chr(65 + CAST(n_nationkey % 26 AS INTEGER)) AS letter, COUNT(*) AS n FROM nation GROUP BY 1 ORDER BY 1;
SELECT t.k, COUNT(*) AS n FROM (SELECT CAST(c_nationkey AS BIGINT) AS k FROM customer UNION ALL SELECT s_suppkey AS k FROM supplier) t GROUP BY t.k ORDER BY t.k LIMIT 12;
SELECT o_orderkey, cume_dist() OVER (ORDER BY o_totalprice) AS cd FROM orders WHERE o_orderkey < 20 ORDER BY o_orderkey;
SELECT c_mktsegment, any_value(seg_len) AS sl FROM (SELECT c_mktsegment, length(c_mktsegment) AS seg_len FROM customer) t GROUP BY c_mktsegment ORDER BY c_mktsegment;
SELECT last_day(o_orderdate) AS eom, COUNT(*) AS n FROM orders WHERE o_orderkey < 400 GROUP BY 1 ORDER BY 1 LIMIT 10;
SELECT p_brand, CAST(SUM(p_size) AS BIGINT) AS ssize FROM part GROUP BY p_brand ORDER BY ssize DESC, p_brand LIMIT 5 OFFSET 3;
SELECT d1.lang, COUNT(*) AS n FROM documents d1 WHERE d1.n_chars IS DISTINCT FROM (SELECT MAX(n_chars) FROM documents d2 WHERE d2.lang = d1.lang) GROUP BY d1.lang ORDER BY d1.lang;
SELECT event_type, CAST(MIN(event_id) AS BIGINT) AS first_id, CAST(MAX(event_id) AS BIGINT) AS last_id, count_if(value IS NOT NULL) AS n_valued FROM events GROUP BY event_type ORDER BY event_type;
SELECT s_nationkey, COUNT(*) AS n FROM supplier GROUP BY s_nationkey ORDER BY n DESC, s_nationkey LIMIT 6 OFFSET 2;
SELECT regexp_extract(c_name, '([0-9]+)', 1) AS digits, COUNT(*) AS n FROM customer WHERE c_custkey < 50 GROUP BY 1 ORDER BY 1 LIMIT 10;
SELECT upper(concat_ws('/', lang, source)) AS tag, COUNT(*) AS n FROM documents GROUP BY 1 ORDER BY 1 LIMIT 12;
SELECT o_orderstatus, count_if(o_orderpriority LIKE '1%') AS urgent, count_if(o_orderpriority LIKE '5%') AS low FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT x.b, x.mx FROM (SELECT o_orderkey % 4 AS b, MAX(o_totalprice) AS mx FROM orders WHERE o_orderkey < 900 GROUP BY 1) x WHERE x.mx IS DISTINCT FROM NULL ORDER BY x.b;
SELECT levenshtein(substr(p_name, 1, 8), substr(p_brand, 1, 8)) AS d, COUNT(*) AS n FROM part WHERE p_partkey < 250 GROUP BY 1 ORDER BY 1 LIMIT 12;
SELECT make_date(2020 + CAST(n_nationkey % 5 AS INTEGER), 6, 1) AS dt, COUNT(*) AS n FROM nation GROUP BY 1 ORDER BY 1;
SELECT t.grp, t.n FROM (SELECT lang AS grp, COUNT(*) AS n FROM documents GROUP BY lang UNION ALL SELECT 'TOTAL' AS grp, COUNT(*) AS n FROM documents) t ORDER BY t.grp = 'TOTAL', t.grp;
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n, CAST(COUNT(*) - count_if(c_acctbal > 0) AS BIGINT) AS nonpos FROM customer GROUP BY c_nationkey HAVING count_if(c_acctbal > 0) < COUNT(*) ORDER BY c_nationkey LIMIT 10;

-- tranche r5-t: bit_count, left/right, md5 census, EXTRACT(QUARTER),
-- scalar EXISTS in projection, triple INTERSECT, ROLLUP with explicit
-- NULLS FIRST ordering, LIKE ESCAPE, negative-dividend modulo (validated)
SELECT bit_count(o_orderkey) AS bits, COUNT(*) AS n FROM orders WHERE o_orderkey < 4000 GROUP BY 1 ORDER BY 1;
SELECT left(c_name, 9) AS l9, right(c_name, 2) AS r2, COUNT(*) AS n FROM customer WHERE c_custkey < 40 GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 15;
SELECT substr(md5(text), 1, 1) AS h, COUNT(*) AS n FROM documents GROUP BY 1 ORDER BY 1;
SELECT EXTRACT(QUARTER FROM o_orderdate) AS q, COUNT(*) AS n FROM orders WHERE o_orderkey < 2000 GROUP BY 1 ORDER BY 1;
SELECT c_name, EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000) AS has_big FROM customer c WHERE c.c_custkey < 12 ORDER BY c_custkey;
SELECT p_name FROM part WHERE p_name NOT LIKE '%green%' AND p_partkey < 25 ORDER BY p_partkey LIMIT 8;
SELECT n_name FROM nation WHERE n_nationkey < 15 INTERSECT SELECT n_name FROM nation WHERE n_regionkey < 3 INTERSECT SELECT n_name FROM nation WHERE length(n_name) > 4 ORDER BY n_name;
SELECT t.o_custkey, t.r FROM (SELECT o_custkey, o_totalprice, rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS r FROM orders WHERE o_custkey < 20) t WHERE t.r = 1 ORDER BY t.o_custkey;
SELECT a.c_mktsegment, b.top_bal, COUNT(*) AS n FROM customer a CROSS JOIN (SELECT MAX(c_acctbal) AS top_bal FROM customer) b WHERE a.c_acctbal > b.top_bal - 500 GROUP BY 1, 2 ORDER BY 1;
SELECT o_orderstatus, COALESCE(MAX(CASE WHEN o_totalprice > 400000 THEN o_orderkey END), -1) AS big_key FROM orders WHERE o_orderkey < 3000 GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT l_returnflag, CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_ord, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_part FROM lineitem WHERE l_orderkey < 1000 GROUP BY l_returnflag HAVING COUNT(DISTINCT l_orderkey) > 10 ORDER BY l_returnflag;
SELECT s_nationkey, CAST(SUM(CAST(s_acctbal > 0 AS INTEGER)) AS BIGINT) AS n_pos FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey LIMIT 12;
SELECT (0 - o_orderkey) % 7 AS m, COUNT(*) AS n FROM orders WHERE o_orderkey < 1000 GROUP BY 1 ORDER BY 1;
SELECT x.n_name, y.n_orders FROM nation x JOIN (SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_orders FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey GROUP BY c_nationkey ORDER BY n_orders DESC LIMIT 5) y ON y.c_nationkey = x.n_nationkey ORDER BY y.n_orders DESC, x.n_name;
SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n FROM orders WHERE CAST(o_orderdate AS DATE) IN (DATE '1995-06-15', DATE '1996-01-02') GROUP BY 1 ORDER BY 1;
SELECT lang FROM documents GROUP BY lang HAVING COUNT(*) BETWEEN 10 AND 10000 ORDER BY lang;
SELECT user_id, event_type FROM events WHERE user_id < 4 GROUP BY user_id, event_type HAVING COUNT(*) >= 2 ORDER BY user_id, event_type LIMIT 15;
SELECT r_name, (SELECT MAX(n_name) FROM nation WHERE n_regionkey = r_regionkey) AS max_nation FROM region ORDER BY r_name;
SELECT doc_id FROM documents WHERE lang = 'en' EXCEPT SELECT doc_id FROM documents WHERE source = 'web' ORDER BY doc_id LIMIT 10;
SELECT t1.doc_id, t2.lang FROM (SELECT doc_id FROM documents WHERE n_chars > 2000 ORDER BY doc_id LIMIT 5) t1 JOIN documents t2 ON t1.doc_id = t2.doc_id ORDER BY t1.doc_id;
SELECT p_type, COUNT(*) AS n FROM part WHERE p_type LIKE '%!%%' ESCAPE '!' GROUP BY p_type ORDER BY p_type LIMIT 5;
SELECT o_orderpriority, MIN(o_orderkey) AS mn, MAX(o_orderkey) AS mx, CAST(MAX(o_orderkey) - MIN(o_orderkey) AS BIGINT) AS span FROM orders WHERE o_orderkey < 5000 GROUP BY o_orderpriority ORDER BY o_orderpriority;
SELECT b.bucket, COUNT(*) AS n FROM (SELECT CASE WHEN value IS NULL THEN 'null' WHEN value < 25 THEN 'low' WHEN value < 75 THEN 'mid' ELSE 'high' END AS bucket FROM events) b GROUP BY 1 ORDER BY 1;
SELECT c.c_custkey FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) AND c.c_custkey < 30 ORDER BY c.c_custkey LIMIT 10;
SELECT CASE WHEN p_size < 10 THEN 'S' WHEN p_size < 30 THEN 'M' ELSE 'L' END AS size_cls, p_brand, COUNT(*) AS n FROM part GROUP BY ROLLUP (1, 2) ORDER BY size_cls NULLS FIRST, p_brand NULLS FIRST LIMIT 20;
SELECT d.lang, d.source, d.n_chars FROM documents d WHERE EXISTS (SELECT 1 FROM documents g WHERE g.lang = d.lang AND g.source = d.source GROUP BY g.lang, g.source HAVING COUNT(*) > 5) AND d.doc_id < 12 ORDER BY d.doc_id;

-- tranche r5-u: SUM(DISTINCT), partitioned ntile, second-highest
-- row_number pattern, INTERVAL arithmetic, HAVING on compared
-- conditional sums, year-over-year lag deltas (validated)
SELECT l_returnflag, CAST(SUM(DISTINCT CAST(l_quantity AS BIGINT)) AS BIGINT) AS sdq FROM lineitem WHERE l_orderkey < 600 GROUP BY l_returnflag ORDER BY l_returnflag;
SELECT o_orderpriority, ntile(3) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS t FROM orders WHERE o_orderkey < 25 ORDER BY o_orderkey;
SELECT CASE WHEN p_size < 5 THEN 'tiny' ELSE CASE WHEN p_brand LIKE '%4%' THEN 'b4' ELSE 'other' END END AS cls, COUNT(*) AS n FROM part GROUP BY 1 ORDER BY 1;
SELECT COUNT(*) AS n FROM orders WHERE o_orderdate + INTERVAL 30 DAY < TIMESTAMP '1995-01-01 00:00:00';
SELECT n_name, COALESCE(s.cnt, 0) AS suppliers FROM nation n LEFT JOIN (SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS cnt FROM supplier GROUP BY s_nationkey) s ON COALESCE(s.s_nationkey, -1) = n.n_nationkey ORDER BY n_name LIMIT 10;
SELECT r_name FROM region WHERE r_name NOT IN ('EUROPE', 'ASIA') ORDER BY r_name;
SELECT t.o_custkey, t.o_totalprice FROM (SELECT o_custkey, o_totalprice, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders WHERE o_custkey < 25) t WHERE t.rn = 2 ORDER BY t.o_custkey;
SELECT p_brand FROM part WHERE p_brand BETWEEN 'Brand#2' AND 'Brand#4' GROUP BY p_brand ORDER BY p_brand LIMIT 10;
SELECT o_orderstatus, CAST(SUM(CASE WHEN EXTRACT(YEAR FROM o_orderdate) < 1995 THEN 1 ELSE 0 END) AS BIGINT) AS early, CAST(SUM(CASE WHEN EXTRACT(YEAR FROM o_orderdate) >= 1995 THEN 1 ELSE 0 END) AS BIGINT) AS late FROM orders WHERE o_orderkey < 4000 GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT x.seg FROM (SELECT c_mktsegment AS seg FROM customer UNION SELECT 'SYNTH' AS seg) x ORDER BY x.seg;
SELECT s.s_name FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey WHERE n.n_name IN (SELECT n_name FROM nation WHERE n_regionkey = 2) AND s.s_acctbal > 9500 ORDER BY s.s_name LIMIT 8;
SELECT trim(TRAILING '5' FROM CAST(o_orderkey AS STRING)) AS stripped, COUNT(*) AS n FROM orders WHERE o_orderkey < 100 GROUP BY 1 ORDER BY 1 LIMIT 12;
SELECT user_id, CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views, CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS buys FROM events WHERE user_id < 8 GROUP BY user_id HAVING SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) > SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) ORDER BY user_id;
SELECT d.source, CAST(MAX(d.n_chars) - MIN(d.n_chars) AS BIGINT) AS spread FROM documents d GROUP BY d.source ORDER BY d.source;
SELECT a.n_regionkey, CAST(COUNT(*) AS BIGINT) AS pairs FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey GROUP BY a.n_regionkey ORDER BY a.n_regionkey;
SELECT o_orderkey FROM orders WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) = 7) ORDER BY o_orderkey LIMIT 10;
SELECT lang, CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN n_chars ELSE 0 END) AS BIGINT) AS even_chars, CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN n_chars ELSE 0 END) AS BIGINT) AS odd_chars FROM documents GROUP BY lang ORDER BY lang;
SELECT c_nationkey, c_mktsegment, COUNT(*) AS n FROM customer WHERE c_nationkey IN (0, 5, 10) GROUP BY GROUPING SETS ((c_nationkey, c_mktsegment), (c_nationkey)) ORDER BY c_nationkey, c_mktsegment NULLS LAST LIMIT 24;
SELECT event_type, MIN(ts) AS first_ts, MAX(ts) AS last_ts FROM events WHERE user_id = 3 GROUP BY event_type ORDER BY event_type;
SELECT p.p_type, CAST(COUNT(l.l_orderkey) AS BIGINT) AS lineitems FROM part p LEFT JOIN lineitem l ON l.l_partkey = p.p_partkey AND l.l_quantity > 45 WHERE p.p_partkey < 60 GROUP BY p.p_type ORDER BY p.p_type LIMIT 12;
SELECT w.yr, w.n, w.n - lag(w.n, 1) OVER (ORDER BY w.yr) AS delta FROM (SELECT EXTRACT(YEAR FROM o_orderdate) AS yr, CAST(COUNT(*) AS BIGINT) AS n FROM orders WHERE o_orderkey < 3000 GROUP BY 1) w ORDER BY w.yr;
SELECT CAST(FLOOR(o_totalprice / 100000) AS BIGINT) AS price_band, COUNT(*) AS n FROM orders WHERE o_orderkey < 2500 GROUP BY 1 ORDER BY 1;
SELECT s_suppkey FROM supplier WHERE s_suppkey NOT IN (SELECT CAST(r_regionkey AS BIGINT) FROM region) ORDER BY s_suppkey LIMIT 10;

-- tranche r5-v: pure-SQL sessionization (lag gaps + flag sums),
-- IQR via percentile_disc, modal value via tie-broken max_by,
-- adjacency self-joins, bitwise ops, per-group top-k sums (validated)
SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions FROM (SELECT user_id, CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTE OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1 ELSE 0 END AS new_session FROM events WHERE user_id < 6) s GROUP BY user_id ORDER BY user_id;
SELECT lang, percentile_disc(0.25) WITHIN GROUP (ORDER BY n_chars) AS q1, percentile_disc(0.75) WITHIN GROUP (ORDER BY n_chars) AS q3 FROM documents GROUP BY lang ORDER BY lang;
SELECT o_orderstatus, max_by(o_orderpriority, cnt * 1000000 + CASE o_orderpriority WHEN '1-URGENT' THEN 5 WHEN '2-HIGH' THEN 4 WHEN '3-MEDIUM' THEN 3 WHEN '4-NOT SPECIFIED' THEN 2 ELSE 1 END) AS modal_priority FROM (SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt FROM orders GROUP BY 1, 2) t GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT u.user_id, CAST(u.first_buy > u.first_view AS INTEGER) AS viewed_first FROM (SELECT user_id, MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_buy, MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view FROM events WHERE user_id < 10 GROUP BY user_id) u WHERE u.first_buy IS NOT NULL AND u.first_view IS NOT NULL ORDER BY u.user_id;
SELECT n_nationkey & 7 AS band, n_nationkey | 16 AS ored, COUNT(*) AS n FROM nation GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 15;
SELECT hex(n_nationkey) AS h, n_name FROM nation WHERE n_nationkey IN (10, 11, 15, 20) ORDER BY n_nationkey;
SELECT rpad(r_name, 12, '*') AS padded FROM region ORDER BY padded;
SELECT greatest(r_name, 'EUROPE') AS g, COUNT(*) AS n FROM region GROUP BY 1 ORDER BY 1;
SELECT EXTRACT(DAY FROM o_orderdate) AS dom, COUNT(*) AS n FROM orders WHERE o_orderkey < 1200 GROUP BY 1 ORDER BY 1 LIMIT 16;
SELECT c_mktsegment FROM customer GROUP BY c_mktsegment HAVING COUNT(DISTINCT c_nationkey) >= (SELECT COUNT(*) FROM region) ORDER BY c_mktsegment;
SELECT t.src, t.k, SUM(t.v) AS sv FROM (SELECT 'o' AS src, o_orderstatus AS k, CAST(COUNT(*) AS BIGINT) AS v FROM orders GROUP BY 2 UNION ALL SELECT 'l' AS src, l_linestatus AS k, CAST(COUNT(*) AS BIGINT) AS v FROM lineitem GROUP BY 2 UNION ALL SELECT 'd' AS src, lang AS k, CAST(COUNT(*) AS BIGINT) AS v FROM documents GROUP BY 2) t GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 20;
SELECT e1.user_id, e1.event_type AS a, e2.event_type AS b, COUNT(*) AS n FROM events e1 JOIN events e2 ON e2.user_id = e1.user_id AND e2.event_id = e1.event_id + 1 WHERE e1.user_id < 4 GROUP BY 1, 2, 3 ORDER BY 1, 2, 3 LIMIT 15;
SELECT src, n FROM (SELECT source AS src, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY source) x ORDER BY n DESC, src LIMIT 3;
SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n FROM part WHERE p_partkey BETWEEN 10 AND 99 GROUP BY p_brand ORDER BY n DESC, p_brand LIMIT 6;
SELECT lang FROM documents WHERE n_chars > 50 GROUP BY lang EXCEPT SELECT lang FROM documents WHERE n_chars > 100000 GROUP BY lang ORDER BY lang;
SELECT user_id, MIN(value) AS mn, MAX(value) AS mx FROM events WHERE value IS NOT NULL AND user_id < 6 GROUP BY user_id HAVING MIN(value) < MAX(value) / 2 ORDER BY user_id;
SELECT a.p_size, b.p_size AS bigger, COUNT(*) AS n FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1 AND b.p_size > a.p_size WHERE a.p_partkey < 150 GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 15;
SELECT s_name FROM supplier WHERE length(s_name) = (SELECT MAX(length(s_name)) FROM supplier) ORDER BY s_name;
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n FROM orders o WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_discount = 0.0) GROUP BY o_orderpriority ORDER BY o_orderpriority;
SELECT x.flag, CAST(SUM(x.qty) AS BIGINT) AS total FROM (SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS qty, row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn FROM lineitem WHERE l_orderkey < 2000) x WHERE x.rn <= 10 GROUP BY x.flag ORDER BY x.flag;
SELECT c_nationkey, CAST(AVG(length(c_name)) * 100 AS BIGINT) AS avg_len_c100 FROM customer GROUP BY c_nationkey HAVING COUNT(*) > 3 ORDER BY c_nationkey LIMIT 12;
SELECT CAST(value AS BIGINT) AS vi, COUNT(*) AS n FROM events WHERE value IS NOT NULL AND value = CAST(value AS BIGINT) AND user_id < 40 GROUP BY 1 ORDER BY 1 LIMIT 10;
SELECT doc_id, lang FROM documents WHERE doc_id IN (1, 2, 3) UNION ALL SELECT doc_id, lang FROM documents WHERE doc_id IN (3, 4) ORDER BY doc_id, lang;
SELECT CAST(FLOOR(n_chars / 500) AS BIGINT) AS bucket, lang, COUNT(*) AS n FROM documents WHERE lang IN ('en', 'de') GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 20;

-- tranche r5-w: scalar-subquery arithmetic, UNION type coercion,
-- COALESCE/NULLIF chains, LIKE underscore wildcards, correlated
-- above-group-average, windowed group totals (validated)
SELECT o_orderkey, o_totalprice - (SELECT MIN(o_totalprice) FROM orders) AS above_min FROM orders WHERE o_orderkey < 12 ORDER BY o_orderkey;
SELECT k FROM (SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation UNION SELECT c_custkey AS k FROM customer WHERE c_custkey < 5) t ORDER BY k LIMIT 12;
SELECT COALESCE(NULLIF(lang, 'en'), NULLIF(source, 'web'), 'both-default') AS pick, COUNT(*) AS n FROM documents GROUP BY 1 ORDER BY 1;
SELECT COUNT(*) AS n FROM orders WHERE o_orderdate - INTERVAL 7 DAY > TIMESTAMP '1998-07-01 00:00:00';
SELECT n_name FROM nation WHERE n_name LIKE '_R%' ORDER BY n_name;
SELECT p_brand FROM part WHERE p_brand LIKE 'Brand#_3' GROUP BY p_brand ORDER BY p_brand;
SELECT c.c_custkey FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) AND NOT EXISTS (SELECT 1 FROM orders o2 WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F') ORDER BY c.c_custkey LIMIT 10;
SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey < 40 ORDER BY length(o_orderpriority), o_orderkey LIMIT 12;
SELECT l_orderkey, CAST(SUM(CASE WHEN l_linenumber <= 3 THEN l_quantity ELSE 0 END) AS BIGINT) AS first3_qty FROM lineitem WHERE l_orderkey < 100 GROUP BY l_orderkey ORDER BY l_orderkey LIMIT 12;
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, CAST((SELECT COUNT(*) FROM events) AS BIGINT) AS total FROM events GROUP BY event_type ORDER BY event_type;
SELECT s_nationkey, s_name, s_acctbal FROM supplier s WHERE s_acctbal > (SELECT AVG(s_acctbal) FROM supplier s2 WHERE s2.s_nationkey = s.s_nationkey) ORDER BY s_nationkey, s_name LIMIT 10;
SELECT doc_id, substr(text, 1, 10) AS head10 FROM documents WHERE doc_id < 6 ORDER BY doc_id;
SELECT lang, MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc FROM documents GROUP BY lang ORDER BY lang;
SELECT x.priority, x.status, x.n, SUM(x.n) OVER (PARTITION BY x.priority) AS priority_total FROM (SELECT o_orderpriority AS priority, o_orderstatus AS status, CAST(COUNT(*) AS BIGINT) AS n FROM orders WHERE o_orderkey < 2000 GROUP BY 1, 2) x ORDER BY x.priority, x.status;
SELECT CAST(l_tax * 100 AS INTEGER) AS tax_pct, COUNT(*) AS n FROM lineitem WHERE l_orderkey < 700 AND l_tax IN (0.0, 0.02, 0.04) GROUP BY 1 ORDER BY 1;
SELECT r.r_name, n.n_name FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey WHERE n.n_name > r.r_name ORDER BY r.r_name, n.n_name LIMIT 10;
SELECT user_id, CAST(MAX(event_id) - MIN(event_id) AS BIGINT) AS id_span, CAST(COUNT(*) AS BIGINT) AS n FROM events WHERE user_id < 7 GROUP BY user_id HAVING MAX(event_id) - MIN(event_id) + 1 > COUNT(*) ORDER BY user_id;
SELECT 'total' AS scope, CAST(COUNT(*) AS BIGINT) AS n FROM lineitem UNION ALL SELECT 'filtered' AS scope, CAST(COUNT(*) AS BIGINT) AS n FROM lineitem WHERE l_discount > 0.05 ORDER BY scope;
SELECT p_size + p_partkey % 10 AS synth_key, COUNT(*) AS n FROM part WHERE p_partkey < 120 GROUP BY 1 ORDER BY 1 LIMIT 15;
SELECT c_mktsegment, CAST(SUM(length(c_name)) AS BIGINT) AS chars FROM customer WHERE c_custkey % 5 IN (0, 1) GROUP BY c_mktsegment ORDER BY c_mktsegment;
-- tranche r5-x: exact-median/mode folds, EXISTS/subquery-in-CASE,
-- multi-distinct aggregates, window-over-derived, GROUPING SETS/ROLLUP
-- with HAVING, correlated MAX-guards, FILTER+DISTINCT combos (validated)
SELECT l_returnflag, CAST(FLOOR(median(CAST(l_quantity AS BIGINT)) * 2) AS BIGINT) AS med2 FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag;
SELECT o_orderstatus, CAST(FLOOR(median(o_custkey % 100) * 2) AS BIGINT) AS med2, COUNT(*) AS n FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT c_mktsegment, CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS nations, CAST(COUNT(DISTINCT c_custkey % 7) AS BIGINT) AS mods FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment;
SELECT n_regionkey, CAST(COUNT(DISTINCT n_name) FILTER (WHERE n_nationkey % 2 = 0) AS BIGINT) AS even_names FROM nation GROUP BY n_regionkey ORDER BY n_regionkey;
SELECT o_orderkey, CASE WHEN EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45) THEN 'bulk' ELSE 'small' END AS kind FROM orders o WHERE o_orderkey < 30 ORDER BY o_orderkey;
SELECT p_brand, CAST(SUM(CASE WHEN p_size > (SELECT AVG(p_size) FROM part) THEN 1 ELSE 0 END) AS BIGINT) AS above_avg FROM part GROUP BY p_brand ORDER BY p_brand LIMIT 12;
SELECT t.lang, t.rnk, t.doc_id FROM (SELECT lang, doc_id, dense_rank() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rnk FROM documents) t WHERE t.rnk = 1 ORDER BY t.lang, t.doc_id;
SELECT u.user_id, u.n, rank() OVER (ORDER BY u.n DESC, u.user_id) AS r FROM (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM events WHERE user_id < 25 GROUP BY user_id) u ORDER BY r, u.user_id LIMIT 15;
SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n FROM supplier GROUP BY s_nationkey HAVING COUNT(*) > (SELECT COUNT(*) FROM supplier) / 50 ORDER BY s_nationkey;
SELECT a.n_name AS lo, b.n_name AS hi FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey AND a.n_name < b.n_name WHERE a.n_regionkey = 2 ORDER BY lo, hi;
SELECT l_linestatus, CAST(SUM(DISTINCT CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_dq FROM lineitem WHERE l_orderkey < 400 GROUP BY l_linestatus ORDER BY l_linestatus;
SELECT o_orderpriority, CAST(AVG(DISTINCT o_orderkey % 10) AS BIGINT) AS avg_dm FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority;
SELECT doc_id, n_chars, CAST(SUM(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll3 FROM documents WHERE doc_id < 12 ORDER BY doc_id;
SELECT event_type, CAST(MAX(user_id) FILTER (WHERE event_id % 3 = 0) AS BIGINT) AS max_u_div3 FROM events GROUP BY event_type ORDER BY event_type;
SELECT x.seg, x.cnt FROM (SELECT c_mktsegment AS seg, COUNT(*) AS cnt FROM customer GROUP BY c_mktsegment) x WHERE x.cnt = (SELECT MAX(cnt) FROM (SELECT COUNT(*) AS cnt FROM customer GROUP BY c_mktsegment) y) ORDER BY x.seg;
SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING COUNT(DISTINCT l_suppkey) = COUNT(*) AND COUNT(*) > 3 ORDER BY l_orderkey LIMIT 12;
SELECT n.n_name, coalesce(s.n, 0) AS suppliers FROM nation n LEFT JOIN (SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n FROM supplier GROUP BY s_nationkey) s ON s.s_nationkey = n.n_nationkey ORDER BY suppliers DESC, n.n_name LIMIT 10;
SELECT CAST(o_orderkey % 5 AS BIGINT) AS bucket, CAST(FLOOR(min(o_totalprice) * 100) AS BIGINT) AS min_cents FROM orders WHERE o_orderkey < 3000 GROUP BY 1 ORDER BY 1;
SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY ROLLUP (lang, source) HAVING lang IS NOT NULL ORDER BY lang, source NULLS FIRST;
SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n FROM part WHERE p_brand IN (SELECT p_brand FROM part WHERE p_size > 40) GROUP BY p_brand ORDER BY p_brand LIMIT 12;
SELECT c_custkey FROM customer c WHERE c_acctbal > (SELECT COALESCE(MAX(o_totalprice / 1000), -1e9) FROM orders o WHERE o.o_custkey = c.c_custkey) AND c_custkey < 40 ORDER BY c_custkey;
SELECT c_custkey FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND c.c_acctbal < o.o_totalprice) AND c_custkey < 25 ORDER BY c_custkey;
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, CAST(FLOOR(100.0 * COUNT(*) / SUM(COUNT(*)) OVER ()) AS BIGINT) AS pct FROM events GROUP BY event_type ORDER BY event_type;
SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus)) ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST;
SELECT l_returnflag, CAST(FLOOR(var_pop(l_linenumber)) AS BIGINT) AS vp FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag;
SELECT upper(substr(n_name, 1, 1)) AS initial, CAST(COUNT(*) AS BIGINT) AS n FROM nation GROUP BY 1 ORDER BY 1;
SELECT doc_id FROM documents WHERE length(trim(text)) < length(text) AND doc_id < 200 ORDER BY doc_id LIMIT 12;
SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey NOT IN (SELECT l_suppkey FROM lineitem WHERE l_quantity > 49) ORDER BY s_suppkey LIMIT 10;
SELECT r_name, (SELECT CAST(COUNT(*) AS BIGINT) FROM nation n WHERE n.n_regionkey = r.r_regionkey) AS n_nations FROM region r ORDER BY r_name;
SELECT CAST(FLOOR(AVG(cnt)) AS BIGINT) AS avg_lines_per_order FROM (SELECT l_orderkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_orderkey) t;
SELECT lang, CAST(COUNT(CASE WHEN n_chars BETWEEN 100 AND 999 THEN 1 END) AS BIGINT) AS mid, CAST(COUNT(CASE WHEN n_chars >= 1000 THEN 1 END) AS BIGINT) AS big FROM documents GROUP BY lang ORDER BY lang;
SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderdate = (SELECT MAX(o_orderdate) FROM orders) ORDER BY o_orderkey LIMIT 10;
SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n FROM lineitem WHERE l_shipdate > (SELECT MIN(o_orderdate) FROM orders) + INTERVAL 30 DAY GROUP BY l_orderkey ORDER BY n DESC, l_orderkey LIMIT 10;
SELECT user_id, event_id, CAST(lag(event_id, 2) OVER (PARTITION BY user_id ORDER BY event_id) AS BIGINT) AS lag2 FROM events WHERE user_id < 4 ORDER BY user_id, event_id LIMIT 20;
SELECT user_id, event_id, CAST(nth_value(event_id, 2) OVER (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS second_seen FROM events WHERE user_id < 3 ORDER BY user_id, event_id LIMIT 18;
SELECT substr(p_type, 1, instr(p_type, ' ') - 1) AS type_head, CAST(COUNT(*) AS BIGINT) AS n FROM part WHERE instr(p_type, ' ') > 1 GROUP BY 1 ORDER BY 1 LIMIT 12;
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n FROM customer WHERE ascii(c_name) BETWEEN 65 AND 90 GROUP BY c_nationkey ORDER BY c_nationkey LIMIT 12;
SELECT doc_id, CAST(instr(text, 'def ') AS BIGINT) AS first_def FROM documents WHERE instr(text, 'def ') > 0 AND doc_id < 300 ORDER BY doc_id LIMIT 15;
SELECT o_orderpriority, CAST(SUM(length(o_orderstatus) + length(o_orderpriority)) AS BIGINT) AS chars FROM orders WHERE o_orderkey < 500 GROUP BY o_orderpriority ORDER BY o_orderpriority;
SELECT lang, CAST(FLOOR(mode() WITHIN GROUP (ORDER BY n_chars)) AS BIGINT) AS modal_len FROM documents WHERE lang IN ('en', 'fr') GROUP BY lang ORDER BY lang;
-- tranche r5-y: ntile/percent_rank/cume_dist integer folds,
-- first/last_value frames, least/greatest, lpad/rpad/translate, 4-way
-- joins, LEFT-JOIN-IS-NULL anti, tuple IN, date_trunc casts (validated)
SELECT user_id, event_id, ntile(4) OVER (PARTITION BY user_id ORDER BY event_id) AS quartile FROM events WHERE user_id < 3 ORDER BY user_id, event_id LIMIT 24;
SELECT doc_id, CAST(FLOOR(percent_rank() OVER (ORDER BY n_chars, doc_id) * 1000) AS BIGINT) AS pr1000 FROM documents WHERE doc_id < 20 ORDER BY doc_id;
SELECT doc_id, CAST(FLOOR(cume_dist() OVER (ORDER BY n_chars, doc_id) * 100) AS BIGINT) AS cd100 FROM documents WHERE doc_id < 15 ORDER BY doc_id;
SELECT lang, doc_id, first_value(doc_id) OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS biggest FROM documents WHERE doc_id < 30 ORDER BY lang, doc_id;
SELECT lang, doc_id, last_value(doc_id) OVER (PARTITION BY lang ORDER BY doc_id ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS last_doc FROM documents WHERE doc_id < 25 ORDER BY lang, doc_id;
SELECT n_name, least(n_nationkey, n_regionkey * 3) AS lo, greatest(n_nationkey, n_regionkey * 3) AS hi FROM nation ORDER BY n_name LIMIT 15;
SELECT c_custkey, lpad(CAST(c_custkey AS VARCHAR(6)), 6, '0') AS padded FROM customer WHERE c_custkey < 12 ORDER BY c_custkey;
SELECT s_suppkey, rpad(substr(s_name, 1, 8), 12, '.') AS tag FROM supplier WHERE s_suppkey < 10 ORDER BY s_suppkey;
SELECT n_name, translate(n_name, 'AEIOU', 'aeiou') AS lowered_vowels FROM nation ORDER BY n_name LIMIT 12;
SELECT r.r_name, n.n_name, CAST(COUNT(s.s_suppkey) AS BIGINT) AS suppliers, CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS customers FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey GROUP BY r.r_name, n.n_name ORDER BY r.r_name, n.n_name LIMIT 15;
SELECT c.c_custkey FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey WHERE o.o_orderkey IS NULL ORDER BY c.c_custkey LIMIT 12;
SELECT CASE WHEN o_totalprice < 50000 THEN 'lo' WHEN o_totalprice < 150000 THEN 'mid' ELSE 'hi' END AS band, CAST(COUNT(*) AS BIGINT) AS n FROM orders GROUP BY 1 ORDER BY 1;
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon, CAST(COUNT(*) AS BIGINT) AS n FROM orders WHERE o_orderkey < 2000 GROUP BY 1 ORDER BY 1 LIMIT 12;
SELECT CAST(date_trunc('year', l_shipdate) AS DATE) AS yr, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty FROM lineitem GROUP BY 1 ORDER BY 1;
SELECT l_orderkey, l_linenumber FROM lineitem WHERE (l_returnflag, l_linestatus) IN (('R', 'F'), ('A', 'F')) AND l_orderkey < 100 ORDER BY l_orderkey, l_linenumber LIMIT 15;
SELECT o_orderstatus, CAST(SUM(CASE WHEN o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS in_1995 FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT x.lang, x.total - x.mx AS rest FROM (SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS total, CAST(MAX(n_chars) AS BIGINT) AS mx FROM documents GROUP BY lang) x ORDER BY x.lang;
SELECT reverse(n_name) AS rev FROM nation WHERE n_nationkey < 8 ORDER BY rev;
SELECT repeat(substr(r_name, 1, 2), 3) AS tri FROM region ORDER BY tri;
SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n FROM part WHERE replace(p_type, ' ', '_') LIKE '%BRUSHED%' GROUP BY p_brand ORDER BY p_brand LIMIT 10;
SELECT event_type, user_id FROM events WHERE user_id IN (SELECT user_id FROM events GROUP BY user_id HAVING COUNT(*) > 50) AND event_id < 100 ORDER BY event_type, user_id LIMIT 15;
SELECT t.mon, t.n, CAST(SUM(t.n) OVER (ORDER BY t.mon ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum FROM (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon, CAST(COUNT(*) AS BIGINT) AS n FROM orders WHERE o_orderdate >= DATE '1997-01-01' GROUP BY 1) t ORDER BY t.mon LIMIT 15;
SELECT c_mktsegment, CAST(MIN(length(c_name)) AS BIGINT) AS shortest, CAST(MAX(length(c_name)) AS BIGINT) AS longest FROM customer GROUP BY c_mktsegment HAVING MIN(length(c_name)) < MAX(length(c_name)) ORDER BY c_mktsegment;
SELECT COALESCE(CAST(NULLIF(n_regionkey, 0) AS VARCHAR(4)), 'zero') AS rk, CAST(COUNT(*) AS BIGINT) AS n FROM nation GROUP BY 1 ORDER BY 1;
SELECT o_orderkey FROM orders WHERE o_orderkey BETWEEN 50 AND 120 AND NOT (o_orderstatus = 'F' OR o_totalprice > 200000) ORDER BY o_orderkey;
SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey AND s.s_acctbal < 0) GROUP BY l_suppkey ORDER BY n DESC, l_suppkey LIMIT 10;
SELECT d.lang, e.event_type, CAST(COUNT(*) AS BIGINT) AS n FROM documents d CROSS JOIN (SELECT DISTINCT event_type FROM events) e WHERE d.doc_id < 10 GROUP BY d.lang, e.event_type ORDER BY d.lang, e.event_type LIMIT 20;
SELECT s_nationkey, min(s_name) || '>' || max(s_name) AS name_span, CAST(COUNT(*) AS BIGINT) AS n FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey LIMIT 12;
SELECT lang, CAST(SUM(n_chars % 10) AS BIGINT) AS lastdigit_sum FROM documents GROUP BY lang HAVING SUM(n_chars % 10) > 0 ORDER BY lang;
SELECT user_id, CAST(MAX(event_id) FILTER (WHERE event_type = 'click') AS BIGINT) AS last_click, CAST(MAX(event_id) FILTER (WHERE event_type <> 'click') AS BIGINT) AS last_other FROM events WHERE user_id < 8 GROUP BY user_id ORDER BY user_id;
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n FROM customer GROUP BY c_nationkey ORDER BY n DESC, c_nationkey LIMIT 5;
SELECT q.b, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS b FROM orders) q GROUP BY q.b ORDER BY q.b;
SELECT n_name FROM nation WHERE n_nationkey = (SELECT MAX(n_nationkey) FROM nation WHERE n_regionkey = 1) ORDER BY n_name;
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n FROM orders WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') GROUP BY o_orderpriority ORDER BY o_orderpriority;
SELECT doc_id, n_chars FROM documents WHERE n_chars = (SELECT MAX(n_chars) FROM documents d2 WHERE d2.lang = documents.lang) ORDER BY doc_id LIMIT 12;
SELECT event_type, CAST(FLOOR(AVG(user_id) * 100) AS BIGINT) AS avg_u100 FROM events WHERE event_id % 2 = 0 GROUP BY event_type ORDER BY event_type;
SELECT a.r_name FROM region a JOIN region b ON a.r_regionkey <> b.r_regionkey GROUP BY a.r_name HAVING COUNT(*) = 4 ORDER BY a.r_name;
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n, CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS orders, CAST(COUNT(*) - COUNT(DISTINCT l_orderkey) AS BIGINT) AS extra_lines FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag;
SELECT upper(trim(substr(p_name, 1, 5))) AS head, CAST(COUNT(*) AS BIGINT) AS n FROM part GROUP BY 1 ORDER BY n DESC, head LIMIT 8;
SELECT user_id, event_id FROM events WHERE user_id < 2 AND event_id > (SELECT -1) ORDER BY user_id, event_id LIMIT 5;
-- tranche r5-z: shared-regexp shapes, RANGE frames on int keys,
-- 3-deep nesting, CTE self-joins, EXTRACT combos, NULL-typed UNION
-- branches, CASE-keyed sorts, percentile_cont folds, DECIMAL cents
-- (validated; traps: regexp_matches/regexp_like/width_bucket/octet_length
-- are single-engine, DuckDB regexp_replace is first-match-only)
SELECT doc_id, regexp_extract(text, '([A-Za-z]+)', 1) AS first_word FROM documents WHERE doc_id < 10 ORDER BY doc_id;
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents WHERE regexp_extract(text, '[a-z]{4} [a-z]{4}', 0) <> '' GROUP BY lang ORDER BY lang;
SELECT n_name, regexp_replace(n_name, '^[AEIOU]', '*') AS starred FROM nation ORDER BY n_name LIMIT 10;
SELECT o_orderkey, position('3' IN CAST(o_orderkey AS VARCHAR(12))) AS pos3 FROM orders WHERE o_orderkey < 40 ORDER BY o_orderkey;
SELECT doc_id, length(rtrim(ltrim(text))) AS trimmed_len, CAST(length(text) AS BIGINT) AS chars FROM documents WHERE doc_id < 8 ORDER BY doc_id;
SELECT user_id, event_id, CAST(SUM(event_id) OVER (PARTITION BY user_id ORDER BY event_id RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT) AS range_sum FROM events WHERE user_id < 3 ORDER BY user_id, event_id LIMIT 20;
SELECT z.lang, z.n FROM (SELECT y.lang, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT x.lang FROM (SELECT lang, n_chars FROM documents WHERE n_chars > 50) x WHERE x.n_chars < 5000) y GROUP BY y.lang) z ORDER BY z.lang;
WITH base AS (SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty FROM lineitem GROUP BY l_orderkey) SELECT a.qty AS q1, CAST(COUNT(*) AS BIGINT) AS n FROM base a JOIN base b ON a.qty = b.qty AND a.l_orderkey < b.l_orderkey GROUP BY a.qty ORDER BY n DESC, q1 LIMIT 10;
WITH counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang), total AS (SELECT SUM(n) AS t FROM counts) SELECT c.lang, CAST(c.n AS BIGINT) AS n, CAST(FLOOR(1000.0 * c.n / t.t) AS BIGINT) AS permille FROM counts c CROSS JOIN total t ORDER BY c.lang;
SELECT EXTRACT(YEAR FROM o_orderdate) AS yr, EXTRACT(MONTH FROM o_orderdate) AS mon, CAST(COUNT(*) AS BIGINT) AS n FROM orders WHERE o_orderkey < 1500 GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 15;
SELECT EXTRACT(DAY FROM l_shipdate) AS dom, CAST(COUNT(*) AS BIGINT) AS n FROM lineitem WHERE l_orderkey < 300 GROUP BY 1 ORDER BY 1 LIMIT 12;
SELECT lang, NULL AS marker FROM documents WHERE doc_id = 1 UNION ALL SELECT 'sentinel' AS lang, 'yes' AS marker ORDER BY lang;
SELECT o_orderstatus FROM orders WHERE o_orderkey < 200 GROUP BY o_orderstatus ORDER BY CASE o_orderstatus WHEN 'P' THEN 0 WHEN 'O' THEN 1 ELSE 2 END;
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n FROM customer GROUP BY c_mktsegment ORDER BY CASE WHEN c_mktsegment = 'BUILDING' THEN 0 ELSE 1 END, c_mktsegment;
SELECT n_regionkey * 2 AS k FROM nation EXCEPT SELECT r_regionkey AS k FROM region ORDER BY k;
SELECT CAST(l_linenumber AS BIGINT) AS k FROM lineitem WHERE l_orderkey < 50 INTERSECT SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation ORDER BY k;
SELECT s.s_name FROM supplier s WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey AND l.l_returnflag = 'R' AND l.l_quantity > 40) ORDER BY s.s_name LIMIT 10;
SELECT o_orderpriority, CAST(SUM(CASE WHEN o_totalprice BETWEEN 10000 AND 100000 THEN 1 ELSE 0 END) AS BIGINT) AS mid_range FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority;
SELECT p_brand, CAST(FLOOR(percentile_cont(0.25) WITHIN GROUP (ORDER BY p_size) * 4) AS BIGINT) AS q1x4 FROM part GROUP BY p_brand ORDER BY p_brand LIMIT 12;
SELECT event_type, CAST(FLOOR(percentile_cont(0.5) WITHIN GROUP (ORDER BY user_id) * 2) AS BIGINT) AS medx2 FROM events GROUP BY event_type ORDER BY event_type;
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n FROM lineitem WHERE l_shipdate >= DATE '1994-01-01' + INTERVAL 60 DAY AND l_shipdate < DATE '1998-01-01' - INTERVAL 90 DAY GROUP BY l_returnflag ORDER BY l_returnflag;
SELECT t.k, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT CAST(c_custkey % 3 AS BIGINT) AS k, c_acctbal FROM customer) t WHERE t.c_acctbal > 0 GROUP BY t.k HAVING COUNT(*) > 10 ORDER BY t.k;
SELECT d1.lang, CAST(COUNT(*) AS BIGINT) AS pairs FROM documents d1 JOIN documents d2 ON d1.lang = d2.lang AND d1.doc_id + 1 = d2.doc_id GROUP BY d1.lang ORDER BY d1.lang;
SELECT o.o_orderstatus, CAST(SUM(sub.qty) AS BIGINT) AS qty FROM orders o JOIN (SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty FROM lineitem GROUP BY l_orderkey) sub ON sub.l_orderkey = o.o_orderkey WHERE o.o_orderkey < 800 GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus;
SELECT c_nationkey, CAST(SUM(CAST(c_acctbal * 100 AS DECIMAL(18,0))) AS BIGINT) AS cents FROM customer GROUP BY c_nationkey ORDER BY c_nationkey LIMIT 12;
SELECT lang, CAST(MAX(n_chars) - MIN(n_chars) AS BIGINT) AS spread FROM documents GROUP BY lang HAVING MAX(n_chars) > 2 * MIN(n_chars) ORDER BY lang;
SELECT user_id, CAST(COUNT(DISTINCT event_type) AS BIGINT) AS kinds FROM events GROUP BY user_id HAVING COUNT(DISTINCT event_type) >= 3 ORDER BY user_id LIMIT 12;
SELECT x.flag, x.mx FROM (SELECT l_returnflag AS flag, MAX(l_shipdate) AS mx FROM lineitem GROUP BY l_returnflag) x WHERE x.mx > DATE '1998-11-01' ORDER BY x.flag;
SELECT r_regionkey, r_name FROM region WHERE r_regionkey NOT IN (SELECT n_regionkey FROM nation WHERE n_nationkey < 3) ORDER BY r_regionkey;
SELECT doc_id, CASE WHEN lang IN ('en', 'de', 'fr') THEN 'euro' WHEN lang IN ('ja', 'zh') THEN 'cjk' ELSE 'other' END AS family FROM documents WHERE doc_id < 16 ORDER BY doc_id;
SELECT f.family, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT CASE WHEN lang IN ('en', 'de', 'fr') THEN 'euro' ELSE 'other' END AS family FROM documents) f GROUP BY f.family ORDER BY f.family;
SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice = (SELECT MIN(o_totalprice) FROM orders WHERE o_orderkey < 500) ORDER BY o_orderkey;
SELECT l_suppkey, l_partkey FROM lineitem WHERE l_orderkey = (SELECT MIN(l_orderkey) FROM lineitem) ORDER BY l_linenumber;
SELECT CAST(SUM(sq.cnt * sq.cnt) AS BIGINT) AS sum_sq FROM (SELECT COUNT(*) AS cnt FROM events GROUP BY user_id) sq;
SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n, CAST(FLOOR(MIN(s_acctbal)) AS BIGINT) AS min_bal FROM supplier WHERE s_acctbal BETWEEN -500 AND 9999 GROUP BY s_nationkey ORDER BY s_nationkey LIMIT 10;
SELECT t.yr, t.n, lag(t.n) OVER (ORDER BY t.yr) AS prev_n FROM (SELECT EXTRACT(YEAR FROM o_orderdate) AS yr, CAST(COUNT(*) AS BIGINT) AS n FROM orders GROUP BY 1) t ORDER BY t.yr;
SELECT event_type, CAST(MIN(event_id) AS BIGINT) AS first_id FROM events WHERE event_id IN (SELECT MIN(event_id) FROM events GROUP BY user_id) GROUP BY event_type ORDER BY event_type;
SELECT p_type, CAST(COUNT(*) AS BIGINT) AS n FROM part WHERE upper(p_type) = p_type GROUP BY p_type ORDER BY p_type LIMIT 8;
SELECT c.c_mktsegment, o.o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey WHERE c.c_custkey % 10 = 0 GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 18;
SELECT b.bucket, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT CAST(FLOOR(n_chars / 2000) AS BIGINT) + CASE WHEN n_chars % 2000 = 0 AND n_chars > 0 THEN 0 ELSE 0 END AS bucket FROM documents) b GROUP BY b.bucket ORDER BY b.bucket;

-- tranche r5-aa: multi-window single-SELECT, EXISTS in HAVING
-- position, lead-delta sequences, 3-branch UNION ALL rollups, correlated
-- SELECT-list aggregates over joins, nested CASE ladders (validated)
SELECT user_id, event_id, CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS BIGINT) AS rn, CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS user_total, CAST(SUM(event_id) OVER (ORDER BY event_id ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT) AS tri_sum FROM events WHERE user_id < 3 ORDER BY user_id, event_id LIMIT 20;
SELECT user_id, event_id, CAST(lead(event_id) OVER (PARTITION BY user_id ORDER BY event_id) - event_id AS BIGINT) AS gap FROM events WHERE user_id < 4 ORDER BY user_id, event_id LIMIT 20;
SELECT t.src, CAST(SUM(t.n) AS BIGINT) AS total FROM (SELECT 'small' AS src, COUNT(*) AS n FROM orders WHERE o_totalprice < 20000 UNION ALL SELECT 'mid' AS src, COUNT(*) AS n FROM orders WHERE o_totalprice >= 20000 AND o_totalprice < 150000 UNION ALL SELECT 'big' AS src, COUNT(*) AS n FROM orders WHERE o_totalprice >= 150000) t GROUP BY t.src ORDER BY t.src;
SELECT n.n_name, (SELECT CAST(COALESCE(SUM(length(s.s_name)), 0) AS BIGINT) FROM supplier s WHERE s.s_nationkey = n.n_nationkey) AS name_chars FROM nation n WHERE n.n_regionkey < 2 ORDER BY n.n_name;
SELECT c_mktsegment FROM customer GROUP BY c_mktsegment HAVING COUNT(*) > 5 AND MAX(c_acctbal) > 1000 AND MIN(length(c_name)) > 5 ORDER BY c_mktsegment;
SELECT o_orderstatus, CASE WHEN COUNT(*) > 500 THEN 'many' WHEN COUNT(*) > 100 THEN 'some' ELSE 'few' END AS volume FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT doc_id, CASE WHEN n_chars < 100 THEN 'xs' WHEN n_chars < 500 THEN CASE WHEN lang = 'en' THEN 's-en' ELSE 's-other' END ELSE 'l' END AS size_class FROM documents WHERE doc_id < 14 ORDER BY doc_id;
SELECT p_brand, CAST(SUM(p_size) AS BIGINT) AS sz FROM part GROUP BY p_brand HAVING SUM(p_size) > (SELECT CAST(AVG(p_size) AS BIGINT) * 3 FROM part) ORDER BY p_brand LIMIT 10;
SELECT l_returnflag, CAST(FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 10) AS BIGINT) AS rev10 FROM lineitem WHERE l_orderkey < 600 GROUP BY l_returnflag ORDER BY l_returnflag;
SELECT u.user_id FROM (SELECT user_id, MIN(event_id) AS first_ev, MAX(event_id) AS last_ev FROM events GROUP BY user_id) u WHERE u.last_ev - u.first_ev > 400 ORDER BY u.user_id LIMIT 12;
SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders, CAST(COALESCE(FLOOR(SUM(o.o_totalprice)), 0) AS BIGINT) AS spend FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey WHERE c.c_custkey < 20 GROUP BY c.c_custkey ORDER BY c.c_custkey;
SELECT x.b, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT CAST(FLOOR(CAST(l_quantity AS BIGINT) / 10) AS BIGINT) AS b FROM lineitem WHERE l_orderkey < 900) x GROUP BY x.b ORDER BY x.b;
SELECT s_name FROM supplier WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name IN ('ASIA', 'EUROPE'))) ORDER BY s_name LIMIT 12;
SELECT e.event_type, CAST(SUM(CASE WHEN e.user_id % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS parity_balance FROM events e GROUP BY e.event_type ORDER BY e.event_type;
SELECT o_orderkey, CAST(length(o_orderpriority) * 2 + length(o_orderstatus) AS BIGINT) AS weird_len FROM orders WHERE o_orderkey BETWEEN 20 AND 45 ORDER BY weird_len DESC, o_orderkey LIMIT 12;
SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n, CAST(dense_rank() OVER (ORDER BY COUNT(*) DESC) AS BIGINT) AS freq_rank FROM documents GROUP BY lang, source ORDER BY freq_rank, lang, source LIMIT 12;
SELECT l_linestatus, CAST(COUNT(*) FILTER (WHERE l_discount = 0) AS BIGINT) AS no_disc, CAST(COUNT(*) FILTER (WHERE l_discount > 0.08) AS BIGINT) AS deep_disc, CAST(COUNT(*) AS BIGINT) AS total FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus;
SELECT a.n_name, b.n_name AS partner FROM nation a CROSS JOIN nation b WHERE a.n_nationkey = 24 - b.n_nationkey AND a.n_nationkey < b.n_nationkey ORDER BY a.n_name LIMIT 12;
SELECT doc_id FROM documents WHERE doc_id % 7 = 0 AND doc_id NOT IN (SELECT doc_id FROM documents WHERE n_chars < 200) ORDER BY doc_id LIMIT 12;
SELECT t.lang, t.mid FROM (SELECT lang, CAST(FLOOR(AVG(n_chars)) AS BIGINT) AS mid, COUNT(*) AS n FROM documents GROUP BY lang) t WHERE t.n > 3 ORDER BY t.mid DESC, t.lang LIMIT 10;
SELECT o_orderpriority, CAST(MIN(o_orderkey) AS BIGINT) AS first_key FROM orders WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = orders.o_custkey AND c.c_mktsegment = 'MACHINERY') GROUP BY o_orderpriority ORDER BY o_orderpriority;
SELECT r.r_name, CAST(COUNT(DISTINCT n.n_nationkey) AS BIGINT) AS nations, CAST(COUNT(DISTINCT s.s_suppkey) AS BIGINT) AS sups FROM region r LEFT JOIN nation n ON n.n_regionkey = r.r_regionkey LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey GROUP BY r.r_name ORDER BY r.r_name;
SELECT CAST(q.dk AS BIGINT) AS dk, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT EXTRACT(MONTH FROM o_orderdate) + EXTRACT(DAY FROM o_orderdate) AS dk FROM orders WHERE o_orderkey < 1200) q GROUP BY 1 ORDER BY 1 LIMIT 15;
SELECT p_name FROM part WHERE length(p_name) = (SELECT MAX(length(p_name)) FROM part) ORDER BY p_name LIMIT 5;
SELECT user_id, CAST(SUM(CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 10 ELSE 100 END) AS BIGINT) AS weighted FROM events WHERE user_id < 6 GROUP BY user_id ORDER BY user_id;
SELECT v.seg, v.cnt, CAST(v.cnt - lag(v.cnt) OVER (ORDER BY v.seg) AS BIGINT) AS delta FROM (SELECT c_mktsegment AS seg, CAST(COUNT(*) AS BIGINT) AS cnt FROM customer GROUP BY c_mktsegment) v ORDER BY v.seg;
SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) = COUNT(*) ORDER BY l_orderkey LIMIT 12;
SELECT n_regionkey, CAST(SUM(length(n_name)) AS BIGINT) AS chars, CAST(COUNT(*) AS BIGINT) AS n FROM nation GROUP BY n_regionkey HAVING COUNT(*) = 5 ORDER BY n_regionkey;
SELECT 'exists' AS probe FROM region WHERE EXISTS (SELECT 1 FROM nation WHERE n_regionkey = region.r_regionkey AND n_nationkey > 20) ORDER BY r_regionkey LIMIT 3;
SELECT doc_id, substr(text, length(text) - 4, 5) AS tail5 FROM documents WHERE length(text) > 10 AND doc_id < 9 ORDER BY doc_id;
SELECT o.o_orderstatus, CAST(FLOOR(AVG(o.o_totalprice - sub.avg_price)) AS BIGINT) AS avg_dev FROM orders o CROSS JOIN (SELECT AVG(o_totalprice) AS avg_price FROM orders) sub GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus;
SELECT c_nationkey, CAST(MAX(c_acctbal) - MIN(c_acctbal) AS DECIMAL(18,2)) AS bal_spread FROM customer GROUP BY c_nationkey HAVING COUNT(*) >= 3 ORDER BY c_nationkey LIMIT 12;
SELECT t1.event_type, t2.event_type AS next_type, CAST(COUNT(*) AS BIGINT) AS n FROM events t1 JOIN events t2 ON t2.user_id = t1.user_id AND t2.event_id = t1.event_id + 1 WHERE t1.user_id < 5 GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 16;
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents WHERE text LIKE '%the%' OR text LIKE '%und%' GROUP BY lang ORDER BY lang;
SELECT s_suppkey, s_acctbal FROM supplier WHERE s_acctbal > 0 AND s_suppkey < 15 ORDER BY s_acctbal DESC, s_suppkey LIMIT 8;
SELECT q.k, CAST(SUM(q.v) AS BIGINT) AS total FROM (SELECT o_orderkey % 4 AS k, o_orderkey AS v FROM orders WHERE o_orderkey < 100 UNION ALL SELECT l_orderkey % 4 AS k, l_linenumber AS v FROM lineitem WHERE l_orderkey < 100) q GROUP BY q.k ORDER BY q.k;
SELECT p_type, p_brand FROM part WHERE p_size IN (1, 50) ORDER BY p_type, p_brand LIMIT 14;
SELECT user_id, CAST(MIN(event_id) AS BIGINT) AS first_ev FROM events GROUP BY user_id HAVING MIN(event_id) = user_id * 100 ORDER BY user_id LIMIT 10;
SELECT x.lang, x.n_chars, x.pct_of_lang FROM (SELECT lang, n_chars, CAST(FLOOR(100.0 * n_chars / SUM(n_chars) OVER (PARTITION BY lang)) AS BIGINT) AS pct_of_lang, row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn FROM documents) x WHERE x.rn = 1 ORDER BY x.lang;
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs FROM supplier s1 JOIN supplier s2 ON s1.s_nationkey = s2.s_nationkey AND s1.s_suppkey < s2.s_suppkey;
-- tranche r5-ab: anti-join symmetry, conditional window frames,
-- correlated aggregates in CASE, per-group-min correlation, sequential
-- event self-joins, first-event-per-user rollups (validated)
SELECT c_custkey FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders) AND c_custkey < 60 ORDER BY c_custkey;
SELECT COUNT(*) AS n_lonely FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey);
SELECT user_id, event_id, CAST(CASE WHEN event_type = 'click' THEN SUM(event_id) OVER (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) ELSE 0 END AS BIGINT) AS click_roll FROM events WHERE user_id < 3 ORDER BY user_id, event_id LIMIT 18;
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n FROM orders WHERE o_totalprice > 1000 GROUP BY o_orderstatus HAVING COUNT(*) > 2 AND o_orderstatus <> 'X' ORDER BY o_orderstatus;
SELECT n_name, CASE WHEN (SELECT COUNT(*) FROM supplier s WHERE s.s_nationkey = n.n_nationkey) > 2 THEN 'dense' ELSE 'sparse' END AS density FROM nation n ORDER BY n_name LIMIT 15;
SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size < 5) AND l_orderkey < 2000 ORDER BY l_orderkey, l_linenumber LIMIT 15;
SELECT CAST(FLOOR(EXTRACT(YEAR FROM o_orderdate) / 2) * 2 AS BIGINT) AS biennium, CAST(COUNT(*) AS BIGINT) AS n FROM orders GROUP BY 1 ORDER BY 1;
SELECT lower(c_mktsegment) AS seg, upper(lower(c_mktsegment)) AS seg_round, CAST(COUNT(*) AS BIGINT) AS n FROM customer GROUP BY c_mktsegment ORDER BY seg;
SELECT doc_id, concat(lang, ':', source) AS tag FROM documents WHERE doc_id < 10 ORDER BY doc_id;
SELECT t.tag, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT concat(lang, '/', source) AS tag FROM documents) t GROUP BY t.tag ORDER BY t.tag LIMIT 15;
SELECT s_nationkey, CAST(SUM(CASE WHEN s_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS in_debt, CAST(SUM(CASE WHEN s_acctbal >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS solvent FROM supplier GROUP BY s_nationkey HAVING SUM(CASE WHEN s_acctbal < 0 THEN 1 ELSE 0 END) > 0 ORDER BY s_nationkey LIMIT 12;
SELECT x.k, x.n FROM (SELECT l_returnflag || l_linestatus AS k, CAST(COUNT(*) AS BIGINT) AS n FROM lineitem GROUP BY 1) x WHERE x.n > 100 ORDER BY x.k;
SELECT o_orderkey FROM orders o WHERE (SELECT COUNT(*) FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) = 7 ORDER BY o_orderkey LIMIT 12;
SELECT c.c_nationkey, CAST(MAX(cnt.n) AS BIGINT) AS busiest FROM customer c JOIN (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey) cnt ON cnt.o_custkey = c.c_custkey GROUP BY c.c_nationkey ORDER BY c.c_nationkey LIMIT 12;
SELECT event_type, CAST(MIN(user_id) AS BIGINT) AS min_u, CAST(MAX(user_id) AS BIGINT) AS max_u FROM events WHERE event_id BETWEEN 100 AND 900 GROUP BY event_type ORDER BY event_type;
SELECT p_brand, p_size FROM part WHERE p_size = (SELECT MIN(p_size) FROM part p2 WHERE p2.p_brand = part.p_brand) ORDER BY p_brand, p_size LIMIT 15;
SELECT doc_id, n_chars FROM documents d WHERE n_chars > (SELECT AVG(n_chars) FROM documents d2 WHERE d2.lang = d.lang) * 1.5 ORDER BY doc_id LIMIT 12;
SELECT l_returnflag, CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_linenumber AS BIGINT)) AS BIGINT) AS weighted_qty FROM lineitem WHERE l_orderkey < 400 GROUP BY l_returnflag ORDER BY l_returnflag;
SELECT r_name FROM region WHERE r_regionkey IN (SELECT n_regionkey FROM nation GROUP BY n_regionkey HAVING COUNT(*) = (SELECT MAX(cnt) FROM (SELECT COUNT(*) AS cnt FROM nation GROUP BY n_regionkey) m)) ORDER BY r_name;
SELECT u.user_id, u.span FROM (SELECT user_id, CAST(MAX(event_id) - MIN(event_id) AS BIGINT) AS span FROM events GROUP BY user_id) u WHERE u.span BETWEEN 100 AND 800 ORDER BY u.user_id LIMIT 12;
SELECT o_orderpriority, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS buyers, CAST(COUNT(*) AS BIGINT) AS n, CAST(COUNT(*) - COUNT(DISTINCT o_custkey) AS BIGINT) AS repeats FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority;
SELECT substr(n_name, 2, 3) AS mid3, n_nationkey FROM nation WHERE length(n_name) >= 5 ORDER BY mid3, n_nationkey LIMIT 12;
SELECT t.grp, CAST(SUM(t.v) AS BIGINT) AS total, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT CASE WHEN l_quantity < 10 THEN 'low' WHEN l_quantity < 30 THEN 'mid' ELSE 'high' END AS grp, CAST(l_quantity AS BIGINT) AS v FROM lineitem WHERE l_orderkey < 500) t GROUP BY t.grp ORDER BY t.grp;
SELECT c_mktsegment, CAST(FLOOR(SUM(c_acctbal * c_acctbal)) AS BIGINT) AS sumsq FROM customer WHERE c_acctbal > 0 GROUP BY c_mktsegment ORDER BY c_mktsegment;
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents WHERE substr(text, 1, 1) BETWEEN 'a' AND 'm' GROUP BY lang ORDER BY lang;
SELECT e1.user_id, CAST(COUNT(*) AS BIGINT) AS n_click_then_view FROM events e1 JOIN events e2 ON e2.user_id = e1.user_id AND e2.event_id > e1.event_id AND e2.event_id <= e1.event_id + 3 WHERE e1.event_type = 'click' AND e2.event_type = 'view' AND e1.user_id < 6 GROUP BY e1.user_id ORDER BY e1.user_id;
SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n, CAST(ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY COUNT(*) DESC, o_orderpriority) AS BIGINT) AS rnk FROM orders GROUP BY o_orderstatus, o_orderpriority ORDER BY o_orderstatus, rnk LIMIT 15;
SELECT p_type FROM part GROUP BY p_type HAVING COUNT(DISTINCT p_brand) >= 3 ORDER BY p_type LIMIT 10;
SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey WHERE o.o_orderdate > l.l_shipdate;
SELECT n.n_name FROM nation n JOIN region r ON r.r_regionkey = n.n_regionkey WHERE r.r_name = 'AMERICA' AND n.n_nationkey % 2 = 1 ORDER BY n.n_name;
SELECT user_id, CAST(FLOOR(AVG(CAST(event_id AS BIGINT) - user_id * 100)) AS BIGINT) AS avg_off FROM events WHERE user_id < 10 GROUP BY user_id ORDER BY user_id;
SELECT x.seg, x.mx - x.mn AS spread FROM (SELECT c_mktsegment AS seg, CAST(FLOOR(MAX(c_acctbal)) AS BIGINT) AS mx, CAST(FLOOR(MIN(c_acctbal)) AS BIGINT) AS mn FROM customer GROUP BY c_mktsegment) x ORDER BY x.seg;
SELECT l_returnflag, l_tax, CAST(COUNT(*) AS BIGINT) AS n FROM lineitem WHERE l_orderkey < 1000 GROUP BY l_returnflag, l_tax ORDER BY l_returnflag, l_tax LIMIT 14;
SELECT doc_id FROM documents WHERE lang = 'en' AND source = 'web' AND n_chars > 500 ORDER BY doc_id LIMIT 12;
SELECT o_orderkey, CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS k_price FROM orders WHERE o_orderkey IN (1, 7, 32, 33, 34, 96) ORDER BY o_orderkey;
SELECT COUNT(*) AS n FROM (SELECT DISTINCT l_orderkey, l_returnflag FROM lineitem WHERE l_orderkey < 300) t;
SELECT first.event_type AS first_type, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT user_id, event_type, row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn FROM events) first WHERE first.rn = 1 GROUP BY first.event_type ORDER BY first.event_type;
SELECT s_name, length(s_name) - length(replace(s_name, 'e', '')) AS n_e FROM supplier WHERE s_suppkey < 12 ORDER BY s_name;
SELECT lang, MIN(text) AS lexic_first FROM documents WHERE doc_id < 100 GROUP BY lang ORDER BY lang;
SELECT CAST(SUM(CASE WHEN t.rn % 2 = 1 THEN t.v ELSE -t.v END) AS BIGINT) AS alt_sum FROM (SELECT CAST(l_quantity AS BIGINT) AS v, row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS rn FROM lineitem WHERE l_orderkey < 120) t;

-- tranche r5-ac: NULL semantics over events.value — COUNT(col) vs
-- COUNT(*), IS [NOT] DISTINCT FROM joins, NULLS FIRST/LAST orderings,
-- null bucketing, aggregate NULL-skipping, FILTER + NULLIF (validated)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS all_rows, CAST(COUNT(value) AS BIGINT) AS with_value, CAST(COUNT(*) - COUNT(value) AS BIGINT) AS nulls FROM events GROUP BY event_type ORDER BY event_type;
SELECT event_type, CAST(FLOOR(SUM(value)) AS BIGINT) AS sum_v, CAST(FLOOR(AVG(value) * 100) AS BIGINT) AS avg_v100 FROM events GROUP BY event_type ORDER BY event_type;
SELECT user_id, event_id FROM events WHERE value IS NULL AND user_id < 6 ORDER BY user_id, event_id LIMIT 15;
SELECT CASE WHEN value IS NULL THEN 'missing' WHEN value < 50 THEN 'low' ELSE 'high' END AS bucket, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1 ORDER BY 1;
SELECT event_id, value FROM events WHERE user_id = 1 ORDER BY value NULLS FIRST, event_id LIMIT 12;
SELECT event_id, value FROM events WHERE user_id = 1 ORDER BY value DESC NULLS LAST, event_id LIMIT 12;
SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events a JOIN events b ON a.event_id + 1 = b.event_id AND a.value IS NOT DISTINCT FROM b.value WHERE a.user_id < 4 AND b.user_id < 4;
SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct_rows FROM events a JOIN events b ON a.event_id + 1 = b.event_id WHERE a.value IS DISTINCT FROM b.value AND a.user_id < 3;
SELECT user_id, CAST(FLOOR(MAX(COALESCE(value, -1))) AS BIGINT) AS max_or_neg1 FROM events WHERE user_id < 8 GROUP BY user_id ORDER BY user_id;
SELECT user_id, CAST(COUNT(*) FILTER (WHERE value IS NOT NULL) AS BIGINT) AS valued, CAST(COUNT(*) FILTER (WHERE value IS NULL) AS BIGINT) AS unvalued FROM events WHERE user_id < 10 GROUP BY user_id ORDER BY user_id;
SELECT event_type, CAST(FLOOR(MIN(value)) AS BIGINT) AS min_v, CAST(FLOOR(MAX(value)) AS BIGINT) AS max_v FROM events GROUP BY event_type ORDER BY event_type;
SELECT CAST(FLOOR(SUM(COALESCE(value, 0))) AS BIGINT) AS total_with_default, CAST(FLOOR(SUM(value)) AS BIGINT) AS total_skipping FROM events;
SELECT user_id, event_id, CAST(CASE WHEN value IS NULL THEN 0 ELSE 1 END AS BIGINT) AS has_v, CAST(SUM(CASE WHEN value IS NULL THEN 0 ELSE 1 END) OVER (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS valued_so_far FROM events WHERE user_id < 3 ORDER BY user_id, event_id LIMIT 18;
SELECT t.has_value, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT value IS NOT NULL AS has_value FROM events) t GROUP BY t.has_value ORDER BY t.has_value;
SELECT event_type, CAST(COUNT(DISTINCT CAST(FLOOR(value / 10) AS BIGINT)) AS BIGINT) AS v_buckets FROM events WHERE value IS NOT NULL GROUP BY event_type ORDER BY event_type;
SELECT a.event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events a WHERE NOT EXISTS (SELECT 1 FROM events b WHERE b.event_id = a.event_id + 1 AND b.value IS NULL) AND a.user_id < 5 GROUP BY a.event_type ORDER BY a.event_type;
SELECT user_id, CAST(FLOOR(AVG(value) - MIN(value)) AS BIGINT) AS spread_lo FROM events WHERE user_id < 12 GROUP BY user_id HAVING COUNT(value) > 3 ORDER BY user_id;
SELECT e.event_type, CAST(FLOOR(SUM(e.value * e.user_id)) AS BIGINT) AS weighted FROM events e WHERE e.value IS NOT NULL AND e.user_id < 15 GROUP BY e.event_type ORDER BY e.event_type;
SELECT COALESCE(NULLIF(event_type, 'click'), 'was-click') AS t2, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1 ORDER BY 1;
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM events WHERE COALESCE(value, 999) > 90 AND user_id < 10 GROUP BY user_id ORDER BY user_id;
SELECT event_id, user_id, value FROM events WHERE value = (SELECT MAX(value) FROM events) ORDER BY event_id LIMIT 5;
SELECT user_id, event_id, CAST(FLOOR(COALESCE(lag(value) OVER (PARTITION BY user_id ORDER BY event_id), -1)) AS BIGINT) AS prev_v FROM events WHERE user_id < 2 ORDER BY user_id, event_id LIMIT 15;
SELECT event_type, CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, CAST(FLOOR(100.0 * SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) / COUNT(*)) AS BIGINT) AS pct_null FROM events GROUP BY event_type ORDER BY event_type;
SELECT x.v10, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT CAST(FLOOR(value / 10) AS BIGINT) AS v10 FROM events WHERE user_id < 30) x GROUP BY x.v10 ORDER BY x.v10 NULLS FIRST LIMIT 14;
SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events WHERE value IS NULL AND event_type IN ('click', 'purchase');
SELECT user_id, CAST(MAX(event_id) FILTER (WHERE value IS NULL) AS BIGINT) AS last_null_ev FROM events WHERE user_id < 7 GROUP BY user_id ORDER BY user_id;
SELECT t.k, CAST(SUM(t.c) AS BIGINT) AS n FROM (SELECT COALESCE(CAST(FLOOR(value / 25) AS BIGINT), -1) AS k, 1 AS c FROM events WHERE user_id BETWEEN 5 AND 20) t GROUP BY t.k ORDER BY t.k;
SELECT a.user_id, CAST(COUNT(*) AS BIGINT) AS both_valued FROM events a JOIN events b ON b.user_id = a.user_id AND b.event_id = a.event_id + 1 WHERE a.value IS NOT NULL AND b.value IS NOT NULL AND a.user_id < 8 GROUP BY a.user_id ORDER BY a.user_id;
SELECT event_type, CAST(FLOOR(percentile_cont(0.5) WITHIN GROUP (ORDER BY value) * 10) AS BIGINT) AS med10 FROM events WHERE value IS NOT NULL GROUP BY event_type ORDER BY event_type;
SELECT CAST(COUNT(*) AS BIGINT) AS n_all_null_users FROM (SELECT user_id FROM events GROUP BY user_id HAVING COUNT(value) = 0) t;
SELECT user_id, CAST(COUNT(value) AS BIGINT) AS n_v FROM events GROUP BY user_id HAVING COUNT(value) < COUNT(*) AND COUNT(*) > 10 ORDER BY user_id LIMIT 12;
SELECT event_type, CAST(FLOOR(stddev_pop(value) * 100) AS BIGINT) AS sd100 FROM events WHERE value IS NOT NULL GROUP BY event_type HAVING COUNT(*) > 50 ORDER BY event_type;
SELECT value IS NULL AS missing, event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events WHERE user_id < 40 GROUP BY 1, 2 ORDER BY 1, 2;
SELECT e.event_id, e.value FROM events e WHERE e.value IS NOT NULL AND NOT EXISTS (SELECT 1 FROM events e2 WHERE e2.value IS NOT NULL AND e2.value > e.value) ORDER BY e.event_id LIMIT 5;
SELECT user_id, event_id FROM events WHERE CASE WHEN value IS NULL THEN user_id % 2 = 0 ELSE value > 95 END AND user_id < 6 ORDER BY user_id, event_id LIMIT 15;
SELECT CAST(FLOOR(SUM(value) FILTER (WHERE event_type = 'click')) AS BIGINT) AS click_v, CAST(FLOOR(SUM(value) FILTER (WHERE event_type <> 'click')) AS BIGINT) AS other_v FROM events WHERE user_id < 50;
SELECT x.ut, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT user_id, COALESCE(CAST(FLOOR(MIN(value)) AS BIGINT), -99) AS ut FROM events WHERE user_id < 25 GROUP BY user_id) x GROUP BY x.ut ORDER BY x.ut;
SELECT event_type, CAST(COUNT(NULLIF(value, 0)) AS BIGINT) AS nonzero_valued FROM events GROUP BY event_type ORDER BY event_type;
SELECT user_id, CAST(FLOOR(SUM(value * value)) AS BIGINT) AS sumsq FROM events WHERE value IS NOT NULL AND user_id < 12 GROUP BY user_id ORDER BY user_id;
SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events a LEFT JOIN events b ON b.event_id = a.event_id + 100000 WHERE b.event_id IS NULL AND a.user_id < 3;

-- tranche r5-ad: ORDER BY ordinals, LIMIT OFFSET pagination,
-- EXTRACT(QUARTER), negative-operand modulo/abs/sign, TRIM BOTH/LEADING,
-- concat_ws, CASE without ELSE (NULL groups), chained scalar-subquery
-- range bounds (validated)
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n FROM orders GROUP BY o_orderstatus ORDER BY 2 DESC, 1;
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c_nationkey) AS BIGINT) AS sk FROM customer GROUP BY 1 ORDER BY 3 DESC, 1 LIMIT 4;
SELECT o_orderkey FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey LIMIT 10 OFFSET 5;
SELECT doc_id, lang FROM documents ORDER BY doc_id LIMIT 7 OFFSET 13;
SELECT EXTRACT(QUARTER FROM o_orderdate) AS q, CAST(COUNT(*) AS BIGINT) AS n FROM orders GROUP BY 1 ORDER BY 1;
SELECT EXTRACT(QUARTER FROM l_shipdate) AS q, EXTRACT(YEAR FROM l_shipdate) AS yr, CAST(COUNT(*) AS BIGINT) AS n FROM lineitem WHERE l_orderkey < 800 GROUP BY 1, 2 ORDER BY 2, 1 LIMIT 16;
SELECT CAST((0 - n_nationkey) % 7 AS BIGINT) AS neg_mod, CAST(COUNT(*) AS BIGINT) AS n FROM nation GROUP BY 1 ORDER BY 1;
SELECT CAST(abs(10 - c_nationkey) AS BIGINT) AS dist10, CAST(COUNT(*) AS BIGINT) AS n FROM customer GROUP BY 1 ORDER BY 1 LIMIT 12;
SELECT CAST(sign(s_acctbal) AS BIGINT) AS sgn, CAST(COUNT(*) AS BIGINT) AS n FROM supplier GROUP BY 1 ORDER BY 1;
SELECT trim(BOTH 'A' FROM n_name) AS trimmed, n_nationkey FROM nation WHERE n_nationkey < 10 ORDER BY n_nationkey;
SELECT trim(LEADING 'B' FROM p_brand) AS debranded, CAST(COUNT(*) AS BIGINT) AS n FROM part GROUP BY 1 ORDER BY 1 LIMIT 10;
SELECT concat_ws('-', r_name, CAST(r_regionkey AS VARCHAR(4))) AS tag FROM region ORDER BY tag;
SELECT concat_ws('/', lang, source, CAST(doc_id AS VARCHAR(10))) AS path FROM documents WHERE doc_id < 8 ORDER BY doc_id;
SELECT o_orderkey, CASE WHEN o_totalprice > 200000 THEN 'jumbo' END AS jumbo_tag FROM orders WHERE o_orderkey < 60 ORDER BY o_orderkey;
SELECT t.jumbo_tag, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT CASE WHEN o_totalprice > 150000 THEN 'big' END AS jumbo_tag FROM orders) t GROUP BY 1 ORDER BY 1 NULLS FIRST;
SELECT s_suppkey FROM supplier WHERE s_acctbal > (SELECT CAST(FLOOR(AVG(s_acctbal)) AS BIGINT) FROM supplier) AND s_acctbal < (SELECT MAX(s_acctbal) FROM supplier) ORDER BY s_suppkey LIMIT 12;
SELECT COUNT(*) AS n FROM customer WHERE c_acctbal BETWEEN (SELECT CAST(FLOOR(MIN(c_acctbal)) AS BIGINT) FROM customer) + 100 AND (SELECT CAST(FLOOR(MAX(c_acctbal)) AS BIGINT) FROM customer) - 100;
SELECT CAST(n_nationkey % 5 AS BIGINT) AS m5, CAST(SUM(abs(n_regionkey - 2)) AS BIGINT) AS sum_dist FROM nation GROUP BY 1 ORDER BY 1;
SELECT user_id, event_id FROM events WHERE user_id < 3 ORDER BY event_id DESC LIMIT 6 OFFSET 2;
SELECT l_returnflag, CAST(SUM(CAST(l_quantity AS BIGINT)) % 1000 AS BIGINT) AS qty_mod FROM lineitem GROUP BY l_returnflag ORDER BY 2, 1;
SELECT greatest(n_nationkey, n_regionkey * 4, 7) AS g3, CAST(COUNT(*) AS BIGINT) AS n FROM nation GROUP BY 1 ORDER BY 1;
SELECT least(p_size, p_partkey % 20, 15) AS l3, CAST(COUNT(*) AS BIGINT) AS n FROM part GROUP BY 1 ORDER BY 1 LIMIT 14;
SELECT doc_id, CASE lang WHEN 'en' THEN 1 WHEN 'de' THEN 2 END AS lang_code FROM documents WHERE doc_id < 12 ORDER BY doc_id;
SELECT x.lc, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT CASE lang WHEN 'en' THEN 1 WHEN 'de' THEN 2 END AS lc FROM documents) x GROUP BY 1 ORDER BY 1 NULLS LAST;
SELECT o_orderpriority, CAST(MAX(o_orderkey) - MIN(o_orderkey) AS BIGINT) AS key_span FROM orders GROUP BY o_orderpriority HAVING COUNT(*) BETWEEN 100 AND 100000 ORDER BY o_orderpriority;
SELECT CAST(FLOOR(SUM(o_totalprice) / COUNT(*)) AS BIGINT) AS manual_avg, CAST(FLOOR(AVG(o_totalprice)) AS BIGINT) AS builtin_avg FROM orders WHERE o_orderkey < 2000;
SELECT r_regionkey, upper(substr(r_name, 1, 3)) AS abbrev FROM region ORDER BY 1;
SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS n FROM events WHERE user_id IN (1, 2, 3) GROUP BY 1, 2 ORDER BY 1, 2;
SELECT CAST(COUNT(*) AS BIGINT) AS n_parts_both FROM part WHERE p_size > 10 AND p_size < 20 AND p_brand IN (SELECT p_brand FROM part WHERE p_size >= 45);
SELECT p_brand, CAST(MIN(p_retailprice * 100) AS DECIMAL(18,0)) AS min_cents FROM part GROUP BY p_brand ORDER BY p_brand LIMIT 10;
SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS BIGINT)) % 10 = 0 ORDER BY l_orderkey LIMIT 12;
SELECT n1.n_name, CAST(COUNT(*) AS BIGINT) AS n_lower FROM nation n1 JOIN nation n2 ON n2.n_nationkey < n1.n_nationkey GROUP BY n1.n_name HAVING COUNT(*) >= 20 ORDER BY n1.n_name;
SELECT doc_id, repeat('#', CAST(n_chars / 2000 AS INTEGER)) AS bar FROM documents WHERE n_chars >= 2000 AND doc_id < 200 ORDER BY doc_id LIMIT 10;
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n FROM customer WHERE c_name LIKE '%0%' GROUP BY c_nationkey ORDER BY 1 LIMIT 12;
SELECT t.b, CAST(MAX(t.price) AS DECIMAL(18,2)) AS mx FROM (SELECT CAST(o_orderkey % 3 AS BIGINT) AS b, o_totalprice AS price FROM orders WHERE o_orderkey < 400) t GROUP BY t.b ORDER BY t.b;
SELECT user_id FROM events GROUP BY user_id HAVING MIN(event_id) % 2 = 0 AND MAX(event_id) % 2 = 1 ORDER BY user_id LIMIT 12;
SELECT lang, CAST(SUM(CASE WHEN source = 'web' THEN n_chars END) AS BIGINT) AS web_chars FROM documents GROUP BY lang ORDER BY lang;
SELECT o_orderdate, CAST(COUNT(*) AS BIGINT) AS n FROM orders WHERE o_orderdate BETWEEN DATE '1995-03-01' AND DATE '1995-03-31' GROUP BY o_orderdate ORDER BY o_orderdate LIMIT 15;
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) * 100 + EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS yyyymm, CAST(COUNT(*) AS BIGINT) AS n FROM orders WHERE o_custkey < 50 GROUP BY 1 ORDER BY 1 LIMIT 15;
SELECT CAST(SUM(CASE WHEN l_discount BETWEEN 0.05 AND 0.07 THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS q_mid_disc FROM lineitem WHERE l_orderkey < 1500;
-- r5-ae: VALUES inline tables, split_part/lpad/rpad, RANGE frames over
-- numerics, nth_value/cume_dist, multi-col DISTINCT aggs, date_trunc/
-- last_day/quarter/week, FILTER aggregates, negative-digit rounding,
-- correlated HAVING subqueries, CASE-over-subquery, EXCEPT/INTERSECT.
-- Traps hit while validating (recorded per protocol): QUALIFY is
-- DuckDB-only; part/orders testdata has no p_container/o_comment;
-- non-ASCII aliases parse in DuckDB but not in this harness's reader.
SELECT t.a, t.b FROM (VALUES (1, 'x'), (2, 'y'), (3, 'z')) t(a, b) ORDER BY t.a;
SELECT v.k, CAST(COUNT(*) AS BIGINT) AS n FROM (VALUES (0), (1), (0), (2)) v(k) GROUP BY v.k ORDER BY v.k;
SELECT n_name FROM nation JOIN (VALUES (0), (2)) v(rk) ON n_regionkey = v.rk ORDER BY n_name LIMIT 8;
SELECT split_part(c_name, '#', 2) AS tail, CAST(COUNT(*) AS BIGINT) AS n FROM customer WHERE c_custkey <= 20 GROUP BY 1 ORDER BY 1 LIMIT 10;
SELECT s_suppkey, split_part(s_name, '#', 1) AS head FROM supplier WHERE s_suppkey < 8 ORDER BY s_suppkey;
SELECT lpad(CAST(n_nationkey AS VARCHAR(4)), 4, '0') AS padded FROM nation ORDER BY padded LIMIT 10;
SELECT rpad(r_name, 12, '.') AS dotted FROM region ORDER BY r_regionkey;
SELECT p_partkey, repeat(substr(p_brand, 1, 2), 3) AS b3 FROM part WHERE p_partkey < 8 ORDER BY p_partkey;
SELECT o_orderkey, o_totalprice, CAST(SUM(o_totalprice) OVER (ORDER BY o_totalprice RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS DECIMAL(18,2)) AS near_sum FROM orders WHERE o_orderkey < 80 ORDER BY o_totalprice, o_orderkey LIMIT 12;
SELECT c_custkey, CAST(COUNT(*) OVER (ORDER BY c_acctbal RANGE BETWEEN 500.0 PRECEDING AND 500.0 FOLLOWING) AS BIGINT) AS peers FROM customer WHERE c_custkey < 40 ORDER BY c_custkey;
SELECT n_nationkey, nth_value(n_name, 2) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_name FROM nation ORDER BY n_nationkey LIMIT 15;
SELECT s_suppkey, CAST(FLOOR(cume_dist() OVER (ORDER BY s_acctbal) * 100) AS BIGINT) AS cd_pct FROM supplier WHERE s_suppkey <= 12 ORDER BY s_suppkey;
SELECT o_orderpriority, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS custs, CAST(COUNT(DISTINCT o_orderdate) AS BIGINT) AS days FROM orders WHERE o_orderkey < 3000 GROUP BY 1 ORDER BY 1;
SELECT CAST(SUM(DISTINCT p_size) AS BIGINT) AS sum_distinct_sizes FROM part WHERE p_partkey < 300;
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mth, CAST(COUNT(*) AS BIGINT) AS n FROM orders WHERE o_orderkey < 800 GROUP BY 1 ORDER BY 1 LIMIT 12;
SELECT CAST(last_day(o_orderdate) AS DATE) AS eom, CAST(COUNT(*) AS BIGINT) AS n FROM orders WHERE o_custkey < 25 GROUP BY 1 ORDER BY 1 LIMIT 12;
SELECT CAST(round(o_totalprice, -3) AS DECIMAL(18,0)) AS k_bucket, CAST(COUNT(*) AS BIGINT) AS n FROM orders WHERE o_orderkey < 500 GROUP BY 1 ORDER BY 1 LIMIT 15;
SELECT p_brand FROM part GROUP BY p_brand HAVING COUNT(*) > (SELECT COUNT(*) FROM part) / 30 ORDER BY p_brand;
SELECT n_name FROM nation n WHERE EXISTS (SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey GROUP BY s.s_nationkey HAVING COUNT(*) >= 2) ORDER BY n_name LIMIT 10;
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n FROM customer GROUP BY c_mktsegment HAVING MAX(c_acctbal) > (SELECT AVG(c_acctbal) FROM customer) ORDER BY c_mktsegment;
SELECT o_orderkey, CASE WHEN o_totalprice > (SELECT AVG(o_totalprice) FROM orders) THEN 'above' ELSE 'at-or-below' END AS rel FROM orders WHERE o_orderkey < 40 ORDER BY o_orderkey;
SELECT x.rel, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT CASE WHEN s_acctbal < 0 THEN 'neg' WHEN s_acctbal < (SELECT AVG(s_acctbal) FROM supplier) THEN 'low' ELSE 'high' END AS rel FROM supplier) x GROUP BY 1 ORDER BY 1;
SELECT l_linestatus, CAST(MIN(l_extendedprice * (1 - l_discount)) AS DECIMAL(18,4)) AS min_net FROM lineitem WHERE l_orderkey < 600 GROUP BY 1 ORDER BY 1;
SELECT n_regionkey, CAST(COUNT(*) FILTER (WHERE n_nationkey % 2 = 0) AS BIGINT) AS evens, CAST(COUNT(*) FILTER (WHERE n_nationkey % 2 = 1) AS BIGINT) AS odds FROM nation GROUP BY 1 ORDER BY 1;
SELECT CAST(SUM(l_quantity) FILTER (WHERE l_returnflag = 'R') AS BIGINT) AS returned_qty FROM lineitem WHERE l_orderkey < 900;
SELECT user_id, CAST(MAX(event_id) FILTER (WHERE event_type = 'click') AS BIGINT) AS last_click FROM events WHERE user_id < 6 GROUP BY user_id ORDER BY user_id;
SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n FROM supplier WHERE s_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) GROUP BY 1 ORDER BY 1 LIMIT 12;
SELECT d1.lang, CAST(COUNT(*) AS BIGINT) AS n_pairs FROM documents d1 JOIN documents d2 ON d1.lang = d2.lang AND d1.doc_id < d2.doc_id WHERE d1.doc_id < 30 AND d2.doc_id < 30 GROUP BY 1 ORDER BY 1;
SELECT t.g, CAST(SUM(t.n) AS BIGINT) AS total FROM (SELECT n_regionkey AS g, COUNT(*) AS n FROM nation GROUP BY 1 UNION ALL SELECT r_regionkey AS g, 1 AS n FROM region) t GROUP BY t.g ORDER BY t.g;
SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_orderkey < 2000 GROUP BY o_orderstatus, o_orderpriority EXCEPT SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_orderkey < 50 GROUP BY o_orderstatus, o_orderpriority ORDER BY 1, 2 LIMIT 12;
SELECT lang FROM documents WHERE doc_id < 100 INTERSECT SELECT lang FROM documents WHERE doc_id >= 400 ORDER BY lang;
SELECT position('#' IN s_name) AS hash_pos, CAST(COUNT(*) AS BIGINT) AS n FROM supplier GROUP BY 1 ORDER BY 1;
SELECT c_custkey, translate(c_mktsegment, 'AEIOU', 'aeiou') AS lowered_vowels FROM customer WHERE c_custkey < 8 ORDER BY c_custkey;
SELECT CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS q, CAST(COUNT(*) AS BIGINT) AS n FROM orders WHERE o_orderkey < 1200 GROUP BY 1 ORDER BY 1;
SELECT CAST(EXTRACT(WEEK FROM DATE '1995-07-04') AS BIGINT) AS wk;
SELECT ascii(substr(r_name, 1, 1)) AS first_code FROM region ORDER BY first_code;
SELECT chr(65 + n_nationkey % 5) AS letter, CAST(COUNT(*) AS BIGINT) AS n FROM nation GROUP BY 1 ORDER BY 1;
SELECT CAST(bit_count(CAST(n_nationkey AS BIGINT)) AS BIGINT) AS bits, CAST(COUNT(*) AS BIGINT) AS n FROM nation GROUP BY 1 ORDER BY 1;
SELECT p_size, CAST(SUM(CASE WHEN p_retailprice >= 1500 THEN 1 ELSE 0 END) AS BIGINT) AS pricey FROM part WHERE p_size IN (SELECT p_size FROM part GROUP BY p_size HAVING COUNT(*) >= 8) GROUP BY p_size ORDER BY p_size LIMIT 12;
SELECT MIN(x.mn) AS overall_min FROM (SELECT MIN(l_extendedprice) AS mn FROM lineitem GROUP BY l_suppkey) x;
SELECT c_nationkey, CAST(median(c_acctbal) AS DECIMAL(18,2)) AS med FROM customer WHERE c_custkey < 200 GROUP BY 1 ORDER BY 1 LIMIT 10;

-- tranche r5-af: value-range window frames, INTERSECT/EXCEPT ALL, LATERAL
-- derived tables, VALUES inline tables, boolean aggregates, scalar-function
-- edges (split_part/lpad/md5/make_date/power), correlated scalar subqueries
SELECT o_custkey, o_orderkey, CAST(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS DECIMAL(18,2)) AS rng_sum FROM orders WHERE o_custkey < 8 ORDER BY o_custkey, o_orderkey LIMIT 20;
SELECT l_orderkey, l_linenumber, CAST(COUNT(*) OVER (PARTITION BY l_orderkey ORDER BY CAST(l_quantity AS BIGINT) RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS BIGINT) AS near_qty FROM lineitem WHERE l_orderkey < 40 ORDER BY l_orderkey, l_linenumber LIMIT 25;
SELECT s_nationkey, s_suppkey, CAST(MIN(s_acctbal) OVER (PARTITION BY s_nationkey ORDER BY s_suppkey ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS DECIMAL(18,2)) AS fwd_min FROM supplier WHERE s_suppkey <= 20 ORDER BY s_nationkey, s_suppkey;
SELECT c_nationkey FROM customer WHERE c_custkey < 60 INTERSECT ALL SELECT c_nationkey FROM customer WHERE c_custkey BETWEEN 30 AND 90 ORDER BY c_nationkey LIMIT 15;
SELECT n_regionkey FROM nation EXCEPT ALL SELECT r_regionkey FROM region ORDER BY n_regionkey;
SELECT o_orderstatus FROM orders WHERE o_orderkey < 200 EXCEPT ALL SELECT o_orderstatus FROM orders WHERE o_orderkey < 60 ORDER BY o_orderstatus LIMIT 10;
SELECT n.n_name, x.n_sup FROM nation n, LATERAL (SELECT CAST(COUNT(*) AS BIGINT) AS n_sup FROM supplier s WHERE s.s_nationkey = n.n_nationkey) x WHERE n.n_nationkey < 6 ORDER BY n.n_name;
SELECT r.r_name, x.best FROM region r, LATERAL (SELECT CAST(MAX(n_nationkey) AS BIGINT) AS best FROM nation WHERE n_regionkey = r.r_regionkey) x ORDER BY r.r_name;
SELECT t.a + 10 AS a10, upper(t.b) AS bu FROM (VALUES (1, 'x'), (2, 'y'), (3, 'z')) t(a, b) ORDER BY a10;
SELECT v.k, CAST(COUNT(*) AS BIGINT) AS n FROM nation JOIN (VALUES (0), (2), (4)) v(k) ON n_regionkey = v.k GROUP BY v.k ORDER BY v.k;
SELECT CAST(bool_and(s_acctbal > -1000) AS BOOLEAN) AS all_above, CAST(bool_or(s_acctbal < 0) AS BOOLEAN) AS any_neg FROM supplier;
SELECT c_mktsegment, CAST(bool_and(c_acctbal > 0) AS BOOLEAN) AS all_pos FROM customer WHERE c_custkey < 120 GROUP BY 1 ORDER BY 1;
SELECT p_brand, split_part(p_type, ' ', 1) AS type_head, CAST(COUNT(*) AS BIGINT) AS n FROM part WHERE p_partkey < 120 GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 15;
SELECT s_suppkey, left(s_name, 5) AS name5, substr(s_name, 3, 4) AS tail4 FROM supplier WHERE s_suppkey <= 10 ORDER BY s_suppkey;
SELECT c_custkey, lpad(CAST(c_nationkey AS VARCHAR(8)), 4, '0') AS nk_pad, rpad(c_mktsegment, 12, '.') AS seg_pad FROM customer WHERE c_custkey < 7 ORDER BY c_custkey;
SELECT r_regionkey, repeat('-', CAST(r_regionkey AS INT) + 1) AS dashes FROM region ORDER BY r_regionkey;
SELECT n_name, reverse(n_name) AS rev FROM nation WHERE n_nationkey < 6 ORDER BY n_name;
SELECT o_orderkey, md5(o_orderstatus) AS status_md5 FROM orders WHERE o_orderkey < 8 ORDER BY o_orderkey;
SELECT make_date(1996, CAST(1 + n_nationkey % 12 AS INT), 15) AS d, CAST(COUNT(*) AS BIGINT) AS n FROM nation GROUP BY 1 ORDER BY 1 LIMIT 12;
SELECT CAST(greatest(l_tax, l_discount) AS DECIMAL(8,2)) AS g, CAST(COUNT(*) AS BIGINT) AS n FROM lineitem WHERE l_orderkey < 300 GROUP BY 1 ORDER BY 1 LIMIT 12;
SELECT nullif(o_orderstatus, 'O') AS st_or_null, CAST(COUNT(*) AS BIGINT) AS n FROM orders WHERE o_orderkey < 400 GROUP BY 1 ORDER BY 1 NULLS FIRST;
SELECT CAST(sign(c_acctbal) AS BIGINT) AS sgn, CAST(MIN(c_custkey) AS BIGINT) AS first_cust FROM customer GROUP BY 1 ORDER BY 1;
SELECT CAST(floor(-1.5 * p_size) AS BIGINT) AS f, CAST(ceil(-1.5 * p_size) AS BIGINT) AS c FROM part WHERE p_partkey < 5 ORDER BY f, c;
SELECT CAST(power(2, n_nationkey % 10) AS BIGINT) AS pow2, CAST(COUNT(*) AS BIGINT) AS n FROM nation GROUP BY 1 ORDER BY 1;
SELECT o_orderpriority, CAST(corr(o_totalprice, CAST(o_orderkey % 97 AS DOUBLE)) IS NOT NULL AS BOOLEAN) AS has_corr FROM orders WHERE o_orderkey < 2000 GROUP BY 1 ORDER BY 1;
SELECT CAST(covar_pop(CAST(p_size AS DOUBLE), p_retailprice) AS DECIMAL(18,2)) AS cv FROM part WHERE p_partkey < 200;
WITH base AS (SELECT n_regionkey AS rk, COUNT(*) AS n FROM nation GROUP BY 1), twice AS (SELECT rk, n FROM base UNION ALL SELECT rk, n FROM base) SELECT rk, CAST(SUM(n) AS BIGINT) AS total FROM twice GROUP BY rk ORDER BY rk;
WITH a AS (SELECT o_custkey, COUNT(*) AS n FROM orders WHERE o_orderkey < 900 GROUP BY 1), b AS (SELECT CAST(AVG(n) AS DOUBLE) AS avg_n FROM a) SELECT CAST(COUNT(*) AS BIGINT) AS heavy FROM a, b WHERE a.n > b.avg_n;
SELECT c_custkey, (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders FROM customer c WHERE c.c_custkey < 12 ORDER BY c_custkey;
SELECT s.s_suppkey, (SELECT n_name FROM nation n WHERE n.n_nationkey = s.s_nationkey) AS nat FROM supplier s WHERE s.s_suppkey <= 8 ORDER BY s.s_suppkey;
SELECT x.g, CAST(SUM(x.v) AS DOUBLE) AS total FROM (SELECT n_nationkey % 3 AS g, CAST(n_regionkey AS DOUBLE) AS v FROM nation UNION ALL SELECT r_regionkey % 3 AS g, 0.5 AS v FROM region) x GROUP BY x.g ORDER BY x.g;
SELECT l_returnflag, CAST(ntile(4) OVER (ORDER BY l_orderkey, l_linenumber) AS BIGINT) AS q FROM lineitem WHERE l_orderkey < 12 ORDER BY l_orderkey, l_linenumber LIMIT 16;
SELECT o_orderkey, CAST(nth_value(o_totalprice, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DECIMAL(18,2)) AS second_price FROM orders WHERE o_custkey < 5 ORDER BY o_orderkey LIMIT 15;
SELECT s_suppkey, CAST(lag(s_acctbal, 2, 0.0) OVER (ORDER BY s_suppkey) AS DECIMAL(18,2)) AS lag2 FROM supplier WHERE s_suppkey <= 10 ORDER BY s_suppkey;
SELECT user_id, event_id, CAST(lead(event_id, 1, -1) OVER (PARTITION BY user_id ORDER BY event_id) AS BIGINT) AS next_ev FROM events WHERE user_id < 4 ORDER BY user_id, event_id LIMIT 20;
SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(length(d.text)) AS BIGINT) AS n_chars FROM documents d WHERE d.doc_id < 150 GROUP BY d.lang ORDER BY d.lang;
SELECT e.event_type, CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS users FROM events e WHERE e.event_id < 500 GROUP BY 1 HAVING COUNT(DISTINCT e.user_id) > 1 ORDER BY 1;
SELECT p_type, CAST(MAX(length(p_name)) AS BIGINT) AS max_name_len FROM part WHERE p_partkey < 250 GROUP BY 1 ORDER BY 1 LIMIT 12;
SELECT CAST(o_orderdate AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n FROM orders WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-01-01' + INTERVAL 10 DAY GROUP BY 1 ORDER BY 1;
SELECT CAST(EXTRACT(DOY FROM DATE '1996-02-29') AS BIGINT) AS doy_leap;
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n FROM customer GROUP BY c_nationkey HAVING COUNT(*) BETWEEN 2 AND 50 ORDER BY c_nationkey LIMIT 12;
SELECT a.n_name, b.n_name AS peer FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey WHERE a.n_regionkey = 2 ORDER BY a.n_name, peer;
SELECT o1.o_custkey, CAST(COUNT(*) AS BIGINT) AS n_pairs FROM orders o1 JOIN orders o2 ON o1.o_custkey = o2.o_custkey AND o1.o_orderkey < o2.o_orderkey WHERE o1.o_custkey < 6 GROUP BY 1 ORDER BY 1;
SELECT CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l_orderkey AND (o.o_orderstatus = 'F' OR o.o_totalprice > 100000));
SELECT n_name FROM nation n WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal < -900) ORDER BY n_name LIMIT 12;
SELECT CAST(SUM(o_totalprice) AS DECIMAL(18,2)) AS tot FROM orders WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49);

-- tranche r5-ag: GROUPING SETS/CUBE/ROLLUP shapes, window-dedup
-- first-per-group, nested set-ops, scalar subquery arithmetic, string/date
-- composition, negative-modulo edges, grouped percentile_cont
SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n FROM orders WHERE o_orderkey < 600 GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ()) ORDER BY 1 NULLS FIRST, 2 NULLS FIRST;
SELECT c_mktsegment, c_nationkey, CAST(grouping(c_nationkey) AS BIGINT) AS g_nat, CAST(COUNT(*) AS BIGINT) AS n FROM customer WHERE c_custkey < 150 GROUP BY GROUPING SETS ((c_mktsegment, c_nationkey), (c_mktsegment)) ORDER BY 1, 2 NULLS FIRST;
SELECT n_regionkey, CAST(SUM(n_nationkey) AS BIGINT) AS s FROM nation GROUP BY CUBE (n_regionkey) ORDER BY 1 NULLS FIRST;
SELECT l_returnflag, l_linestatus, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q FROM lineitem WHERE l_orderkey < 300 GROUP BY ROLLUP (l_returnflag, l_linestatus) ORDER BY 1 NULLS FIRST, 2 NULLS FIRST;
SELECT x.o_custkey, x.o_orderkey FROM (SELECT o_custkey, o_orderkey, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn FROM orders WHERE o_custkey < 10) x WHERE x.rn = 1 ORDER BY x.o_custkey;
SELECT y.lang, y.doc_id FROM (SELECT lang, doc_id, rank() OVER (PARTITION BY lang ORDER BY length(text) DESC, doc_id) AS r FROM documents WHERE doc_id < 200) y WHERE y.r <= 2 ORDER BY y.lang, y.doc_id;
SELECT z.sha, z.n FROM (SELECT substr(md5(text), 1, 8) AS sha, COUNT(*) AS n FROM documents WHERE doc_id < 120 GROUP BY 1) z WHERE z.n > 1 ORDER BY z.sha LIMIT 10;
SELECT (SELECT COUNT(*) FROM region) * 100 + (SELECT COUNT(*) FROM nation) AS combo;
SELECT CAST(a.total - b.total AS BIGINT) AS diff FROM (SELECT COUNT(*) AS total FROM orders WHERE o_orderkey < 500) a, (SELECT COUNT(*) AS total FROM orders WHERE o_orderkey < 100) b;
SELECT t.k, CAST(COUNT(*) AS BIGINT) AS n FROM ((SELECT n_regionkey AS k FROM nation) UNION ALL (SELECT r_regionkey AS k FROM region) UNION ALL (SELECT CAST(s_nationkey % 5 AS BIGINT) AS k FROM supplier)) t GROUP BY t.k ORDER BY t.k;
SELECT u.k FROM (SELECT o_orderstatus AS k FROM orders WHERE o_orderkey < 100 UNION SELECT l_returnflag AS k FROM lineitem WHERE l_orderkey < 100) u ORDER BY u.k;
SELECT CAST(concat_ws('-', r_name, CAST(r_regionkey AS VARCHAR(4))) AS VARCHAR(40)) AS tag FROM region ORDER BY tag;
SELECT c_custkey, replace(lower(c_mktsegment), 'a', '@') AS seg FROM customer WHERE c_custkey < 6 ORDER BY c_custkey;
SELECT p_partkey, trim(concat('  ', p_brand, '  ')) AS b FROM part WHERE p_partkey < 5 ORDER BY p_partkey;
SELECT ltrim(rtrim('  pad  ')) AS bare, length(ltrim(rtrim('  pad  '))) AS n;
SELECT s_suppkey, instr(s_name, '1') AS pos1 FROM supplier WHERE s_suppkey <= 8 ORDER BY s_suppkey;
SELECT o_orderkey, date_part('day', o_orderdate) AS dom FROM orders WHERE o_orderkey < 10 ORDER BY o_orderkey;
SELECT CAST(date_trunc('quarter', DATE '1995-08-17') AS DATE) AS q_start;
SELECT CAST(EXTRACT(HOUR FROM TIMESTAMP '1997-03-05 14:30:00') AS BIGINT) AS hr, CAST(EXTRACT(MINUTE FROM TIMESTAMP '1997-03-05 14:30:00') AS BIGINT) AS mi;
SELECT e.event_type, CAST(MIN(date_part('hour', e.ts)) AS BIGINT) AS first_hr FROM events e WHERE e.event_id < 300 GROUP BY 1 ORDER BY 1;
SELECT CAST(-7 % 3 AS BIGINT) AS m1, CAST(7 % -3 AS BIGINT) AS m2, CAST(((-7 % 3) + 3) % 3 AS BIGINT) AS pm;
SELECT CAST(abs(t0.n) AS BIGINT) AS a, CAST(-t0.n AS BIGINT) AS neg FROM (SELECT -5 AS n) t0;
SELECT l_linenumber, CAST(SUM(l_extendedprice * l_discount * (1 + l_tax)) AS DECIMAL(18,4)) AS adj FROM lineitem WHERE l_orderkey < 200 GROUP BY 1 ORDER BY 1;
SELECT CAST(MAX(o_totalprice) - MIN(o_totalprice) AS DECIMAL(18,2)) AS price_range FROM orders WHERE o_custkey < 40;
SELECT c_nationkey, CAST(AVG(length(c_name)) AS DECIMAL(10,4)) AS avg_name_len FROM customer WHERE c_custkey < 300 GROUP BY 1 ORDER BY 1 LIMIT 10;
SELECT p_brand, CAST(MIN(p_retailprice) AS DECIMAL(18,2)) AS lo, CAST(MAX(p_retailprice) AS DECIMAL(18,2)) AS hi FROM part GROUP BY p_brand HAVING MIN(p_retailprice) < MAX(p_retailprice) ORDER BY p_brand LIMIT 10;
SELECT o_orderpriority, CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS statuses, CAST(MAX(o_orderkey) AS BIGINT) AS max_k FROM orders WHERE o_orderkey < 1500 GROUP BY 1 ORDER BY 1;
SELECT d.lang, CAST(COUNT(*) FILTER (WHERE length(d.text) > 100) AS BIGINT) AS longs, CAST(COUNT(*) FILTER (WHERE length(d.text) <= 100) AS BIGINT) AS shorts FROM documents d WHERE d.doc_id < 250 GROUP BY 1 ORDER BY 1;
SELECT s.s_nationkey, CAST(SUM(CASE WHEN s.s_acctbal > c.avg_bal THEN 1 ELSE 0 END) AS BIGINT) AS above FROM supplier s JOIN (SELECT s_nationkey AS nk, AVG(s_acctbal) AS avg_bal FROM supplier GROUP BY 1) c ON s.s_nationkey = c.nk GROUP BY 1 ORDER BY 1 LIMIT 10;
SELECT o.o_orderkey FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey AND l.l_quantity > 45 WHERE l.l_orderkey IS NULL AND o.o_orderkey < 120 ORDER BY o.o_orderkey LIMIT 15;
SELECT n.n_name, COALESCE(x.cnt, 0) AS suppliers FROM nation n LEFT JOIN (SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS cnt FROM supplier GROUP BY 1) x ON n.n_nationkey = x.s_nationkey WHERE n.n_nationkey < 8 ORDER BY n.n_name;
SELECT r.r_name, n.n_name, s.s_suppkey FROM region r JOIN nation n ON r.r_regionkey = n.n_regionkey JOIN supplier s ON n.n_nationkey = s.s_nationkey WHERE s.s_suppkey <= 6 ORDER BY r.r_name, n.n_name, s.s_suppkey;
SELECT w.event_type, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT event_type, value, avg(value) OVER (PARTITION BY event_type) AS m FROM events WHERE event_id < 400 AND value IS NOT NULL) w WHERE w.value > w.m GROUP BY 1 ORDER BY 1;
SELECT p.p_type, CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY p.p_retailprice) AS DECIMAL(18,2)) AS med_price FROM part p WHERE p.p_partkey < 160 GROUP BY 1 ORDER BY 1 LIMIT 8;
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n FROM lineitem WHERE l_shipdate BETWEEN DATE '1994-01-01' AND DATE '1994-12-31' AND l_orderkey < 4000 GROUP BY 1 ORDER BY 1;
SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem WHERE l_discount BETWEEN 0.02 AND 0.04 AND l_orderkey < 2500;
SELECT c.c_mktsegment, CAST(COUNT(DISTINCT o.o_orderdate) AS BIGINT) AS active_days FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey WHERE o.o_orderkey < 700 GROUP BY 1 ORDER BY 1;
SELECT t.decade_key, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) / 10 * 10 AS decade_key FROM orders WHERE o_orderkey < 900) t GROUP BY 1 ORDER BY 1;
SELECT CASE WHEN l_quantity < 10 THEN 'small' WHEN l_quantity < 30 THEN 'mid' ELSE 'large' END AS bucket, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(l_extendedprice) AS DECIMAL(18,2)) AS rev FROM lineitem WHERE l_orderkey < 350 GROUP BY 1 ORDER BY 1;
SELECT d.is_dup_lang, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT CASE WHEN COUNT(*) OVER (PARTITION BY lang) > 100 THEN 1 ELSE 0 END AS is_dup_lang FROM documents WHERE doc_id < 500) d GROUP BY 1 ORDER BY 1;
SELECT o_orderstatus, CAST(MIN(o_orderkey) AS BIGINT) AS first_key, CAST(MAX(o_orderkey) AS BIGINT) AS last_key, CAST(MAX(o_orderkey) - MIN(o_orderkey) AS BIGINT) AS span FROM orders WHERE o_custkey < 30 GROUP BY 1 ORDER BY 1;

-- tranche r5-ah: multi-level window nesting, nested EXISTS, type-coercion
-- arithmetic, CASE-in-join shapes, percent-of-total windows, stddev subqueries
SELECT q.k, CAST(SUM(q.rn) AS BIGINT) AS rn_sum FROM (SELECT o_custkey AS k, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn FROM orders WHERE o_custkey < 12) q GROUP BY q.k ORDER BY q.k;
SELECT w.seg, CAST(MAX(w.d) AS DECIMAL(18,2)) AS max_jump FROM (SELECT c_mktsegment AS seg, c_acctbal - lag(c_acctbal, 1, c_acctbal) OVER (PARTITION BY c_mktsegment ORDER BY c_custkey) AS d FROM customer WHERE c_custkey < 120) w GROUP BY 1 ORDER BY 1;
SELECT v.flag, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT CASE WHEN dense_rank() OVER (ORDER BY s_acctbal DESC) <= 5 THEN 'top5' ELSE 'rest' END AS flag FROM supplier) v GROUP BY 1 ORDER BY 1;
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n FROM orders WHERE o_orderkey < 1000 AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_discount > 0.05) GROUP BY 1 ORDER BY 1;
SELECT n_name FROM nation WHERE n_nationkey IN (SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000) AND n_nationkey NOT IN (SELECT c_nationkey FROM customer WHERE c_acctbal < -500) ORDER BY n_name LIMIT 10;
SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders o WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey AND p.p_size > 40)) AND o.o_orderkey < 900;
SELECT CAST(1 + 2 * 3 - 10 / 4 AS DOUBLE) AS prec1, CAST((1 + 2) * (3 - 10) / 4 AS DOUBLE) AS prec2;
SELECT CAST(CAST(7 AS DECIMAL(10,3)) / CAST(2 AS DECIMAL(10,3)) AS DECIMAL(12,4)) AS dec_div;
SELECT l_orderkey, CAST(SUM(l_quantity * 1.0) AS DOUBLE) AS qsum FROM lineitem WHERE l_orderkey < 60 GROUP BY 1 ORDER BY 1;
SELECT CAST(SUM(CASE o_orderstatus WHEN 'O' THEN 1 WHEN 'F' THEN 10 ELSE 100 END) AS BIGINT) AS weighted FROM orders WHERE o_orderkey < 400;
SELECT x.b, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT CASE WHEN length(text) % 3 = 0 THEN 'z' WHEN length(text) % 3 = 1 THEN 'o' ELSE 't' END AS b FROM documents WHERE doc_id < 300) x GROUP BY 1 ORDER BY 1;
SELECT c.seg, CAST(SUM(c.flag) AS BIGINT) AS n_high FROM (SELECT c_mktsegment AS seg, CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END AS flag FROM customer) c GROUP BY 1 ORDER BY 1;
SELECT s.s_nationkey, n.grp, CAST(COUNT(*) AS BIGINT) AS n FROM supplier s JOIN (SELECT n_nationkey, CASE WHEN n_regionkey < 2 THEN 'west' ELSE 'east' END AS grp FROM nation) n ON s.s_nationkey = n.n_nationkey GROUP BY 1, 2 ORDER BY 1 LIMIT 12;
SELECT e.user_id, CAST(COUNT(DISTINCT e.event_type) AS BIGINT) AS kinds, CAST(COUNT(*) AS BIGINT) AS total FROM events e WHERE e.user_id < 8 GROUP BY 1 HAVING COUNT(*) >= 2 ORDER BY 1;
SELECT t.event_type, CAST(SUM(t.v) AS DOUBLE) AS v_sum FROM (SELECT event_type, COALESCE(value, 0.0) AS v FROM events WHERE event_id < 600) t GROUP BY 1 ORDER BY 1;
SELECT d1.doc_id, d2.doc_id AS peer FROM documents d1 JOIN documents d2 ON length(d1.text) = length(d2.text) AND d1.doc_id < d2.doc_id WHERE d1.doc_id < 15 AND d2.doc_id < 15 ORDER BY 1, 2 LIMIT 20;
SELECT l.l_returnflag, CAST(AVG(CAST(o.o_totalprice AS DOUBLE)) AS DECIMAL(18,2)) AS avg_order FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey < 250 GROUP BY 1 ORDER BY 1;
SELECT p.sz_grp, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT p_size - p_size % 10 AS sz_grp FROM part) p GROUP BY 1 ORDER BY 1;
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs FROM nation a JOIN nation b ON a.n_nationkey <> b.n_nationkey AND a.n_regionkey = b.n_regionkey;
SELECT r_name, (SELECT COUNT(*) FROM nation WHERE n_regionkey = r_regionkey) * 2 AS dbl FROM region ORDER BY r_name;
SELECT o_orderstatus, CAST(VAR_POP(o_totalprice) IS NOT NULL AS BOOLEAN) AS has_var, CAST(COUNT(*) AS BIGINT) AS n FROM orders WHERE o_orderkey < 700 GROUP BY 1 ORDER BY 1;
SELECT CAST(STDDEV_POP(CAST(n_nationkey AS DOUBLE)) AS DECIMAL(12,4)) AS sd FROM nation;
SELECT k.lang, k.mx - k.mn AS span FROM (SELECT lang, MIN(doc_id) AS mn, MAX(doc_id) AS mx FROM documents GROUP BY lang) k ORDER BY k.lang;
SELECT CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT DISTINCT o_custkey, o_orderstatus FROM orders WHERE o_orderkey < 500) d;
SELECT u.k, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT DISTINCT l_orderkey % 7 AS k FROM lineitem WHERE l_orderkey < 450 UNION ALL SELECT DISTINCT o_orderkey % 7 AS k FROM orders WHERE o_orderkey < 450) u GROUP BY 1 ORDER BY 1;
SELECT CAST(MIN(x.mn) AS DATE) AS first_day FROM (SELECT CAST(MIN(o_orderdate) AS DATE) AS mn FROM orders GROUP BY o_orderstatus) x;
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n, CAST(RANK() OVER (ORDER BY COUNT(*) DESC, c_nationkey) AS BIGINT) AS rnk FROM customer GROUP BY c_nationkey ORDER BY rnk LIMIT 8;
SELECT z.status, z.share FROM (SELECT o_orderstatus AS status, CAST(COUNT(*) * 100 / SUM(COUNT(*)) OVER () AS DECIMAL(10,4)) AS share FROM orders WHERE o_orderkey < 1200 GROUP BY 1) z ORDER BY z.status;
SELECT l_linestatus, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS gross, CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS net FROM lineitem WHERE l_orderkey < 150 GROUP BY 1 ORDER BY 1;
SELECT CAST(COUNT(*) AS BIGINT) AS big_orders FROM orders WHERE o_totalprice > (SELECT AVG(o_totalprice) + (SELECT STDDEV_POP(o_totalprice) FROM orders) FROM orders);
SELECT f.ftype, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT CASE WHEN o_totalprice < 50000 THEN 'S' WHEN o_totalprice < 150000 THEN 'M' ELSE 'L' END AS ftype FROM orders WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')) f GROUP BY 1 ORDER BY 1;
SELECT g.gk, CAST(SUM(g.cnt) AS BIGINT) AS total FROM (SELECT p_brand AS gk, COUNT(*) AS cnt FROM part GROUP BY p_brand HAVING COUNT(*) > 2 UNION ALL SELECT p_type AS gk, COUNT(*) AS cnt FROM part GROUP BY p_type HAVING COUNT(*) > 6) g GROUP BY 1 ORDER BY 1 LIMIT 15;
SELECT CAST(SUM(len_mod) AS BIGINT) AS checksum FROM (SELECT (length(text) * 31 + doc_id) % 1000003 AS len_mod FROM documents) t;

-- tranche r5-ai: anti-join over aggregates, argmax-via-HAVING, left-join
-- miss counting, running totals over grouped counts, EXISTS-in-CASE routing
SELECT t.nk, t.n FROM (SELECT s_nationkey AS nk, COUNT(*) AS n FROM supplier GROUP BY 1) t WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = t.nk AND c.c_acctbal > 9000) ORDER BY t.nk LIMIT 10;
SELECT o_custkey FROM orders GROUP BY o_custkey HAVING COUNT(*) = (SELECT MAX(cnt) FROM (SELECT COUNT(*) AS cnt FROM orders GROUP BY o_custkey) m) ORDER BY o_custkey LIMIT 5;
SELECT q.g, q.total FROM (SELECT l_returnflag AS g, SUM(CAST(l_quantity AS BIGINT)) AS total FROM lineitem GROUP BY 1) q JOIN (SELECT SUM(CAST(l_quantity AS BIGINT)) AS grand FROM lineitem) w ON q.total * 4 > w.grand ORDER BY q.g;
SELECT u.b, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT CASE WHEN o_orderkey % 100 < 50 THEN 'lo' ELSE 'hi' END AS b FROM orders WHERE o_orderkey < 3000 AND o_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'P')) u GROUP BY 1 ORDER BY 1;
SELECT c_mktsegment, CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS no_order_rows, CAST(COUNT(*) AS BIGINT) AS total FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_totalprice > 200000 GROUP BY 1 ORDER BY 1;
SELECT x.dmod, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) % 7 AS dmod FROM orders WHERE o_orderkey < 2600) x GROUP BY 1 ORDER BY 1;
SELECT y.yr, CAST(SUM(y.rev) AS DECIMAL(18,2)) AS annual FROM (SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr, l_extendedprice * (1 - l_discount) AS rev FROM lineitem WHERE l_orderkey < 1200) y GROUP BY 1 ORDER BY 1;
SELECT p_size, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(COUNT(*)) OVER (ORDER BY p_size ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running FROM part WHERE p_size <= 12 GROUP BY p_size ORDER BY p_size;
SELECT w.k, CAST(w.v - w.prior AS DECIMAL(18,2)) AS delta FROM (SELECT o_orderstatus AS k, SUM(o_totalprice) AS v, lag(SUM(o_totalprice), 1, 0.0) OVER (ORDER BY o_orderstatus) AS prior FROM orders WHERE o_orderkey < 500 GROUP BY 1) w ORDER BY w.k;
SELECT z.seg, z.r FROM (SELECT c_mktsegment AS seg, percent_rank() OVER (ORDER BY COUNT(*)) AS r FROM customer GROUP BY c_mktsegment) z ORDER BY z.seg;
SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n, CAST(COUNT(*) = 5 AS BOOLEAN) AS is_five FROM nation GROUP BY 1 ORDER BY 1;
SELECT b.bucket3, CAST(AVG(b.tp) AS DECIMAL(18,4)) AS avg_price FROM (SELECT o_orderkey % 3 AS bucket3, o_totalprice AS tp FROM orders WHERE o_orderkey < 1700) b GROUP BY 1 ORDER BY 1;
SELECT p1.p_brand, CAST(COUNT(DISTINCT p2.p_partkey) AS BIGINT) AS same_size_peers FROM part p1 JOIN part p2 ON p1.p_size = p2.p_size AND p1.p_partkey <> p2.p_partkey WHERE p1.p_partkey < 40 GROUP BY 1 ORDER BY 1;
SELECT v.seg FROM (SELECT DISTINCT c_mktsegment AS seg FROM customer) v WHERE v.seg LIKE '%I%' ORDER BY v.seg;
SELECT CAST(SUM(length(replace(text, ' ', ''))) AS BIGINT) AS nonspace_chars FROM documents WHERE doc_id < 80;
SELECT k.flag2, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT l_returnflag || l_linestatus AS flag2 FROM lineitem WHERE l_orderkey < 800) k GROUP BY 1 ORDER BY 1;
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n FROM orders WHERE o_orderdate = (SELECT MIN(o_orderdate) FROM orders) GROUP BY 1 ORDER BY 1;
SELECT g.grp, CAST(SUM(g.bal) AS DECIMAL(18,2)) AS bal_sum FROM (SELECT CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'pos' END AS grp, c_acctbal AS bal FROM customer UNION ALL SELECT CASE WHEN s_acctbal < 0 THEN 'neg' ELSE 'pos' END AS grp, s_acctbal AS bal FROM supplier) g GROUP BY 1 ORDER BY 1;
SELECT h.hour_bucket, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT CAST(EXTRACT(HOUR FROM ts) AS BIGINT) / 6 AS hour_bucket FROM events WHERE event_id < 700) h GROUP BY 1 ORDER BY 1;
SELECT CAST(COUNT(*) AS BIGINT) AS n_with_comment_marker FROM documents WHERE text LIKE '%//%' OR text LIKE '%#%';
SELECT t.tail, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT substr(c_name, length(c_name), 1) AS tail FROM customer WHERE c_custkey < 400) t GROUP BY 1 ORDER BY 1 LIMIT 12;
SELECT CAST(SUM(CAST(substr(CAST(o_orderkey AS VARCHAR(12)), 1, 1) AS BIGINT)) AS BIGINT) AS benford_digit_sum FROM orders WHERE o_orderkey < 1000;
SELECT j.size_band, CAST(MAX(j.cnt) AS BIGINT) AS peak FROM (SELECT p_size / 5 AS size_band, p_brand, COUNT(*) AS cnt FROM part GROUP BY 1, 2) j GROUP BY 1 ORDER BY 1;
SELECT q.flag, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT CASE WHEN EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R') THEN 'ret' ELSE 'clean' END AS flag FROM orders o WHERE o.o_orderkey < 1400) q GROUP BY 1 ORDER BY 1;
SELECT s.s_name FROM supplier s WHERE s.s_acctbal > (SELECT AVG(s2.s_acctbal) FROM supplier s2 WHERE s2.s_nationkey = s.s_nationkey) AND s.s_suppkey <= 30 ORDER BY s.s_name LIMIT 12;
SELECT d.parity, CAST(SUM(d.len) AS BIGINT) AS chars FROM (SELECT doc_id % 2 AS parity, length(text) AS len FROM documents) d GROUP BY 1 ORDER BY 1;
SELECT CAST(COUNT(*) AS BIGINT) AS n_multi_line FROM documents WHERE length(text) - length(replace(text, chr(10), '')) >= 2;

-- tranche r5-aj: correlated COALESCE subqueries, UNION type widening,
-- ratio-of-sums HAVING, palindrome/hash key shapes, grouped median
SELECT n_name, COALESCE((SELECT MAX(s_acctbal) FROM supplier WHERE s_nationkey = n_nationkey), 0.0) AS best_bal FROM nation WHERE n_nationkey < 8 ORDER BY n_name;
SELECT t.k, CAST(SUM(t.v) AS BIGINT) AS s FROM (SELECT o_orderkey % (3 + 2) AS k, 1 AS v FROM orders WHERE o_orderkey < 800) t GROUP BY 1 ORDER BY 1;
SELECT u.x FROM (SELECT CAST(n_nationkey AS DOUBLE) AS x FROM nation UNION SELECT CAST(r_regionkey AS DOUBLE) AS x FROM region) u ORDER BY u.x LIMIT 12;
SELECT l_returnflag, CAST(SUM(l_extendedprice) / SUM(l_quantity) AS DECIMAL(18,4)) AS price_per_unit FROM lineitem WHERE l_orderkey < 400 GROUP BY 1 HAVING SUM(l_quantity) > 0 ORDER BY 1;
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n FROM customer GROUP BY 1 HAVING length(c_mktsegment) > 5 ORDER BY 1;
SELECT p.p_brand, CAST(COUNT(*) AS BIGINT) AS n FROM part p WHERE p.p_type LIKE '%BRASS%' OR p.p_type LIKE '%STEEL%' GROUP BY 1 ORDER BY 1 LIMIT 12;
SELECT s_suppkey, CASE WHEN s_acctbal BETWEEN 0 AND 2500 THEN 'A' WHEN s_acctbal BETWEEN 2500 AND 6000 THEN 'B' ELSE 'C' END AS band FROM supplier WHERE s_suppkey <= 12 ORDER BY s_suppkey;
SELECT b.lang, b.first_text_len FROM (SELECT lang, length(MIN(text)) AS first_text_len FROM documents WHERE doc_id < 100 GROUP BY lang) b ORDER BY b.lang;
SELECT CAST(COUNT(*) AS BIGINT) AS palindromic_keys FROM orders WHERE CAST(o_orderkey AS VARCHAR(12)) = reverse(CAST(o_orderkey AS VARCHAR(12))) AND o_orderkey < 3000;
SELECT e.user_id, CAST(SUM(CASE WHEN e.event_type IN ('click', 'view') THEN 1 ELSE 0 END) AS BIGINT) AS clicks_views FROM events e WHERE e.user_id < 10 GROUP BY 1 ORDER BY 1;
SELECT w.r, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT CAST(round(c_acctbal / 1000) AS BIGINT) AS r FROM customer WHERE c_acctbal >= 0) w GROUP BY 1 ORDER BY 1 LIMIT 12;
SELECT x.g, CAST(MIN(x.d) AS DATE) AS first_d, CAST(MAX(x.d) AS DATE) AS last_d FROM (SELECT o_orderstatus AS g, CAST(o_orderdate AS DATE) AS d FROM orders WHERE o_orderkey < 2000) x GROUP BY 1 ORDER BY 1;
SELECT CAST(SUM(CAST(l_partkey % 1000 AS BIGINT) * CAST(l_suppkey % 100 AS BIGINT)) AS BIGINT) AS mixsum FROM lineitem WHERE l_orderkey < 300;
SELECT n1.n_name AS nation, n2.n_name AS same_region_peer FROM nation n1 JOIN nation n2 ON n1.n_regionkey = n2.n_regionkey WHERE n1.n_nationkey = 3 AND n2.n_nationkey <> 3 ORDER BY same_region_peer;
SELECT q.status, CAST(q.n AS BIGINT) AS n, CAST(q.n - lead(q.n, 1, 0) OVER (ORDER BY q.status) AS BIGINT) AS drop_to_next FROM (SELECT o_orderstatus AS status, COUNT(*) AS n FROM orders WHERE o_orderkey < 1000 GROUP BY 1) q ORDER BY q.status;
SELECT CAST(AVG(gap) AS DECIMAL(18,4)) AS avg_gap FROM (SELECT o_orderkey - lag(o_orderkey) OVER (ORDER BY o_orderkey) AS gap FROM orders WHERE o_custkey = 1) g WHERE gap IS NOT NULL;
SELECT d.tri, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT substr(text, 1, 3) AS tri FROM documents WHERE doc_id < 150 AND length(text) >= 3) d GROUP BY 1 HAVING COUNT(*) >= 2 ORDER BY 1 LIMIT 12;
SELECT CAST(SUM(CASE WHEN t.flag THEN 1 ELSE 0 END) AS BIGINT) AS n_true FROM (SELECT c_acctbal > 0 AND c_nationkey < 10 AS flag FROM customer) t;
SELECT v.k2, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT (o_orderkey * 2654435761) % 97 AS k2 FROM orders WHERE o_orderkey < 970) v GROUP BY 1 ORDER BY 1 LIMIT 15;
SELECT z.b, CAST(SUM(z.price) AS DECIMAL(18,2)) AS total FROM (SELECT CASE WHEN p_retailprice IS NULL THEN 'null' WHEN p_retailprice < 1200 THEN 'cheap' ELSE 'dear' END AS b, COALESCE(p_retailprice, 0) AS price FROM part) z GROUP BY 1 ORDER BY 1;
SELECT CAST(COUNT(DISTINCT CAST(o_totalprice AS BIGINT) % 10) AS BIGINT) AS last_digit_kinds FROM orders WHERE o_orderkey < 500;
SELECT m.seg, m.med FROM (SELECT c_mktsegment AS seg, CAST(median(c_acctbal) AS DECIMAL(18,2)) AS med FROM customer WHERE c_custkey < 500 GROUP BY 1) m ORDER BY m.seg;

-- tranche r5-ak: levenshtein/md5/bitwise ops, try_cast, ntile,
-- grouping() rollup flags, full-outer coalesce keys, date_trunc,
-- position/translate/lpad/repeat string shapes, scalar-subquery HAVING
-- (dropped: SUM over CAST(double*100 AS BIGINT) — engine-dependent
-- truncation of the double product)
SELECT CAST(levenshtein(n1.n_name, n2.n_name) AS BIGINT) AS dist, n1.n_name AS a, n2.n_name AS b FROM nation n1 JOIN nation n2 ON n1.n_nationkey < n2.n_nationkey WHERE n1.n_nationkey < 4 AND n2.n_nationkey < 6 ORDER BY 1, 2, 3 LIMIT 10;
SELECT md5(c_name) AS h, c_custkey FROM customer WHERE c_custkey <= 5 ORDER BY c_custkey;
SELECT CAST(SUM(o_orderkey & 15) AS BIGINT) AS and_sum, CAST(SUM(o_orderkey | 8) AS BIGINT) AS or_sum FROM orders WHERE o_orderkey < 200;
SELECT s_suppkey, CAST(greatest(s_acctbal, 0) AS DECIMAL(18,2)) AS g, CAST(least(s_acctbal, 1000) AS DECIMAL(18,2)) AS l FROM supplier WHERE s_suppkey <= 10 ORDER BY 1;
SELECT CAST(COUNT(NULLIF(l_returnflag, 'N')) AS BIGINT) AS n_not_n FROM lineitem WHERE l_orderkey < 400;
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m, CAST(COUNT(*) AS BIGINT) AS n FROM orders WHERE o_orderkey < 600 GROUP BY 1 ORDER BY 1 LIMIT 12;
SELECT lpad(CAST(n_nationkey AS VARCHAR(4)), 4, '0') AS padded FROM nation WHERE n_nationkey < 6 ORDER BY 1;
SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part WHERE position('BRASS' IN p_type) > 0;
SELECT translate(c_mktsegment, 'AEIOU', 'aeiou') AS t, CAST(COUNT(*) AS BIGINT) AS n FROM customer GROUP BY 1 ORDER BY 1;
SELECT CAST(COUNT(try_cast(substr(c_name, 10, 9) AS BIGINT)) AS BIGINT) AS numeric_suffixes FROM customer WHERE c_custkey < 200;
SELECT q.tile, CAST(COUNT(*) AS BIGINT) AS n, CAST(MIN(q.bal) AS DECIMAL(18,2)) AS lo FROM (SELECT ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS tile, c_acctbal AS bal FROM customer WHERE c_custkey < 200) q GROUP BY 1 ORDER BY 1;
SELECT COALESCE(o_orderstatus, 'ALL') AS st, CAST(grouping(o_orderstatus) AS BIGINT) AS is_total, CAST(COUNT(*) AS BIGINT) AS n FROM orders WHERE o_orderkey < 500 GROUP BY ROLLUP(o_orderstatus) ORDER BY 2, 1;
SELECT chr(ascii(substr(n_name, 1, 1)) + 1) AS nxt, n_name FROM nation WHERE n_nationkey < 5 ORDER BY n_name;
SELECT CAST(COUNT(*) AS BIGINT) AS n FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_nationkey > 20);
SELECT COALESCE(a.k, b.k) AS k, CAST(COALESCE(a.n, 0) AS BIGINT) AS from_cust, CAST(COALESCE(b.n, 0) AS BIGINT) AS from_supp FROM (SELECT c_nationkey AS k, COUNT(*) AS n FROM customer GROUP BY 1) a FULL JOIN (SELECT s_nationkey AS k, COUNT(*) AS n FROM supplier GROUP BY 1) b ON a.k = b.k ORDER BY 1;
SELECT repeat('ab', n_nationkey % 3 + 1) AS r, CAST(COUNT(*) AS BIGINT) AS n FROM nation GROUP BY 1 ORDER BY 1;
SELECT x FROM (SELECT c_nationkey AS x FROM customer INTERSECT SELECT s_nationkey FROM supplier) t ORDER BY 1 LIMIT 10;
SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n FROM lineitem WHERE l_orderkey < 2000 GROUP BY 1 HAVING COUNT(*) > (SELECT 2) ORDER BY 2 DESC, 1 LIMIT 10;
SELECT substr(p_type, 1, position(' ' IN p_type) - 1) AS head, CAST(COUNT(*) AS BIGINT) AS n FROM part GROUP BY 1 ORDER BY 1 LIMIT 12;
SELECT o_orderstatus, CAST(SUM(o_totalprice) / COUNT(*) AS DECIMAL(18,4)) AS avg_price FROM orders WHERE o_orderkey < 700 GROUP BY 1 ORDER BY 1;
SELECT e.event_type, CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS users, CAST(COUNT(*) AS BIGINT) AS n FROM events e WHERE e.event_id < 900 GROUP BY 1 HAVING COUNT(DISTINCT e.user_id) >= 2 ORDER BY 1;

-- tranche r5-al: unbounded-frame first/last/nth_value, dense_rank
-- censuses, concat_ws/split_part, double NOT EXISTS, date+INTERVAL,
-- CASE-in-GROUP-BY, rolling-frame AVG, correlated scalar counts,
-- lag-gap first-event census, nested MAX-of-COUNT
SELECT q.seg, q.first_bal, q.last_bal FROM (SELECT DISTINCT c_mktsegment AS seg, CAST(first_value(c_acctbal) OVER (PARTITION BY c_mktsegment ORDER BY c_custkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DECIMAL(18,2)) AS first_bal, CAST(last_value(c_acctbal) OVER (PARTITION BY c_mktsegment ORDER BY c_custkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DECIMAL(18,2)) AS last_bal FROM customer WHERE c_custkey < 300) q ORDER BY q.seg;
SELECT p.p_brand, CAST(nth_value(p_retailprice, 2) OVER (PARTITION BY p_brand ORDER BY p_partkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DECIMAL(18,2)) AS second_price, p.p_partkey FROM part p WHERE p.p_partkey <= 40 ORDER BY p.p_brand, p.p_partkey LIMIT 15;
SELECT d.r, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT dense_rank() OVER (ORDER BY o_orderstatus) AS r FROM orders WHERE o_orderkey < 300) d GROUP BY 1 ORDER BY 1;
SELECT concat_ws('-', n_name, CAST(n_nationkey AS VARCHAR(4))) AS tag FROM nation WHERE n_nationkey < 6 ORDER BY 1;
SELECT split_part(p_type, ' ', 2) AS mid, CAST(COUNT(*) AS BIGINT) AS n FROM part GROUP BY 1 ORDER BY 1 LIMIT 10;
SELECT CAST(COUNT(*) AS BIGINT) AS lonely FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) AND NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey AND n.n_regionkey = 0);
SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders WHERE o_orderdate + INTERVAL '90' DAY < DATE '1995-01-01' AND o_orderkey < 2000;
SELECT CASE WHEN l_quantity < 10 THEN 'small' WHEN l_quantity < 30 THEN 'mid' ELSE 'big' END AS band, CAST(SUM(l_quantity) AS DECIMAL(18,2)) AS q FROM lineitem WHERE l_orderkey < 500 GROUP BY CASE WHEN l_quantity < 10 THEN 'small' WHEN l_quantity < 30 THEN 'mid' ELSE 'big' END ORDER BY 1;
SELECT reverse(n_name) AS rev FROM nation WHERE n_nationkey < 5 ORDER BY 1;
SELECT CAST(COUNT(*) AS BIGINT) AS pairs FROM supplier a JOIN supplier b ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey WHERE a.s_suppkey <= 40 AND b.s_suppkey <= 40;
SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part p WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey AND l.l_orderkey < 200) OR p.p_size > 48;
SELECT t.k, CAST(t.m AS DECIMAL(18,2)) AS m FROM (SELECT o_orderkey AS k, AVG(o_totalprice) OVER (ORDER BY o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS m FROM orders WHERE o_orderkey < 60) t ORDER BY t.k;
SELECT u.v, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT CAST(n_nationkey AS BIGINT) AS v FROM nation UNION ALL SELECT s_suppkey FROM supplier WHERE s_suppkey < 10) u GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY 1;
SELECT l_linestatus, CAST(MIN(l_quantity) AS DECIMAL(18,2)) AS mn FROM lineitem WHERE l_orderkey < 300 GROUP BY 1 HAVING MIN(l_quantity) <= 5 ORDER BY 1;
SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events WHERE CAST(ts AS DATE) IN (SELECT MIN(CAST(ts AS DATE)) FROM events);
SELECT n_name, CAST((SELECT COUNT(*) FROM supplier s WHERE s.s_nationkey = n.n_nationkey) AS BIGINT) AS n_supp FROM nation n WHERE n_nationkey < 10 ORDER BY n_name;
SELECT CAST(SUM((l_partkey % 7) * (l_suppkey % 5) + l_linenumber) AS BIGINT) AS mix FROM lineitem WHERE l_orderkey < 250;
SELECT CAST(COUNT(DISTINCT substr(c_name, 10, 3)) AS BIGINT) AS prefixes FROM customer WHERE c_custkey < 300;
SELECT CAST(COUNT(*) AS BIGINT) AS first_events FROM (SELECT user_id, ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap FROM events WHERE user_id < 20) g WHERE gap IS NULL;
SELECT CAST(MAX(cnt) AS BIGINT) AS peak FROM (SELECT COUNT(*) AS cnt FROM lineitem WHERE l_orderkey < 1000 GROUP BY l_orderkey) t;

-- tranche r5-am: FILTER clause aggregates, GROUP BY ALL, boolean
-- aggregates, EXISTS-in-CASE, grouped-HAVING correlated EXISTS,
-- LIMIT OFFSET, explicit CROSS JOIN, IN (ordered LIMIT subquery),
-- window min/max ranges, YEAR*100+MONTH censuses
-- (dropped: lag(...) IGNORE NULLS — DuckDB parser rejects the
-- inline IGNORE NULLS syntax)
SELECT o_orderstatus, CAST(COUNT(*) FILTER (WHERE o_totalprice > 100000) AS BIGINT) AS big, CAST(COUNT(*) AS BIGINT) AS n FROM orders WHERE o_orderkey < 900 GROUP BY 1 ORDER BY 1;
SELECT l_returnflag, l_linestatus, CAST(SUM(l_quantity) AS DECIMAL(18,2)) AS q FROM lineitem WHERE l_orderkey < 400 GROUP BY ALL ORDER BY 1, 2;
SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS p, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS s FROM lineitem WHERE l_orderkey < 600;
SELECT c_mktsegment, bool_and(c_acctbal > -1000) AS all_ok, bool_or(c_acctbal > 9000) AS any_big FROM customer GROUP BY 1 ORDER BY 1;
SELECT c_custkey FROM customer ORDER BY c_custkey LIMIT 5 OFFSET 7;
SELECT n_name, CASE WHEN EXISTS (SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey AND s.s_acctbal > 9000) THEN 'rich' ELSE 'plain' END AS tag FROM nation n WHERE n_nationkey < 8 ORDER BY n_name;
SELECT l_orderkey, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS s FROM lineitem WHERE l_orderkey < 800 GROUP BY 1 HAVING COUNT(DISTINCT l_suppkey) >= 3 ORDER BY 1 LIMIT 12;
SELECT CAST(COUNT(*) AS BIGINT) AS combos FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s;
SELECT CAST(MAX(y.s) AS DECIMAL(18,2)) AS mx FROM (SELECT x.g, SUM(x.b) AS s FROM (SELECT c_nationkey % 5 AS g, c_acctbal AS b FROM customer) x GROUP BY 1) y;
SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders WHERE o_custkey IN (SELECT c_custkey FROM customer ORDER BY c_acctbal DESC LIMIT 10);
SELECT CAST(COUNT(*) AS BIGINT) AS heavy_parts FROM part p WHERE EXISTS (SELECT l_partkey FROM lineitem l WHERE l.l_partkey = p.p_partkey GROUP BY l_partkey HAVING SUM(l.l_quantity) > 200);
SELECT COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS st, CAST(COUNT(*) AS BIGINT) AS n FROM orders GROUP BY 1 ORDER BY 1;
SELECT t.seg, t.rng FROM (SELECT DISTINCT c_mktsegment AS seg, CAST(MAX(c_custkey) OVER (PARTITION BY c_mktsegment) - MIN(c_custkey) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS rng FROM customer WHERE c_custkey < 250) t ORDER BY t.seg;
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) * 100 + EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS ym, CAST(COUNT(*) AS BIGINT) AS n FROM orders WHERE o_orderkey < 400 GROUP BY 1 ORDER BY 1 LIMIT 12;
SELECT CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders) t;
SELECT CAST(COUNT(*) AS BIGINT) AS n FROM supplier WHERE s_suppkey NOT IN (SELECT l_suppkey FROM lineitem WHERE l_orderkey < 100);
SELECT rpad(substr(n_name, 1, 3), 6, '.') AS p FROM nation WHERE n_nationkey < 5 ORDER BY 1;
SELECT o_custkey, CAST(any_value(o_custkey % 7) AS BIGINT) AS cmod, CAST(COUNT(*) AS BIGINT) AS n FROM orders WHERE o_custkey < 15 GROUP BY 1 ORDER BY 1;
SELECT 'orders' AS src, CAST(COUNT(*) AS BIGINT) AS n FROM orders UNION ALL SELECT 'lineitem', CAST(COUNT(*) AS BIGINT) FROM lineitem ORDER BY src;

-- tranche r5-an: shifted-key equi-joins, EXISTS+NOT-EXISTS conjunction,
-- integer percent-of-total, lead() defaults, self-EXCEPT empties,
-- overlapping-range UNION dedup, HAVING with OR, ORDER BY agg DESC
-- tie-broken, nested-EXISTS scalar counts, sum-of-squared group sizes,
-- adjacent-key region peers (empty-result shape)
SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem a JOIN orders b ON a.l_orderkey = b.o_orderkey + 1 WHERE b.o_orderkey < 300;
SELECT t.grp, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT CASE WHEN c_mktsegment IN ('BUILDING', 'MACHINERY') THEN 'industrial' ELSE 'other' END AS grp FROM customer) t GROUP BY 1 ORDER BY 1;
SELECT q.seg, q.rnk FROM (SELECT c_mktsegment AS seg, RANK() OVER (ORDER BY SUM(c_acctbal) DESC, c_mktsegment) AS rnk FROM customer GROUP BY c_mktsegment) q ORDER BY q.rnk;
SELECT CAST(COUNT(*) AS BIGINT) AS n FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F') AND NOT EXISTS (SELECT 1 FROM orders o2 WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'P');
SELECT n_regionkey, CAST(100 * COUNT(*) / (SELECT COUNT(*) FROM nation) AS BIGINT) AS pct FROM nation GROUP BY 1 ORDER BY 1;
SELECT t.k, t.nxt FROM (SELECT n_nationkey AS k, lead(n_nationkey, 1, -1) OVER (ORDER BY n_nationkey) AS nxt FROM nation WHERE n_nationkey < 6) t ORDER BY t.k;
SELECT CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT r_regionkey FROM region EXCEPT SELECT r_regionkey FROM region) t;
SELECT x FROM (SELECT c_nationkey AS x FROM customer WHERE c_custkey < 50 UNION SELECT c_nationkey FROM customer WHERE c_custkey BETWEEN 25 AND 75) u ORDER BY 1 LIMIT 12;
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n FROM orders WHERE o_orderkey < 900 GROUP BY 1 HAVING COUNT(*) > 50 OR MIN(o_totalprice) < 10000 ORDER BY 1;
SELECT p_size / 10 AS band, CAST(COUNT(*) AS BIGINT) AS n FROM part GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 5;
SELECT CAST(COUNT(*) AS BIGINT) AS n FROM supplier WHERE s_suppkey > (SELECT MIN(s_suppkey) + 5 FROM supplier);
SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders WHERE o_orderdate BETWEEN DATE '1994-03-01' AND DATE '1994-06-30';
SELECT l_returnflag, CASE WHEN SUM(l_quantity) > 500 THEN 'hi' ELSE 'lo' END AS vol FROM lineitem WHERE l_orderkey < 300 GROUP BY 1 ORDER BY 1;
SELECT n_name FROM nation n WHERE (SELECT COUNT(*) FROM supplier s WHERE s.s_nationkey = n.n_nationkey AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey AND l.l_orderkey < 150)) >= 1 ORDER BY n_name LIMIT 10;
SELECT e.event_type, CAST(MIN(e.event_id) AS BIGINT) AS first_id, CAST(MAX(e.event_id) AS BIGINT) AS last_id FROM events e GROUP BY 1 ORDER BY 1;
SELECT d.lang, CAST(SUM(CASE WHEN d.n_chars > 300 THEN 1 ELSE 0 END) AS BIGINT) AS longdocs FROM documents d GROUP BY 1 HAVING SUM(CASE WHEN d.n_chars > 300 THEN 1 ELSE 0 END) > 0 ORDER BY 1;
SELECT CAST(SUM(sub.cnt * sub.cnt) AS BIGINT) AS sq FROM (SELECT COUNT(*) AS cnt FROM lineitem WHERE l_orderkey < 500 GROUP BY l_orderkey) sub;
SELECT a.n_name, b.n_name AS peer FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey AND a.n_nationkey + 1 = b.n_nationkey WHERE a.n_nationkey < 10 ORDER BY 1;

-- tranche r5-ao: day-of-month week buckets, derived-count joins,
-- ROW_NUMBER top-1-per-group sums, correlated scalar counts per region,
-- UNION-with-total rollups, MAX-size subquery keys, lag gap censuses,
-- per-source doc rollups, FILTER neg/pos splits, argmax-by-count HAVING
-- (dropped: CAST(double AS BIGINT) bucketing — DuckDB rounds, Spark
-- truncates)
SELECT w.wk, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) / 7 AS wk FROM orders WHERE o_orderkey < 500) w GROUP BY 1 ORDER BY 1;
SELECT s.s_name, c.cnt FROM supplier s JOIN (SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS cnt FROM lineitem WHERE l_orderkey < 400 GROUP BY 1) c ON c.l_suppkey = s.s_suppkey WHERE s.s_suppkey <= 12 ORDER BY s.s_name;
SELECT CAST(SUM(CASE WHEN t.r = 1 THEN t.price ELSE 0 END) AS DECIMAL(18,2)) AS top_per_status FROM (SELECT o_totalprice AS price, ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS r FROM orders WHERE o_orderkey < 600) t;
SELECT v.band, CAST(COUNT(DISTINCT v.sup) AS BIGINT) AS sups FROM (SELECT l_quantity / 10 AS band, l_suppkey AS sup FROM lineitem WHERE l_orderkey < 700) v GROUP BY 1 ORDER BY 1;
SELECT r_name, (SELECT CAST(COUNT(*) AS BIGINT) FROM nation n WHERE n.n_regionkey = r.r_regionkey) AS nations FROM region r ORDER BY r_name;
SELECT u.st, CAST(u.n AS BIGINT) AS n FROM (SELECT o_orderstatus AS st, COUNT(*) AS n FROM orders GROUP BY 1 UNION ALL SELECT 'TOTAL', COUNT(*) FROM orders) u ORDER BY u.st;
SELECT x.pk FROM (SELECT p_partkey AS pk FROM part WHERE p_size = (SELECT MAX(p_size) FROM part)) x ORDER BY x.pk LIMIT 8;
SELECT CAST(COUNT(*) AS BIGINT) AS n_gap_orders FROM (SELECT o_orderkey, lag(o_orderkey) OVER (ORDER BY o_orderkey) AS prev FROM orders WHERE o_orderkey < 2000) g WHERE g.prev IS NOT NULL AND g.o_orderkey - g.prev > 3;
SELECT t.mod3, CAST(MAX(t.len) AS BIGINT) AS longest FROM (SELECT doc_id % 3 AS mod3, length(text) AS len FROM documents WHERE doc_id < 200) t GROUP BY 1 ORDER BY 1;
SELECT c.c_mktsegment, CAST(COUNT(*) FILTER (WHERE c.c_acctbal < 0) AS BIGINT) AS neg, CAST(COUNT(*) FILTER (WHERE c.c_acctbal >= 0) AS BIGINT) AS pos FROM customer c GROUP BY 1 ORDER BY 1;
SELECT q.k FROM (SELECT l_orderkey AS k FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) = (SELECT MAX(c) FROM (SELECT COUNT(*) AS c FROM lineitem GROUP BY l_orderkey) m)) q ORDER BY q.k LIMIT 10;
SELECT CAST(COUNT(*) AS BIGINT) AS mixed_case FROM part WHERE lower(p_type) <> p_type AND upper(p_type) <> p_type;
SELECT e.user_id, CAST(COUNT(DISTINCT e.event_type) AS BIGINT) AS kinds FROM events e WHERE e.user_id < 12 GROUP BY 1 HAVING COUNT(DISTINCT e.event_type) >= 3 ORDER BY 1;
SELECT n1.n_name FROM nation n1 WHERE n1.n_nationkey IN (SELECT n2.n_nationkey FROM nation n2 WHERE n2.n_regionkey = n1.n_regionkey AND n2.n_nationkey <> n1.n_nationkey UNION SELECT 0) ORDER BY 1 LIMIT 10;
SELECT CAST(COUNT(*) AS BIGINT) AS palindrome_free FROM nation WHERE n_name <> reverse(n_name);
SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part WHERE p_brand IS NOT NULL AND p_size BETWEEN 10 AND 20 AND p_type NOT LIKE '%BRASS%';
SELECT d.source, CAST(COUNT(*) AS BIGINT) AS docs, CAST(SUM(d.n_chars) AS BIGINT) AS chars FROM documents d GROUP BY d.source ORDER BY 1;

-- tranche r5-ap: equal-count segment self-pairs, window-in-subquery
-- group rollups, correlated date comparisons, scalar-subquery BETWEEN
-- bounds, VALUES-join lookups, NOT-EXISTS quantity guards, cents
-- fixed-point sums, ntile tiers, fraction-of-corpus HAVING
-- (dropped: '> ALL (subquery)' — Spark parser rejects ALL/ANY
-- comparisons, the known single-engine trap)
SELECT t.dow, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) % 7 AS dow FROM orders WHERE o_orderkey < 700) t GROUP BY 1 ORDER BY 1;
SELECT a.seg, b.seg AS other, CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b FROM (SELECT c_mktsegment AS seg, COUNT(*) AS n FROM customer GROUP BY 1) a JOIN (SELECT c_mktsegment AS seg, COUNT(*) AS n FROM customer GROUP BY 1) b ON a.n = b.n AND a.seg < b.seg ORDER BY 1, 2;
SELECT CAST(SUM(len_mod) AS BIGINT) AS s FROM (SELECT length(p_name) % 11 AS len_mod FROM part WHERE p_partkey < 300) t;
SELECT v.grp, CAST(MIN(v.mn) AS DECIMAL(18,2)) AS mn, CAST(MAX(v.mx) AS DECIMAL(18,2)) AS mx FROM (SELECT s_nationkey % 4 AS grp, MIN(s_acctbal) OVER (PARTITION BY s_nationkey) AS mn, MAX(s_acctbal) OVER (PARTITION BY s_nationkey) AS mx FROM supplier) v GROUP BY 1 ORDER BY 1;
SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem l WHERE l.l_shipdate > (SELECT o.o_orderdate FROM orders o WHERE o.o_orderkey = l.l_orderkey) AND l.l_orderkey < 500;
SELECT g.gk, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT COALESCE(NULLIF(l_returnflag, 'N'), l_linestatus) AS gk FROM lineitem WHERE l_orderkey < 400) g GROUP BY 1 ORDER BY 1;
SELECT CAST(COUNT(*) AS BIGINT) AS n_between FROM customer WHERE c_acctbal BETWEEN (SELECT MIN(s_acctbal) FROM supplier) AND (SELECT MAX(s_acctbal) FROM supplier);
SELECT w.b, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT CAST(n_chars AS BIGINT) / 100 AS b FROM documents WHERE lang = 'en') w GROUP BY 1 ORDER BY 1 LIMIT 12;
SELECT t.flag, CAST(SUM(t.qty) AS DECIMAL(18,2)) AS q FROM (SELECT l_returnflag AS flag, l_quantity AS qty FROM lineitem WHERE l_orderkey < 200 UNION ALL SELECT l_returnflag, -l_quantity FROM lineitem WHERE l_orderkey < 100) t GROUP BY 1 ORDER BY 1;
SELECT p.p_brand, CAST(COUNT(*) AS BIGINT) AS n FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey WHERE l.l_orderkey < 250 GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 8;
SELECT x.k, x.v FROM (VALUES (1, 'one'), (2, 'two'), (3, 'three')) AS x(k, v) JOIN region r ON r.r_regionkey = x.k ORDER BY x.k;
SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders o WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45) AND o.o_orderkey < 900;
SELECT s.s_nationkey, CAST(SUM(CAST(s.s_acctbal * 100 AS DECIMAL(18,0))) AS BIGINT) AS cents FROM supplier s GROUP BY 1 ORDER BY 1 LIMIT 10;
SELECT t.tier, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT ntile(3) OVER (ORDER BY o_totalprice, o_orderkey) AS tier FROM orders WHERE o_orderkey < 300) t GROUP BY 1 ORDER BY 1;
SELECT m.lang, m.n FROM (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang) m WHERE m.n >= (SELECT CAST(COUNT(*) AS BIGINT) / 10 FROM documents) ORDER BY m.lang;

-- tranche r5-aq: quarter buckets, name-length extremes, scaled
-- scalar-subquery thresholds, priority-prefix censuses, weighted CASE
-- sums, filtered LEFT-JOIN fanout, argmax segment lookup, year-range
-- extracts, distinct-user hour censuses (dropped: l_receiptdate —
-- not in the synthetic lineitem schema)
SELECT t.q, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) / 4 AS q FROM orders WHERE o_orderkey < 800) t GROUP BY 1 ORDER BY 1;
SELECT c.c_mktsegment, CAST(MAX(length(c.c_name)) AS BIGINT) AS mx, CAST(MIN(length(c.c_name)) AS BIGINT) AS mn FROM customer c GROUP BY 1 ORDER BY 1;
SELECT v.sup, CAST(v.total AS DECIMAL(18,2)) AS total FROM (SELECT l_suppkey AS sup, SUM(l_extendedprice) AS total FROM lineitem WHERE l_orderkey < 300 GROUP BY 1) v WHERE v.total > (SELECT 2 * MIN(s_acctbal) FROM supplier WHERE s_acctbal > 0) ORDER BY v.sup LIMIT 10;
SELECT p.p_brand, CAST(SUM(p.p_size) AS BIGINT) AS sz FROM part p WHERE p.p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_orderkey < 150) GROUP BY 1 ORDER BY 1 LIMIT 10;
SELECT u.k, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT substr(o_orderpriority, 1, 1) AS k FROM orders WHERE o_orderkey < 700) u GROUP BY 1 ORDER BY 1;
SELECT CAST(SUM(CASE WHEN e.value < 5 THEN 1 WHEN e.value < 10 THEN 2 ELSE 3 END) AS BIGINT) AS weighted FROM events e WHERE e.event_id < 500;
SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n, CAST(MIN(d.doc_id) AS BIGINT) AS first_doc FROM documents d WHERE d.n_chars % 2 = 0 GROUP BY 1 ORDER BY 1;
SELECT r.r_name, n.n_name FROM region r LEFT JOIN nation n ON n.n_regionkey = r.r_regionkey AND n.n_nationkey < 3 ORDER BY r.r_name, n.n_name;
SELECT x.grp, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT CASE WHEN s_acctbal IS NULL THEN 'null' WHEN s_acctbal < 0 THEN 'neg' ELSE 'pos' END AS grp FROM supplier) x GROUP BY 1 ORDER BY 1;
SELECT t.ok, CAST(t.nk AS BIGINT) AS nk FROM (SELECT o_orderkey AS ok, ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS nk FROM orders WHERE o_orderkey < 120) t WHERE t.nk <= 5 ORDER BY t.nk;
SELECT CAST(COUNT(*) AS BIGINT) AS n_shared_name_len FROM nation a JOIN region b ON length(a.n_name) = length(b.r_name);
SELECT g.b, CAST(SUM(g.q) AS DECIMAL(18,2)) AS q FROM (SELECT l_linenumber AS b, l_quantity AS q FROM lineitem WHERE l_orderkey < 250) g GROUP BY 1 ORDER BY 1;
SELECT q.seg FROM (SELECT c_mktsegment AS seg, COUNT(*) AS n FROM customer GROUP BY 1) q WHERE q.n = (SELECT MAX(n2.n) FROM (SELECT COUNT(*) AS n FROM customer GROUP BY c_mktsegment) n2) ORDER BY q.seg;
SELECT CAST(EXTRACT(YEAR FROM MIN(o_orderdate)) AS BIGINT) AS first_year, CAST(EXTRACT(YEAR FROM MAX(o_orderdate)) AS BIGINT) AS last_year FROM orders;
SELECT h.hh, CAST(COUNT(DISTINCT h.uid) AS BIGINT) AS users FROM (SELECT CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS hh, user_id AS uid FROM events WHERE event_id < 800) h GROUP BY 1 HAVING COUNT(DISTINCT h.uid) >= 2 ORDER BY 1 LIMIT 12;

-- tranche r5-ar: doc-length buckets, distinct-customer censuses,
-- 3-table region chains, anti-join supplier picks, value cents sums,
-- composite-key mod groups, BETWEEN on strings, reorder censuses
-- (dropped: CAST(AVG(bigint) AS BIGINT) — Spark DECIMAL half-up vs
-- DuckDB DOUBLE truncation)
SELECT t.b, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT length(text) / 200 AS b FROM documents WHERE doc_id < 300) t GROUP BY 1 ORDER BY 1 LIMIT 10;
SELECT o.o_orderstatus, CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS custs FROM orders o WHERE o.o_orderkey < 1200 GROUP BY 1 ORDER BY 1;
SELECT CAST(COUNT(*) AS BIGINT) AS n FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey JOIN region r ON n.n_regionkey = r.r_regionkey WHERE r.r_name LIKE 'A%';
SELECT s.s_name FROM supplier s WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey AND l.l_orderkey < 50) AND s.s_suppkey <= 20 ORDER BY 1 LIMIT 10;
SELECT x.src, x.mx FROM (SELECT source AS src, CAST(MAX(doc_id) AS BIGINT) AS mx FROM documents GROUP BY 1) x ORDER BY x.mx DESC, x.src LIMIT 5;
SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part WHERE p_size IN (1, 5, 10, 25, 50);
SELECT w.pk, w.nextsz FROM (SELECT p_partkey AS pk, lead(p_size) OVER (ORDER BY p_partkey) AS nextsz FROM part WHERE p_partkey <= 15) w WHERE w.nextsz IS NOT NULL ORDER BY w.pk;
SELECT c.seg, CAST(c.total AS BIGINT) AS total FROM (SELECT c_mktsegment AS seg, SUM(length(c_name)) AS total FROM customer GROUP BY 1) c ORDER BY 1;
SELECT CAST(MIN(d) AS DATE) AS earliest FROM (SELECT CAST(ts AS DATE) AS d FROM events UNION ALL SELECT o_orderdate FROM orders WHERE o_orderkey < 10) u;
SELECT e.event_type, CAST(SUM(CAST(e.value * 100 AS DECIMAL(18,0))) AS BIGINT) AS cents FROM events e WHERE e.event_id < 400 GROUP BY 1 ORDER BY 1;
SELECT q.g, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT (l_partkey + l_suppkey) % 6 AS g FROM lineitem WHERE l_orderkey < 350) q GROUP BY 1 ORDER BY 1;
SELECT n_name FROM nation WHERE n_name BETWEEN 'C' AND 'K' ORDER BY 1;
SELECT CAST(COUNT(*) AS BIGINT) AS reorders FROM (SELECT o_custkey, COUNT(*) AS k FROM orders GROUP BY 1 HAVING COUNT(*) >= 2) t;
SELECT t.band, CAST(MAX(t.bal) AS DECIMAL(18,2)) AS top_bal FROM (SELECT c_custkey % 4 AS band, c_acctbal AS bal FROM customer WHERE c_acctbal IS NOT NULL) t GROUP BY 1 ORDER BY 1;

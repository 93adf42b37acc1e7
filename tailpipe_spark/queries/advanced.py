"""Second-wave §2.b coverage: window frames, correlated subqueries,
HAVING, conditional/string/date function zoo, schema introspection
(A31), and the threat-detection layer over events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tailpipe_spark.functions.exact import dsum, oracle_dsum
from tailpipe_spark.functions.security import burst_count, ip_in_cidr, ipv4_to_long, is_private_ip
from tailpipe_spark.queries import QuerySpec


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from tailpipe_spark.session import read_table

    return read_table(spark, f"{sf_dir}/{name}.parquet")


# --- window frames: range frames, ntile, first/last, percent_rank ---

def q_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_orderkey").asc()
    )
    wrange = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_orderkey").asc()
    ).rangeBetween(-1000, 0)
    return (
        o.select(
            "o_orderkey",
            "o_orderstatus",
            F.ntile(4).over(w).alias("quartile"),
            F.first("o_orderkey").over(w).alias("first_key"),
            F.last("o_orderkey").over(
                w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            ).alias("last_key"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            F.count(F.lit(1)).over(wrange).alias("keys_in_range_1000"),
        )
        .orderBy("o_orderstatus", "o_orderkey")
        .limit(2000)
    )


Q_WINDOW_FRAMES_SQL = """
SELECT o_orderkey, o_orderstatus,
       NTILE(4) OVER w AS quartile,
       FIRST_VALUE(o_orderkey) OVER w AS first_key,
       LAST_VALUE(o_orderkey) OVER
         (PARTITION BY o_orderstatus ORDER BY o_orderkey ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume,
       COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey ASC
                      RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)
         AS keys_in_range_1000
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey ASC)
ORDER BY o_orderstatus, o_orderkey
LIMIT 2000
"""


# --- correlated subquery (decorrelated by Catalyst) ---

def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tailpipe_spark.session import configure_runtime

    configure_runtime(spark)
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_custkey, COUNT(*) AS n_big
        FROM orders o
        WHERE o_totalprice > (
            SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
                   / COUNT(*) * 1.5
            FROM orders i WHERE i.o_custkey = o.o_custkey)
        GROUP BY o_custkey
        ORDER BY o_custkey
        """
    )


Q_CORRELATED_SQL = """
SELECT o_custkey, COUNT(*) AS n_big
FROM orders o
WHERE o_totalprice > (
    SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
           / COUNT(*) * 1.5
    FROM orders i WHERE i.o_custkey = o.o_custkey)
GROUP BY o_custkey
ORDER BY o_custkey
"""


# --- HAVING + conditional functions ---

def q_having_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    g = (
        li.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("l_quantity", "qty"),
            F.min("l_discount").alias("min_disc"),
            F.max("l_discount").alias("max_disc"),
        )
        .filter(F.col("n") > 100)
    )
    return g.select(
        "l_suppkey",
        "n",
        "qty",
        F.coalesce(F.nullif(F.col("min_disc"), F.lit(0.0)), F.lit(-1.0)).alias(
            "min_nonzero_disc"
        ),
        F.greatest("min_disc", "max_disc").alias("g_disc"),
        F.least("min_disc", "max_disc").alias("l_disc"),
    ).orderBy("l_suppkey")


Q_HAVING_SQL = f"""
SELECT l_suppkey, n, qty,
       COALESCE(NULLIF(min_disc, 0.0), -1.0) AS min_nonzero_disc,
       GREATEST(min_disc, max_disc) AS g_disc,
       LEAST(min_disc, max_disc) AS l_disc
FROM (
  SELECT l_suppkey, COUNT(*) AS n, {oracle_dsum('l_quantity')} AS qty,
         MIN(l_discount) AS min_disc, MAX(l_discount) AS max_disc
  FROM lineitem GROUP BY l_suppkey HAVING COUNT(*) > 100)
ORDER BY l_suppkey
"""


# --- string function zoo ---

def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            F.trim(F.col("c_name")).alias("t_name"),
            F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("repl"),
            F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
            F.split(F.col("c_name"), "#").getItem(0).alias("name_prefix"),
            F.regexp_extract(F.col("c_name"), r"(\d+)", 1).alias("name_digits"),
            F.instr(F.col("c_name"), "0").alias("pos_zero"),
            F.reverse(F.col("c_mktsegment")).alias("seg_rev"),
            F.repeat(F.lit("ab"), 3).alias("repeated"),
            F.translate(F.col("c_mktsegment"), "AEIOU", "aeiou").alias("translated"),
        )
        .orderBy("c_custkey")
        .limit(1000)
    )


Q_STRING_SQL = """
SELECT c_custkey,
       TRIM(c_name) AS t_name,
       REPLACE(c_name, 'Customer', 'Cust') AS repl,
       LPAD(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
       STRING_SPLIT(c_name, '#')[1] AS name_prefix,
       REGEXP_EXTRACT(c_name, '(\\d+)', 1) AS name_digits,
       INSTR(c_name, '0') AS pos_zero,
       REVERSE(c_mktsegment) AS seg_rev,
       REPEAT('ab', 3) AS repeated,
       TRANSLATE(c_mktsegment, 'AEIOU', 'aeiou') AS translated
FROM customer
ORDER BY c_custkey
LIMIT 1000
"""


# --- date/time function zoo ---

def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return (
        o.select(
            "o_orderkey",
            d.alias("od"),
            F.date_add(d, 30).alias("plus30"),
            F.add_months(d, 2).alias("plus2mo"),
            F.datediff(F.lit("2000-01-01").cast("date"), d).alias("days_to_y2k"),
            F.dayofweek("o_orderdate").alias("dow"),
            F.dayofyear("o_orderdate").alias("doy"),
            F.quarter("o_orderdate").alias("qtr"),
            F.weekofyear("o_orderdate").alias("woy"),
            F.last_day(d).alias("month_end"),
            F.unix_timestamp(F.col("o_orderdate")).alias("epoch_s"),
        )
        .orderBy("o_orderkey")
        .limit(2000)
    )


Q_DATE_SQL = """
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS od,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS plus30,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2mo,
       datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
       dayofweek(o_orderdate) + 1 AS dow,
       dayofyear(o_orderdate) AS doy,
       quarter(o_orderdate) AS qtr,
       weekofyear(o_orderdate) AS woy,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
FROM orders
ORDER BY o_orderkey
LIMIT 2000
"""


# --- schema introspection (A31: DESCRIBE <query> without executing) ---

def q_describe_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column defs of a query — ``spark.sql(q).schema``, no job run
    (reference: internal/query/execute.go:80-123). Emitted as rows in
    the engine's lower-case type vocabulary for oracle parity."""
    from tailpipe_spark.schema import to_type_string
    from tailpipe_spark.session import configure_runtime

    configure_runtime(spark)
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    q = "SELECT o_orderkey, o_totalprice, o_orderdate, o_orderpriority FROM orders"
    schema = spark.sql(q).schema  # lazy — no execution
    rows = [
        (i, f.name, to_type_string(f.dataType).replace("timestamp_ntz", "timestamp"))
        for i, f in enumerate(schema.fields)
    ]
    return spark.createDataFrame(rows, ["ordinal", "column_name", "column_type"])


Q_DESCRIBE_SQL = """
SELECT (ROW_NUMBER() OVER () - 1) AS ordinal,
       column_name,
       LOWER(column_type) AS column_type
FROM (DESCRIBE SELECT o_orderkey, o_totalprice, o_orderdate, o_orderpriority
      FROM orders)
"""


# --- threat detection: IP classification + burst detection ---

def sec_ip_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classify synthetic per-user source IPs (derived deterministically
    from user_id — the testdata has no IP column) with the JVM-side IP
    function library."""
    e = _t(spark, sf_dir, "events")
    ip = F.concat_ws(
        ".",
        F.when(F.col("user_id") % 3 == 0, F.lit("10")).otherwise(F.lit("203")),
        (F.col("user_id") % 256).cast("string"),
        ((F.col("user_id") * 7) % 256).cast("string"),
        F.lit("1"),
    )
    d = e.select("event_id", "event_type", ip.alias("src_ip"))
    return (
        d.select(
            "event_type",
            is_private_ip(F.col("src_ip")).alias("is_private"),
            ip_in_cidr(F.col("src_ip"), "203.0.0.0/8").alias("in_203_8"),
            ipv4_to_long(F.col("src_ip")).alias("ip_num"),
        )
        .groupBy("event_type", "is_private", "in_203_8")
        .agg(F.count(F.lit(1)).alias("n"), F.min("ip_num").alias("min_ip_num"))
        .orderBy("event_type", "is_private", "in_203_8")
    )


SEC_IP_SQL = """
WITH ips AS (
  SELECT event_type,
         (CASE WHEN user_id % 3 = 0 THEN '10' ELSE '203' END)
           || '.' || CAST(user_id % 256 AS VARCHAR)
           || '.' || CAST((user_id * 7) % 256 AS VARCHAR)
           || '.1' AS src_ip
  FROM events),
parsed AS (
  SELECT event_type, src_ip,
         CAST(string_split(src_ip, '.')[1] AS BIGINT) * 16777216
       + CAST(string_split(src_ip, '.')[2] AS BIGINT) * 65536
       + CAST(string_split(src_ip, '.')[3] AS BIGINT) * 256
       + CAST(string_split(src_ip, '.')[4] AS BIGINT) AS ip_num
  FROM ips)
SELECT event_type,
       ((ip_num >= 167772160 AND ip_num < 184549376)      -- 10/8
        OR (ip_num >= 2886729728 AND ip_num < 2887778304) -- 172.16/12
        OR (ip_num >= 3232235520 AND ip_num < 3232301056) -- 192.168/16
        OR (ip_num >= 2130706432 AND ip_num < 2147483648) -- 127/8
        OR (ip_num >= 2851995648 AND ip_num < 2852061184) -- 169.254/16
       ) AS is_private,
       (ip_num >= 3405774848 AND ip_num < 3422552064) AS in_203_8,
       COUNT(*) AS n, MIN(ip_num) AS min_ip_num
FROM parsed
GROUP BY 1, 2, 3
ORDER BY event_type, is_private, in_203_8
"""


def sec_error_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users with bursts of error events (>=2 in a trailing 30-minute
    window) — brute-force/beacon detection via a RANGE window frame."""
    e = _t(spark, sf_dir, "events")
    b = burst_count(
        e,
        key="user_id",
        time_col="ts",
        window_seconds=1800,
        filter_expr=F.col("event_type") == "error",
    )
    return (
        b.filter(F.col("burst_count") >= 2)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_burst_events"),
            F.max("burst_count").alias("max_burst"),
        )
        .orderBy("user_id")
    )


SEC_BURST_SQL = """
WITH errors AS (SELECT user_id, ts FROM events WHERE event_type = 'error'),
counted AS (
  SELECT user_id,
         COUNT(*) OVER (PARTITION BY user_id
                        ORDER BY epoch_us(ts) / 1000000.0
                        RANGE BETWEEN 1800 PRECEDING AND CURRENT ROW)
           AS burst_count
  FROM errors)
SELECT user_id, COUNT(*) AS n_burst_events, MAX(burst_count) AS max_burst
FROM counted WHERE burst_count >= 2
GROUP BY user_id ORDER BY user_id
"""


# --- pivot (wide aggregation; oracle = portable CASE aggregation) ---

def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        e.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
        .orderBy("user_id")
    )


Q_PIVOT_SQL = """
SELECT user_id,
       COUNT(*) FILTER (WHERE event_type = 'click') AS click,
       COUNT(*) FILTER (WHERE event_type = 'error') AS error,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
       COUNT(*) FILTER (WHERE event_type = 'view') AS view
FROM events GROUP BY user_id ORDER BY user_id
"""


def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join (DataFrame.lateralJoin, Spark 4): for
    each nation, the top-2 customers by balance. Catalyst decorrelates
    the per-row subquery into WindowGroupLimit (partial top-k before
    the shuffle) + one broadcast join — no nested-loop re-execution per
    outer row, which is what makes LATERAL viable at 100 TB."""
    nat = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    top2 = (
        cust.where(F.col("c_nationkey") == F.col("n_nationkey").outer())
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
        .limit(2)
        .select("c_custkey", "c_acctbal")
    )
    return (
        nat.lateralJoin(top2)
        .select("n_name", "c_custkey", "c_acctbal")
        .orderBy("n_name", "c_custkey")
    )


Q_LATERAL_SQL = """
SELECT n_name, t.c_custkey, t.c_acctbal
FROM nation, LATERAL (
  SELECT c_custkey, c_acctbal FROM customer
  WHERE c_nationkey = n_nationkey
  ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 2) t
ORDER BY n_name, c_custkey
"""


def q_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise surface: bit_and / bit_or / bit_xor aggregates plus
    scalar shifts and bit_count — flag-mask analytics (permission
    fields, feature bitmaps) in one pass."""
    e = _t(spark, sf_dir, "events")
    flags = (F.col("event_id") % 256).cast("long")
    base = e.select(
        "event_type",
        flags.alias("flags"),
        F.bit_count(flags).alias("n_bits"),
        F.shiftleft(flags, 2).alias("shl2"),
        F.shiftright(flags, 3).alias("shr3"),
    )
    return (
        base.groupBy("event_type")
        .agg(
            F.bit_and("flags").alias("mask_and"),
            F.bit_or("flags").alias("mask_or"),
            F.bit_xor("flags").alias("mask_xor"),
            F.sum("n_bits").alias("total_bits"),
            F.max("shl2").alias("max_shl2"),
            F.min("shr3").alias("min_shr3"),
        )
        .orderBy("event_type")
    )


Q_BITWISE_SQL = """
WITH base AS (
  SELECT event_type,
         CAST(event_id % 256 AS BIGINT) AS flags,
         bit_count(CAST(event_id % 256 AS BIGINT)) AS n_bits,
         CAST(event_id % 256 AS BIGINT) << 2 AS shl2,
         CAST(event_id % 256 AS BIGINT) >> 3 AS shr3
  FROM events)
SELECT event_type,
       bit_and(flags) AS mask_and,
       bit_or(flags) AS mask_or,
       bit_xor(flags) AS mask_xor,
       CAST(SUM(n_bits) AS BIGINT) AS total_bits,
       MAX(shl2) AS max_shl2,
       MIN(shr3) AS min_shr3
FROM base
GROUP BY event_type
ORDER BY event_type
"""


def q_bool_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean/conditional aggregates: bool_and / bool_or / count_if —
    the predicate-summary class (ALL rows satisfy / ANY row satisfies /
    how many satisfy) every data-quality report uses."""
    c = _t(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.bool_and(F.col("c_acctbal") > -1000).alias("all_above_floor"),
            F.bool_or(F.col("c_acctbal") < 0).alias("any_negative"),
            F.count_if(F.col("c_acctbal") > 9000).alias("n_rich"),
        )
        .orderBy("c_mktsegment")
    )


Q_BOOL_AGGS_SQL = """
SELECT c_mktsegment,
       bool_and(c_acctbal > -1000) AS all_above_floor,
       bool_or(c_acctbal < 0) AS any_negative,
       CAST(COUNT(CASE WHEN c_acctbal > 9000 THEN 1 END) AS BIGINT) AS n_rich
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def q_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING()/GROUPING_ID semantics over CUBE: distinguishes a NULL
    that came from the DATA from a NULL synthesized by the rollup — the
    corner every report-over-cube query eventually hits. Events carry
    no null event_type, so one is injected (every 7th event) to make
    the distinction observable."""
    e = _t(spark, sf_dir, "events")
    typed = e.select(
        F.when(F.col("event_id") % 7 == 0, None)
        .otherwise(F.col("event_type"))
        .alias("et"),
        (F.col("user_id") % 3).alias("ub"),
    )
    return (
        typed.cube("et", "ub")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.grouping("et").cast("int").alias("g_et"),
            F.grouping("ub").cast("int").alias("g_ub"),
            F.grouping_id().cast("int").alias("gid"),
        )
        .orderBy(
            F.col("gid"),
            F.col("et").asc_nulls_first(),
            F.col("ub").asc_nulls_first(),
        )
    )


Q_GROUPING_ID_SQL = """
WITH typed AS (
  SELECT CASE WHEN event_id % 7 = 0 THEN NULL ELSE event_type END AS et,
         user_id % 3 AS ub
  FROM events)
SELECT et, ub, COUNT(*) AS n,
       CAST(GROUPING(et) AS INTEGER) AS g_et,
       CAST(GROUPING(ub) AS INTEGER) AS g_ub,
       CAST(GROUPING(et, ub) AS INTEGER) AS gid
FROM typed
GROUP BY CUBE (et, ub)
ORDER BY gid, et NULLS FIRST, ub NULLS FIRST
"""


def q_argmax_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arg-max aggregation (max_by/min_by == DuckDB arg_max/arg_min):
    per market segment, WHICH customer holds the extreme balance — the
    select-the-witness aggregate that otherwise costs a window + filter
    pass. Ties broken deterministically by encoding (balance, key) into
    one sortable long (DuckDB's arg_max rejects struct keys): balances
    carry 2 decimals, so round(bal*100)*10^7 + key orders exactly like
    the pair while keys stay under 10^7."""
    c = _t(spark, sf_dir, "customer")
    enc = (
        F.round(F.col("c_acctbal") * 100).cast("long") * 10_000_000
        + F.col("c_custkey")
    )
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.max_by("c_custkey", enc).alias("richest"),
            F.min_by("c_custkey", enc).alias("poorest"),
            F.max("c_acctbal").alias("max_bal"),
        )
        .orderBy("c_mktsegment")
    )


Q_ARGMAX_SQL = """
SELECT c_mktsegment,
       arg_max(c_custkey,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) * 10000000 + c_custkey)
         AS richest,
       arg_min(c_custkey,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) * 10000000 + c_custkey)
         AS poorest,
       MAX(c_acctbal) AS max_bal
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def q_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type zoo: per-doc token-count maps built row-locally
    (map_from_entries over transform/filter), probed via scalar lookups
    (element_at / cardinality / value-max) — scalars keep the compare
    portable since map key ORDER is engine-specific."""
    d = _t(spark, sf_dir, "documents")
    toks = F.slice(F.split(F.lower(F.col("text")), " "), 1, 8)
    base = d.select("doc_id", toks.alias("t8"))
    entries = F.expr(
        "transform(array_distinct(t8), "
        "u -> struct(u AS key, size(filter(t8, x -> x = u)) AS value))"
    )
    m = base.withColumn("m", F.map_from_entries(entries))
    return m.select(
        "doc_id",
        F.size("m").alias("n_keys"),
        F.coalesce(F.element_at("m", F.lit("the")), F.lit(0)).alias("the_cnt"),
        F.array_max(F.map_values("m")).alias("max_cnt"),
    ).orderBy("doc_id")


Q_MAP_FUNCS_SQL = """
WITH base AS (
  SELECT doc_id, (string_split(lower(text), ' '))[1:8] AS t8 FROM documents),
m AS (
  SELECT doc_id,
         map_from_entries(list_transform(list_distinct(t8),
           u -> {'k': u,
                 'v': CAST(len(list_filter(t8, x -> x = u)) AS INTEGER)}))
           AS mp
  FROM base)
SELECT doc_id,
       CAST(cardinality(mp) AS INTEGER) AS n_keys,
       COALESCE(map_extract(mp, 'the')[1], 0) AS the_cnt,
       list_max(map_values(mp)) AS max_cnt
FROM m ORDER BY doc_id
"""


def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-algebra zoo beyond explode: set ops (intersect/except/
    union-distinct via concat+distinct), sort, slice, position,
    contains, zip_with — all row-local (zero shuffle until the final
    tiny agg). Token arrays derived from document text give each doc a
    pair of overlapping arrays to exercise the set semantics."""
    d = _t(spark, sf_dir, "documents")
    toks = F.slice(F.split(F.lower(F.col("text")), " "), 1, 8)
    rev = F.reverse(toks)
    a = d.select(
        "doc_id",
        F.array_distinct(toks).alias("a"),
        F.array_distinct(F.slice(rev, 1, 5)).alias("b"),
    )
    return (
        a.select(
            "doc_id",
            F.size(F.array_intersect("a", "b")).alias("n_inter"),
            F.size(F.array_except("a", "b")).alias("n_only_a"),
            F.size(F.array_distinct(F.concat("a", "b"))).alias("n_union"),
            F.element_at(F.array_sort("a"), 1).alias("first_sorted"),
            # position probes run on SORTED arrays: Spark's
            # array_distinct preserves first-occurrence order but
            # DuckDB's list_distinct does not, so only the sorted view
            # is portable
            F.array_position(
                F.array_sort("a"), F.element_at(F.array_sort("b"), 1)
            ).alias("pos_b1"),
            F.array_contains("a", "the").alias("has_the"),
        )
        .orderBy("doc_id")
    )


Q_ARRAY_FUNCS_SQL = """
WITH base AS (
  SELECT doc_id,
         list_distinct(t[1:8]) AS a,
         list_distinct(list_reverse(t[1:8])[1:5]) AS b
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents)),
m AS (
  SELECT doc_id,
         CAST(len(list_intersect(a, b)) AS INTEGER) AS n_inter,
         CAST(len(list_filter(a, x -> NOT list_contains(b, x))) AS INTEGER)
           AS n_only_a,
         CAST(len(list_distinct(list_concat(a, b))) AS INTEGER) AS n_union,
         list_sort(a)[1] AS first_sorted,
         CAST(COALESCE(list_position(list_sort(a), list_sort(b)[1]), 0) AS BIGINT)
           AS pos_b1,
         list_contains(a, 'the') AS has_the
  FROM base)
SELECT * FROM m ORDER BY doc_id
"""


def q_try_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression semantics under ANSI mode: TRY_CAST turns
    malformed input into NULL instead of failing the job, try_divide
    absorbs division by zero — the contract that keeps a 100 TB scan
    alive when one row is garbage. Mixed-validity strings are derived
    from customer rows so both engines see identical inputs."""
    c = _t(spark, sf_dir, "customer")
    mixed = F.when(
        F.col("c_custkey") % 3 == 0, F.concat(F.lit("x"), F.col("c_name"))
    ).otherwise((F.col("c_custkey") % 100).cast("string"))
    denom = (F.col("c_custkey") % 5).cast("double")
    return (
        c.select(
            mixed.try_cast("int").alias("as_int"),
            F.try_divide(F.col("c_acctbal"), denom).alias("ratio"),
        )
        .agg(
            F.count("as_int").alias("n_parsed"),
            F.count(F.when(F.col("as_int").isNull(), 1)).alias("n_unparsable"),
            F.count("ratio").alias("n_divided"),
            F.count(F.when(F.col("ratio").isNull(), 1)).alias("n_div_by_zero"),
        )
    )


Q_TRY_SQL = """
WITH m AS (
  SELECT TRY_CAST(CASE WHEN c_custkey % 3 = 0 THEN 'x' || c_name
                       ELSE CAST(c_custkey % 100 AS VARCHAR) END AS INTEGER)
           AS as_int,
         CASE WHEN (c_custkey % 5) = 0 THEN NULL
              ELSE c_acctbal / (c_custkey % 5) END AS ratio
  FROM customer)
SELECT CAST(COUNT(as_int) AS BIGINT) AS n_parsed,
       CAST(COUNT(CASE WHEN as_int IS NULL THEN 1 END) AS BIGINT) AS n_unparsable,
       CAST(COUNT(ratio) AS BIGINT) AS n_divided,
       CAST(COUNT(CASE WHEN ratio IS NULL THEN 1 END) AS BIGINT) AS n_div_by_zero
FROM m
"""


def q_window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rank-family window zoo not covered by q_window_functions:
    ntile / percent_rank / first+nth_value over a TOTAL order (ties
    would make ntile nondeterministic), dense_rank / cume_dist over a
    tie-heavy bucket order (both are tie-aware, so deterministic)."""
    c = _t(spark, sf_dir, "customer")
    w_total = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    w_bucket = Window.partitionBy("c_mktsegment").orderBy(
        F.floor(F.col("c_acctbal") / 1000.0).asc()
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w_total).alias("quartile"),
        F.percent_rank().over(w_total).alias("pct_rank"),
        F.first_value(F.col("c_custkey")).over(w_total).alias("poorest"),
        F.nth_value(F.col("c_custkey"), 3).over(w_total).alias("third"),
        F.dense_rank().over(w_bucket).alias("bucket_rank"),
        F.cume_dist().over(w_bucket).alias("cume"),
    ).orderBy("c_custkey")


Q_WINDOW_RANKS_SQL = """
SELECT c_custkey, c_mktsegment,
       NTILE(4) OVER w_total AS quartile,
       PERCENT_RANK() OVER w_total AS pct_rank,
       FIRST_VALUE(c_custkey) OVER w_total AS poorest,
       NTH_VALUE(c_custkey, 3) OVER w_total AS third,
       DENSE_RANK() OVER w_bucket AS bucket_rank,
       CUME_DIST() OVER w_bucket AS cume
FROM customer
WINDOW w_total AS (PARTITION BY c_mktsegment
                   ORDER BY c_acctbal ASC, c_custkey ASC),
       w_bucket AS (PARTITION BY c_mktsegment
                    ORDER BY FLOOR(c_acctbal / 1000.0) ASC)
ORDER BY c_custkey
"""


def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling zoo: null-safe equality join (<=> / IS NOT
    DISTINCT FROM — NULL keys MATCH each other, unlike '='), NULLIF
    null injection, and NULLS FIRST ordering. Derived NULL keys
    (every 7th customer) exercise the join on both populated and null
    sides."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.nullif((F.col("c_custkey") % 7).cast("int"), F.lit(0)).alias("grp"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.nullif((F.col("s_suppkey") % 7).cast("int"), F.lit(0)).alias("grp"),
    )
    joined = c.join(s, c.grp.eqNullSafe(s.grp))
    return (
        joined.groupBy(c.grp.alias("grp"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy(F.col("grp").asc_nulls_first())
    )


Q_NULL_SEMANTICS_SQL = """
WITH c AS (SELECT NULLIF(c_custkey % 7, 0) AS grp FROM customer),
s AS (SELECT NULLIF(s_suppkey % 7, 0) AS grp FROM supplier)
SELECT CAST(c.grp AS INTEGER) AS grp, COUNT(*) AS n_pairs
FROM c JOIN s ON c.grp IS NOT DISTINCT FROM s.grp
GROUP BY c.grp
ORDER BY grp NULLS FIRST
"""


def sec_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score anomaly detection with EXACT portable math:
    mean and variance derive from fixed-point integer sums (milli-unit
    longs — sum and sum-of-squares are exact, so mean/var/σ are the
    same doubles in any engine), then outliers are |v−mean| > 3σ. One
    group aggregation broadcast back onto the stream of rows — no
    window over the full event set."""
    e = _t(spark, sf_dir, "events")
    m = e.select(
        "event_id", "event_type",
        F.round(F.col("value") * 1000).cast("long").alias("v"),
    )
    stats = m.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var = (
        F.col("s2").cast("double") / F.col("n") - mean * mean
    )
    enriched = m.join(F.broadcast(stats), "event_type").withColumn(
        "__sigma", F.sqrt(var)
    )
    out = enriched.where(
        F.abs(F.col("v").cast("double") - mean) > 3.0 * F.col("__sigma")
    )
    return (
        out.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_outliers"))
        .orderBy("event_type")
    )


SEC_ZSCORE_SQL = """
WITH m AS (
  SELECT event_id, event_type, CAST(ROUND(value * 1000) AS BIGINT) AS v
  FROM events),
stats AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(v) AS BIGINT) AS s1,
         CAST(SUM(v * v) AS BIGINT) AS s2
  FROM m GROUP BY event_type)
SELECT m.event_type, CAST(COUNT(*) AS BIGINT) AS n_outliers
FROM m JOIN stats ON m.event_type = stats.event_type
WHERE ABS(CAST(v AS DOUBLE) - CAST(s1 AS DOUBLE) / n)
      > 3.0 * SQRT(CAST(s2 AS DOUBLE) / n
                   - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
GROUP BY m.event_type
ORDER BY m.event_type
"""


def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG WITHIN GROUP, Spark 4 /
    string_agg in DuckDB): nation names per region, deterministic
    order — the report-building aggregate SQL surfaces lacked for
    years."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    joined.createOrReplaceTempView("__sa_nr")
    return spark.sql("""
      SELECT r_name,
             listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations,
             COUNT(*) AS n_nations
      FROM __sa_nr GROUP BY r_name ORDER BY r_name
    """)


Q_STRING_AGG_SQL = """
SELECT r_name,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       COUNT(*) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
"""


def q_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style upsert compaction: reduce an event history to the
    latest state per key (window rank over (ts, event_id) — the
    deterministic tiebreak matters, duplicate timestamps exist in any
    real feed). WindowGroupLimit prunes non-latest rows before the
    exchange's final stage, so state size, not history size, bounds the
    output."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .select("user_id", "event_type", "ts", "value")
        .orderBy("user_id")
    )


Q_UPSERT_SQL = """
SELECT user_id, event_type, ts, value
FROM (
  SELECT user_id, event_type, ts, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rk
  FROM events)
WHERE rk = 1
ORDER BY user_id
"""


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram — the binning shape every metrics dashboard
    needs; one partial-agg exchange over bucket ids. Binning is plain
    arithmetic (floor of a power-of-ten division, IEEE-identical
    everywhere) rather than width_bucket, which DuckDB doesn't ship."""
    o = _t(spark, sf_dir, "orders")
    bucket = F.least(
        F.lit(19).cast("long"),
        F.floor(F.col("o_totalprice") / 25000.0).cast("long"),
    )
    return (
        o.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
    )


Q_HISTOGRAM_SQL = """
SELECT CAST(LEAST(19, FLOOR(o_totalprice / 25000.0)) AS BIGINT) AS bucket,
       COUNT(*) AS n
FROM orders
GROUP BY 1 ORDER BY bucket
"""


def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT semi-structured path (Spark 4): parse the JSON props
    column ONCE into a variant and extract typed fields from the
    binary-encoded value — at 100 TB this replaces per-field
    get_json_object re-parsing (N parses per row) with one parse and
    O(1) typed navigations."""
    e = _t(spark, sf_dir, "events")
    v = e.select(
        "event_type", F.parse_json(F.col("props")).alias("v")
    ).select(
        "event_type", F.variant_get("v", "$.k", "long").alias("k")
    )
    return (
        v.groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


Q_VARIANT_SQL = """
SELECT event_type,
       CAST(COUNT(k) AS BIGINT) AS n_with_k,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MAX(k) AS BIGINT) AS max_k
FROM (SELECT event_type,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k
      FROM events)
GROUP BY event_type
ORDER BY event_type
"""


def q_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware comparison (Spark 4 COLLATE): case-insensitive
    predicate evaluated JVM-side under UTF8_LCASE instead of wrapping
    every row in lower() — the collation survives into pushdown where
    lower(col) would not."""
    c = _t(spark, sf_dir, "customer")
    c.createOrReplaceTempView("__coll_customer")
    return spark.sql("""
      SELECT c_mktsegment, COUNT(*) AS n
      FROM __coll_customer
      WHERE c_mktsegment COLLATE UTF8_LCASE = 'building'
         OR c_mktsegment COLLATE UTF8_LCASE = 'machinery'
      GROUP BY c_mktsegment ORDER BY c_mktsegment
    """)


Q_COLLATION_SQL = """
SELECT c_mktsegment, COUNT(*) AS n
FROM customer
WHERE lower(c_mktsegment) = 'building' OR lower(c_mktsegment) = 'machinery'
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): generate a calendar
    series and left-join per-day order counts — the canonical gap-fill
    query, recursive in both engines. The recursion depth is the series
    length (90), independent of data size; the join against the fact is
    one ordinary shuffle."""
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__rcte_orders")
    return spark.sql("""
      WITH RECURSIVE days(d) AS (
        SELECT DATE '1996-01-01'
        UNION ALL SELECT date_add(d, 1) FROM days WHERE d < DATE '1996-03-30')
      SELECT date_format(d, 'yyyy-MM') AS month,
             COUNT(*) AS n_days,
             COUNT(o.cnt) AS days_with_orders,
             COUNT(CASE WHEN o.cnt IS NULL THEN 1 END) AS days_without
      FROM days
      LEFT JOIN (
        SELECT CAST(o_orderdate AS DATE) AS od, COUNT(*) AS cnt
        FROM __rcte_orders GROUP BY 1) o ON o.od = days.d
      GROUP BY 1 ORDER BY 1
    """)


Q_RECURSIVE_SQL = """
WITH RECURSIVE days(d) AS (
  SELECT DATE '1996-01-01'
  UNION ALL SELECT d + INTERVAL 1 DAY FROM days WHERE d < DATE '1996-03-30')
SELECT strftime(CAST(d AS DATE), '%Y-%m') AS month,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(COUNT(o.cnt) AS BIGINT) AS days_with_orders,
       CAST(COUNT(CASE WHEN o.cnt IS NULL THEN 1 END) AS BIGINT) AS days_without
FROM days
LEFT JOIN (
  SELECT CAST(o_orderdate AS DATE) AS od, COUNT(*) AS cnt
  FROM orders GROUP BY 1) o ON o.od = CAST(days.d AS DATE)
GROUP BY 1 ORDER BY 1
"""


def q_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL distinct-count rollup (operators/sketches.py):
    per-day user sketches unioned to per-event-type estimates without
    rescanning raw rows. Sketch bytes are engine-specific
    (DataSketches), so this entry is rows-only; the accuracy bound vs
    exact COUNT(DISTINCT) is pinned in tests/test_operators.py."""
    from tailpipe_spark.operators import sketches as sk

    ev = _t(spark, sf_dir, "events")
    daily = sk.sketch_buckets(
        ev, F.to_date("ts"), "user_id", group_cols=["event_type"]
    )
    return sk.rollup_estimate(daily, ["event_type"]).orderBy("event_type")


def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable fixed-point histogram quantile sketch
    (operators/sketches.py): per-event-type p50/p95/p99 of ``value``.
    Binning, rank and midpoint arithmetic are integer-exact/IEEE-
    deterministic, so unlike the HLL entries this sketch carries a
    FULL hash oracle (DuckDB reproduces the algorithm bit-for-bit).
    Absolute error ≤ 0.25 value units at width_milli=500, pinned in
    tests/test_operators.py."""
    from tailpipe_spark.operators import sketches as sk

    ev = _t(spark, sf_dir, "events")
    hist = sk.value_histogram(ev, "value", ["event_type"])
    return sk.histogram_quantiles(hist, ["event_type"]).orderBy("event_type")


_QSKETCH_BINS = """
  SELECT event_type,
         CAST(FLOOR(CAST(CAST(ROUND(value * 1000) AS BIGINT) AS DOUBLE) / 500)
              AS BIGINT) AS bin,
         COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
"""

_QSKETCH_TAIL = """
cum AS (
  SELECT event_type, bin,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
         SUM(cnt) OVER (PARTITION BY event_type) AS n
  FROM bins)
SELECT event_type,
       MIN(CASE WHEN cum >= CEIL(0.5  * n) THEN (bin * 1000 + 500) / 2000.0 END) AS p50,
       MIN(CASE WHEN cum >= CEIL(0.95 * n) THEN (bin * 1000 + 500) / 2000.0 END) AS p95,
       MIN(CASE WHEN cum >= CEIL(0.99 * n) THEN (bin * 1000 + 500) / 2000.0 END) AS p99
FROM cum GROUP BY event_type ORDER BY event_type
"""

Q_QUANTILE_SKETCH_SQL = f"WITH bins AS ({_QSKETCH_BINS}),\n{_QSKETCH_TAIL}"


def q_quantile_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level rollup: per-day histograms merged to per-type, then
    quantiles — never rescans raw rows after the daily pass. The
    oracle computes the UNBUCKETED histogram directly, so the hash
    match IS the cross-engine proof that the bin-wise merge is
    lossless (counts add; sketching the concatenation equals merging
    the sketches).

    AQE-safety (r11 verdict "what's wrong" #2 audit): a linear chain —
    histogram → merge → quantiles, each stage the single consumer of
    the previous — so the two-consumers-of-one-exchange shape that
    broke distributed_cumsum cannot occur; and every expression is
    integer-exact (fixed-point binning, BIGINT counts, rank
    arithmetic), so even a full AQE re-execution is bit-identical.
    Pinned by tests/test_aqe_multiconsumer.py."""
    from tailpipe_spark.operators import sketches as sk

    ev = _t(spark, sf_dir, "events")
    daily = sk.value_histogram(
        ev, "value", ["event_type"], bucket_expr=F.to_date("ts")
    )
    merged = sk.merge_histograms(daily, ["event_type"])
    return sk.histogram_quantiles(merged, ["event_type"]).orderBy("event_type")


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt: wide per-segment balance stats back to long
    (metric, value) rows — DataFrame.unpivot maps to one Expand node
    (row-local, no shuffle beyond the upstream agg)."""
    c = _t(spark, sf_dir, "customer")
    wide = c.groupBy("c_mktsegment").agg(
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
        F.count(F.lit(1)).cast("double").alias("n_customers"),
    )
    return wide.unpivot(
        ids=["c_mktsegment"],
        values=["min_bal", "max_bal", "n_customers"],
        variableColumnName="metric",
        valueColumnName="value",
    ).orderBy("c_mktsegment", "metric")


Q_UNPIVOT_SQL = """
WITH wide AS (
  SELECT c_mktsegment,
         MIN(c_acctbal) AS min_bal,
         MAX(c_acctbal) AS max_bal,
         CAST(COUNT(*) AS DOUBLE) AS n_customers
  FROM customer GROUP BY c_mktsegment)
SELECT c_mktsegment, metric, value
FROM wide UNPIVOT (value FOR metric IN (min_bal, max_bal, n_customers))
ORDER BY c_mktsegment, metric
"""


# --- multiset set ops (ALL variants keep duplicates) ---

def q_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    inter = s.intersectAll(c).groupBy().agg(F.count(F.lit(1)).alias("cnt")).select(
        F.lit("intersect_all").alias("op"), "cnt"
    )
    exc = c.exceptAll(s).groupBy().agg(F.count(F.lit(1)).alias("cnt")).select(
        F.lit("except_all").alias("op"), "cnt"
    )
    return inter.unionAll(exc).orderBy("op")


Q_SET_OPS_ALL_SQL = """
SELECT 'except_all' AS op, COUNT(*) AS cnt FROM (
  SELECT c_nationkey AS k FROM customer
  EXCEPT ALL SELECT s_nationkey FROM supplier)
UNION ALL
SELECT 'intersect_all', COUNT(*) FROM (
  SELECT s_nationkey AS k FROM supplier
  INTERSECT ALL SELECT c_nationkey FROM customer)
ORDER BY op
"""


# --- case-insensitive LIKE ---

def q_ilike(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_mktsegment").ilike("%build%"))
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("c_mktsegment")
    )


Q_ILIKE_SQL = """
SELECT c_mktsegment, COUNT(*) AS n
FROM customer WHERE c_mktsegment ILIKE '%build%'
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# --- skew-safe two-phase aggregation (operators.skew, oracle = plain GROUP BY) ---

def q_skew_two_phase_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation must equal the plain GROUP BY — the
    oracle IS the unsalted query, so the equivalence is hash-checked.
    Doubles go through a decimal cast so the extra combine step cannot
    perturb the sum."""
    from tailpipe_spark.operators.skew import two_phase_agg

    e = _t(spark, sf_dir, "events").withColumn(
        "v_dec", F.col("value").cast("decimal(27,6)")
    )
    out = two_phase_agg(
        e,
        "event_type",
        [
            ("v_dec", "sum", "total_dec"),
            ("value", "count", "n"),
            ("value", "min", "min_v"),
            ("value", "max", "max_v"),
        ],
        salt=8,
    )
    return out.select(
        "event_type",
        F.col("total_dec").cast("double").alias("total_value"),
        "n",
        "min_v",
        "max_v",
    ).orderBy("event_type")


Q_SKEW_AGG_SQL = f"""
SELECT event_type, {oracle_dsum('value')} AS total_value,
       COUNT(value) AS n, MIN(value) AS min_v, MAX(value) AS max_v
FROM events GROUP BY event_type ORDER BY event_type
"""


def sec_entropy_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of document texts (DGA-style randomness scoring).
    Per-character p*log2(p) accumulation order differs across engines at
    the last ulp (~1e-15 over ~40 distinct chars); the shared 1e-9
    quantization grid absorbs it, making the value oracle-checkable."""
    from tailpipe_spark.functions.security import shannon_entropy
    from tailpipe_spark.operators.similarity import quantize

    d = _t(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            quantize(
                shannon_entropy(F.substring(F.col("text"), 1, 64)), 9
            ).alias("entropy_bits"),
        )
        .orderBy("doc_id")
    )


SEC_ENTROPY_SQL = """
WITH chars AS (
  SELECT doc_id, unnest(regexp_split_to_array(substr(lower(text), 1, 64), '')) AS ch
  FROM documents
), counts AS (
  SELECT doc_id, ch, COUNT(*) AS c FROM chars WHERE ch <> '' GROUP BY doc_id, ch
), totals AS (
  SELECT doc_id, SUM(c) AS n FROM counts GROUP BY doc_id
)
SELECT c.doc_id,
       CAST(ROUND(SUM(-(c.c / t.n) * log2(c.c / t.n)) * 1000000000) AS BIGINT)
         / 1000000000 AS entropy_bits
FROM counts c JOIN totals t USING (doc_id)
GROUP BY c.doc_id ORDER BY c.doc_id
"""


# --- exact percentiles / median (§2.b ordered-set aggregates) ---

def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`). Values quantize to a 1e-9 grid: both
    engines interpolate (1-f)*lo + f*hi in doubles, identical to ~1e-14,
    and the shared grid makes the comparison engine-exact."""
    e = _t(spark, sf_dir, "events")

    def pq(p, alias):
        v = F.expr(f"percentile(value, {p})")
        return (
            (F.round(v * F.lit(1e9)).cast("long").cast("double") / F.lit(1e9))
            .alias(alias)
        )

    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            pq(0.5, "median_value"),
            pq(0.9, "p90_value"),
            pq(0.99, "p99_value"),
        )
        .orderBy("event_type")
    )


def _pq_sql(p: str, alias: str) -> str:
    return (
        f"CAST(ROUND(quantile_cont(value, {p}) * 1000000000) AS BIGINT)"
        f" / 1000000000 AS {alias}"
    )


Q_PERCENTILES_SQL = f"""
SELECT event_type, COUNT(*) AS n,
       {_pq_sql('0.5', 'median_value')},
       {_pq_sql('0.9', 'p90_value')},
       {_pq_sql('0.99', 'p99_value')}
FROM events GROUP BY event_type ORDER BY event_type
"""


# --- array explode / positional access (§2.b array-struct surface) ---

def q_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).select("vec_id", "pos", F.col("val").cast("double").alias("val"))
    return (
        exploded.groupBy("pos")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("val").cast("decimal(30,15)")).cast("double"), 9).alias("sum_val"),
            F.min("val").alias("min_val"),
            F.max("val").alias("max_val"),
        )
        .orderBy("pos")
    )


Q_ARRAY_EXPLODE_SQL = """
SELECT pos, COUNT(*) AS n,
       ROUND(CAST(SUM(CAST(val AS DECIMAL(30,15))) AS DOUBLE), 9) AS sum_val,
       MIN(val) AS min_val, MAX(val) AS max_val
FROM (SELECT vec_id,
             unnest(range(len(embedding))) AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS val
      FROM embeddings)
GROUP BY pos ORDER BY pos
"""


SPECS = [
    QuerySpec("q_array_explode", q_array_explode, Q_ARRAY_EXPLODE_SQL, "posexplode / unnest positional array access + agg"),
    QuerySpec("q_window_frames", q_window_frames, Q_WINDOW_FRAMES_SQL, "ntile/first/last/percent_rank/cume_dist + RANGE frame"),
    QuerySpec("q_correlated_subquery", q_correlated_subquery, Q_CORRELATED_SQL, "correlated scalar subquery (Catalyst decorrelation)"),
    QuerySpec("q_having_conditional", q_having_conditional, Q_HAVING_SQL, "HAVING + coalesce/nullif/greatest/least"),
    QuerySpec("q_string_functions", q_string_functions, Q_STRING_SQL, "string function zoo"),
    QuerySpec("q_date_functions", q_date_functions, Q_DATE_SQL, "date/time function zoo"),
    QuerySpec("q_describe_query", q_describe_query, Q_DESCRIBE_SQL, "A31 DESCRIBE <query> column defs without execution"),
    QuerySpec("sec_ip_classify", sec_ip_classify, SEC_IP_SQL, "threat detection: IP parse/CIDR/private classification"),
    QuerySpec("sec_error_burst", sec_error_burst, SEC_BURST_SQL, "threat detection: sliding-window burst detector"),
    QuerySpec("sec_entropy_scan", sec_entropy_scan, SEC_ENTROPY_SQL, "threat detection: Shannon entropy scoring (quantized grid)"),
    QuerySpec("sec_zscore_outliers", sec_zscore_outliers, SEC_ZSCORE_SQL, "threat detection: per-group z-score anomalies from exact integer sums"),
    QuerySpec("q_null_semantics", q_null_semantics, Q_NULL_SEMANTICS_SQL, "null-safe equality join + NULLIF + NULLS FIRST ordering"),
    QuerySpec("q_window_ranks", q_window_ranks, Q_WINDOW_RANKS_SQL, "ntile/percent_rank/dense_rank/cume_dist/first+nth_value window zoo"),
    QuerySpec("q_try_semantics", q_try_semantics, Q_TRY_SQL, "TRY_CAST / try_divide error-safe semantics under ANSI mode"),
    QuerySpec("q_array_functions", q_array_functions, Q_ARRAY_FUNCS_SQL, "array algebra zoo: set ops, sort, slice, position, contains"),
    QuerySpec("q_map_functions", q_map_functions, Q_MAP_FUNCS_SQL, "map-type zoo: row-local map build + scalar lookups"),
    QuerySpec("q_argmax_agg", q_argmax_agg, Q_ARGMAX_SQL, "arg-max aggregation (max_by/min_by) with deterministic tiebreak"),
    QuerySpec("q_grouping_id", q_grouping_id, Q_GROUPING_ID_SQL, "GROUPING()/GROUPING_ID over CUBE with data-vs-rollup NULLs"),
    QuerySpec("q_bool_aggs", q_bool_aggs, Q_BOOL_AGGS_SQL, "bool_and / bool_or / count_if predicate-summary aggregates"),
    QuerySpec("q_bitwise", q_bitwise, Q_BITWISE_SQL, "bit_and/or/xor aggregates + shifts + bit_count"),
    QuerySpec("q_skew_two_phase_agg", q_skew_two_phase_agg, Q_SKEW_AGG_SQL, "salted two-phase agg == plain GROUP BY (skew operator equivalence)"),
    QuerySpec("q_percentiles", q_percentiles, Q_PERCENTILES_SQL, "exact interpolated percentiles / median per group (quantized grid)"),
    QuerySpec("q_pivot", q_pivot, Q_PIVOT_SQL, "pivot / wide CASE aggregation"),
    QuerySpec("q_unpivot", q_unpivot, Q_UNPIVOT_SQL, "unpivot / melt wide stats to long rows"),
    QuerySpec("q_lateral_topk", q_lateral_topk, Q_LATERAL_SQL, "correlated LATERAL join decorrelated to WindowGroupLimit"),
    QuerySpec("q_sketch_rollup", q_sketch_rollup, None, "mergeable HLL distinct sketches rolled up without rescan (rows-only: sketch bytes are engine-specific)"),
    QuerySpec("q_quantile_sketch", q_quantile_sketch, Q_QUANTILE_SKETCH_SQL, "mergeable fixed-point histogram quantiles (deterministic: full hash oracle)"),
    QuerySpec("q_quantile_sketch_rollup", q_quantile_sketch_rollup, Q_QUANTILE_SKETCH_SQL, "daily histogram sketches merged then estimated; oracle computes unbucketed directly = cross-engine merge-losslessness proof"),
    QuerySpec("q_recursive_cte", q_recursive_cte, Q_RECURSIVE_SQL, "WITH RECURSIVE calendar series + gap-fill left join"),
    QuerySpec("q_variant_json", q_variant_json, Q_VARIANT_SQL, "VARIANT semi-structured: parse once, typed navigation"),
    QuerySpec("q_collation", q_collation, Q_COLLATION_SQL, "COLLATE UTF8_LCASE case-insensitive predicate"),
    QuerySpec("q_upsert_latest", q_upsert_latest, Q_UPSERT_SQL, "CDC-style latest-state-per-key compaction (WindowGroupLimit)"),
    QuerySpec("q_string_agg", q_string_agg, Q_STRING_AGG_SQL, "LISTAGG WITHIN GROUP ordered string aggregation"),
    QuerySpec("q_histogram", q_histogram, Q_HISTOGRAM_SQL, "equi-width histogram via width_bucket"),
    QuerySpec("q_set_ops_all", q_set_ops_all, Q_SET_OPS_ALL_SQL, "EXCEPT ALL / INTERSECT ALL multiset semantics"),
    QuerySpec("q_ilike", q_ilike, Q_ILIKE_SQL, "case-insensitive LIKE"),
]

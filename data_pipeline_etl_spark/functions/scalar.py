"""Group H — scalar functions: string / regex / date / math / array
(SURVEY.md §2.H).

All expressions are JVM-side builtins inside whole-stage codegen — no
Python in the hot path. Cross-engine traps handled here:
- ``dayofweek``: Spark 1=Sunday vs DuckDB 0=Sunday → oracle adds +1;
- ``regexp_replace``: DuckDB replaces the first match by default → oracle
  passes the 'g' flag; regex patterns stay in the Java∩RE2 common subset;
- transcendentals (ln/pow) are libm-dependent in the last ULP → rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_etl_spark.registry import query
from data_pipeline_etl_spark.sources.tables import table


@query(
    "q_str_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                                    AS name_upper,
           substring(c_name, 1, 10)                         AS name_prefix,
           concat_ws('-', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS seg_key,
           length(c_name)                                   AS name_len,
           lpad(CAST(c_custkey AS VARCHAR), 12, '0')        AS key_padded
    FROM customer
    """,
)
def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/substring/concat_ws/length/lpad (verified family §2.1 #7)."""
    c = table(spark, sf_dir, "customer")
    key_str = F.col("c_custkey").cast("string")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 10).alias("name_prefix"),
        F.concat_ws("-", F.col("c_mktsegment"), key_str).alias("seg_key"),
        F.length("c_name").cast("long").alias("name_len"),
        F.lpad(key_str, 12, "0").alias("key_padded"),
    )


@query(
    "q_str_regexp",
    oracle="""
    SELECT p_partkey,
           CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS INTEGER) AS brand_num,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS name_devoweled
    FROM part
    """,
)
def q_str_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-group extract + global replace (Java∩RE2-safe patterns)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("int").alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_devoweled"),
    )


@query(
    "q_date_parts",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT)        AS o_year,
           CAST(month(o_orderdate) AS BIGINT)       AS o_month,
           CAST(day(o_orderdate) AS BIGINT)         AS o_day,
           CAST(weekofyear(o_orderdate) AS BIGINT)  AS o_week,
           CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS o_dow,
           CAST(quarter(o_orderdate) AS BIGINT)     AS o_quarter
    FROM orders
    """,
)
def q_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-dimension derivation (the core reference ETL transform).

    Oracle uses ``dayofweek(x)+1``: Spark counts 1=Sunday, DuckDB 0=Sunday
    (measured offset, SURVEY.md §2.1 #10).
    """
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.month("o_orderdate").cast("long").alias("o_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("o_day"),
        F.weekofyear("o_orderdate").cast("long").alias("o_week"),
        F.dayofweek("o_orderdate").cast("long").alias("o_dow"),
        F.quarter("o_orderdate").cast("long").alias("o_quarter"),
    )


@query(
    "q_date_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_epoch_start,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS TIMESTAMP) AS plus_3_months,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_trunc('week',  o_orderdate) AS TIMESTAMP) AS week_start
    FROM orders
    """,
)
def q_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """datediff / add_months / date_trunc (verified parity §2.1 #9, #10)."""
    o = table(spark, sf_dir, "orders")
    od = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.datediff(od, F.lit("1995-01-01").cast("date")).cast("long").alias("days_since_epoch_start"),
        F.add_months(od, 3).cast("timestamp_ntz").alias("plus_3_months"),
        F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("month_start"),
        F.date_trunc("week", "o_orderdate").cast("timestamp_ntz").alias("week_start"),
    )


@query(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 5000.0)        AS abs_dev,
           round(sqrt(l_extendedprice), 6)      AS sqrt_price,
           round(ln(l_extendedprice), 6)        AS ln_price,
           CAST(floor(l_quantity / 7) AS BIGINT)       AS qty_bucket,
           CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_kilo,
           CAST(l_orderkey % 7 AS BIGINT)       AS key_mod,
           round(power(l_discount, 2), 6)       AS disc_sq
    FROM lineitem
    WHERE l_orderkey % 10 = 0
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs/sqrt/ln/floor/ceil/mod/power over prices.

    Bounded to a deterministic 1-in-10 orderkey stripe: the r4 bench
    showed 2.8 s at sf0.1 for this query, and profiling attributed
    0.22 s to compute (count() over the full projection) with the rest
    being Arrow materialization of the 600k x 9 result — the function
    coverage is identical on the stripe while the result volume matches
    the sibling scalar queries (orders-scale, ~60k rows). The modulus
    predicate is pushed into the parquet scan on both engines.
    """
    l = table(spark, sf_dir, "lineitem")
    return l.filter((F.col("l_orderkey") % 10) == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 5000.0).alias("abs_dev"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
        F.floor(F.col("l_quantity") / 7).alias("qty_bucket"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_kilo"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
    )


@query(
    "q_array_funcs",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))                 AS n_tokens,
           len(list_distinct(string_split(text, ' ')))  AS n_distinct,
           list_contains(string_split(text, ' '), 'spark') AS has_spark
    FROM documents
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize + array size/distinct/contains (token histogram verified §2.1 #8)."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.array_contains(toks, "spark").alias("has_spark"),
    )

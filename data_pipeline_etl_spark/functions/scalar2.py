"""Group H (extended) — second batch of scalar builtins: string
manipulation, transcendental math, calendar functions, bit operations.
All engine-neutral (verified runnable on DuckDB 1.0; initcap is absent
there, hence excluded). Transcendentals are libm-dependent in the last
ULP → rounded to 6 dp on both sides. Zero-crossing outputs (sin/cos)
additionally get `+ 0.0`: DuckDB's round can yield -0.0 where Spark's
BigDecimal round yields +0.0 (observed once in 150k rows at sf0.1), and
IEEE `-0.0 + 0.0 = +0.0` normalizes both engines.

Stringified array outputs use `F.array_join`, never `concat_ws`: a NULL
array is NULL under array_join and DuckDB's array_to_string, but '' under
concat_ws — a latent hash mismatch the moment a fixture gains NULLs.
EMPTY arrays diverge one step further: DuckDB's array_to_string folds an
empty list to NULL where Spark's array_join yields '' — so any output
whose array can legitimately be empty (regexp_extract_all misses, short
slices) goes through ``joined_or_null``, which maps both NULL and empty
to NULL on the Spark side (tests/test_null_parity.py pins all three
behaviors against a live DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_etl_spark.registry import query
from data_pipeline_etl_spark.sources.tables import table


def joined_or_null(arr: Column | str, sep: str) -> Column:
    """array_join with DuckDB array_to_string's NULL semantics: NULL
    array -> NULL (size(NULL) is NULL), empty array -> NULL (not '')."""
    arr = F.col(arr) if isinstance(arr, str) else arr
    return F.when(F.size(arr) > 0, F.array_join(arr, sep))


@query(
    "q_str_funcs2",
    oracle="""
    SELECT c_custkey,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_translated,
           replace(c_name, 'Customer', 'Cust')       AS name_short,
           split_part(c_name, '#', 2)                AS name_num,
           reverse(c_mktsegment)                     AS seg_rev,
           repeat(left(c_mktsegment, 1), 3)          AS seg_initial3,
           CAST(strpos(c_name, '#') AS INTEGER)      AS hash_pos,
           right(c_name, 4)                          AS name_tail,
           starts_with(c_mktsegment, 'BU')           AS is_bu,
           contains(c_name, '007')                   AS has_007
    FROM customer
    """,
)
def q_str_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """translate/replace/split_part/reverse/repeat/strpos/right/predicates."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_translated"),
        F.expr("replace(c_name, 'Customer', 'Cust')").alias("name_short"),
        F.split_part("c_name", F.lit("#"), F.lit(2)).alias("name_num"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.repeat(F.expr("left(c_mktsegment, 1)"), 3).alias("seg_initial3"),
        F.instr("c_name", "#").alias("hash_pos"),
        F.expr("right(c_name, 4)").alias("name_tail"),
        F.startswith("c_mktsegment", F.lit("BU")).alias("is_bu"),
        F.contains("c_name", F.lit("007")).alias("has_007"),
    )


@query(
    "q_math_funcs2",
    oracle="""
    SELECT o_orderkey,
           round(sin(o_totalprice / 100000), 6) + 0.0     AS sin_p,
           round(cos(o_totalprice / 100000), 6) + 0.0     AS cos_p,
           round(atan2(o_totalprice, 100000.0), 6)        AS atan2_p,
           round(log10(o_totalprice), 6)                  AS log10_p,
           round(log2(o_totalprice), 6)                   AS log2_p,
           round(exp(o_totalprice / 1000000), 6)          AS exp_p,
           CAST(sign(o_totalprice - 150000) AS DOUBLE)    AS sign_p,
           greatest(o_totalprice, 100000.0)               AS hi,
           least(o_totalprice, 100000.0)                  AS lo
    FROM orders
    """,
)
def q_math_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trig / logs / exp / sign / greatest / least."""
    o = table(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        (F.round(F.sin(p / 100000), 6) + 0.0).alias("sin_p"),
        (F.round(F.cos(p / 100000), 6) + 0.0).alias("cos_p"),
        F.round(F.atan2(p, F.lit(100000.0)), 6).alias("atan2_p"),
        F.round(F.log10(p), 6).alias("log10_p"),
        F.round(F.log2(p), 6).alias("log2_p"),
        F.round(F.exp(p / 1000000), 6).alias("exp_p"),
        F.signum(p - 150000).alias("sign_p"),
        F.greatest(p, F.lit(100000.0)).alias("hi"),
        F.least(p, F.lit(100000.0)).alias("lo"),
    )


@query(
    "q_date_funcs2",
    oracle="""
    SELECT o_orderkey,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(dayofyear(o_orderdate) AS BIGINT)                 AS doy,
           CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP)      AS plus_30d,
           CAST(CAST(o_orderdate AS DATE) - 7 AS TIMESTAMP)       AS minus_7d,
           CAST(make_date(CAST(year(o_orderdate) AS INTEGER), 1, 1) AS TIMESTAMP) AS year_start
    FROM orders
    """,
)
def q_date_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """last_day / dayofyear / date_add / date_sub / make_date.

    DATE results are surfaced as NTZ timestamps on both engines — pandas
    materializes DuckDB DATEs as datetime64 anyway, so emitting timestamps
    keeps value hashing representation-free (cf. q_date_arith).
    """
    o = table(spark, sf_dir, "orders")
    od = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.last_day(od).cast("timestamp_ntz").alias("month_end"),
        F.dayofyear(od).cast("long").alias("doy"),
        F.date_add(od, 30).cast("timestamp_ntz").alias("plus_30d"),
        F.date_sub(od, 7).cast("timestamp_ntz").alias("minus_7d"),
        F.make_date(F.year(od), F.lit(1), F.lit(1)).cast("timestamp_ntz").alias("year_start"),
    )


@query(
    "q_bit_funcs",
    oracle="""
    SELECT p_partkey,
           xor(p_partkey, 255)                      AS key_xor,
           p_partkey & 255                          AS key_and,
           p_partkey | 4096                         AS key_or,
           CAST(p_size AS BIGINT) << 3              AS size_shl,
           CAST(bit_count(CAST(p_partkey AS BIGINT)) AS INTEGER) AS key_bits
    FROM part
    """,
)
def q_bit_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise xor/and/or/shift/popcount."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.expr("p_partkey ^ 255").alias("key_xor"),
        F.expr("p_partkey & 255").alias("key_and"),
        F.expr("p_partkey | 4096").alias("key_or"),
        F.expr("shiftleft(CAST(p_size AS BIGINT), 3)").alias("size_shl"),
        F.bit_count(F.col("p_partkey")).alias("key_bits"),
    )


@query(
    "q_str_regexp2",
    oracle="""
    SELECT doc_id,
           array_to_string(regexp_extract_all(text, '[a-z]*a[a-z]*'), ' ') AS a_words,
           CAST(len(regexp_extract_all(text, '[a-z]*a[a-z]*')) AS INTEGER) AS n_a_words
    FROM documents
    WHERE regexp_matches(text, 'spark\\s+\\w*stream')
    """,
)
def q_str_regexp2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all + regexp-predicate filtering (scalar-joined output)."""
    d = table(spark, sf_dir, "documents")
    words = F.expr("regexp_extract_all(text, '[a-z]*a[a-z]*', 0)")
    return d.select(
        "doc_id",
        # a doc with no 'a' at all yields an empty match list -> NULL on
        # both engines via the guard (DuckDB folds empty to NULL)
        joined_or_null(words, " ").alias("a_words"),
        F.size(words).alias("n_a_words"),
    ).where(F.expr(r"text RLIKE 'spark\\s+\\w*stream'"))


@query(
    "q_array_funcs2",
    oracle="""
    SELECT doc_id,
           array_to_string(list_sort(list_distinct(string_split(text, ' ')))[2:4], ' ') AS toks_2_4,
           CAST(list_position(list_sort(list_distinct(string_split(text, ' '))), 'spark') AS BIGINT) AS spark_pos,
           array_to_string(flatten([string_split(text, ' ')[1:2], string_split(text, ' ')[-2:]]), ' ') AS ends,
           array_to_string(list_concat(string_split(lang, '-'), [source]), ' ') AS lang_source
    FROM documents
    """,
)
def q_array_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array slice / position / flatten / concat, scalar-joined outputs."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    sorted_distinct = F.array_sort(F.array_distinct(toks))
    return d.select(
        "doc_id",
        # a 1-distinct-token doc makes slice [2:4] empty -> NULL on both
        joined_or_null(F.slice(sorted_distinct, 2, 3), " ").alias("toks_2_4"),
        F.array_position(sorted_distinct, "spark").alias("spark_pos"),
        F.array_join(
            F.flatten(F.array(F.slice(toks, 1, 2), F.slice(toks, -2, 2))), " "
        ).alias("ends"),
        F.array_join(
            F.concat(F.split("lang", "-"), F.array(F.col("source"))), " "
        ).alias("lang_source"),
    )


@query(
    "q_map_funcs",
    oracle="""
    SELECT c_custkey,
           c_mktsegment                     AS seg_val,
           CAST(c_nationkey AS VARCHAR)     AS nat_val,
           2                                AS n_keys,
           'nat,seg'                        AS keys_csv,
           c_mktsegment IS NOT NULL         AS has_seg
    FROM customer
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type surface: create_map / element_at / map_keys /
    map_contains_key, flattened to scalar outputs.

    The oracle states the expected values directly (DuckDB's MAP dialect
    differs), so it is the semantic spec the Spark map ops must
    reproduce. Maps stay codegen'd JVM expressions — a per-row key-value
    projection, no shuffle.
    """
    c = table(spark, sf_dir, "customer")
    m = F.create_map(
        F.lit("seg"), F.col("c_mktsegment"),
        F.lit("nat"), F.col("c_nationkey").cast("string"),
    )
    return c.select(
        "c_custkey",
        F.element_at(m, "seg").alias("seg_val"),
        F.element_at(m, "nat").alias("nat_val"),
        F.size(m).cast("int").alias("n_keys"),
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_csv"),
        F.map_contains_key(m, "seg").alias("has_seg"),
    )


@query(
    "q_null_funcs",
    oracle="""
    SELECT o_orderkey,
           nullif(o_orderstatus, 'P')                              AS status_or_null,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING')         AS status_filled,
           CASE WHEN nullif(o_orderstatus, 'P') IS NULL
                THEN 'was_p' ELSE 'not_p' END                      AS nvl2_equiv,
           ifnull(nullif(o_totalprice, 0.0), -1.0)                 AS price_or_neg1,
           CAST(nullif(o_orderstatus, 'P') IS NOT NULL AS BOOLEAN) AS has_status
    FROM orders
    """,
)
def q_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling surface: nullif/coalesce/nvl2/ifnull/isnotnull.

    The fixtures carry no NULLs, so nullif manufactures them first —
    every downstream null-function then has real NULL inputs to handle.
    """
    o = table(spark, sf_dir, "orders")
    s_null = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return o.select(
        "o_orderkey",
        s_null.alias("status_or_null"),
        F.coalesce(s_null, F.lit("PENDING")).alias("status_filled"),
        F.nvl2(s_null, F.lit("not_p"), F.lit("was_p")).alias("nvl2_equiv"),
        F.ifnull(F.nullif(F.col("o_totalprice"), F.lit(0.0)), F.lit(-1.0)).alias(
            "price_or_neg1"
        ),
        s_null.isNotNull().alias("has_status"),
    )


@query(
    "q_str_mask",
    oracle="""
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(
             c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
             AS name_masked,
           CAST(length(c_name) AS BIGINT) AS name_len
    FROM customer
    """,
)
def q_str_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style data masking: uppercase→X, lowercase→x, digits→n
    (Spark builtin ``mask``; shape- and length-preserving redaction).

    The masking path for exporting identifier-bearing columns: a pure
    codegen'd projection, so redaction adds no shuffle at any scale. The
    oracle reproduces the default mask characters with a regexp chain.
    """
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.mask("c_name").alias("name_masked"),
        F.length("c_name").cast("long").alias("name_len"),
    )

"""Scalar function families (SURVEY.md §2.1-H).

One registered query per family, each exercising the representative
functions side-by-side with the DuckDB spelling. All expressions are
JVM-side built-ins — they stay inside whole-stage codegen; no Python
touches the hot path.

Cross-engine trap notes (SURVEY.md §5.3.5) handled here:
- dayofweek: Spark 1=Sunday vs DuckDB dow 0=Sunday → normalize.
- log naming: Spark ``F.log`` is ln; DuckDB ``log`` is log10 — use
  ``ln`` on the DuckDB side.
- libm last-ULP drift on exp/ln/pow/sqrt → ROUND 6dp both sides.
- temporal outputs emitted as formatted STRINGS (engines disagree on
  timestamp precision in transport; strings are hash-stable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_adapter_spark.catalog import load
from kinesis_adapter_spark.operators.aggregates import AGG_SUM_GROUP_ORACLE
from kinesis_adapter_spark.plans.registry import query


@query(
    "fn_string_basic",
    """
    SELECT
      doc_id,
      upper(lang)                              AS lang_uc,
      lower(source)                            AS source_lc,
      trim(substring(text, 1, 20))             AS head20,
      length(text)                             AS n_len,
      lpad(CAST(doc_id AS VARCHAR), 8, '0')    AS id_pad,
      concat_ws('|', lang, source)             AS lang_src,
      replace(substring(text, 1, 30), ' ', '_') AS head_snake,
      str_split(text, ' ')[1]                  AS first_word,
      reverse(lang)                            AS lang_rev
    FROM documents
    """,
)
def fn_string_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """case/trim/pad/concat/substr/length/replace/split/reverse."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper("lang").alias("lang_uc"),
        F.lower("source").alias("source_lc"),
        F.trim(F.substring("text", 1, 20)).alias("head20"),
        F.length("text").alias("n_len"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("id_pad"),
        F.concat_ws("|", "lang", "source").alias("lang_src"),
        F.replace(F.substring("text", 1, 30), F.lit(" "), F.lit("_")).alias("head_snake"),
        F.split("text", " ").getItem(0).alias("first_word"),
        F.reverse("lang").alias("lang_rev"),
    )


@query(
    "fn_string_regexp",
    """
    SELECT
      event_id,
      regexp_extract(props, '([0-9]+)', 1)                AS k_digits,
      regexp_replace(props, '[0-9]+', '#')                AS props_masked,
      regexp_matches(event_type, '^(click|view)$')        AS is_impression,
      regexp_extract(event_type, '^(.)', 1)               AS first_char
    FROM events
    """,
)
def fn_string_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regex extract/replace/match (patterns kept in the common subset
    of Java regex and RE2 so both engines agree)."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_extract("props", r"([0-9]+)", 1).alias("k_digits"),
        F.regexp_replace("props", r"[0-9]+", "#").alias("props_masked"),
        F.col("event_type").rlike(r"^(click|view)$").alias("is_impression"),
        F.regexp_extract("event_type", r"^(.)", 1).alias("first_char"),
    )


@query(
    "fn_date",
    """
    SELECT
      o_orderkey,
      year(o_orderdate)                                    AS yr,
      month(o_orderdate)                                   AS mo,
      day(o_orderdate)                                     AS dom,
      dayofyear(o_orderdate)                               AS doy,
      CAST(extract(dow FROM o_orderdate) AS INT) + 1                    AS dow_spark,
      strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
      strftime(last_day(o_orderdate), '%Y-%m-%d')          AS month_end,
      datediff('day', DATE '1995-01-01', o_orderdate)      AS days_since_95,
      strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d')  AS plus_90d,
      CAST(quarter(o_orderdate) AS INT)                    AS qtr
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date truncate/extract/arithmetic. dow normalized to Spark's
    1=Sunday; all date-typed outputs emitted as strings."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.dayofweek("o_orderdate").alias("dow_spark"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 90), "yyyy-MM-dd").alias(
            "plus_90d"
        ),
        F.quarter("o_orderdate").alias("qtr"),
    )


@query(
    "fn_math",
    """
    SELECT
      l_orderkey,
      l_linenumber,
      ROUND(l_extendedprice, 1)                   AS price_r1,
      abs(l_discount - 0.05)                      AS disc_dev,
      CAST(ceil(l_quantity / 7) AS BIGINT)        AS q_ceil,
      CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_kfloor,
      ROUND(power(l_quantity, 2), 6)              AS q_sq,
      ROUND(sqrt(l_extendedprice), 6)             AS price_sqrt,
      ROUND(ln(l_extendedprice + 1), 6)           AS price_ln,
      ROUND(exp(l_discount), 6)                   AS disc_exp,
      CAST(l_orderkey % 7 AS BIGINT)              AS key_mod7,
      CAST(sign(l_discount - 0.05) AS DOUBLE)     AS disc_sign
    FROM lineitem
    WHERE l_orderkey <= 5000
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/ceil/floor/power/sqrt/ln/exp/mod/sign (transcendental
    outputs ROUNDed: JVM Math vs libm differ in the last ULP).

    Output-type pins: Spark ceil/floor return BIGINT while DuckDB's
    return DOUBLE, and Spark signum returns DOUBLE while DuckDB sign
    returns INT — the oracle casts each to Spark's natural type so both
    engines emit identical Arrow schemas (round-2 type-alignment)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 5000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil(F.col("l_quantity") / 7).alias("q_ceil"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_kfloor"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("q_sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
    )


@query(
    "fn_conditional",
    """
    SELECT
      event_id,
      CASE WHEN value < 50 THEN 'low' WHEN value < 200 THEN 'mid' ELSE 'high' END AS tier,
      coalesce(nullif(event_type, 'error'), 'n/a')   AS type_clean,
      greatest(value, 100.0)                         AS at_least_100,
      least(value, 100.0)                            AS at_most_100,
      CASE WHEN event_type = 'purchase' AND value > 100 THEN value ELSE 0.0 END AS big_purchase
    FROM events
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif / greatest / least."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("value") < 50, "low")
        .when(F.col("value") < 200, "mid")
        .otherwise("high")
        .alias("tier"),
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("n/a")).alias("type_clean"),
        F.greatest("value", F.lit(100.0)).alias("at_least_100"),
        F.least("value", F.lit(100.0)).alias("at_most_100"),
        F.when((F.col("event_type") == "purchase") & (F.col("value") > 100), F.col("value"))
        .otherwise(F.lit(0.0))
        .alias("big_purchase"),
    )


@query(
    "fn_cast_try",
    """
    SELECT
      event_id,
      CAST(regexp_extract(props, '([0-9]+)', 1) AS INT)  AS k_int,
      TRY_CAST(event_type AS INT)                        AS type_as_int,
      TRY_CAST(CAST(value AS VARCHAR) AS DOUBLE)         AS value_roundtrip,
      CASE WHEN CAST(user_id % 3 AS INT) = 0 THEN NULL
           ELSE value / CAST(user_id % 3 AS INT) END     AS safe_div,
      CAST(floor(value) AS BIGINT)                       AS value_floor
    FROM events
    """,
)
def fn_cast_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts + safe casts + guarded division (Spark try_divide ≡
    NULLIF-guarded division; DuckDB integer / raises instead).

    CAST(double AS BIGINT) is engine-defined (Spark truncates toward
    zero, DuckDB rounds half-even — verified mismatch), so the op pins
    semantics with an explicit floor() before the cast."""
    ev = load(spark, sf_dir, "events")
    denom = (F.col("user_id") % 3).cast("int")
    return ev.select(
        "event_id",
        F.regexp_extract("props", r"([0-9]+)", 1).cast("int").alias("k_int"),
        F.col("event_type").try_cast("int").alias("type_as_int"),
        F.col("value").cast("string").try_cast("double").alias("value_roundtrip"),
        F.try_divide("value", F.nullif(denom, F.lit(0))).alias("safe_div"),
        F.floor("value").cast("bigint").alias("value_floor"),
    )


@query(
    "fn_array",
    """
    SELECT
      vec_id,
      len(embedding)                                          AS dim,
      ROUND(CAST(embedding[1] AS DOUBLE), 6)                  AS first_elem,
      ROUND(list_aggregate(list_transform(embedding[1:8],
            x -> CAST(x AS DOUBLE)), 'sum'), 6)               AS head8_sum,
      ROUND(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 6) AS max_elem,
      len(list_distinct([label % 3, label % 5, 1]))           AS n_distinct_demo,
      list_contains([2, 4, 6, 8], label)                      AS label_even_small
    FROM embeddings
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array size/index/slice/HOF-transform/aggregate/distinct/contains
    over the 64-d embedding column (float32 → cast DOUBLE before math)."""
    e = load(spark, sf_dir, "embeddings")
    head8 = F.slice("embedding", 1, 8)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_elem"),
        F.round(
            F.aggregate(
                F.transform(head8, lambda x: x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("head8_sum"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_elem"),
        F.size(
            F.array_distinct(F.array(F.col("label") % 3, F.col("label") % 5, F.lit(1)))
        ).alias("n_distinct_demo"),
        F.array_contains(F.array(*[F.lit(x) for x in (2, 4, 6, 8)]), F.col("label")).alias(
            "label_even_small"
        ),
    )


@query(
    "fn_map",
    """
    SELECT
      event_id,
      json_extract_string(props, '$.k')          AS k_str,
      CAST(json_extract(props, '$.k') AS INT)    AS k_val,
      array_to_string(json_keys(props), ',')     AS keys_csv
    FROM events
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map built from parsed JSON props: keys/values/element access
    (Spark MapType ⟷ DuckDB JSON accessors)."""
    ev = load(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.element_at(m, "k").cast("string").alias("k_str"),
        F.element_at(m, "k").alias("k_val"),
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
    )


@query(
    "fn_json",
    """
    SELECT
      event_id,
      CAST(json_extract(props, '$.k') AS INT)        AS k,
      json_extract_string(props, '$.k')              AS k_text,
      json_extract_string(props, '$.missing')        AS missing_path,
      CAST(json_valid(props) AS BOOLEAN)             AS is_valid
    FROM events
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the props string column."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        F.get_json_object("props", "$.k").alias("k_text"),
        F.get_json_object("props", "$.missing").alias("missing_path"),
        F.when(F.from_json("props", "map<string,int>").isNotNull(), F.lit(True))
        .otherwise(F.lit(False))
        .alias("is_valid"),
    )


@query(
    "fn_hash",
    """
    SELECT
      doc_id,
      md5(text)                 AS text_md5,
      sha256(text)              AS text_sha256,
      md5(concat(lang, '|', source)) AS bucket_key
    FROM documents
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content hashing (dedup keys). md5/sha256 are
    standardized — exact cross-engine match, unlike xxhash64 which is
    Spark-internal (fine for partitioning, never in oracled output)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.md5(F.concat_ws("|", "lang", "source")).alias("bucket_key"),
    )


@query(
    "fn_struct_nested",
    """
    WITH words AS (
      SELECT doc_id, lang,
             unnest(str_split(text, ' ')) AS word,
             generate_subscripts(str_split(text, ' '), 1) - 1 AS pos
      FROM documents
      WHERE doc_id < 100
    )
    SELECT doc_id, lang, pos, word, length(word) AS word_len
    FROM words
    WHERE pos < 5
    """,
)
def fn_struct_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct build + field access + posexplode of split arrays
    (DuckDB twin: unnest + generate_subscripts zip)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    exploded = d.select(
        "doc_id",
        "lang",
        F.posexplode(F.split("text", " ")).alias("pos", "word"),
    )
    # Round-trip through a struct to exercise build + dot-access.
    packed = exploded.select(
        "doc_id",
        "lang",
        F.struct(F.col("pos"), F.col("word")).alias("pw"),
    )
    return packed.select(
        "doc_id",
        "lang",
        F.col("pw.pos").alias("pos"),
        F.col("pw.word").alias("word"),
        F.length(F.col("pw.word")).alias("word_len"),
    ).filter(F.col("pos") < 5)


@query(
    "fn_bitwise",
    """
    SELECT event_id,
           event_id & 255                    AS low_byte,
           event_id | 4096                   AS with_flag,
           xor(event_id, 65535)              AS toggled,
           event_id << 2                     AS shl2,
           event_id >> 3                     AS shr3,
           CAST(~event_id AS BIGINT)         AS inverted
    FROM events WHERE event_id < 2000
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family (and/or/xor/shifts/not) — the workhorse ops for
    flag columns, bucket assignment, and bloom/bitset maintenance; all
    JVM-codegen'd long arithmetic."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    eid = F.col("event_id")
    return ev.select(
        "event_id",
        eid.bitwiseAND(F.lit(255)).alias("low_byte"),
        eid.bitwiseOR(F.lit(4096)).alias("with_flag"),
        eid.bitwiseXOR(F.lit(65535)).alias("toggled"),
        F.shiftleft(eid, 2).alias("shl2"),
        F.shiftright(eid, 3).alias("shr3"),
        F.bitwise_not(eid).alias("inverted"),
    )


@query(
    "sql_surface_q1",
    AGG_SUM_GROUP_ORACLE,
)
def sql_surface_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same flagship pricing summary expressed through the ENGINE'S
    SQL entry point (temp views + spark.sql) instead of the DataFrame
    API: identical ANSI SQL text runs on Spark and DuckDB, proving the
    two surfaces are interchangeable (they meet at the same Catalyst
    plan from the analyzer down)."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(AGG_SUM_GROUP_ORACLE)


@query(
    "fn_interval_math",
    """
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
           CAST(last_day(o_orderdate) AS DATE) AS month_end,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00')
                AS BIGINT) AS days_to_y2k,
           CAST(date_diff('month', o_orderdate, TIMESTAMP '2000-01-01 00:00:00')
                AS BIGINT) AS months_to_y2k
    FROM orders WHERE o_orderkey <= 200
    ORDER BY o_orderkey
    """,
)
def fn_interval_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic family: day offsets, month-end snapping, and
    day/month distances. The month distance is the BOUNDARY-CROSSING
    count ((Δyear)*12 + Δmonth) — deliberately NOT Spark's fractional
    months_between, whose day-of-month fractions are engine-specific
    lore; boundary counting is what both engines (and most humans)
    agree on. All map-only codegen expressions."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    d = F.to_date("o_orderdate")
    y2k = F.lit("2000-01-01").cast("date")
    months = (F.lit(2000) - F.year(d)) * 12 + (F.lit(1) - F.month(d))
    return o.select(
        "o_orderkey",
        F.date_add(d, 30).alias("due_date"),
        F.last_day(d).alias("month_end"),
        F.datediff(y2k, d).cast("long").alias("days_to_y2k"),
        months.cast("long").alias("months_to_y2k"),
    ).orderBy("o_orderkey")


@query(
    "fn_url_parse",
    """
    WITH urls AS (
      SELECT event_id,
             concat('https://cdn', CAST(event_id % 5 AS VARCHAR),
                    '.example.com/media/', event_type, '/',
                    CAST(event_id AS VARCHAR), '.bin?user=',
                    CAST(user_id AS VARCHAR), '&v=2') AS url
      FROM events WHERE event_id < 500
    )
    SELECT event_id,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '[?&]user=([^&]*)', 1) AS user_param
    FROM urls
    ORDER BY event_id
    """,
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition (host / path / query param) with Spark's
    dedicated ``parse_url`` — the log-processing staple. DuckDB has no
    URL parser, so the oracle re-derives the same parts with anchored
    regexes; on well-formed URLs (this fixture synthesizes them from
    event fields) the two definitions coincide exactly, which the
    hash-match proves. Map-only codegen; at 100 TB this is a free
    rider on whatever scan feeds it."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    url = F.concat(
        F.lit("https://cdn"),
        (F.col("event_id") % 5).cast("string"),
        F.lit(".example.com/media/"),
        F.col("event_type"),
        F.lit("/"),
        F.col("event_id").cast("string"),
        F.lit(".bin?user="),
        F.col("user_id").cast("string"),
        F.lit("&v=2"),
    )
    u = ev.select("event_id", url.alias("url"))
    return u.select(
        "event_id",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("user")).alias(
            "user_param"
        ),
    ).orderBy("event_id")


@query(
    "fn_variant",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT)     AS k_int,
           json_extract_string(props, '$.k')           AS k_str,
           CAST(json_extract(props, '$.missing') AS INT) AS k_missing
    FROM events
    ORDER BY event_id
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT ingestion (the open lakehouse semi-structured
    type): ``parse_json`` turns the props string into a binary VARIANT
    once, then ``variant_get`` extracts typed paths without re-parsing
    — at 100 TB this is the difference between parsing JSON text per
    extraction (fn_json's get_json_object path) and parsing ONCE into
    a columnar binary that every later projection reads directly.
    Missing paths yield NULL (try-semantics), pinned by k_missing.
    Oracle: DuckDB json_extract on the same paths — VARIANT is an
    encoding change, not a semantics change, so the values must match
    the JSON-text reference exactly."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("k_int"),
            F.expr("variant_get(parse_json(props), '$.k', 'string')").alias("k_str"),
            F.expr("variant_get(parse_json(props), '$.missing', 'int')").alias(
                "k_missing"
            ),
        )
        .orderBy("event_id")
    )


@query(
    "fn_xml",
    """
    SELECT event_id, event_type AS t_parsed, CAST(user_id AS BIGINT) AS u_parsed
    FROM events
    ORDER BY event_id
    """,
)
def fn_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 native XML: serialize each event to an XML fragment,
    parse it back with ``from_xml`` (schema'd, codegen-friendly), and
    emit the parsed fields — the round trip must be lossless, which is
    what the oracle (the original columns) checks. This pins the XML
    ingestion surface (feeds/exports still speak XML at many
    enterprises) without needing an XML fixture file; the parse is the
    same whether the string came from concat or from a raw scan."""
    ev = load(spark, sf_dir, "events")
    xml = F.concat(
        F.lit("<e><t>"),
        F.col("event_type"),
        F.lit("</t><u>"),
        F.col("user_id").cast("string"),
        F.lit("</u></e>"),
    )
    parsed = F.from_xml(xml, "t STRING, u BIGINT")
    return (
        ev.select("event_id", parsed.alias("p"))
        .select(
            "event_id",
            F.col("p.t").alias("t_parsed"),
            F.col("p.u").alias("u_parsed"),
        )
        .orderBy("event_id")
    )


# --- round-5 depth: ANSI subquery surface (NOT IN null semantics,
#     correlated scalar subqueries) — identical SQL text on both engines.

_NOT_IN_NULL_SQL = """
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
   WHERE c_custkey NOT IN (SELECT o_custkey FROM orders))            AS n_not_in,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM customer c
   WHERE NOT EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey))               AS n_not_exists,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
   WHERE c_custkey NOT IN
     (SELECT CASE WHEN o_orderstatus = 'P' THEN NULL
                  ELSE o_custkey END FROM orders))                   AS n_not_in_nullable
"""


@query("sql_surface_not_in_null", _NOT_IN_NULL_SQL)
def sql_surface_not_in_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN null trap, executed through the SQL surface as
    identical ANSI text on both engines: with a null-free subquery,
    NOT IN ≡ NOT EXISTS (first two counts agree); inject ONE null into
    the subquery and three-valued logic collapses NOT IN to an empty
    result (third count = 0) while NOT EXISTS is unaffected. Pinning
    this protects the null-aware anti-join Catalyst plans for NOT IN —
    the plan-level twin is join_anti/join_null_safe.

    Scale: each count is a null-aware anti join against orders —
    Catalyst broadcasts the subquery side when small; at 100 TB the
    null-aware variant degrades to a broadcast-only strategy (one null
    anywhere empties the result), which is exactly why production
    pipelines write NOT EXISTS — the lesson this key encodes."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_NOT_IN_NULL_SQL)


_SCALAR_SUBQ_SQL = """
SELECT c_custkey, c_name,
       (SELECT ROUND(MAX(o_totalprice), 2) FROM orders o
        WHERE o.o_custkey = c.c_custkey) AS max_order_price,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
        WHERE o.o_custkey = c.c_custkey) AS n_orders
FROM customer c
WHERE c_custkey <= 300
  AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY c_custkey
"""


@query("sql_surface_scalar_subquery", _SCALAR_SUBQ_SQL)
def sql_surface_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries in the SELECT list plus a
    correlated EXISTS filter — the report-writer's surface. Catalyst
    DECORRELATES both: each scalar subquery becomes an aggregate on
    orders left-outer-joined on o_custkey, EXISTS becomes a semi join
    — no per-row re-execution anywhere (pinned in
    tests/test_plans.py). The COUNT(*) subquery is the subtle one:
    decorrelation must coalesce the no-match case to 0, not NULL
    (COUNT over an empty correlated set is 0) — EXISTS makes both
    engines' no-match rows unobservable here, but the plan still
    carries the coalesce.

    Scale: three joins all keyed on custkey; AQE picks
    broadcast/shuffle per side size. Same story at 100 TB — the
    surface sugar costs nothing over hand-written joins."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_SCALAR_SUBQ_SQL)


@query(
    "fn_collation_group",
    """
    WITH mixed AS (
      SELECT CASE WHEN c_custkey % 2 = 1 THEN UPPER(c_mktsegment)
                  ELSE LOWER(c_mktsegment) END AS seg_raw
      FROM customer
    )
    SELECT LOWER(seg_raw) AS segment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT seg_raw) AS BIGINT) AS n_surface_forms
    FROM mixed
    GROUP BY LOWER(seg_raw)
    ORDER BY segment
    """,
)
def fn_collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 COLLATION surface: grouping under UTF8_LCASE merges
    case-variant strings ENGINE-SIDE — no lower() scattered through
    every expression, and on a cluster the collation-aware hash means
    case variants of one key land in one shuffle partition instead of
    splitting across reducers and re-merging. The fixture mixes case
    deterministically (odd custkeys upper, even lower); the group key
    is `collate(seg, 'UTF8_LCASE')`, the surface-form count keeps the
    default binary collation to PROVE two spellings merged into each
    group. The oracle expresses the same semantics portably with
    LOWER() — collation names are engine lore, case-insensitive
    equality is not."""
    c = load(spark, sf_dir, "customer")
    seg_raw = F.when(
        F.col("c_custkey") % 2 == 1, F.upper("c_mktsegment")
    ).otherwise(F.lower("c_mktsegment"))
    return (
        c.select(seg_raw.alias("seg_raw"))
        .groupBy(F.collate("seg_raw", "UTF8_LCASE").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(F.collate("seg_raw", "UTF8_BINARY")).alias(
                "n_surface_forms"
            ),
        )
        .select(
            F.lower(F.col("k")).alias("segment"), "n", "n_surface_forms"
        )
        .orderBy("segment")
    )


@query(
    "fn_mask_redact",
    """
    SELECT c_custkey,
           regexp_replace(
             regexp_replace(
               regexp_replace(c_name, '[A-Z]', 'X', 'g'),
               '[a-z]', 'x', 'g'),
             '[0-9]', 'n', 'g') AS masked_name
    FROM customer
    WHERE c_custkey <= 100
    ORDER BY c_custkey
    """,
)
def fn_mask_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format-preserving redaction with Spark's built-in ``mask()``
    (upper→X, lower→x, digit→n, other kept): shape-revealing,
    content-hiding display masking — the lightweight cousin of the
    regex PII scrub (text_pii_redact) for log/UI surfaces where the
    VALUE must hide but its format stays debuggable. DuckDB has no
    mask(), so the oracle replicates it with the three character-class
    regexp_replace passes — proving the builtin's exact semantics
    rather than assuming them."""
    return (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 100)
        .select("c_custkey", F.expr("mask(c_name)").alias("masked_name"))
        .orderBy("c_custkey")
    )

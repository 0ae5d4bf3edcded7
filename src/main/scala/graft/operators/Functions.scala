package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Scalar-function inventory (SURVEY.md §2B `fn_*`): string, date,
  * math, array/higher-order, and JSON functions — the reference's D7
  * (per-record projection) and D8 (JSON lift) generalized to the whole
  * `org.apache.spark.sql.functions` surface. Everything here is a
  * built-in Catalyst expression (whole-stage codegen'd, pushdown-
  * friendly); no UDFs.
  *
  * Cross-engine determinism rules (vs the DuckDB oracle):
  *   - integer-valued results are emitted as the same width both sides
  *     (Spark size()/year() are INT, DuckDB's are BIGINT → CAST);
  *   - float results come from either correctly-rounded ops (sqrt, +,
  *     *, /) or are rounded to a scale finer than the data's intrinsic
  *     decimal scale, which is boundary-safe;
  *   - libm-dependent ops (ln, pow) are rounded to 4 decimals: the two
  *     engines agree to ~1 ulp and true values are irrational, so the
  *     probability of straddling a rounding boundary is ~1e-10/row.
  */
object Functions {

  /** String functions on customer: case, substring, concat, trim-set,
    * pad, reverse, regex extract/replace, predicates. */
  def fnString(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_custkey"),
        upper(col("c_mktsegment")).as("seg_up"),
        lower(col("c_name")).as("name_lo"),
        substring(col("c_name"), 10, 6).as("id_mid"),
        concat_ws("_", col("c_mktsegment"), col("c_name")).as("seg_name"),
        trim(col("c_name"), "Customer#").as("trimmed"),
        lpad(col("c_mktsegment"), 12, "*").as("seg_pad"),
        reverse(col("c_mktsegment")).as("seg_rev"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).cast("long").as("id_num"),
        regexp_replace(col("c_name"), "Customer", "Cust").as("shortname"),
        length(col("c_name")).as("name_len"),
        startswith(col("c_name"), lit("Customer")).as("is_cust"))
      .orderBy(col("c_custkey"))

  val fnStringSql: String =
    """SELECT c_custkey,
      |  UPPER(c_mktsegment) AS seg_up,
      |  LOWER(c_name) AS name_lo,
      |  SUBSTR(c_name, 10, 6) AS id_mid,
      |  CONCAT_WS('_', c_mktsegment, c_name) AS seg_name,
      |  TRIM(c_name, 'Customer#') AS trimmed,
      |  LPAD(c_mktsegment, 12, '*') AS seg_pad,
      |  REVERSE(c_mktsegment) AS seg_rev,
      |  CAST(REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS BIGINT) AS id_num,
      |  REGEXP_REPLACE(c_name, 'Customer', 'Cust') AS shortname,
      |  CAST(LENGTH(c_name) AS INT) AS name_len,
      |  STARTS_WITH(c_name, 'Customer') AS is_cust
      |FROM customer
      |ORDER BY c_custkey""".stripMargin

  /** Regexp function family over free text: match counting, global
    * extraction, whitespace squeezing, and field splitting — the
    * codegen'd `functions._` surface a text pipeline reaches for
    * before ever writing a UDF. Patterns stay in the
    * character-class/greedy-quantifier subset where Java regex
    * (leftmost-first) and RE2 (leftmost-longest) provably agree, so
    * the oracle can't diverge on engine-specific backtracking. Pure
    * projection: one scan, no shuffle, whole-stage codegen at any
    * scale. */
  def fnRegex(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit("[.!?]"), lit(0)))
          .cast("long").as("n_sentences"),
        size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0)))
          .cast("long").as("n_numbers"),
        size(regexp_extract_all(col("text"), lit("[A-Z][a-z]+"), lit(0)))
          .cast("long").as("n_capitalized"),
        size(regexp_extract_all(lower(col("text")), lit("[a-z]+ing"), lit(0)))
          .cast("long").as("n_ing"),
        length(regexp_replace(col("text"), "  +", " "))
          .cast("long").as("squeezed_len"),
        split_part(col("text"), lit(" "), lit(1)).as("first_word"))
      .orderBy(col("doc_id"))

  val fnRegexSql: String =
    """SELECT doc_id,
      |  CAST(LEN(regexp_extract_all(text, '[.!?]')) AS BIGINT) AS n_sentences,
      |  CAST(LEN(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_numbers,
      |  CAST(LEN(regexp_extract_all(text, '[A-Z][a-z]+')) AS BIGINT) AS n_capitalized,
      |  CAST(LEN(regexp_extract_all(lower(text), '[a-z]+ing')) AS BIGINT) AS n_ing,
      |  CAST(LENGTH(regexp_replace(text, '  +', ' ', 'g')) AS BIGINT) AS squeezed_len,
      |  split_part(text, ' ', 1) AS first_word
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Date/time functions on orders: extract fields, truncate, diff,
    * day-of-week (DuckDB isodow remapped to Spark's Sunday=1), last
    * day of month. */
  def fnDate(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        quarter(col("o_orderdate")).as("qtr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        dayofweek(col("o_orderdate")).as("dow"),
        trunc(col("o_orderdate"), "month").as("month_start"),
        datediff(lit("2020-01-01").cast("date"), col("o_orderdate")).as("days_to_2020"),
        last_day(col("o_orderdate")).as("month_end"))
      .orderBy(col("o_orderkey"))

  val fnDateSql: String =
    """SELECT o_orderkey,
      |  CAST(YEAR(o_orderdate) AS INT) AS yr,
      |  CAST(QUARTER(o_orderdate) AS INT) AS qtr,
      |  CAST(MONTH(o_orderdate) AS INT) AS mo,
      |  CAST(DAY(o_orderdate) AS INT) AS dom,
      |  CAST(ISODOW(o_orderdate) % 7 + 1 AS INT) AS dow,
      |  CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
      |  CAST(DATEDIFF('day', o_orderdate, DATE '2020-01-01') AS INT) AS days_to_2020,
      |  LAST_DAY(o_orderdate) AS month_end
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** Date construction + interval arithmetic on orders: month-clamped
    * add_months (both engines clamp 01-31 + 1 month to the last valid
    * day), fixed-day shifts, make_date construction, quarter
    * truncation, month-end predicate, and anchored week bucketing —
    * the calendar surface of a partition-by-date warehouse. Pure
    * projection, one scan. */
  def fnInterval(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        add_months(col("o_orderdate"), 3).as("plus_3m"),
        date_sub(col("o_orderdate").cast("date"), 14).as("minus_2w"),
        make_date(year(col("o_orderdate")), month(col("o_orderdate")),
          lit(1)).as("month_first"),
        trunc(col("o_orderdate"), "quarter").as("quarter_start"),
        (col("o_orderdate").cast("date") === last_day(col("o_orderdate")))
          .as("is_month_end"),
        expr("""CAST(FLOOR(datediff(CAST(o_orderdate AS DATE),
          | DATE '1995-01-01') / 7.0) AS BIGINT)""".stripMargin)
          .as("week_bucket"))
      .orderBy(col("o_orderkey"))

  val fnIntervalSql: String =
    """SELECT o_orderkey,
      |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_3m,
      |  CAST(CAST(o_orderdate AS DATE) - INTERVAL 14 DAY AS DATE) AS minus_2w,
      |  make_date(CAST(YEAR(o_orderdate) AS BIGINT),
      |            CAST(MONTH(o_orderdate) AS BIGINT), 1) AS month_first,
      |  CAST(DATE_TRUNC('quarter', o_orderdate) AS DATE) AS quarter_start,
      |  CAST(o_orderdate AS DATE) = LAST_DAY(CAST(o_orderdate AS DATE))
      |    AS is_month_end,
      |  CAST(FLOOR(date_diff('day', DATE '1995-01-01',
      |    CAST(o_orderdate AS DATE)) / 7.0) AS BIGINT) AS week_bucket
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** Math functions on lineitem. abs/sub/mult/div and sqrt are
    * correctly-rounded IEEE ops (bit-identical across engines); ln and
    * pow are libm-dependent, hence the round-to-4. */
  def fnMath(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        abs(col("l_extendedprice") - lit(50000.0)).as("absd"),
        sqrt(col("l_extendedprice")).as("sqrt_price"),
        ceil(col("l_discount") * lit(100)).as("disc_pct_ceil"),
        floor(col("l_tax") * lit(100)).as("tax_pct_floor"),
        round(col("l_extendedprice") * lit(0.1), 3).as("tithe"),
        round(log(col("l_extendedprice")), 4).as("ln_price"),
        round(pow(col("l_quantity"), lit(2.0)), 4).as("qty_sq"),
        (col("l_orderkey") % 7).as("key_mod"),
        signum(col("l_extendedprice") - lit(50000.0)).as("sign_d"),
        greatest(col("l_quantity"), lit(25.0)).as("qty_floor25"))
      // (orderkey, linenumber) is NOT unique in the synthetic data,
      // so the sort adds one injective image of each base column
      // (sqrt for price, ceil/floor for discount/tax, square for
      // quantity): rows tying on ALL sort keys are byte-identical in
      // every output column — the order is total over the OUTPUT
      .orderBy(col("l_orderkey"), col("l_linenumber"),
        col("sqrt_price"), col("disc_pct_ceil"), col("tax_pct_floor"),
        col("qty_sq"))

  val fnMathSql: String =
    """SELECT l_orderkey, l_linenumber,
      |  ABS(l_extendedprice - 50000.0) AS absd,
      |  SQRT(l_extendedprice) AS sqrt_price,
      |  CAST(CEIL(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
      |  CAST(FLOOR(l_tax * 100) AS BIGINT) AS tax_pct_floor,
      |  ROUND(l_extendedprice * 0.1, 3) AS tithe,
      |  ROUND(LN(l_extendedprice), 4) AS ln_price,
      |  ROUND(POWER(l_quantity, 2.0), 4) AS qty_sq,
      |  l_orderkey % 7 AS key_mod,
      |  CAST(SIGN(l_extendedprice - 50000.0) AS DOUBLE) AS sign_d,
      |  GREATEST(l_quantity, 25.0) AS qty_floor25
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, sqrt_price, disc_pct_ceil,
      |  tax_pct_floor, qty_sq""".stripMargin

  /** Array + higher-order functions on documents: tokenize, size,
    * element access, membership, sort/distinct, slice, lambda filter.
    * All stay inside codegen (no UDF) — the 100 TB path for per-row
    * collection work. */
  def fnArrayMap(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(toks).as("n_tokens"),
        element_at(toks, 1).as("first_tok"),
        array_contains(toks, "spark").as("has_spark"),
        array_join(slice(array_sort(array_distinct(toks)), 1, 3), " ")
          .as("first3_uniq"),
        size(array_distinct(toks)).as("n_uniq"),
        size(filter(toks, t => t === "the")).as("the_count"))
      .orderBy(col("doc_id"))
  }

  val fnArrayMapSql: String =
    """SELECT doc_id,
      |  CAST(LEN(string_split(text, ' ')) AS INT) AS n_tokens,
      |  string_split(text, ' ')[1] AS first_tok,
      |  LIST_CONTAINS(string_split(text, ' '), 'spark') AS has_spark,
      |  ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(string_split(text, ' ')))[1:3], ' ') AS first3_uniq,
      |  CAST(LEN(LIST_DISTINCT(string_split(text, ' '))) AS INT) AS n_uniq,
      |  CAST(LEN(LIST_FILTER(string_split(text, ' '), t -> t = 'the')) AS INT) AS the_count
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Binary codec functions — base64/hex encode + decode-roundtrip
    * proof, the wire formats a byte-payload column crosses (APIs,
    * JSON-embedded blobs). The roundtrip column re-decodes the
    * encoding and compares to the source, so the oracle equality
    * proves both directions. Pure projection. */
  def fnCodec(spark: SparkSession, dir: String): DataFrame =
    Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name"),
        base64(col("n_name").cast("binary")).as("b64"),
        hex(col("n_name").cast("binary")).as("hexs"),
        (unbase64(base64(col("n_name").cast("binary"))).cast("string")
          === col("n_name")).as("b64_roundtrip"),
        (unhex(hex(col("n_name").cast("binary"))).cast("string")
          === col("n_name")).as("hex_roundtrip"))
      .orderBy(col("n_nationkey"))

  val fnCodecSql: String =
    """SELECT n_nationkey, n_name,
      |  to_base64(encode(n_name)) AS b64,
      |  upper(hex(encode(n_name))) AS hexs,
      |  decode(from_base64(to_base64(encode(n_name)))) = n_name
      |    AS b64_roundtrip,
      |  decode(unhex(hex(encode(n_name)))) = n_name AS hex_roundtrip
      |FROM nation
      |ORDER BY n_nationkey""".stripMargin

  /** Array SET algebra — intersect/except/union/position/bounds
    * against a constant probe vocabulary, the membership tests a
    * filter list or stopword table compiles to. Results are sorted or
    * size-only so the two engines' (unspecified) set-op element order
    * can't leak into the hash. Pure projection. */
  def fnArraySet(spark: SparkSession, dir: String): DataFrame = {
    val a = array_sort(array_distinct(
      filter(split(lower(col("text")), " "), t => t =!= "")))
    val probe = array(Seq("spark", "query", "vector", "data").map(lit): _*)
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(array_intersect(a, probe)).cast("long").as("n_common"),
        array_join(array_sort(array_except(probe, a)), ",").as("missing"),
        size(array_union(a, probe)).cast("long").as("n_union"),
        array_position(a, "the").cast("long").as("pos_the"),
        // try_: plain element_at throws under ANSI on an empty token
        // array (whitespace-only doc) while the oracle's a[1] is NULL
        try_element_at(a, lit(1)).as("min_tok"),
        try_element_at(a, lit(-1)).as("max_tok"))
      .orderBy(col("doc_id"))
  }

  val fnArraySetSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    LIST_SORT(LIST_DISTINCT(LIST_FILTER(
      |      string_split(lower(text), ' '), x -> x <> ''))) AS a,
      |    ['spark', 'query', 'vector', 'data'] AS probe
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(LEN(LIST_INTERSECT(a, probe)) AS BIGINT) AS n_common,
      |  COALESCE(ARRAY_TO_STRING(LIST_SORT(LIST_FILTER(probe,
      |    p -> NOT LIST_CONTAINS(a, p))), ','), '') AS missing,
      |  CAST(LEN(LIST_DISTINCT(LIST_CONCAT(a, probe))) AS BIGINT) AS n_union,
      |  CAST(COALESCE(LIST_POSITION(a, 'the'), 0) AS BIGINT) AS pos_the,
      |  a[1] AS min_tok,
      |  a[-1] AS max_tok
      |FROM t
      |ORDER BY doc_id""".stripMargin

  /** VARIANT (Spark 4's semi-structured type): parse the JSON props
    * into a variant, typed path extraction, and NULL on a missing path
    * — the open-schema alternative to from_json(schema) when event
    * payloads evolve. Scalar outputs only. */
  def fnVariant(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        expr("variant_get(parse_json(props), '$.k', 'int')").as("k_var"),
        expr("variant_get(parse_json(props), '$.missing', 'string')").as("absent"))
      .orderBy(col("event_id"))

  val fnVariantSql: String =
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS k_var,
      |  json_extract_string(props, '$.missing') AS absent
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** MapType surface: build a map from arrays, key lookup, cardinality,
    * key enumeration — emitted as scalars (lookup values, size, joined
    * key list) per the output discipline. DuckDB's map subscript yields
    * a single-element list, unwrapped with [1]. */
  def fnMap(spark: SparkSession, dir: String): DataFrame = {
    val m = map_from_arrays(
      array(lit("status"), lit("priority")),
      array(col("o_orderstatus"), col("o_orderpriority")))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), m.as("m"))
      .select(col("o_orderkey"),
        element_at(col("m"), "status").as("status_val"),
        element_at(col("m"), "priority").as("prio_val"),
        size(col("m")).as("n_keys"),
        array_join(map_keys(col("m")), ",").as("keys_csv"))
      .orderBy(col("o_orderkey"))
  }

  val fnMapSql: String =
    """SELECT o_orderkey,
      |  m['status'][1] AS status_val,
      |  m['priority'][1] AS prio_val,
      |  CAST(cardinality(m) AS INT) AS n_keys,
      |  array_to_string(map_keys(m), ',') AS keys_csv
      |FROM (SELECT o_orderkey,
      |        map(['status','priority'], [o_orderstatus, o_orderpriority]) AS m
      |      FROM orders)
      |ORDER BY o_orderkey""".stripMargin

  /** StructType surface — the remaining nested type (array/map/variant/
    * JSON covered by their own rows): build a struct, access fields,
    * nest a struct in a struct, compare structs (field-wise ordering —
    * both engines compare lexicographically by field position), and
    * sort an array of structs. Outputs are scalars per the output
    * discipline. */
  def fnStruct(spark: SparkSession, dir: String): DataFrame = {
    val s = struct(col("o_orderstatus").as("st"), col("o_totalprice").as("tp"))
    val nested = struct(lit("v1").as("tag"), s.as("inner"))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), s.as("s"), nested.as("n"))
      .select(col("o_orderkey"),
        col("s.st").as("st"),
        col("s.tp").as("tp"),
        col("n.tag").as("tag"),
        col("n.inner.tp").as("nested_tp"),
        (col("s") < struct(lit("P").as("st"), lit(0.0).as("tp"))).as("lt_probe"))
      .orderBy(col("o_orderkey"))
  }

  val fnStructSql: String =
    """SELECT o_orderkey,
      |  s.st AS st, s.tp AS tp,
      |  n.tag AS tag, n.inner.tp AS nested_tp,
      |  s < {'st': 'P', 'tp': 0.0} AS lt_probe
      |FROM (SELECT o_orderkey,
      |        {'st': o_orderstatus, 'tp': o_totalprice} AS s,
      |        {'tag': 'v1', 'inner': {'st': o_orderstatus, 'tp': o_totalprice}} AS n
      |      FROM orders)
      |ORDER BY o_orderkey""".stripMargin

  /** JSON functions on events.props (the reference's D8 JSON lift,
    * TemplateApp.scala:62, per-field instead of whole-record): path
    * extraction, schema-full parse, and re-serialization. */
  def fnJson(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_path"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k_parsed"),
        to_json(struct(col("event_id"), col("event_type"))).as("as_json"))
      .orderBy(col("event_id"))

  val fnJsonSql: String =
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS k_path,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS k_parsed,
      |  CAST(to_json(struct_pack(event_id := event_id, event_type := event_type)) AS VARCHAR) AS as_json
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** Null-semantics functions: NULLIF/COALESCE/null predicates/
    * null-safe equality over synthesized nulls (no nullable columns in
    * the testdata, so NULLIF manufactures them). */
  def fnNull(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("O")).as("status_or_null"))
      .select(col("o_orderkey"), col("status_or_null"),
        coalesce(col("status_or_null"), lit("none")).as("status_filled"),
        col("status_or_null").isNull.as("was_open"),
        col("status_or_null").isNotNull.as("was_closed"),
        (col("status_or_null") <=> lit("F")).as("finished_nullsafe"))
      .orderBy(col("o_orderkey"))

  val fnNullSql: String =
    """SELECT o_orderkey,
      |  NULLIF(o_orderstatus, 'O') AS status_or_null,
      |  COALESCE(NULLIF(o_orderstatus, 'O'), 'none') AS status_filled,
      |  NULLIF(o_orderstatus, 'O') IS NULL AS was_open,
      |  NULLIF(o_orderstatus, 'O') IS NOT NULL AS was_closed,
      |  NULLIF(o_orderstatus, 'O') IS NOT DISTINCT FROM 'F' AS finished_nullsafe
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** Bitwise functions on integer keys: shifts, and/or/xor, popcount —
    * exact integer ops, identical in any engine. */
  def fnBitwise(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        shiftleft(col("o_orderkey"), 3).as("shl3"),
        shiftright(col("o_orderkey"), 2).as("shr2"),
        col("o_orderkey").bitwiseAND(lit(255L)).as("low_byte"),
        col("o_orderkey").bitwiseOR(lit(1L)).as("odd_or"),
        col("o_orderkey").bitwiseXOR(col("o_custkey")).as("key_xor"),
        bit_count(col("o_orderkey")).as("popcount"))
      .orderBy(col("o_orderkey"))

  val fnBitwiseSql: String =
    """SELECT o_orderkey,
      |  o_orderkey << 3 AS shl3,
      |  o_orderkey >> 2 AS shr2,
      |  o_orderkey & 255 AS low_byte,
      |  o_orderkey | 1 AS odd_or,
      |  xor(o_orderkey, o_custkey) AS key_xor,
      |  CAST(bit_count(o_orderkey) AS INT) AS popcount
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_bitwise" -> fnBitwise,
    "fn_regex" -> fnRegex,
    "fn_interval" -> fnInterval,
    "fn_null" -> fnNull,
    "fn_string" -> fnString,
    "fn_date" -> fnDate,
    "fn_math" -> fnMath,
    "fn_array_map" -> fnArrayMap,
    "fn_array_set" -> fnArraySet,
    "fn_codec" -> fnCodec,
    "fn_json" -> fnJson,
    "fn_map" -> fnMap,
    "fn_struct" -> fnStruct,
    "fn_variant" -> fnVariant,
  )

  val oracleSql: Map[String, String] = Map(
    "fn_bitwise" -> fnBitwiseSql,
    "fn_regex" -> fnRegexSql,
    "fn_interval" -> fnIntervalSql,
    "fn_null" -> fnNullSql,
    "fn_string" -> fnStringSql,
    "fn_date" -> fnDateSql,
    "fn_math" -> fnMathSql,
    "fn_array_map" -> fnArrayMapSql,
    "fn_array_set" -> fnArraySetSql,
    "fn_codec" -> fnCodecSql,
    "fn_json" -> fnJsonSql,
    "fn_map" -> fnMapSql,
    "fn_struct" -> fnStructSql,
    "fn_variant" -> fnVariantSql,
  )
}

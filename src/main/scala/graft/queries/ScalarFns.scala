package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, MapType, StringType}
import graft.Tables.t

/** SURVEY.md §2-H — scalar function families, one query per family,
  * every expression a codegen'd built-in (no UDFs). Oracle-parity
  * notes: Spark regexp_replace is replace-all (DuckDB needs the 'g'
  * flag); DuckDB date_trunc returns DATE (match with Spark trunc);
  * DuckDB epoch() is fractional (floor before casting); array folds are
  * expressed as an explicit left fold with a 0.0 seed on both sides so
  * float summation order is pinned.
  */
object ScalarFns {

  private def fnString(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "part")
      .select(col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        lower(col("p_type")).as("type_lower"),
        lpad(col("p_brand"), 12, "*").as("brand_padded"),
        substring(col("p_name"), 1, 5).as("name_head"),
        concat_ws("|", col("p_name"), col("p_type")).as("name_type"),
        length(col("p_name")).as("name_len"),
        regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("name_novowel"),
        col("p_name").like("%widget%").as("is_widget"),
        levenshtein(col("p_name"), lit("large widget")).as("edit_dist"),
        md5(col("p_name")).as("name_md5"))
      .orderBy("p_partkey")

  private def fnDatetime(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        trunc(col("o_orderdate").cast("date"), "month").as("month_start"),
        date_add(col("o_orderdate").cast("date"), 30).as("due_date"),
        datediff(lit("2000-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_y2k"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        from_unixtime(unix_timestamp(col("o_orderdate"))).as("epoch_str"),
        make_date(year(col("o_orderdate")), month(col("o_orderdate")), lit(1)).as("made_date"))
      .orderBy("o_orderkey")

  private def fnMath(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        round(col("l_extendedprice")).as("price_round"),
        floor(col("l_extendedprice")).as("price_floor"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        abs(col("l_quantity") - 25).as("qty_dist25"),
        pow(col("l_quantity"), 2).as("qty_sq"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        exp(col("l_discount")).as("disc_exp"),
        // Java Math.log and libm disagree in the last ulp for some
        // inputs; round to 10 decimals on both sides for oracle parity
        round(log(col("l_quantity")), 10).as("qty_ln"),
        round(log10(col("l_quantity")), 10).as("qty_log10"),
        pmod(col("l_orderkey"), lit(7)).as("key_mod7"),
        greatest(col("l_quantity"), col("l_discount") * 100).as("max_qd"),
        least(col("l_quantity"), col("l_discount") * 100).as("min_qd"))
      .orderBy("l_orderkey", "l_linenumber", "l_quantity")

  private def fnConditional(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .select(col("event_id"),
        when(col("value") >= 100, "high")
          .when(col("value") >= 10, "mid")
          .otherwise("low").as("value_band"),
        coalesce(nullif(col("event_type"), lit("click")), lit("(clicked)")).as("type_or_tag"),
        isnan(col("value")).as("value_is_nan"),
        (col("value") === 0).as("is_zero"))
      .orderBy("event_id")

  // shared scaled-bigint CSV serializers (engine-parity critical)
  private def csvScaled(arrExpr: String): String = OracleFmt.csvScaled(arrExpr)

  private def fnArray(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).cast("double").as("first_elem"),
        expr(csvScaled("slice(embedding, 1, 3)")).as("head3"),
        expr(csvScaled("sort_array(slice(embedding, 1, 5))")).as("head5_sorted"),
        array_contains(col("embedding"), element_at(col("embedding"), 1)).as("contains_first"))
      .orderBy("vec_id")

  private def fnArrayHigherOrder(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        // explicit 0.0-seeded left fold of squares — mirrored exactly in
        // the oracle via list_prepend(0.0, squares) + list_reduce
        aggregate(transform(col("embedding"), x => x.cast("double")),
          lit(0.0), (acc, x) => acc + x * x).as("norm_sq"),
        expr(csvScaled(
          "transform(slice(embedding, 1, 3), x -> cast(x as double) * 2)"))
          .as("head3_doubled"),
        size(filter(col("embedding"), x => x > 0)).as("n_positive"),
        exists(col("embedding"), x => x > lit(0.5f)).as("has_big"),
        expr(csvScaled(
          """zip_with(embedding, reverse(embedding),
               (x, y) -> cast(x as double) + y)"""))
          .as("palindrome_sum"))
      .orderBy("vec_id")

  private val propsMap = MapType(StringType, IntegerType)

  private def fnMap(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .withColumn("m", from_json(col("props"), propsMap))
      .select(col("event_id"),
        concat_ws(",", map_keys(col("m"))).as("ks"),
        expr("concat_ws(',', transform(map_values(m), v -> cast(v as string)))")
          .as("vs"),
        element_at(col("m"), "k").as("k_value"))
      .orderBy("event_id")

  private def fnJson(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_int"),
        json_tuple(col("props"), "k").as("k_str"),
        to_json(struct(get_json_object(col("props"), "$.k").cast("int").as("k"))).as("roundtrip"))
      .orderBy("event_id")

  /** H. Spark 4 VARIANT — semi-structured data as a first-class typed
    * value instead of repeated string re-parsing: `parse_json` once,
    * then typed `variant_get` path extraction (binary-encoded, no
    * text re-scan per field — the shredded-storage scale path for
    * JSON-heavy corpora). Paths cover object fields, nested arrays,
    * and a type-cast-on-extract. */
  private def fnVariant(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .selectExpr(
        "event_id",
        "parse_json(props) AS v",
        """parse_json(concat('{"uid":', cast(user_id as string),
             ',"tags":["evt","', event_type, '"]}')) AS w""")
      .selectExpr(
        "event_id",
        "variant_get(v, '$.k', 'int') AS k_int",
        "variant_get(v, '$.k', 'string') AS k_str",
        "variant_get(w, '$.uid', 'bigint') AS uid",
        "variant_get(w, '$.tags[1]', 'string') AS tag",
        "variant_get(w, '$.missing', 'string') AS absent")
      .orderBy("event_id")

  /** H. Error-safe (`try_`) functions — malformed input tolerated as
    * NULL instead of a job-killing exception: the difference between a
    * 100 TB ingest that finishes with a null-rate metric and one that
    * dies at hour 9 on a single bad row. Covers try_cast (bad int, bad
    * date), try_divide (zero divisor), try_element_at (out-of-bounds). */
  private def fnTry(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .selectExpr(
        "o_orderkey",
        // every 3rd key gets a trailing junk char -> NULL under try_cast
        """try_cast(concat(cast(o_orderkey as string),
             case when o_orderkey % 3 = 0 then 'x' else '' end) as int)
           AS maybe_int""",
        // day-of-month 0..39: 0 and 29..39 are invalid for 2026-02
        """try_to_date(concat('2026-02-',
             lpad(cast(o_orderkey % 40 as string), 2, '0'))) AS maybe_date""",
        // zero divisor every 5th row -> NULL, not Infinity and not a crash;
        // scaled-bigint per the engine-parity convention (OracleFmt) —
        // round(NULL) stays NULL so the try_ semantics survive the format
        """cast(round(try_divide(cast(o_totalprice as double),
             cast(o_orderkey % 5 as double)) * cast(100000000 as double))
           as bigint) AS maybe_ratio_e8""",
        // 1-based index past the end of a 3-element array -> NULL
        """try_element_at(split('a,b,c', ','),
             cast(1 + o_orderkey % 4 as int)) AS maybe_elem""")
      .orderBy("o_orderkey")

  /** H. Higher-order MAP functions — `transform_values/transform_keys/
    * map_filter/map_zip_with` over deterministically constructed maps.
    * Results serialize to sorted `k:v` CSV (driver cannot hash map
    * columns); the DuckDB twin computes the same transforms through
    * `map_entries` list operations. */
  private def fnMapHigherOrder(spark: SparkSession, sfDir: String): DataFrame = {
    def ser(e: String) =
      s"""concat_ws(',', transform(sort_array(map_entries($e)),
            p -> concat(p.key, ':', cast(p.value as string))))"""
    t(spark, sfDir, "events")
      .selectExpr("event_id",
        "map('a', cast(user_id % 100 as int), 'b', cast(event_id % 7 as int)) AS m1",
        "map('b', cast(user_id % 5 as int), 'c', cast(event_id % 3 as int)) AS m2")
      .selectExpr("event_id",
        s"${ser("transform_values(m1, (k, v) -> v * 2)")} AS doubled",
        s"${ser("transform_keys(m1, (k, v) -> upper(k))")} AS upcased",
        s"${ser("map_filter(m1, (k, v) -> v >= 50)")} AS filtered",
        s"${ser("map_zip_with(m1, m2, (k, v1, v2) -> coalesce(v1, 0) + coalesce(v2, 0))")} AS zipped")
      .orderBy("event_id")
  }

  /** H. URL functions — the first parse every web-corpus pipeline runs:
    * host/path/query decomposition (`parse_url`) for domain-level
    * grouping and canonicalization, plus `url_encode`/`url_decode`
    * round-trip. URLs are constructed deterministically from keys so
    * the DuckDB twin can rebuild the expected parts with string ops. */
  private def fnUrl(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .selectExpr("o_orderkey",
        """concat('https://shop', cast(o_custkey % 3 as string),
             '.example.com/p/', cast(o_orderkey as string),
             '?q=', cast(o_custkey as string), '&r=1') AS u""")
      .selectExpr(
        "o_orderkey",
        "parse_url(u, 'HOST') AS host",
        "parse_url(u, 'PATH') AS path",
        "parse_url(u, 'QUERY') AS query_full",
        "parse_url(u, 'QUERY', 'q') AS q_param",
        "parse_url(u, 'PROTOCOL') AS proto")
      .orderBy("o_orderkey")

  /** Remaining §2-H surface: crypto hash, regex predicate, nested-array
    * flatten/zip, map construction/inspection, NVL. */
  private def fnMisc(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "documents")
      .selectExpr("doc_id",
        "sha2(text, 256) AS sha",
        "text RLIKE 'table|scan' AS mentions_scan",
        "size(flatten(array(split(text, ' '), array('x')))) AS flat_sz",
        "size(arrays_zip(split(text, ' '), split(text, ' '))) AS zip_sz",
        """concat_ws(',', map_keys(map_from_entries(array(
             struct('len', length(text)),
             struct('lang_len', length(lang)))))) AS mkeys""",
        "nvl(nullif(lang, 'zh'), '(redacted)') AS lang_or_redacted")
      .orderBy("doc_id")

  /** Regex surface beyond the basics in fn_string: extract-all
    * (serialized — no top-level arrays reach the driver), match counts,
    * and group-backreference rewriting. */
  private def fnRegex(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "part")
      .selectExpr("p_partkey",
        "concat_ws(',', regexp_extract_all(p_name, '[a-z]+', 0)) AS words_csv",
        "size(regexp_extract_all(p_name, '[a-z]+', 0)) AS n_words",
        "p_brand rlike '[0-9]' AS has_digit",
        "regexp_replace(p_type, '([a-z]+) ([a-z]+)', '$2 $1') AS swapped")
      .orderBy("p_partkey")

  /** Bitwise surface over 64-bit keys: shifts, and/or/xor, complement,
    * popcount — the primitives hash-partitioners, bitmap indexes, and
    * bloom filters are built from. */
  private def fnBitwise(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .selectExpr("o_orderkey",
        "shiftleft(o_orderkey, 3) AS shl3",
        "shiftright(o_orderkey, 2) AS shr2",
        "o_orderkey & 255 AS and_lo",
        "o_orderkey | 4096 AS or_bit",
        "o_orderkey ^ 65535 AS xor_lo",
        "~o_orderkey AS complement",
        "cast(bit_count(o_orderkey) as int) AS popcount")
      .orderBy("o_orderkey")

  /** Date arithmetic beyond fn_datetime: whole-month distances (both
    * engines agree once truncated to month starts) and banker's
    * rounding (DuckDB round_even = Spark bround, both HALF_EVEN). */
  private def fnDatetime2(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .selectExpr("o_orderkey",
        """cast(months_between(date_trunc('month', o_orderdate),
                to_timestamp('1997-01-01')) as int) AS months_since""",
        // bround demo on half-integers: n/2 is binary-exact, so the
        // HALF_EVEN tie is a true tie in every engine. (Rounding an
        // inexact double like price/3 double-rounds differently per
        // engine — not a portable operation.)
        "bround(o_orderkey / cast(2 as double), 0) AS half_banker")
      .orderBy("o_orderkey")

  /** H. Spark 4 collations — case-insensitive semantics pushed into
    * the ENGINE instead of lower() wrappers at every call site: a
    * UTF8_LCASE-collated column groups case variants together while
    * the raw binary column still counts them apart. The deliberately
    * mixed-case segment column collapses 2:1 under the collated
    * group-by; output is normalized through lower() so the arbitrary
    * group representative never leaks into the hash. The oracle
    * expresses the same semantics with explicit lower() — exactly the
    * boilerplate collations remove. */
  private def fnCollation(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "customer")
      .selectExpr("c_custkey",
        """CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
                ELSE c_mktsegment END AS seg""")
      .groupBy(expr("collate(seg, 'UTF8_LCASE')").as("seg_ci"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(expr("collate(seg, 'UTF8_BINARY')")).as("n_variants"))
      .selectExpr("lower(seg_ci) AS segment", "n_rows", "n_variants")
      .orderBy("segment")

  /** H. Crypto/digest functions — sha2-256 and md5 digests (both
    * engines compute identical hex), plus an AES-GCM encrypt→decrypt
    * round-trip. GCM ciphertexts are IV-randomized (deliberately NOT
    * hashable), so what the oracle checks is the round-tripped
    * PLAINTEXT — the property that matters — while the digests pin
    * byte-exact parity. Column-level encryption at rest is how PII
    * columns ship to an untrusted lake tier. */
  private def fnCrypto(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "customer")
      .selectExpr("c_custkey",
        "sha2(c_name, 256) AS name_sha256",
        "md5(c_name) AS name_md5",
        """cast(aes_decrypt(
             aes_encrypt(encode(c_name, 'utf-8'),
                         encode('0123456789abcdef', 'utf-8')),
             encode('0123456789abcdef', 'utf-8')) AS STRING)
           AS name_roundtrip""")
      .orderBy("c_custkey")

  /** H. Fuzzy matching — Levenshtein edit distance, the scalar
    * workhorse of entity-resolution refine stages (the blocking stage
    * is an equi-join on cheap keys; edit distance then scores only the
    * candidates — never all-pairs). Both engines implement the classic
    * DP, so distances agree exactly. */
  private def fnFuzzy(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "nation")
      .selectExpr("n_nationkey", "n_name",
        "levenshtein(n_name, 'UNITED STATES') AS dist_us",
        "levenshtein(substring(n_name, 1, 5), 'INDIA') AS dist_prefix")
      .orderBy("n_nationkey")

  /** H. Data masking — the `mask()` governance function: shape-
    * preserving redaction (case classes and digits keep their
    * positions, values vanish) for lake tiers where analysts may see
    * formats but not identities. The oracle spells it as the regexp
    * chain mask() replaces. */
  private def fnMask(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "customer")
      .selectExpr("c_custkey",
        "mask(c_name) AS masked_default",
        "mask(c_name, '*', '*', '#') AS masked_custom")
      .orderBy("c_custkey")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_mask" -> (fnMask _),
    "fn_fuzzy" -> (fnFuzzy _),
    "fn_crypto" -> (fnCrypto _),
    "fn_collation" -> (fnCollation _),
    "fn_regex" -> (fnRegex _),
    "fn_bitwise" -> (fnBitwise _),
    "fn_misc" -> (fnMisc _),
    "fn_datetime2" -> (fnDatetime2 _),
    "fn_string" -> (fnString _),
    "fn_datetime" -> (fnDatetime _),
    "fn_math" -> (fnMath _),
    "fn_conditional" -> (fnConditional _),
    "fn_array" -> (fnArray _),
    "fn_array_higher_order" -> (fnArrayHigherOrder _),
    "fn_map" -> (fnMap _),
    "fn_json" -> (fnJson _),
    "fn_variant" -> (fnVariant _),
    "fn_try" -> (fnTry _),
    "fn_url" -> (fnUrl _),
    "fn_map_higher_order" -> (fnMapHigherOrder _))

  private def dCsvScaled(arrExpr: String): String = OracleFmt.dCsvScaled(arrExpr)

  val oracle: Map[String, String] = Map(
    "fn_mask" ->
      """SELECT c_custkey,
                regexp_replace(regexp_replace(regexp_replace(c_name,
                  '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
                  AS masked_default,
                regexp_replace(regexp_replace(regexp_replace(c_name,
                  '[A-Z]', '*', 'g'), '[a-z]', '*', 'g'), '[0-9]', '#', 'g')
                  AS masked_custom
         FROM customer ORDER BY c_custkey""",
    "fn_fuzzy" ->
      """SELECT n_nationkey, n_name,
                levenshtein(n_name, 'UNITED STATES') AS dist_us,
                levenshtein(substring(n_name, 1, 5), 'INDIA') AS dist_prefix
         FROM nation ORDER BY n_nationkey""",
    "fn_crypto" ->
      """SELECT c_custkey,
                sha256(c_name) AS name_sha256,
                md5(c_name) AS name_md5,
                c_name AS name_roundtrip
         FROM customer ORDER BY c_custkey""",
    "fn_collation" ->
      """WITH s AS (
           SELECT CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
                       ELSE c_mktsegment END AS seg
           FROM customer)
         SELECT lower(seg) AS segment, count(*) AS n_rows,
                count(DISTINCT seg) AS n_variants
         FROM s GROUP BY lower(seg) ORDER BY segment""",
    "fn_regex" ->
      """SELECT p_partkey,
                array_to_string(regexp_extract_all(p_name, '[a-z]+'), ',')
                  AS words_csv,
                CAST(len(regexp_extract_all(p_name, '[a-z]+')) AS INTEGER)
                  AS n_words,
                regexp_matches(p_brand, '[0-9]') AS has_digit,
                regexp_replace(p_type, '([a-z]+) ([a-z]+)', '\2 \1', 'g')
                  AS swapped
         FROM part ORDER BY p_partkey""",
    "fn_bitwise" ->
      """SELECT o_orderkey,
                o_orderkey << 3 AS shl3,
                o_orderkey >> 2 AS shr2,
                o_orderkey & 255 AS and_lo,
                o_orderkey | 4096 AS or_bit,
                xor(o_orderkey, 65535) AS xor_lo,
                ~o_orderkey AS complement,
                CAST(bit_count(o_orderkey) AS INTEGER) AS popcount
         FROM orders ORDER BY o_orderkey""",
    "fn_misc" ->
      """SELECT doc_id,
                sha256(text) AS sha,
                regexp_matches(text, 'table|scan') AS mentions_scan,
                len(flatten([string_split(text, ' '), ['x']])) AS flat_sz,
                len(string_split(text, ' ')) AS zip_sz,
                array_to_string(map_keys(map_from_entries(
                  [{'k': 'len', 'v': length(text)},
                   {'k': 'lang_len', 'v': length(lang)}])), ',') AS mkeys,
                coalesce(nullif(lang, 'zh'), '(redacted)') AS lang_or_redacted
         FROM documents ORDER BY doc_id""",
    "fn_datetime2" ->
      """SELECT o_orderkey,
                CAST(date_diff('month', DATE '1997-01-01',
                     date_trunc('month', o_orderdate)) AS INTEGER) AS months_since,
                round_even(o_orderkey / CAST(2 AS DOUBLE), 0) AS half_banker
         FROM orders ORDER BY o_orderkey""",
    "fn_string" ->
      """SELECT p_partkey,
                upper(p_name) AS name_upper,
                lower(p_type) AS type_lower,
                lpad(p_brand, 12, '*') AS brand_padded,
                substring(p_name, 1, 5) AS name_head,
                concat_ws('|', p_name, p_type) AS name_type,
                CAST(length(p_name) AS INTEGER) AS name_len,
                regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
                regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_novowel,
                (p_name LIKE '%widget%') AS is_widget,
                CAST(levenshtein(p_name, 'large widget') AS INTEGER) AS edit_dist,
                md5(p_name) AS name_md5
         FROM part ORDER BY p_partkey""",
    "fn_datetime" ->
      """SELECT o_orderkey,
                CAST(year(o_orderdate) AS INTEGER) AS y,
                CAST(month(o_orderdate) AS INTEGER) AS m,
                CAST(day(o_orderdate) AS INTEGER) AS d,
                date_trunc('month', CAST(o_orderdate AS DATE)) AS month_start,
                CAST(o_orderdate AS DATE) + 30 AS due_date,
                CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INTEGER) AS days_to_y2k,
                CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s,
                strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS epoch_str,
                make_date(CAST(year(o_orderdate) AS INTEGER), CAST(month(o_orderdate) AS INTEGER), 1) AS made_date
         FROM orders ORDER BY o_orderkey""",
    "fn_math" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
                round(l_extendedprice) AS price_round,
                CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
                CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
                abs(l_quantity - 25) AS qty_dist25,
                pow(l_quantity, 2) AS qty_sq,
                sqrt(l_quantity) AS qty_sqrt,
                exp(l_discount) AS disc_exp,
                round(ln(l_quantity), 10) AS qty_ln,
                round(log10(l_quantity), 10) AS qty_log10,
                CAST(mod(l_orderkey, 7) AS BIGINT) AS key_mod7,
                greatest(l_quantity, l_discount * 100) AS max_qd,
                least(l_quantity, l_discount * 100) AS min_qd
         FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity""",
    "fn_conditional" ->
      """SELECT event_id,
                CASE WHEN value >= 100 THEN 'high'
                     WHEN value >= 10 THEN 'mid'
                     ELSE 'low' END AS value_band,
                coalesce(nullif(event_type, 'click'), '(clicked)') AS type_or_tag,
                isnan(value) AS value_is_nan,
                (value = 0) AS is_zero
         FROM events ORDER BY event_id""",
    "fn_array" ->
      s"""SELECT vec_id,
                CAST(len(embedding) AS INTEGER) AS dim,
                CAST(embedding[1] AS DOUBLE) AS first_elem,
                ${dCsvScaled("embedding[1:3]")} AS head3,
                ${dCsvScaled("list_sort(embedding[1:5])")} AS head5_sorted,
                list_contains(embedding, embedding[1]) AS contains_first
         FROM embeddings ORDER BY vec_id""",
    "fn_array_higher_order" ->
      s"""SELECT vec_id,
                list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
                  (acc, x) -> acc + x) AS norm_sq,
                ${dCsvScaled("list_transform(embedding[1:3], x -> CAST(x AS DOUBLE) * 2)")} AS head3_doubled,
                CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_positive,
                (len(list_filter(embedding, x -> x > 0.5)) > 0) AS has_big,
                ${dCsvScaled("""list_transform(list_zip(embedding, list_reverse(embedding)),
                  s -> CAST(s[1] AS DOUBLE) + s[2])""")} AS palindrome_sum
         FROM embeddings ORDER BY vec_id""",
    "fn_map" ->
      """SELECT event_id,
                coalesce(array_to_string(json_keys(props), ','), '') AS ks,
                coalesce(array_to_string(list_transform(json_keys(props),
                  k -> CAST(CAST(json_extract_string(props, '$."' || k || '"')
                                 AS INTEGER) AS VARCHAR)), ','), '') AS vs,
                CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value
         FROM events ORDER BY event_id""",
    "fn_json" ->
      """SELECT event_id,
                CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
                json_extract_string(props, '$.k') AS k_str,
                CASE WHEN json_extract_string(props, '$.k') IS NULL THEN '{}'
                     ELSE '{"k":' || json_extract_string(props, '$.k') || '}'
                END AS roundtrip
         FROM events ORDER BY event_id""",
    "fn_variant" ->
      """SELECT event_id,
                CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
                json_extract_string(props, '$.k') AS k_str,
                CAST(json_extract_string(
                  ('{"uid":' || user_id || ',"tags":["evt","' || event_type
                    || '"]}')::JSON, '$.uid') AS BIGINT) AS uid,
                json_extract_string(
                  ('{"uid":' || user_id || ',"tags":["evt","' || event_type
                    || '"]}')::JSON, '$.tags[1]') AS tag,
                json_extract_string(
                  ('{"uid":' || user_id || ',"tags":["evt","' || event_type
                    || '"]}')::JSON, '$.missing') AS absent
         FROM events ORDER BY event_id""",
    "fn_try" ->
      """SELECT o_orderkey,
                TRY_CAST(o_orderkey ||
                  CASE WHEN o_orderkey % 3 = 0 THEN 'x' ELSE '' END
                  AS INTEGER) AS maybe_int,
                TRY_CAST('2026-02-' || lpad(CAST(o_orderkey % 40 AS VARCHAR), 2, '0')
                  AS DATE) AS maybe_date,
                CASE WHEN o_orderkey % 5 = 0 THEN NULL
                     ELSE CAST(round(o_totalprice / (o_orderkey % 5)
                       * CAST(100000000 AS DOUBLE)) AS BIGINT)
                END AS maybe_ratio_e8,
                (str_split('a,b,c', ','))[CAST(1 + o_orderkey % 4 AS INTEGER)]
                  AS maybe_elem
         FROM orders ORDER BY o_orderkey""",
    "fn_url" ->
      """SELECT o_orderkey,
                'shop' || (o_custkey % 3) || '.example.com' AS host,
                '/p/' || o_orderkey AS path,
                'q=' || o_custkey || '&r=1' AS query_full,
                CAST(o_custkey AS VARCHAR) AS q_param,
                'https' AS proto
         FROM orders ORDER BY o_orderkey""",
    "fn_map_higher_order" ->
      """WITH src AS (
           SELECT event_id,
                  MAP {'a': CAST(user_id % 100 AS INTEGER),
                       'b': CAST(event_id % 7 AS INTEGER)} AS m1,
                  MAP {'b': CAST(user_id % 5 AS INTEGER),
                       'c': CAST(event_id % 3 AS INTEGER)} AS m2
           FROM events)
         SELECT event_id,
                array_to_string(list_transform(list_sort(map_entries(m1)),
                  e -> e.key || ':' || (e.value * 2)), ',') AS doubled,
                array_to_string(list_sort(list_transform(map_entries(m1),
                  e -> upper(e.key) || ':' || e.value)), ',') AS upcased,
                coalesce(array_to_string(list_transform(list_sort(list_filter(
                  map_entries(m1), e -> e.value >= 50)),
                  e -> e.key || ':' || e.value), ','), '') AS filtered,
                array_to_string(list_transform(['a', 'b', 'c'],
                  k -> k || ':' || (coalesce(map_extract(m1, k)[1], 0)
                                  + coalesce(map_extract(m2, k)[1], 0))), ',')
                  AS zipped
         FROM src ORDER BY event_id""")
}

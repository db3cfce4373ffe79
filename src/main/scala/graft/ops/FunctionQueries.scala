package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Parity._

/** Scalar function coverage (SURVEY.md §2.7): string, regexp, date/time,
  * JSON, array, and higher-order families — all builtin codegen'd
  * expressions, no UDFs. DuckDB naming differences are mirrored in the
  * oracle SQL (split→string_split, date_format→strftime, etc.);
  * `initcap` is absent in DuckDB 1.0.0 and stays ScalaTest-only.
  */
object FunctionQueries {

  /** String cleaning chain over part names (ETL normalization core). */
  def q30StringNorm(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
    val norm = regexp_replace(lower(trim(col("p_name"))), "\\s+", " ")
    p.select(
        col("p_partkey"),
        norm.as("norm_name"),
        length(norm).as("name_len"),
        concat_ws("|", lower(col("p_brand")), translate(norm, " ", "_"))
          .as("brand_key"),
        lpad(col("p_size").cast("string"), 3, "0").as("size_pad"),
        format_string("%s-%03d", col("p_type"), col("p_size")).as("tag"),
        substring(norm, 1, 4).as("prefix4"),
        reverse(col("p_brand")).as("brand_rev"))
      .orderBy("p_partkey")
  }

  val q30StringNormSql: String =
    """SELECT p_partkey,
      |  regexp_replace(lower(trim(p_name)), '\s+', ' ', 'g') AS norm_name,
      |  length(regexp_replace(lower(trim(p_name)), '\s+', ' ', 'g')) AS name_len,
      |  concat_ws('|', lower(p_brand), translate(regexp_replace(lower(trim(p_name)), '\s+', ' ', 'g'), ' ', '_')) AS brand_key,
      |  lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_pad,
      |  printf('%s-%03d', p_type, p_size) AS tag,
      |  substring(regexp_replace(lower(trim(p_name)), '\s+', ' ', 'g'), 1, 4) AS prefix4,
      |  reverse(p_brand) AS brand_rev
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Regexp extract/replace: parse the brand number out of `Brand#N`. */
  def q31Regexp(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
    val brandNum = regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).cast("int")
    p.groupBy(brandNum.as("brand_num"))
      .agg(count(lit(1)).as("n_parts"),
        countDistinct(regexp_replace(col("p_type"), "[aeiou]", "")).as("n_types_devoweled"),
        min(col("p_size")).as("min_size"),
        max(col("p_size")).as("max_size"))
      .orderBy("brand_num")
  }

  val q31RegexpSql: String =
    """SELECT CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS INTEGER) AS brand_num,
      |  COUNT(*) AS n_parts,
      |  COUNT(DISTINCT regexp_replace(p_type, '[aeiou]', '', 'g')) AS n_types_devoweled,
      |  MIN(p_size) AS min_size, MAX(p_size) AS max_size
      |FROM part GROUP BY 1 ORDER BY brand_num""".stripMargin

  /** Date/time surface: parts, trunc, format, month arithmetic.
    * DuckDB dayofweek is 0=Sunday vs Spark 1=Sunday → +1 in the oracle. */
  def q32DateFuncs(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mon"),
        quarter(col("o_orderdate")).as("qtr"),
        dayofweek(col("o_orderdate")).as("dow_sun1"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month_str"),
        last_day(col("o_orderdate")).as("month_end"),
        add_months(col("o_orderdate").cast("date"), 1).as("next_month"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"))
      .orderBy("o_orderkey")
  }

  val q32DateFuncsSql: String =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INTEGER) AS yr,
      |  CAST(month(o_orderdate) AS INTEGER) AS mon,
      |  CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
      |  CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow_sun1,
      |  strftime(o_orderdate, '%Y-%m') AS month_str,
      |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
      |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS next_month,
      |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** JSON extraction from the events props payload (both the string-path
    * accessor and the schema-full from_json route). */
  def q33Json(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val kStr = get_json_object(col("props"), "$.k").cast("int")
    val kStruct = from_json(col("props"),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.IntegerType)))).getField("k")
    e.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        rnd(avg(kStr)).as("avg_k"),
        min(kStr).as("min_k"),
        max(kStruct).as("max_k"))
      .orderBy("event_type")
  }

  val q33JsonSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k,
      |  MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
      |  MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Array basics over tokenized document text. */
  def q34ArrayOps(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val words = split(col("text"), " ")
    d.select(
        col("doc_id"),
        size(words).as("n_words"),
        array_contains(words, "data").as("has_data"),
        element_at(words, 1).as("first_word"),
        array_join(slice(words, 1, 3), " ").as("first3"),
        size(array_distinct(words)).as("n_distinct"))
      .orderBy("doc_id")
  }

  val q34ArrayOpsSql: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words,
      |  list_contains(string_split(text, ' '), 'data') AS has_data,
      |  list_extract(string_split(text, ' '), 1) AS first_word,
      |  array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ') AS first3,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Higher-order functions: transform / filter / aggregate / exists /
    * forall over word arrays. */
  def q35HigherOrder(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val words = split(col("text"), " ")
    d.select(
        col("doc_id"),
        aggregate(transform(words, w => length(w)), lit(0), (acc, x) => acc + x)
          .as("total_chars"),
        size(filter(words, w => length(w) > 5)).as("n_long"),
        exists(words, w => w === "query").as("mentions_query"),
        forall(words, w => length(w) > 1).as("all_multichar"))
      .orderBy("doc_id")
  }

  val q35HigherOrderSql: String =
    """SELECT doc_id,
      |  CAST(list_aggregate(list_transform(string_split(text, ' '), w -> length(w)), 'sum') AS INTEGER) AS total_chars,
      |  CAST(len(list_filter(string_split(text, ' '), w -> length(w) > 5)) AS INTEGER) AS n_long,
      |  len(list_filter(string_split(text, ' '), w -> w = 'query')) > 0 AS mentions_query,
      |  len(list_filter(string_split(text, ' '), w -> length(w) <= 1)) = 0 AS all_multichar
      |FROM documents ORDER BY doc_id""".stripMargin

  /** sequence/flatten arithmetic (generate_series is upper-inclusive in
    * both engines; DuckDB `range` is not — Appendix A). */
  def q36Sequences(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
    p.select(
        col("p_partkey"),
        aggregate(sequence(lit(1), col("p_size")), lit(0), (a, x) => a + x)
          .as("tri_sum"),
        // joined to a string: the driver's pandas hasher cannot
        // sort/hash array cells; int→string formats identically on
        // both engines, so the join is lossless
        array_join(transform(flatten(array(sequence(lit(1), lit(2)),
          sequence(lit(1), pmod(col("p_size"), lit(3)) + 1))),
          x => x.cast("string")), ",").as("flat_seq"))
      .orderBy("p_partkey")
  }

  val q36SequencesSql: String =
    """SELECT p_partkey,
      |  CAST(list_aggregate(generate_series(1, p_size), 'sum') AS INTEGER) AS tri_sum,
      |  array_to_string(flatten([generate_series(1, 2), generate_series(1, p_size % 3 + 1)]), ',') AS flat_seq
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Scalar sweep: the §2.7 functions not already covered by q30–q36 —
    * upper/rpad/replace/LIKE, epoch seconds, sign, pmod, exp/ln
    * (rounded), greatest/least, nullif — one row per first-line item. */
  def q63ScalarSweep(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir).filter(col("l_linenumber") === 1)
    l.select(
        col("l_orderkey"),
        upper(col("l_returnflag")).as("flag_up"),
        rpad(col("l_linestatus"), 3, "x").as("status_pad"),
        regexp_replace(col("l_returnflag"), "A", "Z").as("flag_sub"),
        col("l_linestatus").like("%O%").as("is_open"),
        unix_timestamp(col("l_shipdate")).as("ship_epoch"),
        signum(col("l_quantity") - 25).cast("int").as("qty_sign"),
        pmod(col("l_orderkey"), lit(7)).as("ok_mod7"),
        round(exp(col("l_discount")), 6).as("exp_disc"),
        round(log(col("l_extendedprice")), 6).as("ln_price"),
        greatest(col("l_quantity"), col("l_discount") * 100).as("g_qty"),
        least(col("l_tax") * 100, col("l_quantity")).as("l_qty"),
        nullif(col("l_linestatus"), lit("O")).as("status_or_null"))
      .orderBy("l_orderkey")
  }

  val q63ScalarSweepSql: String =
    """SELECT l_orderkey,
      |  upper(l_returnflag) AS flag_up,
      |  rpad(l_linestatus, 3, 'x') AS status_pad,
      |  regexp_replace(l_returnflag, 'A', 'Z', 'g') AS flag_sub,
      |  l_linestatus LIKE '%O%' AS is_open,
      |  CAST(epoch(l_shipdate) AS BIGINT) AS ship_epoch,
      |  CAST(sign(l_quantity - 25) AS INTEGER) AS qty_sign,
      |  ((l_orderkey % 7) + 7) % 7 AS ok_mod7,
      |  ROUND(exp(l_discount), 6) AS exp_disc,
      |  ROUND(ln(l_extendedprice), 6) AS ln_price,
      |  greatest(l_quantity, l_discount * 100) AS g_qty,
      |  least(l_tax * 100, l_quantity) AS l_qty,
      |  nullif(l_linestatus, 'O') AS status_or_null
      |FROM lineitem WHERE l_linenumber = 1 ORDER BY l_orderkey""".stripMargin

  /** Unicode normalization (custom codegen'd expressions, §2.10): NFC
    * composition + accent folding vs DuckDB `nfc_normalize` /
    * `strip_accents`. The fixture corpus is pure ASCII, so the query
    * MANUFACTURES the non-ASCII path deterministically inside both
    * engines: vowels are translated to their composed accented forms
    * (á é í ó ü — folding must return the original text), and every
    * 'e' is suffixed with a combining acute U+0301 (NFC must compose
    * 'e'+mark into one é code point, shrinking the char count by
    * exactly the number of 'e's). Literals are written as chr()/escape
    * forms so no raw non-ASCII rides through the oracle JSON.
    *
    * Scale: per-row map over codegen'd kernels — no shuffle before the
    * output sort, no UDF. */
  def q104UnicodeNorm(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.UniFns
    val d = Tables.documents(s, dir)
    val accented = translate(col("text"), "aeiou", "\u00e1\u00e9\u00ed\u00f3\u00fc")
    val decomposed = regexp_replace(col("text"), "e", "e\u0301")
    d.select(
        col("doc_id"),
        (UniFns.foldAccents(accented) === col("text")).as("fold_roundtrip"),
        length(decomposed).as("len_decomposed"),
        length(UniFns.nfcNormalize(decomposed)).as("len_composed"),
        substring(UniFns.foldAccents(UniFns.nfcNormalize(decomposed)), 1, 24)
          .as("folded_prefix"))
      .orderBy("doc_id")
  }

  val q104UnicodeNormSql: String =
    """SELECT doc_id,
      |  strip_accents(translate(text, 'aeiou',
      |    chr(225)||chr(233)||chr(237)||chr(243)||chr(252))) = text AS fold_roundtrip,
      |  CAST(length(replace(text, 'e', 'e'||chr(769))) AS INTEGER) AS len_decomposed,
      |  CAST(length(nfc_normalize(replace(text, 'e', 'e'||chr(769)))) AS INTEGER) AS len_composed,
      |  substring(strip_accents(nfc_normalize(replace(text, 'e', 'e'||chr(769)))), 1, 24) AS folded_prefix
      |FROM documents ORDER BY doc_id""".stripMargin
}

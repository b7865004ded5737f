package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Dsl._
import graft.tables.Tables

/** Scalar-function surface: string / date / math / array / JSON
  * (SURVEY.md §2.2 q18–q22). Everything is a built-in codegen'd expression;
  * no UDFs anywhere (SURVEY.md §2.2 UDF note) — so whole-stage codegen spans
  * the full plan and the oracle computes bit-identical values.
  */
object Scalars {

  /** q18: string scalars over part. */
  def q18(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir)
      .filter(col("p_name").like("%rod%"))
      .select(col("p_partkey"),
        upper(col("p_brand")).as("brand_upper"),
        substring(col("p_name"), 1, 10).as("name10"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
        length(col("p_name")).as("name_len"),
        regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_head"))
      .orderBy(col("p_partkey"))

  /** q19: date scalars over orders — the BNPL 30-day due-date rule
    * (consumer/consumer.go:137) and its yyyy-MM-dd string format
    * (Go layout 2006-01-02, main.go:119,148,231). */
  def q19(spark: SparkSession, sfDir: String): DataFrame = {
    val due = date_add(to_date(col("o_orderdate")), 30)
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        due.as("due_date"),
        to_date(date_trunc("month", col("o_orderdate"))).as("month_start"),
        year(col("o_orderdate")).as("o_year"),
        datediff(due, to_date(col("o_orderdate"))).as("days_to_due"),
        date_format(due, "yyyy-MM-dd").as("due_str"))
      .orderBy(col("o_orderkey"))
      .limit(500)
  }

  /** q20: math scalars over the first 1000 lineitems. round() runs on an
    * exact DECIMAL, not the raw double — the testdata's 2-decimal prices sit
    * exactly on .x5 boundaries where double rounding is engine-dependent.
    * (l_orderkey, l_linenumber) is NOT unique in the testdata, so the
    * "first 1000" cut and the final order sort on all six value columns —
    * a verified total order (D1/D5). */
  def q20(spark: SparkSession, sfDir: String): DataFrame = {
    val keys = Seq(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
      col("l_quantity"), col("l_tax"), col("l_discount"))
    Tables.lineitem(spark, sfDir)
      .orderBy(keys: _*)
      .limit(1000)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        col("l_quantity"), col("l_tax"), col("l_discount"),
        round(col("l_extendedprice").cast("decimal(18,4)"), 1).cast("double").as("price_round1"),
        abs(col("l_quantity") - lit(25.0)).as("qty_dist25"),
        floor(col("l_extendedprice")).as("price_floor"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        (col("l_orderkey") % 7).as("okey_mod7"),
        greatest(col("l_tax"), col("l_discount")).as("max_rate"),
        least(col("l_tax"), col("l_discount")).as("min_rate"))
      .orderBy(keys: _*)
  }

  /** q21: array scalars + higher-order functions over embeddings — the
    * typed Array[Float] column surface of the multimodal north star. */
  def q21(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        size(col("embedding")).as("dim"),
        round4(element_at(col("embedding"), 1).cast("double")).as("first_val"),
        // head4 is a STRING (joined fixed-point decimals), not an ArrayType
        // column: the driver's oracle compare sorts result columns in pandas
        // and array cells are unhashable there (r1 q21 failure) — the HOF
        // surface (slice + transform) is unchanged, only the output is scalar.
        array_join(transform(slice(col("embedding"), 1, 4),
          x => round(x.cast("double"), 4).cast("decimal(18,4)").cast("string")), ",").as("head4"),
        round4(sqrt(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double")))).as("l2_norm"))
      .orderBy(col("vec_id"))
      .limit(100)

  /** q22: JSON scalars — schema-on-read over the event `props` column, the
    * event_data JSON decode of consumer/consumer.go:112-119 / readme:68. */
  def q22(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("int").as("k"))
      .filter(col("k").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        sum(col("k")).as("sum_k"),
        (sum(col("k")).cast("double") / count(lit(1))).as("avg_k"))
      .orderBy(col("event_type"))

  /** q50: map-type scalars — the open-keys form of the event `props`
    * decode (MapType(String,Int) where keys aren't known at plan time,
    * SURVEY.md §1.2): parse, inspect keys (sorted — map key order is not
    * defined), look up, merge with a literal map. */
  def q50(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_id"),
        from_json(col("props"),
          org.apache.spark.sql.types.DataType.fromDDL("map<string,int>")).as("m"))
      .select(
        col("event_id"),
        size(col("m")).as("n_keys"),
        array_join(sort_array(map_keys(col("m"))), ",").as("keys"),
        element_at(col("m"), "k").as("k_val"),
        size(map_concat(col("m"), map(lit("extra"), lit(1)))).as("n_after_concat"))
      .orderBy(col("event_id"))
      .limit(500)
}

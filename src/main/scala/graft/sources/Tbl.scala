package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pipe-delimited `.tbl` ingestion — the reference's input format
  * (positional `split("\\|", n)` parsing at every use site, e.g.
  * `assignment5/Q1.scala:32` field 10 = shipdate, `Q2.scala:29-33` orders
  * field 6 = clerk). Full TPC-H positional layouts are declared once as
  * `StructType`s and mapped onto the fixture Parquet schemas, so a query
  * written against [[graft.Tables]] runs unchanged on `.tbl` input.
  *
  * Spark's CSV reader handles the format natively (sep='|'); with an
  * explicit schema there is no inference pass, unused trailing columns are
  * pruned at scan, and malformed rows follow the standard PERMISSIVE/
  * FAILFAST modes instead of throwing mid-`split`.
  */
object Tbl {

  private def st(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t, nullable = true) })

  /** Full TPC-H column layouts (positional, as in the reference's data). */
  val layouts: Map[String, StructType] = Map(
    "lineitem" -> st(
      "l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
      "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> StringType, "l_commitdate" -> StringType,
      "l_receiptdate" -> StringType, "l_shipinstruct" -> StringType,
      "l_shipmode" -> StringType, "l_comment" -> StringType),
    "orders" -> st(
      "o_orderkey" -> LongType, "o_custkey" -> LongType, "o_orderstatus" -> StringType,
      "o_totalprice" -> DoubleType, "o_orderdate" -> StringType,
      "o_orderpriority" -> StringType, "o_clerk" -> StringType,
      "o_shippriority" -> IntegerType, "o_comment" -> StringType),
    "customer" -> st(
      "c_custkey" -> LongType, "c_name" -> StringType, "c_address" -> StringType,
      "c_nationkey" -> IntegerType, "c_phone" -> StringType,
      "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType, "c_comment" -> StringType),
    "supplier" -> st(
      "s_suppkey" -> LongType, "s_name" -> StringType, "s_address" -> StringType,
      "s_nationkey" -> IntegerType, "s_phone" -> StringType,
      "s_acctbal" -> DoubleType, "s_comment" -> StringType),
    "part" -> st(
      "p_partkey" -> LongType, "p_name" -> StringType, "p_mfgr" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType, "p_size" -> IntegerType,
      "p_container" -> StringType, "p_retailprice" -> DoubleType, "p_comment" -> StringType),
    "nation" -> st(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType, "n_comment" -> StringType),
    "region" -> st(
      "r_regionkey" -> IntegerType, "r_name" -> StringType, "r_comment" -> StringType),
  )

  /** Columns of the fixture Parquet schema (what [[graft.Tables]] serves),
    * with date strings lifted to timestamps.
    */
  private val fixtureCols: Map[String, Seq[String]] = Map(
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate"),
    "orders"   -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority"),
    "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part"     -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
    "nation"   -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "region"   -> Seq("r_regionkey", "r_name"),
  )

  private val dateCols = Set("l_shipdate", "o_orderdate")

  /** Read `dir/name.tbl` in the reference layout, projected+typed to the
    * fixture schema — so `Tbl.table(...)` is a drop-in for
    * `Tables.table(...)`.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read
      .schema(layouts(name))
      .option("sep", "|")
      .option("mode", "PERMISSIVE")
      .csv(s"$dir/$name.tbl")
    raw.select(fixtureCols(name).map { c =>
      if (dateCols(c)) to_timestamp(col(c), "yyyy-MM-dd").as(c) else col(c)
    }: _*)
  }

  /** The lineitem fixture rendered ONCE per session in the reference's
    * positional 16-field `.tbl` layout (a [[graft.Caches]] artifact under
    * the session artifact root — the 5 trailing TPC-H fields the fixture
    * lacks are filled with constants the read-side projection never
    * touches), then read back through the positional scanner. The
    * round-trip makes the `.tbl` path itself part of the oracle-gated
    * surface, not just a spec: any parse/typing/date drift in the scanner
    * shows up as a hash mismatch downstream.
    */
  def lineitemViaTbl(spark: SparkSession, dir: String): DataFrame =
    graft.Caches.memoized(spark, dir, "artifact:lineitem_tbl") {
      val root = graft.Caches.artifactBase(dir).resolve("tbl").toString
      graft.Tables.lineitem(spark, dir)
        // widen BEFORE rendering (the parquet scan yields ~5 input
        // partitions; with the repartition above the render, the
        // concat_ws of 16 columns per row — the CPU of this build — ran
        // 5-way and only the finished strings fanned out to 16 writers).
        // The scanner globs the directory, and row order is immaterial
        // to every consumer (aggregates + the sort-before-hash gate)
        .repartition(16)
        .select(concat_ws("|",
          col("l_orderkey"), col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"),
          col("l_returnflag"), col("l_linestatus"),
          date_format(col("l_shipdate"), "yyyy-MM-dd"),
          lit("1996-01-01"), lit("1996-01-01"), lit("NONE"), lit("MAIL"), lit("x")))
        .write.mode("overwrite").text(s"$root/lineitem.tbl")
      table(spark, root, "lineitem")
    }

  /** Q1 over the `.tbl` round-trip (`Q1.scala:29-34` — the reference's
    * only input format): pushed-down shipdate range + global count, same
    * oracle as q1_shipdate_count because the `.tbl` detour must be
    * value-transparent.
    */
  def q1ViaTbl(spark: SparkSession, dir: String, dt: String = "1996-03"): DataFrame =
    lineitemViaTbl(spark, dir)
      .filter(graft.Tables.dateMatches(col("l_shipdate"), dt))
      .agg(count(lit(1)).as("cnt"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_tbl_roundtrip" -> ((s, d) => q1ViaTbl(s, d)),
  )

  val oracles: Map[String, String] = Map(
    // identical to the q1_shipdate_count oracle: the .tbl write/read is
    // required to be invisible to the values
    "q1_tbl_roundtrip" ->
      "SELECT count(*) AS cnt FROM lineitem WHERE strftime(l_shipdate, '%Y-%m-%d') LIKE '1996-03%'",
  )
}

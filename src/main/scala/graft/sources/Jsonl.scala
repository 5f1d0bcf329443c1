package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-Lines ingestion — the de-facto interchange format for raw LLM
  * training corpora (one JSON object per line). No reference counterpart
  * (its text inputs are positional `.tbl` and adjacency text; extension
  * mandate): a corpus engine that cannot eat JSONL cannot ingest anything
  * a crawler emits.
  *
  * Scale notes: JSONL is LINE-SPLITTABLE — embedded newlines/quotes are
  * escaped inside the JSON string, so a 100-TB dump splits at arbitrary
  * byte offsets into parallel tasks (unlike CSV with embedded newlines,
  * which needs multiLine=true and turns every file into ONE task). The
  * read uses an explicit schema: no inference pass over the corpus, and
  * unreferenced fields are pruned by Jackson before row materialization.
  */
object Jsonl {

  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Read a JSONL documents dump with the fixture schema (FAILFAST: a
    * malformed line is corpus corruption, not a row to silently null).
    */
  def documents(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(documentsSchema).option("mode", "FAILFAST").json(path)

  /** The documents fixture rendered ONCE per session as a JSONL artifact,
    * then read back through the schema'd scanner — the `.tbl` round-trip
    * protocol ([[Tbl.lineitemViaTbl]]) applied to the JSON path: any
    * escaping/typing drift in the writer or scanner shows up as a hash
    * mismatch downstream.
    */
  def documentsViaJsonl(spark: SparkSession, dir: String): DataFrame =
    graft.Caches.memoized(spark, dir, "artifact:documents_jsonl") {
      val root = graft.Caches.artifactBase(dir).resolve("jsonl").toString
      graft.Tables.documents(spark, dir)
        .write.mode("overwrite").json(s"$root/documents.jsonl")
      documents(spark, s"$root/documents.jsonl")
    }

  /** Content-checksummed per-lang rollup over the JSONL detour. The text
    * checksum is an order-independent SUM of md5 prefixes, so it is
    * sensitive to any character-level corruption in any document while
    * staying a plain aggregate; the oracle computes the same rollup over
    * the PARQUET table — the JSONL write/read must be value-transparent.
    */
  def langChecksum(spark: SparkSession, dir: String): DataFrame =
    documentsViaJsonl(spark, dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(expr("CAST(conv(substr(md5(text), 1, 7), 16, 10) AS BIGINT)"))
          .as("text_hash_sum"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_jsonl_roundtrip" -> ((s, d) => langChecksum(s, d)),
  )

  val oracles: Map[String, String] = Map(
    "src_jsonl_roundtrip" ->
      """SELECT lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(CAST('0x' || substr(md5(text), 1, 7) AS BIGINT)) AS BIGINT)
             AS text_hash_sum
         FROM documents GROUP BY lang""",
  )
}

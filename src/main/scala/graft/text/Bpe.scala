package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftExpr
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.Tables

/** Real merge-table byte-pair encoding (driver-extension mandate): the
  * trainable subword tokenizer a training-data pipeline budgets with,
  * next to the regex segmentation floor in
  * [[graft.analysis.TextAnalysis.bpeTokenCount]].
  *
  * Protocol (ours — the reference has no BPE; semantics follow the
  * published Sennrich et al. 2016 algorithm):
  *   - a word's symbol sequence is its characters plus a final `</w>`
  *     end-of-word symbol;
  *   - training repeatedly merges the most frequent adjacent symbol pair
  *     (frequency-weighted over the word dictionary, overlapping pairs
  *     counted; ties broken lexicographically so training is
  *     deterministic);
  *   - encoding applies the merge list in rank order, each merge one
  *     left-to-right non-overlapping pass.
  *
  * Scale split: the corpus-sized work is the distributed word count
  * (shuffle on word, map-side partial aggregation); the driver then
  * trains over the top-`maxDict` dictionary ROWS — bounded by vocabulary,
  * not corpus size, which is exactly how production tokenizer trainers
  * run. Encoding broadcasts the merge table inside a native expression:
  * per-row, shuffle-free, scales linearly.
  */
object Bpe {

  val Eow = "</w>"

  /** A word's initial symbol sequence: characters + end-of-word marker. */
  def symbols(word: String): IndexedSeq[String] =
    word.map(_.toString) :+ Eow

  /** One merge pass: single left-to-right non-overlapping scan replacing
    * adjacent (a, b) with a+b. Returns the input unchanged (same
    * reference) when the pair never occurs, so encode's 48-pass loop
    * allocates only on words the merge actually touches.
    */
  def mergePass(syms: IndexedSeq[String], a: String, b: String): IndexedSeq[String] = {
    var hit = false
    var i = 0
    while (i < syms.length - 1 && !hit) {
      hit = syms(i) == a && syms(i + 1) == b
      i += 1
    }
    if (!hit) syms
    else {
      val out = mutable.ArrayBuffer.empty[String]
      var j = 0
      while (j < syms.length) {
        if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
          out += a + b; j += 2
        } else { out += syms(j); j += 1 }
      }
      out.toIndexedSeq
    }
  }

  /** Encode one word with a trained merge list (rank order). */
  def encodeWord(word: String, merges: Seq[(String, String)]): IndexedSeq[String] = {
    var syms = symbols(word)
    merges.foreach { case (a, b) => if (syms.length > 1) syms = mergePass(syms, a, b) }
    syms
  }

  /** Sennrich trainer over a word-frequency dictionary (driver-side; the
    * dictionary is the compressed corpus — its size is bounded by
    * `maxDict`, not by the data).
    */
  def train(dict: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var segs = dict.map { case (w, f) => (symbols(w), f) }.toArray
    val out = mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (out.length < numMerges && !exhausted) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      segs.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        out += best
        segs = segs.map { case (syms, f) => (mergePass(syms, best._1, best._2), f) }
      }
    }
    out.toSeq
  }

  /** Distributed dictionary extraction + driver training. `orderBy.limit`
    * plans as TakeOrdered, so the driver never holds more than `maxDict`
    * dictionary rows regardless of corpus size; ties on count break by
    * word for determinism.
    */
  def trainOnCorpus(spark: SparkSession, dir: String,
                    numMerges: Int = 48, maxDict: Int = 50000): Seq[(String, String)] = {
    val dict = Text.wordCount(spark, dir)
      .orderBy(col("cnt").desc, col("word"))
      .limit(maxDict)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    train(dict.toSeq, numMerges)
  }

  /** The SHIPPED tokenizer: 48 merges trained by [[trainOnCorpus]] on the
    * sf0.001 fixture tier and frozen here, the way a production pipeline
    * ships one fixed tokenizer for every corpus it processes. Freezing is
    * what makes `ta_bpe_encode` oracle-checkable — the DuckDB side replays
    * the same static merge list. BpeSpec re-derives this list from the
    * fixture and asserts equality, so the constant's provenance is
    * test-pinned.
    */
  val FrozenMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("e", "</w>"), ("n", "</w>"), ("o", "r"), ("t", "</w>"),
    ("er", "</w>"), ("o", "w"), ("ow", "</w>"), ("l", "u"), ("i", "n"),
    ("y", "</w>"), ("a", "r"), ("p", "ar"), ("g", "</w>"), ("a", "s"),
    ("h", "</w>"), ("a", "</w>"), ("s", "t"), ("a", "t"), ("a", "n</w>"),
    ("c", "an</w>"), ("s", "can</w>"), ("c", "o"), ("co", "lu"),
    ("colu", "m"), ("colum", "n</w>"), ("d", "ow</w>"), ("in", "dow</w>"),
    ("w", "indow</w>"), ("d", "er</w>"), ("or", "der</w>"), ("or", "t</w>"),
    ("s", "ort</w>"), ("p", "</w>"), ("par", "t</w>"), ("u", "p</w>"),
    ("a", "g"), ("ag", "g</w>"), ("a", "lu"), ("alu", "e</w>"),
    ("v", "alue</w>"), ("in", "e</w>"), ("l", "ine</w>"), ("e", "y</w>"),
    ("k", "ey</w>"), ("i", "n</w>"), ("j", "o"), ("jo", "in</w>"),
  )

  /** Native encoder: array<string> tokens → flattened array<string> of
    * subword units. One interpreted call per ROW (CodegenFallback), tight
    * scalar loops inside — the HOF alternative would interpret per token
    * × merge. Merge table travels with the expression (driver-known
    * constant, serialized once per task, never a shuffle).
    */
  case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "bpe_encode"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val out = mutable.ArrayBuffer.empty[Any]
      var t = 0
      while (t < arr.numElements()) {
        val subs = encodeWord(arr.getUTF8String(t).toString, merges)
        var i = 0
        while (i < subs.length) { out += UTF8String.fromString(subs(i)); i += 1 }
        t += 1
      }
      new GenericArrayData(out.toArray)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def bpeEncode(tokens: Column, merges: Seq[(String, String)] = FrozenMerges): Column =
    GraftExpr.column(BpeEncode(GraftExpr.expression(tokens), merges))

  /** ta_bpe_encode: per-document subword budget under the shipped
    * tokenizer — total subword count plus the first 8 units as a
    * human-auditable sample.
    */
  def encode(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), bpeEncode(Text.tokenize(col("text"))).as("subs"))
      .select(col("doc_id"),
        size(col("subs")).as("n_subwords"),
        concat_ws(" ", slice(col("subs"), 1, 8)).as("seg_sample"))

  /** ta_bpe_train: the trainer as a registered operator — merge table
    * learned from THIS corpus (rank, pair, merged symbol).
    */
  def trainQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    trainOnCorpus(spark, dir).zipWithIndex
      .map { case ((a, b), i) => (i + 1, a, b, a + b) }
      .toDF("rank", "lhs", "rhs", "merged")
  }

  // ---------------------------------------------------------------- oracle

  private def sqlQuote(s: String) = s.replace("'", "''")

  /** DuckDB replay of [[encodeWord]]: a word's segmentation is kept as a
    * string with every symbol prefixed by chr(10) and suffixed by ' '
    * (symbols can contain neither — tokens are whitespace-split), so one
    * merge pass is one `replace` of chr(10)||a||' '||chr(10)||b||' ' —
    * matches always start and end at symbol boundaries, and replace's
    * left-to-right non-overlapping scan continues exactly at the next
    * symbol, i.e. the same pass [[mergePass]] performs. BpeSpec asserts
    * this replace-semantics equivalence over every fixture word.
    */
  private def mergeListSql: String =
    FrozenMerges.map { case (a, b) => s"'${sqlQuote(s"$a $b")}'" }
      .mkString("[", ", ", "]")

  private val tokSql =
    graft.text.Text.TokSql

  private def encodeOracle: String =
    s"""SELECT doc_id, len(subs) AS n_subwords,
              array_to_string(subs[1:8], ' ') AS seg_sample
       FROM (
         SELECT doc_id,
           flatten(list_transform(toks, w ->
             list_transform(
               string_split(
                 list_reduce(
                   list_prepend(
                     chr(10) || array_to_string(regexp_extract_all(w, '.'), ' ' || chr(10))
                             || ' ' || chr(10) || '</w> ',
                     $mergeListSql),
                   (acc, m) -> replace(acc,
                     chr(10) || replace(m, ' ', ' ' || chr(10)) || ' ',
                     chr(10) || replace(m, ' ', '') || ' ')),
                 chr(10))[2:],
               s -> rtrim(s, ' ')))) AS subs
         FROM (SELECT doc_id, $tokSql AS toks FROM documents))"""

  /** DuckDB replay of the TRAINER: the sequential argmax recurrence
    * unrolls into chained MATERIALIZED CTEs (the pr_toprank technique) —
    * per merge, a weighted adjacent-pair count over the current
    * segmentations (`list_zip(syms, syms[2:])`), the deterministic argmax
    * (count desc, pair asc), and the dictionary re-segmentation via the
    * same sentinel-replace [[encodeOracle]] uses. A defensive LEFT JOIN
    * keeps the dictionary unchanged if the pair supply ever runs dry
    * (early-stop parity with [[train]]).
    */
  private def trainOracle(numMerges: Int, maxDict: Int): String = {
    val segSyms =
      s"""list_transform(string_split(seg, chr(10))[2:], x -> rtrim(x, ' '))"""
    val sb = new StringBuilder(
      s"""WITH dict AS MATERIALIZED (
            SELECT chr(10) || array_to_string(regexp_extract_all(word, '.'), ' ' || chr(10))
                   || ' ' || chr(10) || '</w> ' AS seg,
                   freq
            FROM (SELECT word, count(*) AS freq
                  FROM (SELECT unnest(toks) AS word
                        FROM (SELECT $tokSql AS toks FROM documents))
                  GROUP BY word ORDER BY freq DESC, word LIMIT $maxDict)),
          s0 AS MATERIALIZED (SELECT seg, freq FROM dict)""")
    for (i <- 1 to numMerges) sb ++=
      s""",
          b$i AS MATERIALIZED (
            SELECT u[1] AS a, u[2] AS b FROM (
              SELECT u, sum(freq) AS c FROM (
                SELECT unnest(list_zip(syms, syms[2:])) AS u, freq
                FROM (SELECT $segSyms AS syms, freq FROM s${i - 1}))
              WHERE u[2] IS NOT NULL
              GROUP BY u)
            ORDER BY c DESC, u[1], u[2] LIMIT 1),
          s$i AS MATERIALIZED (
            SELECT CASE WHEN b.a IS NULL THEN s.seg
                   ELSE replace(s.seg,
                     chr(10) || b.a || ' ' || chr(10) || b.b || ' ',
                     chr(10) || b.a || b.b || ' ') END AS seg,
                   s.freq
            FROM s${i - 1} s LEFT JOIN b$i b ON true)"""
    sb ++= (1 to numMerges).map(i =>
      s"""
          SELECT $i AS rank, a AS lhs, b AS rhs, a || b AS merged FROM b$i""")
      .mkString("", " UNION ALL", "")
    sb ++= "\n          ORDER BY rank"
    sb.toString
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_bpe_encode" -> ((s, d) => encode(s, d)),
    "ta_bpe_train"  -> ((s, d) => trainQuery(s, d)),
  )

  val oracles: Map[String, String] = Map(
    "ta_bpe_encode" -> encodeOracle,
    "ta_bpe_train"  -> trainOracle(numMerges = 48, maxDict = 50000),
  )
}

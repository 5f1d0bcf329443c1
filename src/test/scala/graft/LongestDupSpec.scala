package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.Dedup

/** Exact longest-duplicated-substring semantics on planted corpora —
  * properties the fixture oracle can't isolate: overlapping-occurrence
  * counting, the tie order at the maximal length, cross- vs within-doc
  * duplicates, and the no-duplicate empty result.
  */
class LongestDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("longest dup is exact; overlapping occurrences count; ties order by substring") {
    // cross-doc dup "XYZ" (2 occ, 2 docs) and within-doc overlapping
    // dup "mmm" in "mmmm" (positions 1 and 2 — 2 occ, 1 doc); both have
    // length 3 and nothing longer repeats, so both rows appear, ordered
    // n_occ desc then substring asc ('X' < 'm')
    val out = Dedup.longestDupOn(docs(1L -> "abcXYZdef", 2L -> "ghiXYZjkl", 3L -> "mmmm"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((3, "XYZ", 2L, 2L), (3, "mmm", 2L, 1L)))
  }

  test("a longer duplicate shadows every shorter one") {
    val out = Dedup.longestDupOn(
      docs(1L -> "the quick brown fox", 2L -> "xx the quick brown cat"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // longest common run is "the quick brown " (16 chars incl. space)
    assert(out.toSeq === Seq((16, "the quick brown ", 2L)))
  }

  test("no duplicate at all yields an empty frame with the output schema") {
    val out = Dedup.longestDupOn(docs(1L -> "abcdefg"))
    assert(out.columns.toSeq === Seq("len", "substring", "n_occ", "n_docs"))
    assert(out.count() === 0L)
  }

  test("identical documents duplicate their full length") {
    val out = Dedup.longestDupOn(docs(1L -> "same text here", 2L -> "same text here"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((14, "same text here", 2L, 2L)))
  }
}

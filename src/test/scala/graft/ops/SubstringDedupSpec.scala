package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact-substring (w-token-window) dedup on hand-planted overlaps:
  * document-level keep-first semantics, short-doc immunity, and the
  * window-sharing characterization of ">= w-token overlap".
  */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  // 30 distinct tokens: a0..a29 — long enough for 20-token windows
  private def toks(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("a doc sharing a >= w-token run with a lower id is dropped") {
    val shared = toks("a", 25) // 25 shared tokens -> 6 shared 20-windows
    val docs = Seq(
      (1L, shared + " " + toks("x", 10)),      // source: kept
      (2L, toks("y", 30)),                     // unrelated: kept
      (3L, shared + " " + toks("z", 10)))      // copies 1's first 25: dropped
      .toDF("doc_id", "text")
    val kept = TextAnalysis.substringDedup(docs, "doc_id", "text", w = 20)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
  }

  test("overlap shorter than w does not trigger a drop") {
    val shared = toks("a", 19) // max run 19 < w=20
    val docs = Seq(
      (1L, shared + " " + toks("x", 15)),
      (2L, shared + " " + toks("z", 15)))
      .toDF("doc_id", "text")
    val kept = TextAnalysis.substringDedup(docs, "doc_id", "text", w = 20)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
  }

  test("docs with fewer than w tokens are always kept") {
    val docs = Seq(
      (1L, toks("a", 5)), (2L, toks("a", 5))) // identical but windowless
      .toDF("doc_id", "text")
    val kept = TextAnalysis.substringDedup(docs, "doc_id", "text", w = 20)
    assert(kept.count() == 2)
  }

  test("the overlap is detected at ANY alignment, not just the prefix") {
    val run = toks("r", 22)
    val docs = Seq(
      (1L, toks("p", 7) + " " + run),          // run at the tail
      (2L, run + " " + toks("q", 9)))          // run at the head: dropped
      .toDF("doc_id", "text")
    val kept = TextAnalysis.substringDedup(docs, "doc_id", "text", w = 20)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("dup stats report window counts and the drop verdict") {
    val shared = toks("a", 25)
    val docs = Seq(
      (1L, shared + " " + toks("x", 10)),
      (3L, shared + " " + toks("z", 10)))
      .toDF("doc_id", "text")
    val st = TextAnalysis.substringDupStats(docs, "doc_id", "text", w = 20)
      .as[(Long, Long, Long, Boolean)].collect().toMap2
    // doc 1: 35 tokens -> 16 distinct windows, none first-seen elsewhere
    assert(st(1L) == (16L, 0L, false))
    // doc 3: 6 of its 16 windows live entirely in the shared 25 tokens
    assert(st(3L) == (16L, 6L, true))
  }

  private implicit class Tup4Ops(rows: Array[(Long, Long, Long, Boolean)]) {
    def toMap2: Map[Long, (Long, Long, Boolean)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.WinnowFps

/** Pins [[graft.functions.WinnowFps]] to the windowed formulation the DuckDB
  * oracle still runs verbatim: for every document, the native kernel's
  * fingerprint SET must equal {min(h[j..j+W)) | full windows j}, with
  * h(i) = md5_32(substr(text, i, K)) — computed here with the original
  * posexplode + window-min pipeline (the r11 dedup_winnow shape, kept as the
  * executable reference).
  */
class WinnowFpsSpec extends AnyFunSuite {
  private val K = 32
  private val W = 16

  /** The r11 shape, verbatim, as the reference implementation. */
  private def referenceFps(df: org.apache.spark.sql.DataFrame) = {
    val grams = df.select(col("doc_id"), posexplode(expr(
      s"""CASE WHEN length(text) < $K THEN array()
          ELSE transform(sequence(1, length(text) - ${K - 1}),
                         i -> substr(text, i, $K)) END"""))
      .as(Seq("pos", "g")))
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, W - 1)
    grams
      .select(col("doc_id"), col("pos"),
        graft.functions.Hashing.md5Hash32(col("g")).as("h"))
      .withColumn("fp", min(col("h")).over(byPos))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .filter(col("pos") <= col("n") - W)
      .select(col("doc_id"), col("fp")).distinct()
  }

  private def kernelFps(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"),
      explode(WinnowFps.winnow_fps(col("text"), K, W)).as("fp"))

  private def asSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("kernel fingerprint set == windowed formulation on the fixture corpus") {
    val spark = TestSpark.spark
    val docs = Tables.t(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text"))
    val ref = asSet(referenceFps(docs))
    val got = asSet(kernelFps(docs))
    assert(ref.nonEmpty, "fixture produced no fingerprints — vacuous test")
    assert(got == ref)
    // and per-doc arrays are already distinct: explode emits no dup pairs
    val rows = kernelFps(docs).count()
    assert(rows == got.size, s"kernel emitted duplicate fingerprints: $rows vs ${got.size}")
  }

  test("kernel handles edge lengths and multi-byte text like the reference") {
    val spark = TestSpark.spark
    import spark.implicits._
    val edge = Seq(
      1L -> "",                                  // empty
      2L -> "a" * (K - 1),                       // below gram size
      3L -> "a" * (K + W - 2),                   // grams exist, no full window
      4L -> "a" * (K + W - 1),                   // exactly one window
      5L -> ("ü" * 10 + "abcdefgh" * 10),        // multi-byte chars (substr is char-based)
      6L -> ("日本語テキスト重複検出" * 8),          // CJK, 3-byte UTF-8
      7L -> ("x" * 200),                         // long constant run: 1 fingerprint
      8L -> ("the quick brown fox jumps over the lazy dog. " * 5)
    ).toDF("doc_id", "text")
    assert(asSet(kernelFps(edge)) == asSet(referenceFps(edge)))
    // constant text: every window has the same min — exactly one fingerprint
    assert(kernelFps(edge).filter(col("doc_id") === 7L).count() == 1)
    // sub-span docs produce nothing
    assert(kernelFps(edge).filter(col("doc_id").isin(1L, 2L, 3L)).count() == 0)
  }

  test("winnow_fps participates in whole-stage codegen (no fallback)") {
    val spark = TestSpark.spark
    val df = Tables.t(spark, TestSpark.sf, "documents")
      .select(WinnowFps.winnow_fps(col("text"), K, W))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(") && p.contains("winnow_fps"))
  }
}

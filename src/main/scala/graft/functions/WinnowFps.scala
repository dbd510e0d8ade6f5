package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints (Schleimer et al., SIGMOD'03) of one document as a
  * single native Catalyst expression: the distinct set of
  * `fp(j) = min(h(j) .. h(j+W-1))` over every full window, where
  * `h(i) = md5_32(substr(text, i, K))` — the per-gram portable hash the rest
  * of the dedup family uses ([[Hashing.md5Hash32]]: first 8 hex chars of md5
  * of the gram's UTF-8 bytes, i.e. the digest's first 4 bytes big-endian,
  * zero-extended to a long).
  *
  * Exists for the same reason [[SqDist]] does: this is dedup_winnow's inner
  * loop — |text|−K+1 md5 digests and as many sliding-window minima PER
  * DOCUMENT (~2.3 billion grams at the 5M-doc third decade). The r11 shape
  * posexploded every gram through a doc-partitioned window (a corpus-
  * character-sized exchange that spilled at sf100); the first r12 rewrite
  * kept selection in-row but paid interpreted HOF lambdas plus a boxed
  * 16-element array allocation per gram (`array_min(slice(hs, j, W))`) and
  * measured SLOWER at sf10 (26.4 → 45.8 s). This expression is the fused
  * form: one primitive long[] of gram hashes, an in-place window scan with
  * run-compression (winnowing emits long runs of the same minimum — drop
  * repeats before deduplicating), sort + unique for the distinct set, zero
  * boxing on the hash path. Output ORDER is unspecified (it is a set;
  * callers aggregate or join on it), only membership is pinned —
  * WinnowFpsSpec checks set-equality against the windowed-SQL formulation
  * the DuckDB oracle still runs verbatim.
  */
case class WinnowFps(child: Expression, k: Int, w: Int)
  extends UnaryExpression {

  require(k >= 1 && w >= 1, s"gram size k=$k and window w=$w must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override def nullSafeEval(input: Any): Any =
    WinnowFps.compute(input.asInstanceOf[UTF8String].toString, k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // one static call per ROW (per document) — the per-gram work lives in
    // compiled Scala; inlining it as Java source would buy nothing and
    // break the stage into an uncompilable method
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowFps.compute($c.toString(), $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object WinnowFps {

  /** Column API: distinct winnowing fingerprints of `text`. */
  def winnow_fps(text: Column, k: Int, w: Int): Column =
    GraftColumnBridge.column(
      WinnowFps(GraftColumnBridge.expression(text), k, w))

  /** The whole kernel, one document per call. Public static so generated
    * code can reach it.
    */
  def compute(s: String, k: Int, w: Int): ArrayData = {
    val n = s.length
    if (n < k + w - 1) return new GenericArrayData(Array.empty[Long])
    val g = n - k + 1 // gram count; g >= w here
    val h = new Array[Long](g)
    val md = java.security.MessageDigest.getInstance("MD5")
    val bytes = s.getBytes(StandardCharsets.UTF_8)
    if (bytes.length == n) {
      // ASCII fast path: char offsets == byte offsets, no per-gram substring
      var i = 0
      while (i < g) {
        md.reset()
        md.update(bytes, i, k)
        h(i) = hash32(md.digest())
        i += 1
      }
    } else {
      // multi-byte text: substr() is CHARACTER-based in both engines, so
      // slice chars first, then encode the gram
      var i = 0
      while (i < g) {
        h(i) = hash32(md.digest(
          s.substring(i, i + k).getBytes(StandardCharsets.UTF_8)))
        i += 1
      }
    }
    // sliding minima over full windows, run-compressed: adjacent windows
    // overlap in w-1 grams, so the minimum repeats in long runs — skipping
    // repeats shrinks the dedup input ~w-fold before the sort
    val mins = new Array[Long](g - w + 1)
    var m = 0
    var prev = -1L // h values are unsigned 32-bit: -1 can't collide
    var j = 0
    while (j <= g - w) {
      var mn = h(j)
      var x = j + 1
      while (x < j + w) {
        if (h(x) < mn) mn = h(x)
        x += 1
      }
      if (mn != prev) { mins(m) = mn; m += 1; prev = mn }
      j += 1
    }
    // distinct set: sort the run-compressed minima, drop adjacent repeats
    java.util.Arrays.sort(mins, 0, m)
    var uniq = 0
    var r = 0
    while (r < m) {
      if (r == 0 || mins(r) != mins(r - 1)) { mins(uniq) = mins(r); uniq += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOfRange(mins, 0, uniq))
  }

  /** First 8 hex chars of the digest as an unsigned value — identical to
    * `conv(substring(md5(x), 1, 8), 16, 10)` ([[Hashing.md5Hash32]]).
    */
  private def hash32(d: Array[Byte]): Long =
    ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
      ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tools.ScaleUp

/** Pins the ScaleUp fixture generator's transform-family properties
  * (VERDICT r9 ask #4): >= 520 pairwise-collision-free text transforms,
  * k < 104 bit-identical to the r9 family, shingle disjointness across
  * copies, and the block-0 case-sensitivity assumption ADVICE flagged.
  */
class ScaleUpSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // pure-Scala mirror of copyText (translate + conditional reverse) so the
  // full MaxCopies family can be checked driver-side in milliseconds
  private def applyK(s: String, k: Int): String = {
    val (from, to) = ScaleUp.charMap(k)
    val m = from.zip(to).toMap
    val t = s.map(ch => m.getOrElse(ch, ch))
    if (k % 104 >= 52) t.reverse else t
  }

  private val text =
    "The quick brown fox jumps over the lazy dog while Forty Birds sing " +
      "softly near an Old Stone Bridge at dawn and nobody watches them"

  test("family size >= 520 and all transforms of a text are pairwise distinct") {
    assert(ScaleUp.MaxCopies >= 520)
    val all = (0 until ScaleUp.MaxCopies).map(k => applyK(text, k))
    assert(all.distinct.size == ScaleUp.MaxCopies)
    // invariants the scaling model rides on: length and token count are
    // copy-invariant (whitespace is never remapped)
    assert(all.forall(_.length == text.length))
    assert(all.forall(_.split(" ").length == text.split(" ").length))
  }

  test("cross-copy 8-gram shingles share NOTHING (the linear-scaling property)") {
    def shingles(s: String): Set[String] = s.sliding(8).toSet
    val owner = scala.collection.mutable.Map.empty[String, Int]
    for (k <- 0 until ScaleUp.MaxCopies; sh <- shingles(applyK(text, k))) {
      owner.get(sh).foreach(k0 => fail(s"shingle '$sh' shared by copies $k0 and $k"))
      owner(sh) = k
    }
  }

  test("k < 104 is bit-identical to the r9 family (existing corpora reproduce)") {
    // rotation 1 of the 52-cycle: a->b ... z->A ... Z->a; digits rotate by 1
    assert(applyK("azZ9", 1) == "bAa0")
    // k=52 is rotation 0 reversed
    assert(applyK("abc", 52) == "cba")
    // k=53 is rotation 1 reversed
    assert(applyK("abc", 53) == "dcb")
  }

  test("block-0 case-fold assumption is real; blocks >= 1 are immune") {
    // rotations 26 apart in block 0 ARE equal after lower() — the documented
    // latent hazard: no pair-generating query may case-fold text
    assert(applyK(text, 3).toLowerCase == applyK(text, 29).toLowerCase)
    // blocks >= 1 use caseless CJK alphabets: the whole extended family
    // stays pairwise distinct even under lower()-folding
    val folded = (104 until ScaleUp.MaxCopies).map(k => applyK(text, k).toLowerCase)
    assert(folded.distinct.size == folded.size)
    // and CJK blocks really are caseless (lower == identity on the alphabet)
    val (_, to) = ScaleUp.charMap(104)
    assert(to.take(52).toLowerCase == to.take(52))
  }

  test("embedding signed-perms: bijective, ±1 signs, within-copy geometry exact") {
    // a signed permutation is orthogonal: within-copy dot products (hence
    // cosines, hence the copy's near-dup structure) are exactly preserved,
    // while cross-copy cosines are ~random — the property that keeps the
    // synthesized corpus's embedding dup structure LINEAR in copies
    val seen = scala.collection.mutable.Set.empty[(Seq[Int], Seq[Int])]
    for (k <- 104 until 104 + 64) {
      val (perm, sign) = ScaleUp.signedPerm(k)
      assert(perm.sorted.sameElements(0 until 64), s"k=$k not a permutation")
      assert(sign.forall(s => s == 1 || s == -1), s"k=$k signs")
      assert(seen.add((perm.toSeq, sign.toSeq)), s"k=$k transform repeats")
      // exact dot-product preservation on a concrete pair
      val a = Array.tabulate(64)(i => math.sin(i + 1))
      val b = Array.tabulate(64)(i => math.cos(2 * i + 1))
      def ap(v: Array[Double]) = Array.tabulate(64)(j => sign(j) * v(perm(j)))
      val d0 = a.zip(b).map { case (x, y) => x * y }.sorted.sum
      val d1 = ap(a).zip(ap(b)).map { case (x, y) => x * y }.sorted.sum
      assert(d0 == d1, s"k=$k dot product not preserved")
    }
  }

  test("Column copyText agrees with the driver-side mirror on sampled k") {
    import spark.implicits._
    val df = Seq(text).toDF("text")
    for (k <- Seq(0, 1, 51, 52, 103, 104, 155, 207, 519, ScaleUp.MaxCopies - 1)) {
      val got = df.select(ScaleUp.copyText(col("text"), k)).head.getString(0)
      assert(got == applyK(text, k), s"k=$k")
    }
  }
}

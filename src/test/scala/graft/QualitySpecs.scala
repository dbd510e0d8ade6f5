package graft

import graft.operators.SchemaDiff
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the data-quality family beyond the oracle equality: the
  * oracle proves both engines agree on the FIXTURE; these prove the
  * operators detect what they claim to detect when the condition is
  * PLANTED.
  */
class SchemaDiffSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("diff classifies added, removed, type_changed and same columns") {
    val left = Seq((1L, "a", 1.0)).toDF("id", "gone", "v")
    val right = Seq((1L, 1.0f, true)).toDF("id", "v", "fresh")
    val got = SchemaDiff.diff(spark, left, right)
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(got == Map(
      "id" -> "same", "gone" -> "removed", "v" -> "type_changed",
      "fresh" -> "added"))
  }

  test("identical schemas diff to all-same regardless of row contents") {
    val a = Seq((1L, "x")).toDF("id", "s")
    val b = Seq((999L, "zzz")).toDF("id", "s")
    val statuses = SchemaDiff.diff(spark, a, b)
      .select(col("status")).as[String].collect().toSet
    assert(statuses == Set("same"))
  }
}

/** PSI must actually move when drift is planted — the oracle run can only
  * show the calm fixture scoring ~0; this proves the alarm side.
  */
class DriftDetectionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("planted mean shift raises PSI above the 0.1 threshold") {
    // ref: N(0,1)-ish deterministic values; cur: same values + 2.0 shift.
    // 10 equal-width bins over the ref range see most cur mass pushed into
    // the top bins — PSI must cross the conventional 0.1 alert line.
    val vals = (1 to 1000).map(i => math.sin(i * 0.7) + math.sin(i * 1.3))
    val ref = vals.zipWithIndex.map { case (v, i) => ("t", v, i) }
    val cur = vals.zipWithIndex.map { case (v, i) => ("t", v + 2.0, i + 1000) }
    val df = (ref ++ cur).toDF("event_type", "value", "id")
    // reproduce the query's binning+PSI arithmetic on the planted frame
    val edges = df.filter(col("id") < 1000)
      .groupBy(col("event_type"))
      .agg(min(col("value")).as("vmin"), max(col("value")).as("vmax"))
    val perBin = df.join(broadcast(edges), "event_type")
      .withColumn("side", when(col("id") < 1000, "ref").otherwise("cur"))
      .withColumn("bin",
        least(lit(9), greatest(lit(0), floor(
          (col("value") - col("vmin")) * 10.0 / (col("vmax") - col("vmin")))
          .cast("int"))))
      .groupBy(col("bin"))
      .agg(
        sum(when(col("side") === "ref", 1L).otherwise(0L)).as("cr"),
        sum(when(col("side") === "cur", 1L).otherwise(0L)).as("cc"))
    val psi = perBin
      .select(
        (((col("cr") + 1.0) / 1010.0) - ((col("cc") + 1.0) / 1010.0)).as("d"),
        log(((col("cr") + 1.0) / 1010.0) / ((col("cc") + 1.0) / 1010.0)).as("lg"))
      .agg(sum(col("d") * col("lg"))).head().getDouble(0)
    assert(psi > 0.1, s"planted 2-sigma shift scored PSI=$psi, below alert line")
  }

  test("dq_drift_psi output invariants: psi >= 0 and flag consistent") {
    // every PSI term (p-q)·ln(p/q) is non-negative (both factors share a
    // sign), so the sum must be >= 0; and the drifted flag must be exactly
    // psi > 0.1. (No "calm fixture" assertion here: at the sf0.001 test
    // scale, per-bin counts of ~10 make sampling noise alone cross 0.1 —
    // the sf0.01 verify fixture is where the calm readout shows ~0.01.)
    val rows = SparkEntry.queries("dq_drift_psi")(spark, TestSpark.sf)
      .select(col("psi"), col("drifted")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (psi, drifted) = (r.getDouble(0), r.getBoolean(1))
      assert(psi >= 0.0, s"PSI must be non-negative, got $psi")
      assert(drifted == (psi > 0.1), s"flag inconsistent with psi=$psi")
    }
  }
}

/** The expectation ledger must catch planted violations, not just agree
  * with DuckDB about the fixture.
  */
class ExpectationGateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("fixture run flags the real uniqueness defect and nothing else") {
    val rows = SparkEntry.queries("dq_expectations")(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(!rows("pk_orderkey_linenumber_unique")._2,
      "the synthetic lineitem's duplicate line numbers must be caught")
    assert(rows("pk_orderkey_linenumber_unique")._1 > 0)
    (rows - "pk_orderkey_linenumber_unique").foreach { case (name, (v, ok)) =>
      assert(ok && v == 0L, s"rule $name unexpectedly failing: $v violations")
    }
  }
}

/** CMS merge must stay counter-exact under adversarial partitioning — the
  * declared query merges per-day partials; this merges per-PARTITION
  * partials after hostile repartitionings and demands byte equality.
  */
class CmsMergeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("partial sketches merge byte-identically across partitionings") {
    import org.apache.spark.util.sketch.CountMinSketch
    val e = Tables.t(spark, TestSpark.sf, "events")
    def merged(parts: org.apache.spark.sql.DataFrame): Array[Byte] = {
      val sks = parts
        .groupBy(spark_partition_id().as("p"))
        .agg(count_min_sketch(
          col("event_type"), lit(0.001), lit(0.99), lit(42)).as("sk"))
        .collect().map(r => CountMinSketch.readFrom(r.getAs[Array[Byte]]("sk")))
      sks.reduce { (a, b) => a.mergeInPlace(b); a }.toByteArray
    }
    val one = merged(e.coalesce(1))
    val skewed = merged(e.repartition(7, col("event_type")))
    val shuffled = merged(e.repartition(13))
    assert(java.util.Arrays.equals(one, skewed))
    assert(java.util.Arrays.equals(one, shuffled))
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-volume diagnostic for the MinHash banding family
  * (dedup_minhash, dedup_lsh_tuning): `runMain graft.tools.LshDiag <sfDir>`
  * prints, per (bands × rows) config, the volumes that set the sweep's
  * cost — band-collision join rows (pre-dedup), distinct candidate pairs,
  * and the signature-table row count — plus wall time per stage, so a
  * probe-time bend attributes to a concrete stage (band join vs pair
  * distinct vs the signature re-join) instead of a guess.
  */
object LshDiag {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(s"DIAG $label took ${(System.nanoTime() - t0) / 1e9}s"); r
    }

    val docs = graft.Tables.t(spark, dir, "documents")
    println(s"DIAG docs ${docs.count()}")
    val sigs = t("signatures") {
      graft.operators.MinHashLsh
        .signatures(docs, "doc_id", "text").localCheckpoint()
    }
    println(s"DIAG sig_rows ${sigs.count()}")

    for ((b, r) <- Seq(32 -> 2, 16 -> 4, 8 -> 8)) {
      val banded = sigs.select(
        col("doc_id"),
        posexplode(expr(
          s"transform(sequence(0, ${b - 1}), bb -> xxhash64(slice(signature, bb * $r + 1, $r)))"))
          .as(Seq("band", "band_hash")))
      val collisions = t(s"collision_rows_${b}x$r") {
        val a = banded.select(col("doc_id").as("id1"), col("band"), col("band_hash"))
        val bb = banded.select(col("doc_id").as("id2"), col("band"), col("band_hash"))
        a.join(bb, Seq("band", "band_hash"))
          .filter(col("id1") < col("id2")).count()
      }
      println(s"DIAG collision_rows_${b}x$r $collisions")
      val cand = t(s"distinct_pairs_${b}x$r") {
        graft.operators.MinHashLsh
          .bandedCandidates(sigs, "doc_id", b, r).count()
      }
      println(s"DIAG distinct_pairs_${b}x$r $cand")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Similarity

/** Stage-volume diagnostic for the embedding pair-generators
  * (sim_knn_graph / mine_bitext): `runMain graft.tools.KnnDiag <sfDir>`
  * prints, per query, the numbers that set its cost — plane tier, bucket
  * count, occupancy tail (max / p99.9), and the IMPLIED candidate-pair
  * volume Σ m·(m−1)/2 — computed from a groupBy over int keys only, so the
  * readout costs seconds where materializing the pairs costs minutes.
  * Exists because the r10 sf100 probe of sim_knn_graph errored after 339 s
  * with nothing recorded about which stage blew up (VERDICT r11 ask #1).
  */
object KnnDiag {
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

    val e = graft.Tables.t(spark, dir, "embeddings")
    val n = e.count()
    println(s"DIAG n_vectors $n")

    // sim_knn_graph: the DEPLOYED band geometry (SimilarityQ.pairBandsFor —
    // not a local copy, so this readout can't drift from the query;
    // ADVICE r11 #3)
    locally {
      val p = Similarity.lshPlaneCount(n, base = 6)
      println(s"DIAG knn_planes $p buckets ${1L << p} expected_occ ${n.toDouble / (1L << p)}")
      val bands = graft.queries.SimilarityQ.pairBandsFor(n)
      val banded = e.select(
        col("vec_id"),
        posexplode(array(bands.map(ps =>
          Similarity.lshBucket(col("embedding"), ps)): _*)).as(Seq("band", "bucket")))
      val occ = banded.groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("m"))
      val stats = occ.agg(
        sum(col("m") * (col("m") - 1) / 2).as("pairs"),
        max(col("m")).as("max_m"),
        expr("percentile_approx(m, 0.999)").as("p999_m"),
        count(lit(1)).as("cells")).collect()(0)
      println(s"DIAG knn_pairs_implied ${stats.get(0)} max_occ ${stats.get(1)} " +
        s"p999_occ ${stats.get(2)} used_cells ${stats.get(3)}")
      val top = occ.orderBy(col("m").desc).limit(10).collect()
        .map(r => s"${r.get(0)}/${r.get(1)}:${r.get(2)}").mkString(" ")
      println(s"DIAG knn_top_cells $top")
    }

    // mine_bitext: 1 table at base 8
    locally {
      val p = Similarity.lshPlaneCount(n, base = 8)
      println(s"DIAG bitext_planes $p buckets ${1L << p} expected_occ ${n.toDouble / (1L << p)}")
      val planes = Similarity.planesFor(n, base = 8, dim = 64)
      val occ = e.select(Similarity.lshBucket(col("embedding"), planes).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("m"))
      val stats = occ.agg(
        sum(col("m") * (col("m") - 1) / 2).as("pairs"),
        max(col("m")).as("max_m"),
        expr("percentile_approx(m, 0.999)").as("p999_m"),
        count(lit(1)).as("cells")).collect()(0)
      println(s"DIAG bitext_pairs_implied ${stats.get(0)} max_occ ${stats.get(1)} " +
        s"p999_occ ${stats.get(2)} used_cells ${stats.get(3)}")
    }
    spark.stop()
  }
}

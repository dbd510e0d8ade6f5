package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage timer for the r12 CF-build investigation:
  * `runMain graft.tools.RecDiag <sfDir>` times each cfShared building block
  * separately so the build regression attributes to a stage.
  */
object RecDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(s"RECDIAG $label ${(System.nanoTime() - t0) / 1e9}s"); r
    }
    def rd(n: String) = spark.read.parquet(s"$sfDir/$n.parquet")
    val baskets = rd("lineitem")
      .join(rd("orders"), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("u"), col("l_partkey").as("i"))
      .distinct()
    val small = baskets.groupBy(col("u")).agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= 100).select(col("u"))
    val capped = t("capped-checkpoint") { baskets.join(small, "u").localCheckpoint() }
    val byUser = t("byUser-checkpoint") {
      capped.groupBy(col("u"))
        .agg(sort_array(collect_set(col("i"))).as("items")).localCheckpoint()
    }
    val deg = capped.groupBy(col("i")).agg(count(lit(1)).as("d"))
    val pairs = capped.select(col("u"), col("i").as("i1"))
      .join(capped.select(col("u"), col("i").as("i2")), "u")
      .filter(col("i1") < col("i2"))
      .select((col("i1") * 4294967296L + col("i2")).as("pk"))
      .groupBy(col("pk")).agg(count(lit(1)).as("n_co"))
      .filter(col("n_co") >= 2)
      .select(expr("pk div 4294967296L").as("i1"),
        expr("pk % 4294967296L").as("i2"), col("n_co"))
    val scored = t("scored-checkpoint") {
      pairs
        .join(deg.select(col("i").as("i1"), col("d").as("d1")), "i1")
        .join(deg.select(col("i").as("i2"), col("d").as("d2")), "i2")
        .select(col("i1"), col("i2"), col("n_co"),
          expr("""CAST(round(CAST(n_co AS DOUBLE) * 1e9
                 / sqrt(CAST(d1 * d2 AS DOUBLE))) AS BIGINT)""").as("cos_nano"))
        .localCheckpoint()
    }
    // serving, new shape (array filter)
    val nbrs = scored.select(col("i1").as("i"), col("i2").as("j"), col("cos_nano"))
      .union(scored.select(col("i2").as("i"), col("i1").as("j"), col("cos_nano")))
    val topNbrs = nbrs.withColumn("nr",
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("i")).orderBy(col("cos_nano").desc, col("j"))))
      .filter(col("nr") <= 10).select(col("i"), col("j"), col("cos_nano"))
    val votes = capped.join(topNbrs, "i")
      .select((col("u") * 4294967296L + col("j")).as("uj"), col("cos_nano"))
      .groupBy(col("uj"))
      .agg(sum(col("cos_nano")).as("score_nano"), count(lit(1)).as("n_nbr"))
      .select(expr("uj div 4294967296L").as("u"),
        expr("uj % 4294967296L").as("j"), col("score_nano"), col("n_nbr"))
    t("serving-arrayfilter") {
      votes.join(byUser, "u")
        .filter(!array_contains(col("items"), col("j")))
        .withColumn("rnk", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("u")).orderBy(col("score_nano").desc, col("j"))))
        .filter(col("rnk") <= 3).count()
    }
    t("serving-antijoin") {
      votes.join(capped.select(col("u"), col("i").as("j")), Seq("u", "j"), "left_anti")
        .withColumn("rnk", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("u")).orderBy(col("score_nano").desc, col("j"))))
        .filter(col("rnk") <= 3).count()
    }
    spark.stop()
  }
}

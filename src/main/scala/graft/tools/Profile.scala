package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage profiler for rec_item_cf-shaped workloads:
  * `runMain graft.tools.Profile <sfDir>` times each building block
  * separately so a fat pipeline's cost attributes to a stage.
  */
object Profile {
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
      println(s"PROFILE $label ${(System.nanoTime() - t0) / 1e9}s"); r
    }
    def rd(n: String) = spark.read.parquet(s"$sfDir/$n.parquet")
    val baskets = rd("lineitem")
      .join(rd("orders"), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("u"), col("l_partkey").as("i"))
      .distinct()
    val small = baskets.groupBy(col("u")).agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= 100).select(col("u"))
    val capped = t("checkpoint") { baskets.join(small, "u").localCheckpoint() }
    t("warm2") { capped.count() }
    val joined = capped.select(col("u"), col("i").as("i1"))
      .join(capped.select(col("u"), col("i").as("i2")), "u")
      .filter(col("i1") < col("i2"))
    t("pairgen-only") { joined.count() }
    val agg32 = joined.groupBy(col("i1"), col("i2"))
      .agg(count(lit(1)).as("n_co")).filter(col("n_co") >= 2)
    t("agg-default32") { agg32.count() }
    val agg256 = joined.repartition(256, col("i1"), col("i2"))
      .groupBy(col("i1"), col("i2"))
      .agg(count(lit(1)).as("n_co")).filter(col("n_co") >= 2)
    t("agg-repart256") { agg256.count() }
    val packed = joined.select((col("i1") * 4294967296L + col("i2")).as("pk"))
    val aggPacked = packed.groupBy(col("pk"))
      .agg(count(lit(1)).as("n_co")).filter(col("n_co") >= 2)
    t("agg-packed32") { aggPacked.count() }
    val aggPacked256 = packed.repartition(256, col("pk"))
      .groupBy(col("pk"))
      .agg(count(lit(1)).as("n_co")).filter(col("n_co") >= 2)
    t("agg-packed256") { aggPacked256.count() }
    spark.stop()
  }
}

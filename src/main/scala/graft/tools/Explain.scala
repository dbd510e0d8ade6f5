package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan inspection helper: `runMain graft.tools.Explain <query> [sfDir]`
  * prints the formatted physical plan and the timed count — the iterate-on-
  * the-plan loop from the build brief.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    // time construction + count (some ops execute eagerly at build time);
    // run twice — second run is the warm, bench-comparable number
    for (run <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(s"run=$run rows=$n time=${(System.nanoTime() - t0) / 1e9}s")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan evidence for pieces [[Explain]] cannot see: shared-artifact BUILD
  * expressions (the checkpointed readout a declared query returns shows no
  * scans) and loop-ROUND plans (each round hides behind the previous
  * round's checkpoint). `runMain graft.tools.PlanDump <case> [sfDir]` —
  * VERDICT r12 asks #1 (combined rec build: ONE lineitem scan) and #8
  * (dump a round's plan, not the readout).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val which = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    which match {
      case "rec_tagged_build" =>
        // the ONE corpus-sized pass both rec model families now derive
        // from: lineitem joins era-tagged orders once; distinct (u, i,
        // is_test). Expect exactly one lineitem scan and one orders scan.
        graft.queries.RecQ.buildTagged(spark, sfDir).explain("formatted")

      case "pagerank_round" =>
        // one power-iteration round over a dst-partitioned checkpointed
        // edge table (the R12OpsSpec:107 construction): expect zero
        // ShuffleExchange, one BroadcastHashJoin
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        val pre = Seq((1L, 2L, 2L), (1L, 3L, 2L), (2L, 1L, 1L), (3L, 1L, 1L))
          .toDF("src", "dst", "outdeg").repartition(col("dst")).localCheckpoint()
        val rank0 = Seq((1L, 1000000000L), (2L, 1000000000L), (3L, 1000000000L))
          .toDF("node", "rank")
        graft.queries.GraphQ.rankRound(pre, rank0, nNodes = 3L).explain("formatted")

      case "cc_round" =>
        // one CC round as production runs it — propagate (edge join ships
        // the node-sized label table by broadcast; the only exchange is
        // the node-sized min-aggregate by dst), then the jump over the
        // materialized propagate snapshot (zero exchanges)
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
          .toDF("src", "dst").localCheckpoint()
        val labels = Seq((1L, 1L), (2L, 1L), (3L, 3L))
          .toDF("id", "label").localCheckpoint()
        println("== propagate ==")
        val prop = graft.operators.DedupClusters
          .ccPropagate(edges, labels, nNodes = 3L)
        prop.explain("formatted")
        println("== jump (over the checkpointed propagate) ==")
        graft.operators.DedupClusters
          .ccJump(prop.localCheckpoint(), nNodes = 3L)
          .explain("formatted")

      case other => sys.error(s"unknown plan case: $other")
    }
    spark.stop()
  }
}

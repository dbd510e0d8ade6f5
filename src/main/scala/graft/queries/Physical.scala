package graft.queries

import graft.{Declared, Tables}
import org.apache.spark.sql.functions._

/** Physical-layout operators: the storage-side levers that matter at 100 TB
  * (bucketing for co-located joins). Logical results stay oracle-checkable;
  * the PLAN properties are pinned in BucketedJoinSpec.
  */
object Physical {
  import Tables.t

  /** Co-located (bucketed) join: both sides pre-bucketed on the join key
    * with the same bucket count, so the join runs with NO exchange on either
    * input — at 100 TB this turns the nightly fact⋈dim join's two full-table
    * shuffles into zero. Here the bucketed copies are written once to
    * scratch (external tables in the in-memory catalog) and the join result
    * is oracle-checked; BucketedJoinSpec pins the plan property that the
    * SortMergeJoin has no shuffle below it (the only Exchange left is the
    * final aggregation's).
    *
    * The merge hint only forces SMJ over broadcast — it does not change the
    * result; at real scale neither side fits a broadcast anyway.
    */
  val bucketedJoin = Declared(
    "q_bucketed_join",
    (s, dir) => {
      val buckets = 8
      def bucketed(table: String, key: String): String = {
        val name = s"graft_bucketed_$table"
        s.sql(s"DROP TABLE IF EXISTS $name")
        t(s, dir, table)
          .write.mode("overwrite")
          .bucketBy(buckets, key).sortBy(key)
          .option("path", Tables.scratch(s"bucketed_$table"))
          .saveAsTable(name)
        name
      }
      val cust = s.table(bucketed("customer", "c_custkey"))
      val ord = s.table(bucketed("orders", "o_custkey"))
      cust.hint("merge")
        .join(ord, cust("c_custkey") === ord("o_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
      round(sum(o_totalprice), 2) AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  val all: Seq[Declared] = Seq(bucketedJoin)
}

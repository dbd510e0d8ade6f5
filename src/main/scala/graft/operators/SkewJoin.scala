package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation primitives.
  *
  * At 100 TB a handful of hot keys (boilerplate documents, null-ish ids,
  * celebrity users) dominate a shuffle partition. AQE's skew-join split
  * handles joins at runtime; for aggregates the classic fix is two-phase
  * salting: aggregate on (key, salt) first — distributing a hot key across
  * `salts` partitions — then combine the partials on key alone. Works for
  * any algebraic aggregate (sum/count/min/max; avg via sum+count).
  */
object SkewJoin {

  /** Two-phase (salted) sum/count aggregate. Output: key, n, sums. */
  def saltedAgg(
      df: DataFrame,
      key: String,
      salts: Int,
      sumCols: Seq[String]): DataFrame = {

    // row-unique salt: a content hash would map IDENTICAL rows (the
    // duplicate-heavy hot-key case this operator exists for) to ONE salt and
    // spread nothing; the partition-unique row id spreads unconditionally
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))

    val partialAggs: Seq[Column] =
      count(lit(1)).as("__n") +: sumCols.map(c => sum(col(c)).as(s"__sum_$c"))
    val partial = salted
      .groupBy(col(key), col("__salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)

    val finalAggs: Seq[Column] =
      sum(col("__n")).as("n") +: sumCols.map(c => sum(col(s"__sum_$c")).as(s"sum_$c"))
    partial
      .groupBy(col(key))
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted broadcast-side replication join for a skewed fact⋈dim equi-join
    * when the dim is too big to broadcast whole but hot keys are known:
    * replicate dim rows `salts` times, salt the fact side, join on
    * (key, salt). One shuffle, hot keys spread `salts`-wide.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      salts: Int): DataFrame = {

    // row-unique salt (not a content hash) for the same reason as saltedAgg
    val saltedFact = fact.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }
}

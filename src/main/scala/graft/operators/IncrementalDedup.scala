package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental dedup — the production shape for a growing corpus: new
  * batches are deduplicated AGAINST the persisted fingerprint index (a
  * left-anti equi-join; the 100 TB corpus itself is never rescanned, only
  * its fingerprint column) and WITHIN the batch (first-id-wins window),
  * then the survivors' fingerprints are appended to the index for the next
  * batch. Both joins shuffle on the fingerprint — at scale the index is
  * bucketed by fp so the anti-join co-locates (see Physical.bucketedJoin for
  * the bucketing lever).
  */
object IncrementalDedup {

  /** Rows of `batch` that are new vs `index` and first of their fingerprint
    * within the batch. `batch` carries (idCol, fpCol); `index` carries
    * fpCol.
    */
  def newUnique(batch: DataFrame, index: DataFrame, idCol: String, fpCol: String): DataFrame = {
    val w = Window.partitionBy(col(fpCol)).orderBy(col(idCol))
    batch
      .join(index.select(col(fpCol)).distinct(), Seq(fpCol), "left_anti")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}

package graft.queries

import graft.{Declared, Tables}
import graft.functions.Similarity
import org.apache.spark.sql.functions._

/** Similarity search over the embedding column (BASELINE.json north star):
  * brute-force cosine top-k as the exact baseline, sign-LSH bucketed ANN as
  * the scale path, plus a bounded all-pairs variant.
  */
object SimilarityQ {
  import Tables.t

  /** Brute-force cosine top-10 for one query vector (vec_id = 0).
    * The query row is a 1-row broadcast; the scan over the corpus is
    * embarrassingly parallel — THE baseline shape for exact ANN at scale
    * (one pass, top-k via TakeOrderedAndProject, no shuffle of the corpus).
    */
  val topkBrute = Declared(
    "sim_topk_brute",
    (s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      e.crossJoin(broadcast(q))
        .select(
          col("vec_id"), col("label"),
          round(Similarity.cosine(col("embedding"), col("qv")), 6).as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
    },
    Some("""SELECT vec_id, label,
      round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), 6) AS cos
      FROM embeddings
      CROSS JOIN (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
      ORDER BY cos DESC, vec_id LIMIT 10"""))

  private val annPlanes = Similarity.planes(nPlanes = 6, dim = 64, seed = 7L)

  /** LSH-bucketed ANN: candidates = same 6-bit sign bucket as the query,
    * exact cosine within. At 100 TB the bucket column is precomputed and
    * partitioned-by, so a query touches 1/64th of the corpus.
    */
  val annLsh = Declared(
    "sim_ann_lsh",
    (s, dir) => {
      val e = t(s, dir, "embeddings").select(
        col("vec_id"), col("label"), col("embedding"),
        Similarity.lshBucket(col("embedding"), annPlanes).as("bucket"))
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"), col("bucket").as("qbucket"))
      e.join(broadcast(q), col("bucket") === col("qbucket"))
        .select(
          col("vec_id"), col("label"),
          round(Similarity.cosine(col("embedding"), col("qv")), 6).as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
    },
    Some(s"""WITH b AS (
        SELECT vec_id, label, embedding,
          ${Similarity.lshBucketSql("embedding", annPlanes)} AS bucket
        FROM embeddings),
      q AS (SELECT embedding AS qv, bucket AS qbucket FROM b WHERE vec_id = 0)
      SELECT vec_id, label,
        round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), 6) AS cos
      FROM b CROSS JOIN q WHERE bucket = qbucket
      ORDER BY cos DESC, vec_id LIMIT 10"""))

  /** Bounded all-pairs: top-5 most similar pairs within one label partition
    * (the per-group variant a clustering/linkage step consumes).
    */
  val pairsWithinLabel = Declared(
    "sim_pairs_label0",
    (s, dir) => {
      val e = t(s, dir, "embeddings").filter(col("label") === 0)
      val a = e.select(col("vec_id").as("id1"), col("embedding").as("e1"))
      val b = e.select(col("vec_id").as("id2"), col("embedding").as("e2"))
      a.crossJoin(b)
        .filter(col("id1") < col("id2"))
        .select(col("id1"), col("id2"),
          round(Similarity.cosine(col("e1"), col("e2")), 6).as("cos"))
        .orderBy(col("cos").desc, col("id1"), col("id2"))
        .limit(5)
    },
    Some("""SELECT a.vec_id AS id1, b.vec_id AS id2,
      round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cos
      FROM embeddings a JOIN embeddings b
        ON a.label = 0 AND b.label = 0 AND a.vec_id < b.vec_id
      ORDER BY cos DESC, id1, id2 LIMIT 5"""))

  val all: Seq[Declared] = Seq(topkBrute, annLsh, pairsWithinLabel)
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.SqDist

/** [[graft.functions.SqDist]] must be bit-identical to the HOF formulation
  * it replaced in dedup_semantic's descent —
  * `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0D, (acc,v) -> acc+v)`
  * — including the null semantics zip_with induces (null element or length
  * mismatch → null). Same discipline as CosineSimSpec.
  */
class SqDistSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val hof =
    "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0D, (acc, v) -> acc + v)"

  test("bit-identical to the HOF fold on random double vectors") {
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(200)((
      Array.fill(64)(rng.nextDouble() * 2 - 1),
      Array.fill(64)(rng.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b").select(
      SqDist.sq_dist(col("a"), col("b")).as("native"), expr(hof).as("ref"))
    val bad = df.filter(col("native") =!= col("ref") ||
      col("native").isNull =!= col("ref").isNull).count()
    assert(bad == 0)
    // and on the real fixture's doubled embeddings against themselves+shift
    val e = Tables.t(spark, TestSpark.sf, "embeddings")
      .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("a"))
      .select(col("a"), expr("transform(a, x -> x + 0.25d)").as("b"))
      .select(SqDist.sq_dist(col("a"), col("b")).as("native"), expr(hof).as("ref"))
    assert(e.filter(col("native") =!= col("ref")).count() == 0)
  }

  test("null semantics: length mismatch and null element give null") {
    val df = Seq(
      (Array(1.0, 2.0), Array(1.0, 2.0, 3.0)),       // length mismatch
      (Array(1.0, 2.0), Array(3.0, 4.0))              // clean
    ).toDF("a", "b")
      .select(SqDist.sq_dist(col("a"), col("b")).as("native"), expr(hof).as("ref"))
      .collect()
    assert(df(0).isNullAt(0) && df(0).isNullAt(1))
    assert(df(1).getDouble(0) == df(1).getDouble(1))
    // null ELEMENT: build via SQL literal array with a null slot
    val n = Seq(1).toDF("i")
      .select(expr("array(1.0d, CAST(NULL AS DOUBLE))").as("a"),
        expr("array(1.0d, 2.0d)").as("b"))
      .select(SqDist.sq_dist(col("a"), col("b")).as("native"), expr(hof).as("ref"))
      .collect()(0)
    assert(n.isNullAt(0) && n.isNullAt(1))
  }
}

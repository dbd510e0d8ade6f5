package graft.queries

import graft.{Declared, Tables}
import org.apache.spark.sql.functions._

/** Set-operation surface: UNION [ALL] / INTERSECT [ALL] / EXCEPT [ALL]
  * (SURVEY §2.B "set ops"). INTERSECT/EXCEPT plan as semi/anti joins in
  * Catalyst — shuffle on the full row, fine at scale for projected columns.
  */
object SetOps {
  import Tables.t

  private def custSide(s: org.apache.spark.sql.SparkSession, dir: String) =
    t(s, dir, "customer").select(
      col("c_custkey").as("entity_id"),
      col("c_nationkey").as("nationkey"),
      round(col("c_acctbal"), 2).as("acctbal"),
      lit("customer").as("src"))

  private def suppSide(s: org.apache.spark.sql.SparkSession, dir: String) =
    t(s, dir, "supplier").select(
      col("s_suppkey").as("entity_id"),
      col("s_nationkey").as("nationkey"),
      round(col("s_acctbal"), 2).as("acctbal"),
      lit("supplier").as("src"))

  val unionAll = Declared(
    "q_union_all",
    (s, dir) =>
      custSide(s, dir).unionAll(suppSide(s, dir))
        .orderBy(col("src"), col("entity_id")),
    Some("""SELECT * FROM (
      SELECT c_custkey AS entity_id, c_nationkey AS nationkey,
             round(c_acctbal,2) AS acctbal, 'customer' AS src FROM customer
      UNION ALL
      SELECT s_suppkey, s_nationkey, round(s_acctbal,2), 'supplier' FROM supplier)
      ORDER BY src, entity_id"""))

  val unionDistinct = Declared(
    "q_union",
    (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .union(t(s, dir, "supplier").select(col("s_nationkey")))
        .distinct()
        .orderBy(col("nationkey")),
    Some("""SELECT c_nationkey AS nationkey FROM customer
      UNION SELECT s_nationkey FROM supplier ORDER BY nationkey"""))

  val intersectQ = Declared(
    "q_intersect",
    (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(t(s, dir, "supplier").select(col("s_nationkey")))
        .orderBy(col("nationkey")),
    Some("""SELECT c_nationkey AS nationkey FROM customer
      INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey"""))

  val exceptQ = Declared(
    "q_except",
    (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .except(t(s, dir, "supplier").select(col("s_nationkey")))
        .orderBy(col("nationkey")),
    Some("""SELECT c_nationkey AS nationkey FROM customer
      EXCEPT SELECT s_nationkey FROM supplier ORDER BY nationkey"""))

  val intersectAll = Declared(
    "q_intersect_all",
    (s, dir) =>
      t(s, dir, "orders").select(col("o_custkey").as("k"))
        .intersectAll(t(s, dir, "customer").select(col("c_custkey")))
        .orderBy(col("k")),
    Some("""SELECT o_custkey AS k FROM orders
      INTERSECT ALL SELECT c_custkey FROM customer ORDER BY k"""))

  val exceptAll = Declared(
    "q_except_all",
    (s, dir) =>
      t(s, dir, "orders").select(col("o_custkey").as("k"))
        .exceptAll(t(s, dir, "customer").select(col("c_custkey")))
        .orderBy(col("k")),
    Some("""SELECT o_custkey AS k FROM orders
      EXCEPT ALL SELECT c_custkey FROM customer ORDER BY k"""))

  val all: Seq[Declared] = Seq(
    unionAll, unionDistinct, intersectQ, exceptQ, intersectAll, exceptAll)
}

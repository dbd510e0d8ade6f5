package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the round-7 additions: exact-substring dedup coverage,
  * the hashed linear quality classifier, the Gopher rule battery,
  * hard-negative mining, and hour-of-week seasonality. Where the oracle
  * hash-compare can't state the property (interval-union exactness on a
  * crafted corpus, driver-side recomputation of the hashed score), these
  * specs pin it directly.
  */
class R7OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def run(name: String) = SparkEntry.queries(name)(spark, TestSpark.sf)

  /** A scratch fixture dir holding only a crafted documents.parquet —
    * table-pruned queries read just their own table, so the other nine
    * fixtures aren't needed.
    */
  private lazy val craftedDocsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-r7-docs").toString
    import spark.implicits._
    // exactly 60 chars, no internal period; the flanks differ between the two
    // docs at EVERY position, so no boundary-straddling gram is shared and
    // the expected coverage is exactly the 60-char span
    val shared = "QWERTYUIOPASDFGHJKLZXCVBNMqwertyuiopasdfghjklzxcvbnm12345678"
    assert(shared.length == 60)
    val docs = Seq(
      (1L, ("x" * 20) + shared + ("y" * 20), "en", "src_a", 0L),
      (2L, ("u" * 20) + shared + ("v" * 20), "en", "src_b", 0L),
      (3L, "unrelated words only here nothing matching with anyone at all " +
        "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "src_c", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("dedup_substring: exact interval-union coverage of a known shared span") {
    val rows = SparkEntry.queries("dedup_substring")(spark, craftedDocsDir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(1L, 2L), s"only the sharing pair is flagged: ${rows.keySet}")
    // the shared span is 60 chars => gram positions p..p+20 (21 overlapping
    // 40-grams) whose interval union is exactly 60 chars, one maximal run
    Seq(1L, 2L).foreach { id =>
      assert(rows(id).getAs[Long]("dup_chars") == 60L,
        s"doc $id dup_chars: ${rows(id).getAs[Long]("dup_chars")}")
      assert(rows(id).getAs[Long]("n_runs") == 1L)
    }
  }

  test("dedup_substring fixture invariants: coverage bounded, runs consistent") {
    val rs = run("dedup_substring").collect()
    rs.foreach { r =>
      val (nChars, dupChars, nRuns) =
        (r.getAs[Long]("n_chars"), r.getAs[Long]("dup_chars"), r.getAs[Long]("n_runs"))
      assert(dupChars >= 40L && dupChars <= nChars, s"doc ${r.getLong(0)}")
      // every maximal run covers at least one full gram length
      assert(nRuns >= 1L && dupChars >= 40L * nRuns,
        s"doc ${r.getLong(0)}: $dupChars chars in $nRuns runs")
    }
  }

  test("text_classifier_score matches a driver-side recomputation of doc 0's sum") {
    val doc = Tables.t(spark, TestSpark.sf, "documents")
      .orderBy(col("doc_id")).select(col("doc_id"), col("text")).head()
    val words = doc.getString(1).trim.split("\\s+")
    val wsum = words.map { w =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8"))
      val hex = d.take(4).map(b => f"$b%02x").mkString
      val h = java.lang.Long.parseLong(hex, 16)
      (((h % 64) * 37 + 11) % 97) - 48
    }.sum
    val r = run("text_classifier_score")
      .filter(col("doc_id") === doc.getLong(0)).head()
    val expectedScore = BigDecimal(wsum.toDouble / (96.0 * words.length))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Int]("n_tokens") == words.length)
    assert(math.abs(r.getAs[Double]("score") - expectedScore) < 1e-9)
    assert(r.getAs[Boolean]("keep") == (wsum >= 0))
  }

  test("text_gopher_rules: crafted violations trip exactly their rule") {
    val short = run("text_gopher_rules") // fixture docs are >= 50 words or not
    short.collect().foreach { r =>
      val pass = r.getAs[Boolean]("pass")
      val rules = Seq("r_wordcount", "r_wordlen", "r_symbol", "r_bullet",
        "r_ellipsis", "r_alpha", "r_stopwords").map(r.getAs[Boolean])
      assert(pass == rules.forall(identity), s"doc ${r.getLong(0)}")
    }
    // crafted corpus: doc 3 has < 50 words -> r_wordcount false
    val crafted = SparkEntry.queries("text_gopher_rules")(spark, craftedDocsDir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!crafted(3L).getAs[Boolean]("r_wordcount"))
    assert(!crafted(3L).getAs[Boolean]("pass"))
  }

  test("sim_hardneg_mine: negatives never share the anchor's label, ranked by cos") {
    val labels = Tables.t(spark, TestSpark.sf, "embeddings")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rs = run("sim_hardneg_mine").collect()
    assert(rs.nonEmpty)
    rs.groupBy(_.getLong(0)).foreach { case (q, g) =>
      g.foreach(r => assert(r.getAs[Int]("neg_label") != labels(q),
        s"anchor $q got a same-label 'negative'"))
      val byRk = g.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("cos"))
      assert(byRk.zip(byRk.tail).forall { case (a, b) => a >= b },
        s"anchor $q: cos not descending in rank")
    }
  }

  test("events_seasonality: buckets valid, top-3 ordered, shares bounded") {
    val rs = run("events_seasonality").collect()
    assert(rs.nonEmpty)
    rs.foreach { r =>
      assert(r.getAs[Int]("dow") >= 0 && r.getAs[Int]("dow") <= 6)
      assert(r.getAs[Int]("hour") >= 0 && r.getAs[Int]("hour") <= 23)
      val s = r.getAs[Double]("share")
      assert(s > 0.0 && s <= 1.0)
    }
    rs.groupBy(_.getString(0)).foreach { case (t, g) =>
      val byRk = g.sortBy(_.getAs[Int]("rk")).map(_.getAs[Long]("n"))
      assert(byRk.zip(byRk.tail).forall { case (a, b) => a >= b },
        s"type $t: counts not non-increasing over rank")
    }
  }
}

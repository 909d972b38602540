package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Canonicalize, Fixtures}

/** Remaining SURVEY §2 odds and ends: approximate distinct counting (op 20)
  * and set intersection (op 34). */
class RelationalExtraSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("approx_count_distinct tracks exact distinct within 5% (op 20)") {
    val urls = Fixtures.pages(spark, TestSpark.Sf0001)
      .select(Canonicalize.canonicalUrl($"url").as("url"))
      .filter($"url".isNotNull)
    val row = urls.agg(
      countDistinct($"url").as("exact"),
      approx_count_distinct($"url", rsd = 0.01).as("approx")).head()
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("intersect / exceptAll set semantics (op 34)") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val even = docs.filter($"doc_id" % 2 === 0).select("doc_id")
    val third = docs.filter($"doc_id" % 3 === 0).select("doc_id")
    val both = even.intersect(third).as[Long].collect().sorted
    assert(both.toSeq === (0L until 500L).filter(i => i % 6 == 0))
    // exceptAll preserves multiplicity; except is set-distinct
    val dup = even.union(even)
    assert(dup.exceptAll(even).count() === even.count())
    assert(dup.except(even).count() === 0L)
  }
}

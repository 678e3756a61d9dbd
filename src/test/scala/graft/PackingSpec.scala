package graft

import org.apache.spark.sql.functions._

import graft.operators.Packing

/** Sequence-packing contracts: every doc assigned exactly once, no
  * mixed bin exceeds the budget, oversize docs are isolated, assignment
  * is deterministic under input repartitioning, and the bounded
  * first-fit window actually packs (mean fill ≥ 0.75 on mixed sizes). */
class PackingSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic mixed sizes in [10, 300)
  private lazy val docs = spark.range(0, 2000)
    .select(col("id").as("doc_id"),
      (col("id") * 37 % 290 + 10).cast("int").as("n_tokens"))

  private val budget = 512

  test("every doc packed exactly once; ids preserved") {
    val out = Packing.packSequences(docs, "doc_id", "n_tokens", budget)
    val ids = out.select("doc_id").as[Long].collect()
    assert(ids.length === 2000)
    assert(ids.toSet === (0L until 2000L).toSet)
  }

  test("no bin of within-budget docs exceeds the budget") {
    val out = Packing.packSequences(docs, "doc_id", "n_tokens", budget).toDF()
    val over = out.groupBy("bin_id")
      .agg(sum(col("n_tokens")).as("tot"), max(col("n_tokens")).as("mx"))
      .filter(col("tot") > budget && col("mx") < budget)
    assert(over.count() === 0L)
  }

  test("oversize docs get a bin of their own") {
    val withBig = docs.union(
      Seq((9001L, 700), (9002L, 9999)).toDF("doc_id", "n_tokens"))
    val out = Packing.packSequences(withBig, "doc_id", "n_tokens", budget).toDF()
    val bigBins = out.filter(col("doc_id") >= 9000L).select("bin_id").as[Long].collect()
    val mates = out.filter(col("bin_id").isin(bigBins.map(Long.box): _*))
    assert(mates.count() === 2L) // nothing else shares those bins
  }

  test("assignment is deterministic and independent of input partitioning") {
    val a = Packing.packSequences(docs, "doc_id", "n_tokens", budget)
      .collect().toSet
    val b = Packing.packSequences(docs.repartition(13), "doc_id", "n_tokens", budget)
      .collect().toSet
    assert(a === b)
  }

  test("bounded first-fit fills bins well on mixed sizes") {
    val out = Packing.packSequences(docs, "doc_id", "n_tokens", budget).toDF()
    val bins = out.groupBy("bin_id").agg(sum("n_tokens").as("tot"))
    val fill = bins.agg(avg(col("tot"))).as[Double].collect().head / budget
    assert(fill >= 0.75, s"mean fill $fill")
  }
}

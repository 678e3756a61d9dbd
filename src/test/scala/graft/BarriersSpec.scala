package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.engine.Barriers
import graft.operators.{Dedup, Graph}

/** The reliable-checkpoint seam (r7 VERDICT #3): iterative operators cut
  * per-round lineage through [[Barriers.cut]], which is executor-resident
  * `localCheckpoint` locally and durable `checkpoint` when the session
  * has a checkpoint directory — results must be identical either way.
  */
class BarriersSpec extends SparkTestBase {
  import spark.implicits._

  private def withCheckpointDir[A](body: => A): A = {
    val dir = Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try body
    finally {
      // Option(null) = None — restores the local-mode default so the
      // shared session's other suites keep using localCheckpoint
      spark.sparkContext.setCheckpointDir(null)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("Barriers.cut picks reliable checkpoint iff a checkpoint dir is set") {
    val df = Seq(1, 2, 3).toDF("x")
    assert(spark.sparkContext.getCheckpointDir.isEmpty)
    assert(Barriers.cut(df).as[Int].collect().sorted === Seq(1, 2, 3))
    withCheckpointDir {
      val ckptRoot = new java.io.File(
        new java.net.URI(spark.sparkContext.getCheckpointDir.get))
      assert(Barriers.cut(df).as[Int].collect().sorted === Seq(1, 2, 3))
      // reliable mode is observable: RDD blocks land under the dir
      val files = org.apache.commons.io.FileUtils
        .listFiles(ckptRoot, null, true)
      assert(!files.isEmpty, s"no checkpoint files under $ckptRoot")
    }
    assert(spark.sparkContext.getCheckpointDir.isEmpty)
  }

  test("iterative operators: identical results local vs reliable checkpoint") {
    // two components + an isolated self-referencing pair; enough rounds
    // for several barrierCut calls per operator
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (20L, 21L)).toDF("src", "dst")
    val docs = edges // connectedComponents input: pair relation

    def run(): (Seq[(Long, Long)], Seq[(Long, Double)], Seq[(Long, Int)]) = {
      val cc = Dedup.connectedComponents(docs, "src", "dst")
        .as[(Long, Long)].collect().toSeq.sorted
      val pr = Graph.pageRank(edges, "src", "dst", iterations = 3)
        .select(col("id"), round(col("rank"), 12).as("rank"))
        .as[(Long, Double)].collect().toSeq.sorted
      val bfs = Graph.bfsHops(edges, "src", "dst",
          Seq(1L, 20L).toDF("id"), "id", maxHops = 3)
        .as[(Long, Int)].collect().toSeq.sorted
      graft.engine.Caches.releaseAll()
      (cc, pr, bfs)
    }

    val localMode = run()
    val reliableMode = withCheckpointDir(run())
    assert(localMode === reliableMode)
  }

  test("Barriers.cutCounted: rows + count identical in both modes") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s")
      .filter(col("k") =!= 2L)
    def check(): Unit = {
      val (cut, n) = Barriers.cutCounted(df)
      assert(n === 2L)
      assert(cut.as[(Long, String)].collect().toSeq.sorted ===
        Seq((1L, "a"), (3L, "c")))
      // the frame is a flat leaf (lineage cut) and REUSABLE
      assert(cut.count() === 2L)
      // honest leaf stats: the measured row count rides the plan
      assert(cut.queryExecution.optimizedPlan.stats
        .sizeInBytes.bitLength <= 127)
      val (cutE, nE) = Barriers.cutCounted(df.filter(col("k") < 0))
      assert(nE === 0L && cutE.isEmpty)
    }
    check() // localCheckpoint path
    withCheckpointDir(check()) // reliable path
  }

  test("Barriers.cut caps inherited sizeInBytes across cut-join-cut rounds") {
    // checkpointing copies the input plan's sizeInBytes onto the new
    // leaf and joins take the PRODUCT of child sizes, so an iterated
    // cut->join->cut loop compounds the stat multiplicatively — by
    // round ~20 the BigInt has millions of digits and the next cut's
    // eager stats pass hangs in BigInteger.multiply (the r15 SCC trim
    // regression). The cap rebuilds any leaf past 2^127 bytes.
    var df = Barriers.cut(Seq((1L, 2L), (2L, 3L)).toDF("u", "v"))
    for (_ <- 1 to 25) {
      val other = df.select(col("u").as("u2"), col("v").as("v2"))
      df = Barriers.cut(
        df.join(other, col("u") === col("u2"))
          .join(other.select(col("u2").as("u3"), col("v2").as("v3")),
            col("u") === col("u3"))
          .select(col("u"), col("v")).limit(4))
      assert(df.queryExecution.optimizedPlan.stats
        .sizeInBytes.bitLength <= 127,
        "inherited sizeInBytes escaped the cap")
    }
    assert(df.count() >= 0L) // the loop stays executable and fast
  }
}

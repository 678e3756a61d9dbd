package graft

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, Vectors}

/** Multimodal plumbing tests: stub-decoder contracts (header parse,
  * short-payload edges), feature determinism + normalization +
  * composition with the vector operators, frame-sampling reassembly, and
  * the narrow no-shuffle execution shape. */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def assets(rows: (Long, String)*) =
    Multimodal.assetsFromText(rows.toDF("doc_id", "text"), "text", "doc_id")

  test("decodeMeta parses the stub header and handles short payloads") {
    val out = Multimodal.decodeMeta(assets(
        (1L, "abc"), (2L, ""), (3L, "x")))
      .collect().map(m => m.asset_id -> ((m.n_bytes, m.width, m.height))).toMap
    assert(out(1L) === ((3, 1 + 'a' % 16, 1 + 'b' % 16)))
    assert(out(2L) === ((0, 0, 0)))
    assert(out(3L) === ((1, 1 + 'x' % 16, 0)))
  }

  test("extractFeatures: unit norm, deterministic, identical for identical bytes") {
    val out = Multimodal.extractFeatures(assets(
        (1L, "hello world"), (2L, "hello world"), (3L, "zzzzzz")))
      .collect().map(f => f.asset_id -> f.embedding).toMap
    out.values.foreach { e =>
      assert(math.abs(e.map(x => x * x).sum - 1.0) < 1e-12)
      assert(e.length === 16)
    }
    assert(out(1L) === out(2L))
    assert(out(1L) !== out(3L))
  }

  test("features compose with the vector similarity operators") {
    val f = Multimodal.extractFeatures(assets(
      (1L, "the quick brown fox"), (2L, "the quick brown fox"),
      (3L, "AAAAAAAAAAAAAAAAAAAAAAAAAAAA"))).toDF()
    val pairs = Vectors.cosineNearDup(f, "asset_id", "embedding", 0.999)
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L))) // identical payloads; 3 is byte-disjoint
  }

  test("frameSample reassembles to the original payload") {
    val original = "0123456789abcdef"
    val out = Multimodal.frameSample(assets((1L, original), (2L, "")), n = 5)
      .collect().map(f => f.asset_id -> f).toMap
    assert(out(1L).n_frames === 4) // ceil(16/5)=4-byte frames -> 4 frames
    assert(new String(out(1L).frames.flatten.toArray, "UTF-8") === original)
    assert(out(2L).n_frames === 0)
  }

  test("kernels run narrow: partition count preserved, no shuffle planned") {
    val a = Multimodal.assetsFromText(
      engine.Tables(spark, sfDir, "documents").repartition(3), "text", "doc_id")
    val meta = Multimodal.decodeMeta(a)
    assert(meta.rdd.getNumPartitions === 3)
    val planAfterRepartition = Multimodal.decodeMeta(a).queryExecution
      .executedPlan.toString
    assert(!planAfterRepartition.contains("Exchange hashpartitioning"))
  }

  test("ingestBinaryDir: byte round-trip, id parse, glob filtering") {
    val dir = java.nio.file.Files.createTempDirectory("graft_binsrc")
    def write(name: String, bytes: Array[Byte]): Unit =
      java.nio.file.Files.write(dir.resolve(name), bytes)
    write("asset_007.bin", Array[Byte](1, 2, 3, -1))
    write("asset_042.bin", "hello".getBytes("UTF-8"))
    write("ignored.txt", Array[Byte](9, 9)) // outside the glob
    val got = Multimodal.ingestBinaryDir(spark, dir.toString, "*.bin",
        "asset_(\\d+)\\.bin")
      .orderBy("asset_id").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(7L, 42L))
    assert(got.map(_.getLong(1)).toSeq === Seq(4L, 5L))
    assert(got(0).getAs[Array[Byte]]("content").toSeq ===
      Seq[Byte](1, 2, 3, -1))
    assert(new String(got(1).getAs[Array[Byte]]("content"), "UTF-8")
      === "hello")
  }
}

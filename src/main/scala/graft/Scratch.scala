package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextOps

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    engine.Tables.bootstrap(spark)
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = engine.Tables(spark, dir, "documents")
    docs.count()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // A: current — concat_ws shingles then hash
    val a = docs.select(col("doc_id"),
      array_sort(array_distinct(transform(
        TextOps.shingles(TextOps.tokens(col("text")), 3),
        s => xxhash64(s)))).as("sh"))
    time("A concat+hash")(println(a.agg(sum(size(col("sh")))).head))
    // B: single transform hashing token triples
    val toks = TextOps.tokens(col("text"))
    val idx = sequence(lit(1), size(toks) - lit(2))
    val b = docs.select(col("doc_id"),
      array_sort(array_distinct(when(size(toks) >= 3,
        transform(idx, i => xxhash64(element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))
        .otherwise(array().cast("array<bigint>")))).as("sh"))
    time("B triple-hash transform")(println(b.agg(sum(size(col("sh")))).head))
    // C: explode + window lead + groupBy collect_set
    val ex = docs.select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("i", "w")))
    val w = Window.partitionBy("doc_id").orderBy("i")
    val tri = ex.select(col("doc_id"),
        xxhash64(col("w"), lead(col("w"), 1).over(w), lead(col("w"), 2).over(w)).as("h"))
      .filter(col("h").isNotNull)
    val c = tri.groupBy("doc_id").agg(sort_array(collect_set(col("h"))).as("sh"))
    time("C explode+window")(println(c.agg(sum(size(col("sh")))).head))
    // C2: explode + window, but keep exploded (no re-group) — just count
    time("C2 exploded only")(println(tri.count()))
    // D: like B but skip array_sort/distinct (measure their cost)
    val d = docs.select(col("doc_id"),
      when(size(toks) >= 3,
        transform(idx, i => xxhash64(element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))
        .otherwise(array().cast("array<bigint>")).as("sh"))
    time("D no-sort-no-distinct")(println(d.agg(sum(size(col("sh")))).head))
    // E: split only
    time("E split only")(println(docs.select(size(split(col("text"), " ")).as("n")).agg(sum(col("n"))).head))
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.{Relational, Sketches}

/** Contracts for the frequency-sketch surface (Sketches.scala) and the
  * exact skew diagnostic (Relational.skewProfile). */
class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  test("heavyHitters equals exact GROUP BY + HAVING on a skewed stream") {
    // 3 heavy values (a: 400, b: 120, c: 60 of 1000 ≈ 58% combined),
    // 420 singletons as noise; denom 20 → threshold 50 rows
    val rows = List.fill(400)("a") ++ List.fill(120)("b") ++ List.fill(60)("c") ++
      (0 until 420).map(i => s"noise_$i")
    val df = rows.toDF("v").repartition(7) // force multi-partition merges
    val got = Sketches.heavyHitters(df, "v", denom = 20L)
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("a", 400L), ("b", 120L), ("c", 60L)))
  }

  test("heavyHitters equals exact computation on random corpora (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // small alphabet with a zipf-ish bias so heavy values actually occur
    val word = Gen.frequency((8, Gen.const("hot")), (4, Gen.const("warm")),
      (2, Gen.oneOf("x", "y", "z")), (1, Gen.choose(0, 50).map("w" + _)))
    val gen = Gen.nonEmptyListOf(word)
    val prop = Prop.forAll(gen) { words =>
      val df = words.toDF("v")
      val n = words.length.toLong
      val exact = words.groupBy(identity).view.mapValues(_.length.toLong)
        .filter { case (_, c) => c * 10L >= n }.toMap
      val got = Sketches.heavyHitters(df, "v", denom = 10L)
        .as[(String, Long)].collect().toMap
      got == exact
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(r.passed, r.status.toString)
  }

  test("MisraGries summary never false-negatives above N/(k+1) after merges") {
    // adversarial-ish: many distinct values exactly at the guarantee edge
    val heavy = List.fill(30)("H1") ++ List.fill(25)("H2")
    val light = (0 until 200).map("l" + _)
    val all = (heavy ++ light).toDF("v").repartition(11)
    val n = heavy.size + light.size // 255
    val k = 10 // guarantee: anything with count > 255/11 ≈ 23.2 survives
    val mg = udaf(new Sketches.MisraGries(k), org.apache.spark.sql.Encoders.STRING)
    val cand = all.agg(mg(col("v"))).head.getSeq[String](0).toSet
    assert(cand.contains("H1") && cand.contains("H2"))
    assert(cand.size <= k)
  }

  test("skewProfile surfaces exactly the hot keys with integer-exact columns") {
    // 2 hot keys (500 + 300 rows) and 200 singleton keys → n_keys = 202,
    // n_rows = 1000, mean ≈ 4.95; hotFactor 8 → threshold n ≥ 8·1000/202
    val rows = List.fill(500)(1L) ++ List.fill(300)(2L) ++ (100L until 300L)
    val prof = Relational.skewProfile(rows.toDF("key"), "key", hotFactor = 8L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(prof === Seq(
      (1L, 500L, 500L * 1000000L / 1000L, 500L * 202L / 1000L),
      (2L, 300L, 300L * 1000000L / 1000L, 300L * 202L / 1000L)))
  }

  test("skewProfile is empty on uniform keys") {
    val uniform = (0L until 1000L).map(i => i % 100).toDF("key")
    assert(Relational.skewProfile(uniform, "key", hotFactor = 8L).count() === 0L)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Deterministic-sampling contracts: membership is a pure function of the
  * key (stable across runs and partitionings), realized rates track the
  * requested rates on sequential ids, splits are disjoint and exhaustive,
  * and both hash flavors expose the same operator shape. */
class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val ids = spark.range(0, 10000).toDF("id")

  test("sample is deterministic and independent of partitioning") {
    val a = Sampling.sample(ids, Sampling.fibHash(col("id")), 0.3)
      .as[Long].collect().toSet
    val b = Sampling.sample(ids.repartition(7), Sampling.fibHash(col("id")), 0.3)
      .as[Long].collect().toSet
    assert(a === b)
    assert(math.abs(a.size / 10000.0 - 0.3) < 0.02)
  }

  test("keyHash sample hits the requested rate and resalts independently") {
    val s1 = Sampling.sample(ids, Sampling.keyHash(1, col("id")), 0.5)
      .as[Long].collect().toSet
    val s2 = Sampling.sample(ids, Sampling.keyHash(2, col("id")), 0.5)
      .as[Long].collect().toSet
    assert(math.abs(s1.size / 10000.0 - 0.5) < 0.02)
    assert(math.abs(s2.size / 10000.0 - 0.5) < 0.02)
    val overlap = (s1 & s2).size / 10000.0 // independent draws ⇒ ≈ 0.25
    assert(overlap > 0.2 && overlap < 0.3)
  }

  test("splitColumn labels are disjoint, exhaustive, and at the right rates") {
    val counts = ids
      .select(Sampling.splitColumn(Sampling.fibHash(col("id")), 0.1, 0.2).as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts.values.sum === 10000L)
    assert(math.abs(counts("test") / 10000.0 - 0.2) < 0.02)
    assert(math.abs(counts("val") / 10000.0 - 0.1) < 0.02)
  }

  test("stratifiedSample applies per-stratum rates with a default") {
    val df = ids.withColumn("s",
      when(col("id") % 2 === 0, "a").otherwise("b"))
    val kept = Sampling.stratifiedSample(df, col("s"),
        Sampling.fibHash(col("id")), Map("a" -> 0.8), defaultRate = 0.1)
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(math.abs(kept("a") / 5000.0 - 0.8) < 0.03)
    assert(math.abs(kept("b") / 5000.0 - 0.1) < 0.03)
  }

  test("weightedMix tags each leg and applies its rate") {
    val out = Sampling.weightedMix(Seq(
        ("x", ids, Sampling.fibHash(col("id")), 0.5),
        ("y", ids, Sampling.fibHash(col("id")), 0.1)))
      .groupBy("mix_source").count().as[(String, Long)].collect().toMap
    assert(math.abs(out("x") / 10000.0 - 0.5) < 0.02)
    assert(math.abs(out("y") / 10000.0 - 0.1) < 0.02)
  }

  test("shuffleOrder: positions are a deterministic permutation, ranks dense per shard") {
    val small = spark.range(0, 1000).toDF("id")
    val got = Sampling.shuffleOrder(small, col("id"), 8)
      .select("id", "shard", "rank_in_shard")
      .as[(Long, Int, Int)].collect()
    assert(got.length === 1000)
    // every row gets exactly one position; positions are unique
    assert(got.map(r => (r._2, r._3)).distinct.length === 1000)
    // ranks are 1..n within each shard (dense, no gaps)
    got.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1 to rows.length), s"shard $shard")
    }
    // deterministic across invocations
    val again = Sampling.shuffleOrder(small, col("id"), 8)
      .select("id", "shard", "rank_in_shard").as[(Long, Int, Int)].collect()
    assert(got.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
    // and it actually shuffles: global order != key order
    val globalOrder = got.sortBy(r => (r._2, r._3)).map(_._1).toSeq
    assert(globalOrder !== globalOrder.sorted)
  }

  test("groupSample takes exactly k per stratum (or the whole small stratum), deterministically") {
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("s", when(col("id") < 900, "big").otherwise(when(col("id") < 995, "mid").otherwise("tiny")))
    val got = Sampling.groupSample(df, col("s"), col("id"), 10)
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(got === Map("big" -> 10L, "mid" -> 10L, "tiny" -> 5L)) // tiny has only 5 rows
    // deterministic membership
    val a = Sampling.groupSample(df, col("s"), col("id"), 10)
      .select("id").as[Long].collect().toSet
    val b = Sampling.groupSample(df.repartition(7), col("s"), col("id"), 10)
      .select("id").as[Long].collect().toSet
    assert(a === b)
  }

  test("budgetSelect keeps the maximal global-order prefix within budget, band-count independent") {
    val df = spark.range(0, 500).toDF("id")
      .withColumn("sc", (col("id") % 97).cast("double") / 100.0) // scores in [0, 0.96]
      .withColumn("w", col("id") % 7 + 1)
    def kept(bands: Int): Set[Long] =
      Sampling.budgetSelect(df, col("sc"), col("id"), col("w"), 300L, bands)
        .select("id").as[Long].collect().toSet
    // reference: driver-side global cumulative sum over (score desc, id)
    val rows = df.select("id", "sc", "w").as[(Long, Double, Long)].collect()
      .sortBy { case (id, sc, _) => (-sc, id) }
    val expected = rows.scanLeft((0L, 0L)) { case ((_, cum), (id, _, w)) => (id, cum + w) }
      .drop(1).takeWhile(_._2 <= 300L).map(_._1).toSet
    assert(kept(32) === expected)
    assert(expected.nonEmpty && expected.size < 500)
    // bands change parallelism, never the result
    assert(kept(1) === expected && kept(7) === expected)
  }

  test("denseIds: contiguous 0..n-1, layout-independent, equals the global-order rank") {
    val df = spark.range(0, 777).toDF("id0")
    val got = Sampling.denseIds(df, col("id0"), 8)
      .select(col("id0"), col("id")).as[(Long, Long)].collect()
    assert(got.map(_._2).sorted.toSeq === (0L until 777L)) // dense, no gaps
    // same assignment regardless of input partitioning
    val re = Sampling.denseIds(df.repartition(13), col("id0"), 8)
      .select(col("id0"), col("id")).as[(Long, Long)].collect()
    assert(got.sortBy(_._1).toSeq === re.sortBy(_._1).toSeq)
    // two-level form == one global row_number over (bucket, key)
    val expected = df
      .withColumn("b", Sampling.fibHash(col("id0")))
      .orderBy("b", "id0").as[(Long, Long)].collect()
      .map(_._1).zipWithIndex.map { case (k, i) => (k, i.toLong) }.toMap
    assert(got.map(r => r._1 -> r._2).toMap === expected)
  }

  test("weightedSample keeps rows at exactly weight/wMax rates, deterministic") {
    val df = (0L until 40000L).map(i => (i, i % 5)).toDF("id", "w") // weights 0..4
    val kept = Sampling.weightedSample(df, Sampling.fibHash(col("id")), col("w"), 4L)
      .as[(Long, Long)].collect()
    assert(!kept.exists(_._2 == 0)) // zero weight: never sampled
    val byW = kept.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byW(4L) === 8000) // weight == wMax: every row
    for (w <- 1L to 3L) {
      val want = 8000.0 * w / 4
      assert(math.abs(byW(w) - want) / want < 0.05, s"w=$w got ${byW(w)}")
    }
    // membership is layout-independent
    val again = Sampling
      .weightedSample(df.repartition(13), Sampling.fibHash(col("id")), col("w"), 4L)
      .as[(Long, Long)].collect()
    assert(again.sortBy(_._1).toSeq === kept.sortBy(_._1).toSeq)
  }

  test("leakFreeSplit: cluster members share one split, singletons hash their key") {
    val docs = (0L until 200L).toDF("doc_id")
    // two clusters: {0..9} labeled 0, {10..14} labeled 10; rest singleton
    val labels = ((0L until 10L).map((_, 0L)) ++ (10L until 15L).map((_, 10L)))
      .toDF("id", "component")
    val got = Sampling.leakFreeSplit(docs, col("doc_id"), labels, 0.3, 0.3)
      .as[(Long, String)].collect().toMap
    assert(got.size === 200)
    assert((0L until 10L).map(got).toSet.size === 1) // cluster 0: one split
    assert((10L until 15L).map(got).toSet.size === 1)
    // the shared split is the component id's split; singletons their own
    def splitOf(k: Long): String = docs.sparkSession.range(1)
      .select(Sampling.splitColumn(Sampling.fibHash(lit(k)), 0.3, 0.3))
      .as[String].head()
    assert(got(3L) === splitOf(0L) && got(12L) === splitOf(10L))
    assert(got(77L) === splitOf(77L))
    // leak check by construction: no cluster straddles the eval boundary
    assert(Set("train", "val", "test").contains(got(0L)))
  }

  test("mixRates: waterfill hits targets exactly, binding source at rate 1") {
    // masses 1000/9000/500 with targets 0.5/0.3/0.2 — "a" is binding
    // (1000/0.5 = 2000 is the min), so C = 2000: keep 1000a, 600b, 400c
    val counts = Seq(("a", 1000L), ("b", 9000L), ("c", 500L), ("x", 7L))
      .toDF("source", "n_tokens")
    val got = Sampling.mixRates(counts, "source", "n_tokens",
        Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2))
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("a")._2 === 1.0) // binding source keeps everything
    assert(math.abs(got("b")._2 - 600.0 / 9000.0) < 1e-12)
    assert(math.abs(got("c")._2 - 400.0 / 500.0) < 1e-12)
    assert(got("x")._2 === 0.0) // untargeted source surfaced, dropped
    // achieved mix is exactly the target proportions
    val kept = Seq("a", "b", "c").map(s => got(s)._1 * got(s)._2)
    assert(kept.map(_ / kept.sum).zip(Seq(0.5, 0.3, 0.2))
      .forall { case (p, t) => math.abs(p - t) < 1e-12 })
  }

  test("mixRatesRepeat: binding source repeats at exactly the cap; cap=1 equals mixRates") {
    val counts = Seq(("a", 1000L), ("b", 9000L), ("c", 500L))
      .toDF("source", "n_tokens")
    val targets = Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2)
    val got = Sampling.mixRatesRepeat(counts, "source", "n_tokens", targets, 4.0)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    // "a" binds: C = 4·1000/0.5 = 8000 → a repeats exactly 4 epochs
    assert(math.abs(got("a") - 4.0) < 1e-12)
    assert(math.abs(got("b") - 8000.0 * 0.3 / 9000.0) < 1e-12)
    assert(math.abs(got("c") - 8000.0 * 0.2 / 500.0) < 1e-12)
    // achieved proportions still exactly the targets
    val kept = Seq("a", "b", "c").map(s =>
      got(s) * counts.filter(col("source") === s)
        .head().getLong(1))
    assert(kept.map(_ / kept.sum).zip(Seq(0.5, 0.3, 0.2))
      .forall { case (p, t) => math.abs(p - t) < 1e-12 })
    // cap 1 degenerates to the no-upsampling waterfill
    val one = Sampling.mixRatesRepeat(counts, "source", "n_tokens", targets, 1.0)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    val plain = Sampling.mixRates(counts, "source", "n_tokens", targets)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(one === plain)
    intercept[IllegalArgumentException] {
      Sampling.mixRatesRepeat(counts, "source", "n_tokens", targets, 0.5)
    }
  }

  test("temperatureRates: alpha=1 is proportional, alpha<1 boosts small sources, epochs conserve the budget") {
    val counts = Seq(("big", 90000L), ("mid", 9000L), ("small", 1000L))
      .toDF("source", "n_tokens")
    def rates(alpha: Double) =
      Sampling.temperatureRates(counts, "source", "n_tokens", alpha, 100000L)
        .as[(String, Long, Double, Double)].collect()
        .map(r => r._1 -> (r._3, r._4)).toMap
    val prop = rates(1.0)
    assert(math.abs(prop("big")._1 - 0.9) < 1e-12)
    assert(math.abs(prop("small")._1 - 0.01) < 1e-12)
    // alpha=1: every source is traversed the same fraction of an epoch
    assert(Seq("big", "mid", "small")
      .forall(s => math.abs(prop(s)._2 - 1.0) < 1e-12))
    // alpha=0.5: exact closed form p = sqrt(n) / sum(sqrt(n))
    val t = rates(0.5)
    val z = math.sqrt(90000.0) + math.sqrt(9000.0) + math.sqrt(1000.0)
    assert(math.abs(t("small")._1 - math.sqrt(1000.0) / z) < 1e-12)
    // smaller source → more epochs (the up-weighting direction)
    assert(t("small")._2 > t("mid")._2 && t("mid")._2 > t("big")._2)
    // drawn tokens sum to the budget: sum over s of p_s·B = B
    val drawn = Seq("big", "mid", "small")
      .map(s => t(s)._1 * 100000.0).sum
    assert(math.abs(drawn - 100000.0) < 1e-6)
    assert(intercept[IllegalArgumentException] {
      Sampling.temperatureRates(counts, "source", "n_tokens", 0.0, 1L)
    }.getMessage.contains("alpha"))
  }

  test("mixRates validates targets") {
    val counts = Seq(("a", 10L)).toDF("source", "n_tokens")
    intercept[IllegalArgumentException] {
      Sampling.mixRates(counts, "source", "n_tokens", Map("a" -> 0.7))
    }
    intercept[IllegalArgumentException] {
      Sampling.mixRates(counts, "source", "n_tokens",
        Map("a" -> 1.5, "b" -> -0.5))
    }
    // a typo'd source (absent from counts) must fail loudly, not
    // silently realize a different mixture with the leg at rate 0
    val two = Seq(("a", 10L), ("b", 10L)).toDF("source", "n_tokens")
    val e1 = intercept[IllegalArgumentException] {
      Sampling.mixRates(two, "source", "n_tokens",
        Map("a" -> 0.5, "bee" -> 0.5))
    }
    assert(e1.getMessage.contains("bee"))
    // a targeted source with zero mass would make C = 0 and rate NaN
    val zero = Seq(("a", 10L), ("b", 0L)).toDF("source", "n_tokens")
    val e2 = intercept[IllegalArgumentException] {
      Sampling.mixRates(zero, "source", "n_tokens",
        Map("a" -> 0.5, "b" -> 0.5))
    }
    assert(e2.getMessage.contains("b"))
  }

  test("capContributions: exact-k retention, under-k passthrough, re-ingestion stability") {
    val df = Seq(
      ("u", 1L, 10L), ("u", 2L, 11L), ("u", 3L, 12L), ("u", 4L, 13L),
      ("u", 5L, 14L),
      ("v", 1L, 20L), ("v", 2L, 21L))
      .toDF("k", "t", "id")
    def kept(frame: org.apache.spark.sql.DataFrame) =
      Sampling.capContributions(frame, col("k"), col("t"), col("id"), 3)
        .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    val base = kept(df)
    // u keeps its FIRST 3 in time order; under-k v passes through whole
    assert(base === Set(("u", 10L), ("u", 11L), ("u", 12L),
      ("v", 20L), ("v", 21L)))
    // re-ingestion stability: later arrivals never evict earlier rows
    val more = df.unionByName(
      Seq(("u", 6L, 15L), ("v", 3L, 22L)).toDF("k", "t", "id"))
    assert(kept(more) === base + (("v", 22L)))
    intercept[IllegalArgumentException](
      Sampling.capContributions(df, col("k"), col("t"), col("id"), 0))
  }

  test("apportion: exact proportional, paradox case, ties, zero stratum, conservation") {
    def alloc(rows: Seq[(String, Long)], budget: Long) =
      Sampling.apportion(rows.toDF("src", "n"), "src", "n", budget)
        .collect().map(r => r.getString(0) -> r.getAs[Long]("alloc")).toMap
    // exact proportional: zero leftover
    assert(alloc(Seq("a" -> 5L, "b" -> 3L, "c" -> 2L), 10L)
      === Map("a" -> 5L, "b" -> 3L, "c" -> 2L))
    // classic largest-remainder case: quotas 3.5 / 2.8 / 0.7 → the two
    // largest FRACTIONS (b, c) take the leftover units, not the largest
    // stratum
    assert(alloc(Seq("a" -> 5L, "b" -> 4L, "c" -> 1L), 7L)
      === Map("a" -> 3L, "b" -> 3L, "c" -> 1L))
    // all remainders tie → key order breaks: 'a' gets the single unit
    assert(alloc(Seq("a" -> 1L, "b" -> 1L, "c" -> 1L), 10L)
      === Map("a" -> 4L, "b" -> 3L, "c" -> 3L))
    // a zero-count stratum never receives a unit
    assert(alloc(Seq("a" -> 3L, "b" -> 0L), 7L) === Map("a" -> 7L, "b" -> 0L))
    // conservation property on an awkward split
    val m = alloc(Seq("a" -> 7L, "b" -> 11L, "c" -> 13L, "d" -> 2L), 97L)
    assert(m.values.sum === 97L)
  }

  test("negativeSamples: positive exclusion, fan-out, determinism") {
    import spark.implicits._
    // nItems = 4; 2654435761 % 4 = 1, 40503 % 4 = 3, 97 % 4 = 1
    // u1 items {0,1}: candidates {1,2} and {0,1} -> only 2 survives
    val pos = Seq((1L, 0L), (1L, 1L), (2L, 3L)).toDF("u", "i")
    val got = Sampling.negativeSamples(pos, "u", "i", k = 2, nItems = 4L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    // u2 item {3}: candidates (2+9)%4=3 (own positive, dies) and
    // (3+1)%4=0 -> negative (2,0)
    assert(got === Set((1L, 0L, 1L), (1L, 1L, 1L), (1L, 2L, 0L),
      (2L, 3L, 1L), (2L, 0L, 0L)))
    // deterministic: a second run is bit-identical
    val again = Sampling.negativeSamples(pos, "u", "i", 2, 4L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(again === got)
    graft.engine.Caches.releaseAll()
  }

  test("reservoirSample: proportional bias, reshuffle determinism, " +
      "k >= n passthrough, zero-weight exclusion") {
    // 500 heavy (w=20) vs 500 light (w=1) rows: a 100-draw should be
    // dominated by heavy rows (P[light beats heavy] is tiny per pair)
    val df = (0L until 500L).map(i => (i, 20L)) ++
      (500L until 1000L).map(i => (i, 1L))
    val got = Sampling.reservoirSample(df.toDF("id", "w"),
      col("id"), col("w"), 100).select("id").as[Long].collect().toSet
    assert(got.size === 100)
    assert(got.count(_ < 500L) > 85, s"heavy share: ${got.count(_ < 500L)}")
    // deterministic under reshuffle
    val again = Sampling.reservoirSample(df.toDF("id", "w").repartition(7),
      col("id"), col("w"), 100).select("id").as[Long].collect().toSet
    assert(again === got)
    // k >= n: every positive-weight row survives
    assert(Sampling.reservoirSample(
      Seq((1L, 5L), (2L, 1L)).toDF("id", "w"), col("id"), col("w"), 10)
      .count() === 2L)
    // zero/negative weights are excluded from the draw
    assert(Sampling.reservoirSample(
      Seq((1L, 5L), (2L, 0L), (3L, -4L)).toDF("id", "w"),
      col("id"), col("w"), 10).select("id").as[Long].collect().toSeq
      === Seq(1L))
  }

  test("neymanAllocation: volatility earns budget, zero-variance " +
      "exclusion, conservation, equal-sigma proportional fallback") {
    // two strata of 4 rows each: 'hi' has sd 10x 'lo' -> ~10/11 of
    // the budget; weights are sqrt(N*Sx2 - Sx^2) in cents
    val df = Seq(("hi", 0.0), ("hi", 20.0), ("hi", 0.0), ("hi", 20.0),
      ("lo", 0.0), ("lo", 2.0), ("lo", 0.0), ("lo", 2.0))
      .toDF("g", "y")
    val got = Sampling.neymanAllocation(df, "g", "y", 110L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(4)))).toMap
    // w(hi) = sqrt(4*2000000 - 4000^2)... = sqrt(8e6*cents2 - ...)
    // cents: hi = {0,2000}x2: s1=4000, s2=8e6 -> 4*8e6-16e6 = 16e6,
    // w = 4000; lo = {0,200}x2: 4*80000-160000=160000, w = 400
    assert(got("hi")._1 === 4000L && got("lo")._1 === 400L)
    assert(got("hi")._2 === 100L && got("lo")._2 === 10L)
    assert(got.values.map(_._2).sum === 110L) // conservation
    // a zero-variance stratum weighs 0 and gets nothing
    val withConst = df.unionAll(
      Seq(("const", 5.0), ("const", 5.0)).toDF("g", "y"))
    val z = Sampling.neymanAllocation(withConst, "g", "y", 110L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(z("const") === 0L && z.values.sum === 110L)
    // equal sigma, unequal sizes: reduces to proportional allocation
    // w = sqrt(N^2 sigma^2) = N*sigma: {0,2}x2 vs {0,2}x4
    val prop = Seq(("a", 0.0), ("a", 2.0), ("a", 0.0), ("a", 2.0),
      ("b", 0.0), ("b", 2.0), ("b", 0.0), ("b", 2.0),
      ("b", 0.0), ("b", 2.0), ("b", 0.0), ("b", 2.0))
      .toDF("g", "y")
    val p = Sampling.neymanAllocation(prop, "g", "y", 30L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(p("a") === 10L && p("b") === 20L)
    graft.engine.Caches.releaseAll()
  }

  test("kFoldAssign: per-stratum balance, reshuffle determinism, " +
      "k=1 degenerate, small-stratum coverage") {
    val df = (0L until 103L).map(i => (s"s${i % 3}", i)).toDF("g", "id")
    val folds = Sampling.kFoldAssign(df, col("g"), col("id"), 5)
      .select("g", "id", "fold").as[(String, Long, Int)].collect()
    // balance: within each stratum fold sizes differ by at most 1
    folds.groupBy(_._1).foreach { case (_, rows) =>
      val sizes = rows.groupBy(_._3).values.map(_.length)
      assert(sizes.max - sizes.min <= 1)
      assert(rows.map(_._3).toSet === (0 until 5).toSet)
    }
    // assignment is a pure function of (stratum, key, k): identical
    // after a reshuffle
    val again = Sampling.kFoldAssign(df.repartition(7), col("g"),
      col("id"), 5).select("g", "id", "fold")
      .as[(String, Long, Int)].collect().toSet
    assert(again === folds.toSet)
    // k = 1: everything lands in fold 0
    assert(Sampling.kFoldAssign(df, col("g"), col("id"), 1)
      .select("fold").distinct().as[Int].collect().toSeq === Seq(0))
    // a stratum smaller than k covers folds 0..|stratum|-1 exactly
    val tiny = Sampling.kFoldAssign(
      Seq(("t", 1L), ("t", 2L), ("t", 3L)).toDF("g", "id"),
      col("g"), col("id"), 5)
      .select("fold").as[Int].collect().sorted
    assert(tiny.toSeq === Seq(0, 1, 2))
  }

  test("reservoirSampleStratified: single-stratum equals the flat draw, " +
      "per-stratum counts, cross-stratum independence, zero weights out") {
    import spark.implicits._
    val a = (1L to 40L).map(k => ("a", k, (k % 7 + 1).toDouble))
    val b = (101L to 140L).map(k => ("b", k, (k % 5 + 1).toDouble))
    val df = (a ++ b).toDF("g", "k", "w")
    val strat = Sampling.reservoirSampleStratified(
      df, "g", col("k"), col("w"), 5)
      .as[(String, Int, Long, Long)].collect()
    assert(strat.count(_._1 == "a") === 5 && strat.count(_._1 == "b") === 5)
    // stratum a's draw == the flat reservoirSample over a alone
    val flat = Sampling.reservoirSample(
      a.toDF("g", "k", "w"), col("k"), col("w"), 5)
      .select("k", "es_pico").as[(Long, Long)].collect()
      .map(x => (x._1, x._2)).toSeq
    val sa = strat.filter(_._1 == "a").sortBy(_._2)
      .map(x => (x._3, x._4)).toSeq
    assert(sa === flat)
    // adding stratum b did not perturb a (the per-key draw is pure)
    val aOnly = Sampling.reservoirSampleStratified(
      a.toDF("g", "k", "w"), "g", col("k"), col("w"), 5)
      .as[(String, Int, Long, Long)].collect().sortBy(_._2)
      .map(x => (x._3, x._4)).toSeq
    assert(aOnly === sa)
    // zero/negative weights never sampled
    val wz = Seq(("z", 1L, 0.0), ("z", 2L, -1.0), ("z", 3L, 2.0))
      .toDF("g", "k", "w")
    val z = Sampling.reservoirSampleStratified(
      wz, "g", col("k"), col("w"), 5)
      .as[(String, Int, Long, Long)].collect()
    assert(z.map(_._3).toSeq === Seq(3L))
  }
}

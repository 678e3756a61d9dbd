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

  test("HLL merge, sparse regime: union == one-shot global == exact") {
    // 300 distinct keys per group — below sparse-mode promotion at
    // lgk=12, where DataSketches HLL is an exact coupon set and union
    // is value-identical to building one sketch over everything
    val df = (0 until 3000).map { i =>
      (s"g${i % 3}", i % 13, s"k${i % 900}")
    }.toDF("g", "shard", "k").repartition(9)
    val merged = Sketches.mergedDistinctEstimates(
      Sketches.distinctSketches(df, "g", col("shard"), "k"), "g")
      .withColumnRenamed("n_approx", "m")
    val global = df.groupBy("g")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("k"), lit(12))).as("gl"),
        count_distinct(col("k")).as("ex"))
    val rows = merged.join(global, "g").as[(String, Double, Double, Long)]
      .collect().toSeq.sortBy(_._1)
    assert(rows.size === 3)
    rows.foreach { case (g, m, gl, ex) =>
      assert(m === gl, s"group $g: merged $m != global $gl")
      assert(math.round(m) === ex, s"group $g: $m vs exact $ex")
    }
  }

  test("HLL merge, dense regime: every merge tree lands within the rsd band") {
    // 800 distinct keys — past sparse promotion, where the one-shot
    // sketch and differently-sharded unions are NOT bit-equal (the
    // documented non-contract; measured 787 vs 797 here) but every
    // variant must sit within 5×rsd ≈ 8% of exact
    val df = (0 until 5000).map(i => (s"k${i % 800}", i)).toDF("k", "i")
    def est(shard: org.apache.spark.sql.Column): Double =
      Sketches.mergedDistinctEstimates(
        Sketches.distinctSketches(df.withColumn("g", lit("all")), "g", shard, "k"), "g")
        .as[(String, Double)].head()._2
    val ests = Seq(est(col("i") % 7), est(col("i") % 64), est(lit(0)))
    ests.foreach(e => assert(math.abs(e - 800.0) <= 800.0 * 0.08, ests.toString))
  }

  test("KLL shards merge to quantiles within the rank-error guarantee") {
    // 10k uniform values over many partitions: exact rank-r value = r·10k
    val df = (0 until 10000).map(_.toDouble).toDF("v").repartition(17)
    val got = Sketches.mergedQuantiles(
        Sketches.quantileSketchShards(df, "v"), Seq(0.1, 0.5, 0.9))
      .as[(Double, Double, Double)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq(0.1, 0.5, 0.9))
    got.foreach { case (r, v, eps) =>
      assert(eps > 0 && eps < 0.05, s"suspicious eps $eps")
      assert(math.abs(v - r * 10000) <= 2 * eps * 10000 + 1,
        s"rank $r: value $v outside 2eps of ${r * 10000}")
    }
  }

  test("KLL shard count does not move quantiles outside the guarantee") {
    val vals = (0 until 8000).map(_.toDouble)
    def med(parts: Int): Double = Sketches.mergedQuantiles(
        Sketches.quantileSketchShards(vals.toDF("v").repartition(parts), "v"),
        Seq(0.5)).as[(Double, Double, Double)].head()._2
    Seq(1, 4, 32).map(med).foreach(m =>
      assert(math.abs(m - 4000) <= 300, s"median $m"))
  }

  test("grouped KLL: per-group guarantees hold with disjoint distributions") {
    // group a: 0..999, group b: 0..99990 by 10 — medians 500 and 50000
    val rows = (0 until 1000).map(i => ("a", i.toDouble)) ++
      (0 until 10000).map(i => ("b", i * 10.0))
    val df = rows.toDF("g", "v").repartition(13)
    val got = Sketches.mergedGroupQuantiles(
        Sketches.groupedQuantileSketchShards(df, "g", "v"), "g", Seq(0.5))
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    assert(got.keySet === Set("a", "b"))
    assert(math.abs(got("a")._1 - 500.0) <= 2 * got("a")._2 * 1000 + 1)
    assert(math.abs(got("b")._1 - 50000.0) <= 2 * got("b")._2 * 10000 * 10 + 10)
  }

  test("mergedQuantiles fails fast on empty input") {
    val empty = Seq.empty[Double].toDF("v")
    intercept[IllegalArgumentException] {
      Sketches.mergedQuantiles(Sketches.quantileSketchShards(empty, "v"), Seq(0.5))
    }
  }

  test("segmentOverlap: sparse regime equals the exact intersection matrix") {
    // 3 segments with engineered memberships: A = 0..599, B = 300..899,
    // C = evens of 0..899 → |A∩B| = 300, |A∩C| = 300, |B∩C| = 300
    val rows =
      (0 until 600).map(k => ("A", k.toLong)) ++
      (300 until 900).map(k => ("B", k.toLong)) ++
      (0 until 900 by 2).map(k => ("C", k.toLong))
    // duplicate rows must not move distinct counts. lgk=14: the sparse
    // (exact) regime ends near 2^(lgk−3) keys — 512 at the default 12,
    // which these 600-key segments already exceed (measured 598/596
    // there); 2048 at 14 keeps them exact
    val df = (rows ++ rows).toDF("seg", "k").repartition(7)
    val got = Sketches.segmentOverlap(df, "seg", "k", lgk = 14)
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("A", "B", 600L, 600L, 300L),
      ("A", "C", 600L, 450L, 300L),
      ("B", "C", 600L, 450L, 300L)))
  }

  test("segmentOverlap: dense regime stays within compounded rsd of exact") {
    // 6000-key segments with a 3000-key overlap — past sparse promotion
    // at lgk=12; inclusion-exclusion compounds three estimates, so
    // allow 3 × 5×rsd ≈ 25% of the SEGMENT size (the documented trade:
    // overlaps much smaller than the segments drown in noise)
    val rows = (0 until 6000).map(k => ("A", k.toLong)) ++
      (3000 until 9000).map(k => ("B", k.toLong))
    val Seq((_, _, na, nb, ov)) = Sketches.segmentOverlap(rows.toDF("seg", "k"), "seg", "k")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(math.abs(na - 6000L) <= 480, s"n_a $na")
    assert(math.abs(nb - 6000L) <= 480, s"n_b $nb")
    assert(math.abs(ov - 3000L) <= 1500, s"overlap $ov")
  }

  test("bloomPrefilteredJoin equals the plain join and actually prunes") {
    val fact = (0L until 20000L).map(i => (i % 4000, i)).toDF("key", "payload")
    val dim = (0L until 4000L).filter(_ % 100 == 0).map(k => (k, s"d$k"))
      .toDF("key", "attr") // 1% of fact keys survive
    val plain = fact.join(dim, Seq("key"))
      .select("key", "payload", "attr").as[(Long, Long, String)].collect().toSet
    val bloomed = Sketches.bloomPrefilteredJoin(fact, dim, "key")
      .select("key", "payload", "attr").as[(Long, Long, String)].collect().toSet
    assert(bloomed === plain)
    // the prefilter alone (before the join drops false positives) must
    // cut the fact side by an order of magnitude at 1% selectivity
    val keys = dim.select(col("key").cast("long").as("key")).distinct()
    val bf = keys.stat.bloomFilter("key", 40L, 0.01)
    val bytes = { val b = new java.io.ByteArrayOutputStream(); bf.writeTo(b); b.toByteArray }
    val pruned = fact.filter(call_function("graft_might_contain",
      lit(bytes), col("key").cast("long"))).count()
    assert(pruned < fact.count() / 10, s"prefilter kept $pruned of 20000")
    assert(pruned >= plain.map(_._2).size, "prefilter must keep every true match")
  }

  test("bloomPrefilteredJoin on an empty dim returns an empty result") {
    val fact = (0L until 100L).map(i => (i, i)).toDF("key", "payload")
    val dim = Seq.empty[(Long, String)].toDF("key", "attr")
    assert(Sketches.bloomPrefilteredJoin(fact, dim, "key").count() === 0L)
  }

  test("frequency sketch: exact below map capacity, bounds bracket above") {
    // EXACT regime: cardinality (10) < maxMapSize (64) means no counter
    // is ever evicted — estimates equal true counts and the bounds
    // collapse, across an arbitrary shard split
    val vals = (0 until 1000).map(i => s"k${i % 10}")
    val df = vals.toDF("v").repartition(7)
    val hh = Sketches.mergedHeavyHitters(
      Sketches.frequencySketchShards(df, "v"), denom = 20L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(hh.keySet === (0 until 10).map(i => s"k$i").toSet)
    hh.values.foreach { case (est, lb, ub) =>
      assert(est === 100L && lb === 100L && ub === 100L)
    }
    // EVICTION regime: a tiny map (8 counters) under 2k singletons — the
    // no-false-negative guarantee covers items whose TRUE count exceeds
    // the sketch's max error (~0.44·n at this size; the judged query
    // instead runs sub-capacity where that error is zero). hot = 6000 of
    // n = 8000 clears it: found, and its true count sits inside [lb, ub]
    val skew = (Seq.fill(6000)("hot") ++ (0 until 2000).map(i => s"u$i"))
    val shards = Sketches.frequencySketchShards(
      skew.toDF("v").repartition(7), "v", maxMapSize = 8)
    val found = Sketches.mergedHeavyHitters(shards, denom = 2L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(found.contains("hot"), s"hot key missing from $found")
    val (_, lb, ub) = found("hot")
    assert(lb <= 6000L && 6000L <= ub, s"bounds [$lb,$ub] miss true count 6000")
    // an empty stream yields the empty hitter set, not an exception
    val none = Sketches.mergedHeavyHitters(
      Sketches.frequencySketchShards(
        skew.toDF("v").filter(col("v") === "absent"), "v"), denom = 2L)
    assert(none.count() === 0L)
    // GROUPED form: per-group sketches stay independent — disjoint hot
    // sets per group, each exact in the sub-capacity regime
    val grouped = (0 until 300).map(i => (s"g${i % 2}", s"g${i % 2}_k${i % 3}"))
    val ghh = Sketches.mergedGroupHeavyHitters(
      Sketches.groupedFrequencySketchShards(
        grouped.toDF("g", "v").repartition(5), "g", "v"),
      "g", denom = 4L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(ghh.keySet === (for (g <- 0 until 2; k <- 0 until 3)
      yield (s"g$g", s"g${g}_k$k")).toSet)
    assert(ghh.values.forall(_ === 50L), s"grouped counts not exact: $ghh")
  }

  test("theta set ops: exact regime equality, disjoint/subset edges, resharding invariance") {
    import spark.implicits._
    import graft.operators.Sketches
    def est(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame): Map[String, Double] =
      Sketches.thetaSetEstimates(
          Sketches.thetaSketchShards(a, "k"),
          Sketches.thetaSketchShards(b, "k"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // overlapping: A = 0..599, B = 400..999 -> intersect 200, union 1000
    val a = (0L until 600L).toDF("k")
    val b = (400L until 1000L).toDF("k")
    val e = est(a, b)
    assert(e("a") === 600.0 && e("b") === 600.0)
    assert(e("intersect") === 200.0 && e("union") === 1000.0)
    assert(e("a_not_b") === 400.0)
    // resharding never moves an estimate (order-independent set algebra)
    assert(est(a.repartition(7), b.repartition(3)) === e)
    // disjoint: intersect 0; subset: a_not_b 0
    val d = est((0L until 100L).toDF("k"), (100L until 200L).toDF("k"))
    assert(d("intersect") === 0.0 && d("union") === 200.0)
    val s2 = est((0L until 100L).toDF("k"), (0L until 30L).toDF("k"))
    assert(s2("a_not_b") === 70.0 && s2("intersect") === 30.0)
    // nulls skipped, duplicates collapse (COUNT DISTINCT semantics)
    val withNulls = Seq(Some(1L), Some(1L), None, Some(2L)).toDF("k")
    assert(est(withNulls, (2L until 3L).toDF("k"))("a") === 2.0)
  }

  test("theta set ops: past-capacity estimates stay within 2-sigma bounds of exact") {
    import spark.implicits._
    import graft.operators.Sketches
    // lgK 6 = 64 nominal entries against 5000 keys: deep estimation
    // regime; every measure's [lb, ub] must bracket the true value and
    // the point estimate must sit inside its own bounds
    val a = (0L until 4000L).toDF("k")
    val b = (2000L until 5000L).toDF("k")
    val rows = Sketches.thetaSetEstimates(
        Sketches.thetaSketchShards(a, "k", lgK = 6),
        Sketches.thetaSketchShards(b, "k", lgK = 6), lgK = 6)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    val exact = Map("a" -> 4000.0, "b" -> 3000.0, "intersect" -> 2000.0,
      "union" -> 5000.0, "a_not_b" -> 2000.0)
    rows.foreach { case (m, (p, lb, ub)) =>
      assert(lb <= p && p <= ub, s"$m: point outside own bounds")
      assert(lb <= exact(m) && exact(m) <= ub,
        s"$m: exact ${exact(m)} outside [$lb, $ub]")
    }
  }

  test("CountMin: shard-merge == one-shot cells, never undercounts, exact at tiny vocab") {
    val agg = new Sketches.CountMin(4, 256)
    val vals = (1 to 500).map(i => s"t${i % 7}")
    val c1 = vals.toDS().repartition(1).select(agg.toColumn).head()
    val c8 = vals.toDS().repartition(8).select(agg.toColumn).head()
    // cell-wise merge: the union of shard sketches IS the one-shot sketch
    assert(c1.toSeq === c8.toSeq)
    val exact = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // 7 distinct values over 256-cell rows: collision-free, so the
    // never-undercount guarantee lands exactly ON the true counts
    exact.foreach { case (v, n) =>
      assert(agg.estimate(c1, v) === n, v)
    }
    assert(agg.estimate(c1, "never-seen") >= 0L)
    intercept[IllegalArgumentException](new Sketches.CountMin(0, 256))
    intercept[IllegalArgumentException](new Sketches.CountMin(4, 4))
  }
}

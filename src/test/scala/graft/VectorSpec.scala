package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Vectors

/** Vector-search tests: cosine arithmetic against hand values, exact
  * top-k ordering/self-exclusion, ANN recall >= 0.9 vs brute force on a
  * clustered corpus (the regime ANN exists for — on uniform-random
  * vectors like the harness `embeddings` table no bucketing scheme can
  * prune without losing recall), and the fail-fast width guard. */
class VectorSpec extends SparkTestBase {
  import spark.implicits._

  test("cosine matches hand-computed values") {
    val out = Seq((Seq(1.0, 0.0), Seq(1.0, 0.0)), (Seq(1.0, 0.0), Seq(0.0, 1.0)),
        (Seq(1.0, 1.0), Seq(1.0, 0.0)))
      .toDF("a", "b").select(Vectors.cosine(col("a"), col("b")).as("c"))
      .as[Double].collect()
    assert(math.abs(out(0) - 1.0) < 1e-12)
    assert(math.abs(out(1)) < 1e-12)
    assert(math.abs(out(2) - math.sqrt(0.5)) < 1e-12)
  }

  private lazy val tinyCorpus = Seq(
    (0L, Seq(1.0, 0.0, 0.0)), (1L, Seq(0.9, 0.1, 0.0)),
    (2L, Seq(0.0, 1.0, 0.0)), (3L, Seq(-1.0, 0.0, 0.0)))
    .toDF("vec_id", "v")

  test("bruteForceTopK ranks by cosine and excludes self-matches") {
    val q = tinyCorpus.filter($"vec_id" === 0L)
      .select($"vec_id".as("qid"), $"v".as("qv"))
    val out = Vectors.bruteForceTopK(tinyCorpus, "vec_id", "v", q, "qid", "qv", 3)
      .orderBy("rank").select("neighbor").as[Long].collect().toSeq
    assert(out === Seq(1L, 2L, 3L)) // by descending cosine to (1,0,0)
  }

  test("retrievalRecall: planted cross-modal partners recovered on the " +
      "clustered fixture; hand ranks; shared-id alignment counts") {
    import spark.implicits._
    // text ids 0..39, image ids 1000..1039: +1000 preserves id % 20
    // (the cluster), so text i's partner 1000+i sits in ITS cluster;
    // 2 texts / 2 images per separated cluster → partner always top-2
    val ids = (0L until 40L).toDF("id")
    val txt = Vectors.syntheticClustered(ids, "id", 20, 16, 0.01)
      .select(col("id").as("qid"), col("vec").as("qv"))
    val img = Vectors.syntheticClustered(
      ids.select((col("id") + 1000L).as("id")), "id", 20, 16, 0.01)
    val truth = txt.select(col("qid"), (col("qid") + 1000L).as("tid"))
    val r = Vectors.retrievalRecall(img, "id", "vec", txt, "qid", "qv",
      truth, "qid", "tid", 2).collect().head
    assert(r.getLong(0) === 40L && r.getLong(2) === 40L &&
      r.getLong(3) === 1000L)
    // hand ranks, SAME-id alignment (no self exclusion): the corpus
    // carries the exact query vector under the query's own id
    val q2 = Seq((1L, Seq(1.0, 0.0))).toDF("qid", "qv")
    val c2 = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.9, 0.1)),
      (3L, Seq(0.0, 1.0))).toDF("id", "vec")
    val hit = Vectors.retrievalRecall(c2, "id", "vec", q2, "qid", "qv",
      Seq((1L, 1L)).toDF("qid", "tid"), "qid", "tid", 2).collect().head
    assert((hit.getLong(0), hit.getLong(1), hit.getLong(2),
      hit.getLong(3), hit.getLong(4)) === ((1L, 1L, 1L, 1000L, 1000000L)))
    // a partner outside the top-k is a miss, not an error
    val miss = Vectors.retrievalRecall(c2, "id", "vec", q2, "qid", "qv",
      Seq((1L, 3L)).toDF("qid", "tid"), "qid", "tid", 2).collect().head
    assert((miss.getLong(2), miss.getLong(3), miss.getLong(4))
      === ((0L, 0L, 0L)))
    graft.engine.Caches.releaseAll()
  }

  /** 10 tight clusters (noise 0.1) of 50 points on the 32-sphere, seed 7 —
    * the deterministic corpus whose hamming=2 multi-probe recall was
    * measured at 0.92. */
  private def clustered: (DataFrame, DataFrame) = {
    val rng = new scala.util.Random(7)
    val dim = 32
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val centers = Array.fill(10)(unit(Array.fill(dim)(rng.nextGaussian())))
    val rows = for (c <- 0 until 10; i <- 0 until 50) yield {
      val v = unit(centers(c).zip(Array.fill(dim)(rng.nextGaussian() * 0.1))
        .map { case (a, b) => a + b })
      (c.toLong * 50 + i, v.toSeq)
    }
    val corpus = rows.toDF("vec_id", "v")
    val queries = corpus.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("qid"), $"v".as("qv"))
    (corpus, queries)
  }

  test("annTopK recall >= 0.9 vs bruteForceTopK on a clustered corpus") {
    val (corpus, queries) = clustered
    def pairs(df: DataFrame) = df.select("qid", "neighbor")
      .as[(Long, Long)].collect().toSet
    val exact = pairs(Vectors.bruteForceTopK(corpus, "vec_id", "v", queries, "qid", "qv", 5))
    val ann = pairs(Vectors.annTopK(corpus, "vec_id", "v", queries, "qid", "qv", 5,
      hamming = 2))
    val recall = exact.intersect(ann).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("annTopK sims agree with brute force on shared pairs") {
    val (corpus, queries) = clustered
    def sims(df: DataFrame) = df.select("qid", "neighbor", "sim")
      .as[(Long, Long, Double)].collect()
      .map { case (q, n, s) => (q, n) -> s }.toMap
    val exact = sims(Vectors.bruteForceTopK(corpus, "vec_id", "v", queries, "qid", "qv", 5))
    val ann = sims(Vectors.annTopK(corpus, "vec_id", "v", queries, "qid", "qv", 5,
      hamming = 2))
    val shared = exact.keySet.intersect(ann.keySet)
    assert(shared.nonEmpty)
    shared.foreach(k => assert(math.abs(exact(k) - ann(k)) < 1e-12))
  }

  test("pqTopK recall >= 0.9 vs brute force; sims are exact on returned pairs") {
    // the PQ path compresses each 32-dim vector to 4 codes and scores by
    // ADC lookups; the exact-cosine re-rank must leave returned sims
    // identical to brute force on shared pairs
    val (corpus, queries) = clustered
    def result(df: DataFrame) = df.select("qid", "neighbor", "sim")
      .as[(Long, Long, Double)].collect()
    val exact = result(Vectors.bruteForceTopK(corpus, "vec_id", "v", queries, "qid", "qv", 5))
    val pq = result(Vectors.pqTopK(corpus, "vec_id", "v", queries, "qid", "qv", 5))
    val recall = exact.map(r => (r._1, r._2)).toSet
      .intersect(pq.map(r => (r._1, r._2)).toSet).size.toDouble / exact.length
    assert(recall >= 0.9, s"recall $recall")
    val exactSims = exact.map(r => (r._1, r._2) -> r._3).toMap
    pq.foreach { case (q, n, s) =>
      exactSims.get((q, n)).foreach(e => assert(math.abs(e - s) < 1e-12)) }
    // no duplicate pairs, exactly k rows per query
    assert(pq.map(r => (r._1, r._2)).distinct.length === pq.length)
    assert(pq.groupBy(_._1).values.forall(_.length === 5))
  }

  test("ivfPqTopK recall >= 0.9 vs brute force; sims exact; full probe covers") {
    val (corpus, queries) = clustered
    def result(df: DataFrame) = df.select("qid", "neighbor", "sim")
      .as[(Long, Long, Double)].collect()
    val exact = result(Vectors.bruteForceTopK(
      corpus, "vec_id", "v", queries, "qid", "qv", 5))
    val got = result(Vectors.ivfPqTopK(
      corpus, "vec_id", "v", queries, "qid", "qv", 5, subspaces = 4))
    val recall = exact.map(r => (r._1, r._2)).toSet
      .intersect(got.map(r => (r._1, r._2)).toSet).size.toDouble / exact.length
    assert(recall >= 0.9, s"recall $recall")
    // the exact-cosine re-rank leaves sims identical on shared pairs
    val exactSims = exact.map(r => (r._1, r._2) -> r._3).toMap
    got.foreach { case (q, n, s) =>
      exactSims.get((q, n)).foreach(e => assert(math.abs(e - s) < 1e-12)) }
    assert(got.map(r => (r._1, r._2)).distinct.length === got.length)
    assert(got.groupBy(_._1).values.forall(_.length === 5))
    // probing EVERY cell removes the coarse prune entirely: recall 1.0
    // (the shortlist is far wider than any ADC tie group here)
    val full = result(Vectors.ivfPqTopK(
      corpus, "vec_id", "v", queries, "qid", "qv", 5,
      nCells = 4, nProbe = 4, subspaces = 4))
    val fullRecall = exact.map(r => (r._1, r._2)).toSet
      .intersect(full.map(r => (r._1, r._2)).toSet).size.toDouble / exact.length
    assert(fullRecall === 1.0, s"full-probe recall $fullRecall")
    graft.engine.Caches.releaseAll()
  }

  test("scalarQuantize: error bounded at scale/2, constant vector round-trips to vmin") {
    val (corpus, _) = clustered
    val q = Vectors.scalarQuantize(corpus, "vec_id", "v")
    val checked = q.join(corpus, "vec_id")
      .select($"vec_id", $"scale",
        org.apache.spark.sql.functions.call_function(
          "graft_sq8_err", $"v", $"vmin", $"scale").as("err"),
        org.apache.spark.sql.functions.length($"codes").as("n_codes"))
      .as[(Long, Double, Double, Int)].collect()
    assert(checked.length === 500)
    checked.foreach { case (id, scale, err, n) =>
      assert(n === 32, s"vec $id codes length $n")
      assert(err <= scale / 2 * (1 + 1e-9), s"vec $id err $err vs scale $scale")
    }
    // constant vector: scale 0, all-zero codes, dequantizes to exactly vmin
    val const = Seq((1L, Seq.fill(8)(0.25))).toDF("vec_id", "v")
    val row = Vectors.scalarQuantize(const, "vec_id", "v")
      .select($"vmin", $"scale",
        org.apache.spark.sql.functions.call_function(
          "graft_sq8_err", org.apache.spark.sql.functions.typedLit(
            Seq.fill(8)(0.25)), $"vmin", $"scale").as("err"))
      .as[(Double, Double, Double)].head()
    assert(row === ((0.25, 0.0, 0.0)))
  }

  test("sq8TopK recall >= 0.9 vs brute force; sims exact on returned pairs") {
    val (corpus, queries) = clustered
    def result(df: DataFrame) = df.select("qid", "neighbor", "sim")
      .as[(Long, Long, Double)].collect()
    val exact = result(Vectors.bruteForceTopK(corpus, "vec_id", "v", queries, "qid", "qv", 5))
    val sq = result(Vectors.sq8TopK(corpus, "vec_id", "v", queries, "qid", "qv", 5))
    val recall = exact.map(r => (r._1, r._2)).toSet
      .intersect(sq.map(r => (r._1, r._2)).toSet).size.toDouble / exact.length
    assert(recall >= 0.9, s"recall $recall")
    val exactSims = exact.map(r => (r._1, r._2) -> r._3).toMap
    sq.foreach { case (q, n, s) =>
      exactSims.get((q, n)).foreach(e => assert(math.abs(e - s) < 1e-12)) }
    assert(sq.groupBy(_._1).values.forall(_.length === 5))
  }

  test("native graft_dot matches the HOF formulation and propagates nulls") {
    val df = Seq(
      (Option(Seq(1.0, 2.0, 3.0)), Option(Seq(4.0, 5.0, 6.0))),
      (Option(Seq(0.5, -0.5)), Option(Seq(2.0, 2.0))),
      (None, Option(Seq(1.0))),
      (Option(Seq(1.0)), None))
      .toDF("a", "b")
    val out = df.select(
      Vectors.dot(col("a"), col("b")).as("native"),
      Vectors.dotHof(col("a"), col("b")).as("hof")).collect()
    assert(out(0).getDouble(0) === 32.0)
    assert(out(1).getDouble(0) === 0.0)
    out.take(2).foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
    assert(out(2).isNullAt(0) && out(3).isNullAt(0))
  }

  test("graft_dot agrees with the HOF dot on random vectors (property)") {
    val rng = new scala.util.Random(11)
    val rows = Seq.fill(50)((Seq.fill(16)(rng.nextGaussian()),
      Seq.fill(16)(rng.nextGaussian())))
    val out = rows.toDF("a", "b").select(
        Vectors.dot(col("a"), col("b")).as("n"),
        Vectors.dotHof(col("a"), col("b")).as("h"))
      .as[(Double, Double)].collect()
    out.foreach { case (n, h) => assert(math.abs(n - h) < 1e-12) }
  }

  test("graft_dot rejects non-double-array inputs at analysis time") {
    val df = Seq((1, 2)).toDF("a", "b")
    val ex = intercept[Exception] {
      df.select(Vectors.dot(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage.contains("graft_dot") ||
      ex.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("ivfTopK recall >= 0.9 vs brute force at HALF the r4 probe cost") {
    val (corpus, queries) = clustered
    def pairs(df: DataFrame) = df.select("qid", "neighbor")
      .as[(Long, Long)].collect().toSet
    val exact = pairs(Vectors.bruteForceTopK(corpus, "vec_id", "v", queries, "qid", "qv", 5))
    // r4 needed nProbe=4 on the raw seeded centroids; the Lloyd rounds
    // must hold the same recall bar at nProbe=2
    val ivf = pairs(Vectors.ivfTopK(corpus, "vec_id", "v", queries, "qid", "qv", 5,
      nCentroids = 16, nProbe = 2))
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall")
    // no duplicate (qid, neighbor) pairs: one cell per corpus row
    val all = Vectors.ivfTopK(corpus, "vec_id", "v", queries, "qid", "qv", 5)
      .select("qid", "neighbor").as[(Long, Long)].collect()
    assert(all.length === all.distinct.length)
  }

  test("cosineNearDup finds exactly the above-threshold pairs") {
    val (corpus, _) = clustered
    val sub = corpus.filter(col("vec_id") < 60) // deterministic subset (not limit)
    val out = graft.operators.Vectors
      .cosineNearDup(sub, "vec_id", "v", 0.9)
      .as[(Long, Long, Double)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (a, b, s) => a < b && s >= 0.9 })
    // differential check vs a driver-side brute force on the same 60 rows
    val vecs = sub.as[(Long, Seq[Double])].collect().toSeq
    val expected = (for {
      (a, va) <- vecs; (b, vb) <- vecs if a < b
      d = va.zip(vb).map { case (x, y) => x * y }.sum
      na = math.sqrt(va.map(x => x * x).sum); nb = math.sqrt(vb.map(x => x * x).sum)
      if d / (na * nb) >= 0.9
    } yield (a, b)).toSet
    assert(out.map(p => (p._1, p._2)).toSet === expected)
  }

  test("cosineNearDupBucketed is a high-recall subset of the exact pairs") {
    val (corpus, _) = clustered
    val exact = graft.operators.Vectors
      .cosineNearDup(corpus, "vec_id", "v", 0.9)
      .select("da", "db").as[(Long, Long)].collect().toSet
    val bucketed = graft.operators.Vectors
      .cosineNearDupBucketed(corpus, "vec_id", "v", 0.9)
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(bucketed.subsetOf(exact)) // verify step is exact -> no false positives
    assert(bucketed.size.toDouble / exact.size >= 0.9, // tight pairs, hamming<=2 probes
      s"recall ${bucketed.size.toDouble / exact.size}")
  }

  test("semanticDedup keeps exactly the rows with no lower-id near-neighbor") {
    val (corpus, _) = clustered
    val kept = graft.operators.Vectors
      .semanticDedup(corpus, "vec_id", "v", 0.9)
      .select("vec_id").as[Long].collect().toSet
    // reference: greedy-by-id over the exact pair relation
    val drops = graft.operators.Vectors
      .cosineNearDup(corpus, "vec_id", "v", 0.9)
      .select("db").as[Long].collect().toSet
    val all = corpus.select("vec_id").as[Long].collect().toSet
    assert(kept === all -- drops)
    assert(drops.nonEmpty, "fixture must actually deduplicate something")
    // the bucketed twin can only MISS pairs -> it keeps a superset
    val keptB = graft.operators.Vectors
      .semanticDedupBucketed(corpus, "vec_id", "v", 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(kept.subsetOf(keptB))
    assert(kept.size.toDouble / keptB.size >= 0.9, // high recall on clustered data
      s"bucketed kept ${keptB.size} vs exact ${kept.size}")
  }

  test("centroidDistance: exact distances to the per-label mean; singleton at 0") {
    val emb = Seq(
      (0L, Seq(1.0, 0.0), "a"), // centroid a = (2, 0)
      (1L, Seq(3.0, 0.0), "a"),
      (2L, Seq(2.0, 2.0), "a"),
      (3L, Seq(5.0, 5.0), "b")) // singleton: distance 0
      .toDF("vec_id", "v", "label")
      // centroid path averages over THREE a-vectors: (2, 2/3)
    val out = Vectors.centroidDistance(emb, "vec_id", "v", "label")
      .select("vec_id", "dist").as[(Long, Double)].collect().toMap
    val cy = 2.0 / 3
    assert(math.abs(out(0L) - math.sqrt(1 + cy * cy)) < 1e-12)
    assert(math.abs(out(1L) - math.sqrt(1 + cy * cy)) < 1e-12)
    assert(math.abs(out(2L) - (2 - cy)) < 1e-12)
    assert(math.abs(out(3L)) < 1e-12)
  }

  test("kmeansAssign recovers well-separated clusters exactly, deterministically") {
    val rnd = new scala.util.Random(5)
    val centers = Seq(Seq(10.0, 0.0, 0.0), Seq(0.0, 10.0, 0.0), Seq(0.0, 0.0, 10.0))
    val rows = (0 until 300).map { i =>
      val c = centers(i % 3)
      (i.toLong, i % 3, c.map(_ + rnd.nextGaussian() * 0.3))
    }
    val emb = rows.map { case (id, t, v) => (id, v) }.toDF("vec_id", "v")
    def run() = Vectors.kmeansAssign(emb, "vec_id", "v", 3, iters = 5)
      .as[(Long, Int)].collect().toMap
    val got = run()
    val truth = rows.map(r => r._1 -> r._2).toMap
    // each true cluster maps to exactly one predicted label, and the
    // three predicted labels are distinct (exact recovery up to relabel)
    val mapping = truth.groupBy(_._2).map { case (t, m) =>
      t -> m.keys.map(got).toSet
    }
    assert(mapping.values.forall(_.size == 1), s"split cluster: $mapping")
    assert(mapping.values.flatten.toSet.size === 3, s"merged clusters: $mapping")
    assert(run() === got) // deterministic across invocations
  }

  test("kmeansAssign k = 1: every row lands in cluster 0") {
    // the k = 1 degenerate case short-circuits the argmin (no array
    // build, no farthest-first traversal) — r8 advice regression pin
    val emb = Seq((0L, Seq(1.0, 2.0)), (1L, Seq(-3.0, 4.0)),
      (2L, Seq(0.0, 0.0))).toDF("vec_id", "v")
    val out = Vectors.kmeansAssign(emb, "vec_id", "v", k = 1, iters = 2)
      .as[(Long, Int)].collect().toMap
    assert(out === Map(0L -> 0, 1L -> 0, 2L -> 0))
  }

  test("pcaProject rejects empty input with the contract message") {
    val empty = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "v")
    val e = intercept[IllegalArgumentException] {
      Vectors.pcaProject(empty, "vec_id", "v", 1)
    }
    assert(e.getMessage.contains("pcaProject needs > 1 vector, got 0"))
  }

  test("pcaProject recovers the dominant direction; component variances ordered") {
    // anisotropic 4-D corpus: huge spread along (1,1,0,0)/√2, medium
    // along (0,0,1,0), tiny deterministic jitter along (0,0,0,1)
    val rnd = new scala.util.Random(11)
    val rows = (0 until 400).map { i =>
      val a = rnd.nextGaussian() * 10 // dominant
      val b = rnd.nextGaussian() * 2  // secondary
      val c = rnd.nextGaussian() * 0.1
      (i.toLong, Seq(a / math.sqrt(2) + 5, a / math.sqrt(2) - 3, b + 1, c))
    }
    val emb = rows.toDF("vec_id", "v")
    val out = Vectors.pcaProject(emb, "vec_id", "v", 2)
      .select("vec_id", "pc1", "pc2").as[(Long, Double, Double)].collect()
    assert(out.length === 400)
    def variance(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / xs.size
    }
    val v1 = variance(out.map(_._2).toSeq)
    val v2 = variance(out.map(_._3).toSeq)
    // pc1 captures the dominant axis (σ²≈100), pc2 the secondary (≈4)
    assert(v1 > 50 && v1 > 10 * v2, s"v1=$v1 v2=$v2")
    assert(v2 > 1 && v2 < 50, s"v2=$v2")
    // pc1 projection ≈ the generating coordinate `a` (up to sign):
    // correlation with the true dominant coordinate is ~±1
    val as = rows.map(r => (r._2(0) + r._2(1)) / math.sqrt(2)) // = a + const
    val p1 = out.sortBy(_._1).map(_._2).toSeq
    val corr = {
      val ma = as.sum / as.size; val mp = p1.sum / p1.size
      val cov = as.lazyZip(p1).map((x, y) => (x - ma) * (y - mp)).sum
      cov / math.sqrt(as.map(x => (x - ma) * (x - ma)).sum *
        p1.map(y => (y - mp) * (y - mp)).sum)
    }
    assert(math.abs(corr) > 0.999, s"corr=$corr")
    // projections are centered: mean ≈ 0
    assert(math.abs(out.map(_._2).sum / out.length) < 1e-6)
  }

  test("syntheticClustered: deterministic, clustered by id % C, separated") {
    // the judged-recall fixture (q_vec_ann_recall): same ids → identical
    // vectors across invocations, and within-cluster cosine dominates
    // cross-cluster by a wide margin (that margin is what lets the
    // oracle predict the passing id set from arithmetic alone)
    val ids = (0L until 100L).toDF("doc_id")
    def gen() = Vectors.syntheticClustered(ids, "doc_id", 10, 16, 0.08)
      .as[(Long, Seq[Double])].collect().toMap
    val a = gen()
    assert(a === gen(), "fixture must be deterministic")
    def cos(x: Seq[Double], y: Seq[Double]) = {
      val d = x.lazyZip(y).map(_ * _).sum
      d / math.sqrt(x.map(v => v * v).sum * y.map(v => v * v).sum)
    }
    val within = for (c <- 0 until 10; i <- 1 until 10)
      yield cos(a(c.toLong), a((c + 10 * i).toLong))
    val cross = for (c1 <- 0 until 10; c2 <- 0 until 10 if c1 != c2)
      yield cos(a(c1.toLong), a(c2.toLong))
    assert(within.min > 0.98, s"within-cluster min ${within.min}")
    assert(cross.max < 0.4, s"cross-cluster max ${cross.max}")
  }

  test("semanticDecontaminate flags exactly the train rows near an eval vector") {
    // eval = two orthogonal axes; train: doc 1 ≈ axis-0 paraphrase
    // (cos ≈ 0.995), doc 2 = on-axis-1 exact leak, docs 3-4 far
    val eval = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0)).toDF("v")
    val train = Seq(
      (1L, Seq(10.0, 1.0, 0.0)),   // norm-invariant: scaled paraphrase
      (2L, Seq(0.0, 0.5, 0.0)),
      (3L, Seq(0.0, 0.0, 7.0)),
      (4L, Seq(1.0, 1.0, 1.4)))     // cos to both axes < 0.51
      .toDF("vec_id", "v")
    val got = Vectors.semanticDecontaminate(train, "vec_id", "v", eval, "v", 0.6)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.keySet === Set(1L, 2L))
    assert(got(1L)._1 === 1L && got(1L)._2 > 0.99 && got(1L)._2 < 1.0)
    assert(got(2L) === ((1L, 1.0)))
    // threshold low enough to catch doc 4's 0.507 on both axes → n_close 2
    val loose = Vectors.semanticDecontaminate(train, "vec_id", "v", eval, "v", 0.5)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(loose(4L) === 2L)
  }

  test("annTopK fails fast on mismatched embedding width") {
    val corpus = Seq((0L, Seq(1.0, 0.0, 0.0)), (1L, Seq(0.0, 1.0))).toDF("vec_id", "v")
    val q = Seq((9L, Seq(1.0, 0.0, 0.0))).toDF("qid", "qv")
    val ex = intercept[Exception] {
      Vectors.annTopK(corpus, "vec_id", "v", q, "qid", "qv", 1).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("embedding width")))
  }

  test("knnPredict: majority vote, frequency ties to smallest label, k cut") {
    import spark.implicits._
    import org.apache.spark.sql.functions.array
    // 1-D embeddings: query at 1.0; neighbors by |angle| == by value sign
    // proximity. Corpus: three label-7 points near the query, two
    // label-3 points near, one label-0 far — k=5 takes the five near
    // ones: 7 wins 3-2.
    def vec(x: Double, y: Double) = array(lit(x), lit(y))
    val corpus = Seq(
      (1L, 1.0, 0.1, 7), (2L, 1.0, 0.2, 7), (3L, 1.0, 0.3, 7),
      (4L, 1.0, -0.1, 3), (5L, 1.0, -0.2, 3),
      (6L, -1.0, 0.0, 0)).toDF("id", "x", "y", "label")
      .select(col("id"), array(col("x"), col("y")).as("v"), col("label"))
    val q = Seq((100L, 1.0, 0.0)).toDF("qid", "x", "y")
      .select(col("qid"), array(col("x"), col("y")).as("qv"))
    val got = graft.operators.Vectors
      .knnPredict(corpus, "id", "v", "label", q, "qid", "qv", 5)
      .as[(Long, Long, Long)].head()
    assert(got === ((100L, 3L, 7L)))
    // a 2-2 frequency tie breaks to the SMALLEST label: k=4 takes two
    // of each -> prediction 3
    val got4 = graft.operators.Vectors
      .knnPredict(corpus, "id", "v", "label", q, "qid", "qv", 4)
      .as[(Long, Long, Long)].head()
    assert(got4._2 === 2L && got4._3 === 3L)
  }

  test("bq kernels: sign packing (strict > 0), multi-word boundary, Hamming") {
    import spark.implicits._
    import org.apache.spark.sql.functions.call_function
    // dim 3: [1, -1, 0.5] -> bits 0,2 -> word 5; zero packs as 0
    val small = Seq((1L, Seq(1.0, -1.0, 0.5)), (2L, Seq(0.0, 2.0, -3.0)))
      .toDF("id", "v")
    val words = small
      .select(col("id"), call_function("graft_bq_pack", col("v")).as("c"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(words(1L) === Seq(5L) && words(2L) === Seq(2L))
    // dim 66 crosses the word boundary: bits 64 and 65 land in word 1
    val wide = Seq((3L, Seq.fill(64)(-1.0) ++ Seq(1.0, 1.0))).toDF("id", "v")
    assert(wide.select(call_function("graft_bq_pack", col("v")))
      .as[Seq[Long]].head() === Seq(0L, 3L))
    // Hamming = popcount of the XOR across words
    val h = small.as("a").join(small.as("b"),
        col("a.id") === 1L && col("b.id") === 2L)
      .select(call_function("graft_hamming",
        call_function("graft_bq_pack", col("a.v")),
        call_function("graft_bq_pack", col("b.v"))))
      .as[Int].head()
    assert(h === 3) // 5 ^ 2 = 7 -> 3 bits
  }

  test("bqTopK equals brute force on the separated clustered fixture") {
    import spark.implicits._
    val corpus = graft.operators.Vectors.syntheticClustered(
      (0L until 400L).toDF("doc_id"), "doc_id", 8, dim = 16, noise = 0.05)
    val queries = corpus.filter(col("doc_id") % 40 === 0)
      .select(col("doc_id").as("qid"), col("vec").as("qv"))
    val exact = graft.operators.Vectors
      .bruteForceTopK(corpus, "doc_id", "vec", queries, "qid", "qv", 5)
      .select("qid", "neighbor")
    val approx = graft.operators.Vectors
      .bqTopK(corpus, "doc_id", "vec", queries, "qid", "qv", 5)
      .select("qid", "neighbor")
    // exact re-rank of a Hamming shortlist that holds the whole home
    // cluster: the top-5 sets coincide on separated clusters
    assert(exact.exceptAll(approx).isEmpty && approx.exceptAll(exact).isEmpty)
  }

  test("mmrTopK: λ=1000 equals brute-force order, λ=0 covers clusters, short edges") {
    import spark.implicits._
    val corpus = Vectors.syntheticClustered(
      (0L until 200L).toDF("doc_id"), "doc_id", 5, dim = 16, noise = 0.05)
    val queries = corpus.filter(col("doc_id") === 0L)
      .select(col("doc_id").as("qid"), col("vec").as("qv"))
    // pure relevance reproduces the brute-force ORDER, ranks included
    val bf = Vectors.bruteForceTopK(corpus, "doc_id", "vec", queries,
      "qid", "qv", 8).select("qid", "rank", "neighbor")
    val rel = Vectors.mmrTopK(corpus, "doc_id", "vec", queries,
      "qid", "qv", 8, fetch = 199, lambdaMilli = 1000)
      .select("qid", "rank", "neighbor")
    assert(rel.exceptAll(bf).isEmpty && bf.exceptAll(rel).isEmpty)
    // pure diversity: 5 picks land in 5 distinct clusters, and rank 1
    // is still the most relevant candidate
    val div = Vectors.mmrTopK(corpus, "doc_id", "vec", queries,
      "qid", "qv", 5, fetch = 199, lambdaMilli = 0)
      .orderBy("rank").collect()
    assert(div.map(_.getLong(2) % 5).distinct.length === 5)
    val top1 = Vectors.bruteForceTopK(corpus, "doc_id", "vec", queries,
      "qid", "qv", 1).select("neighbor").collect().head.getLong(0)
    assert(div.head.getLong(2) === top1)
    // fewer candidates than k: emit what exists, ranks stay dense
    val tiny = Vectors.syntheticClustered(
      (0L until 4L).toDF("doc_id"), "doc_id", 2, dim = 8, noise = 0.01)
    val q2 = tiny.filter(col("doc_id") === 0L)
      .select(col("doc_id").as("qid"), col("vec").as("qv"))
    val few = Vectors.mmrTopK(tiny, "doc_id", "vec", q2, "qid", "qv",
      10, fetch = 10, lambdaMilli = 500).collect()
    assert(few.length === 3 && few.map(_.getInt(1)).sorted.toSeq === Seq(1, 2, 3))
    intercept[IllegalArgumentException](
      Vectors.mmrTopK(tiny, "doc_id", "vec", q2, "qid", "qv", 5,
        fetch = 3, lambdaMilli = 500))
    graft.engine.Caches.releaseAll()
  }

  test("dbscan2d: core/border/noise roles, isolated core, eps boundary") {
    import spark.implicits._
    val pts = Seq(
      // chain: interior points core, endpoints border, one component
      (0L, 0.0, 0.0), (1L, 0.5, 0.0), (2L, 1.0, 0.0), (3L, 1.5, 0.0),
      (4L, 2.0, 0.0),
      // pure noise
      (10L, 100.0, 100.0),
      // isolated core: 20 sees both borders, 21 and 22 don't see
      // each other -> core with NO core-core edge (own-id label path)
      (20L, 50.0, 50.0), (21L, 50.0, 50.5), (22L, 50.4, 50.0),
      // exactly-eps pair, but no core anywhere near -> both noise
      (30L, 70.0, 70.0), (31L, 70.6, 70.0))
      .toDF("id", "x", "y")
    val got = Vectors.dbscan2d(pts, "id", "x", "y", 0.6, 3)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1)), r.getBoolean(2)))
      .toMap
    assert(got(0L) === ((1L, false)) && got(4L) === ((1L, false)))
    assert(got(1L) === ((1L, true)) && got(2L) === ((1L, true)) &&
      got(3L) === ((1L, true)))
    assert(got(10L) === ((-1L, false)))
    assert(got(20L) === ((20L, true)))
    assert(got(21L) === ((20L, false)) && got(22L) === ((20L, false)))
    assert(got(30L) === ((-1L, false)) && got(31L) === ((-1L, false)))
    graft.engine.Caches.releaseAll()
  }

  test("dbscan2d: grid blocking equals brute-force on a hashed scatter") {
    import spark.implicits._
    // deterministic scatter crossing many grid cells, eps not a divisor
    // of anything in the layout
    val raw = (0L until 120L).map { i =>
      (i, (i * 2654435761L % 173).toDouble / 10.0,
        (i * 40503L % 151).toDouble / 10.0)
    }
    val eps = 1.3
    val minPts = 4
    // reference implementation: closed-ball brute force + BFS components
    def d2(a: (Long, Double, Double), b: (Long, Double, Double)) =
      (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
    val nbrs = raw.map(p =>
      p._1 -> raw.filter(q => q._1 != p._1 && d2(p, q) <= eps * eps)
        .map(_._1).toSet).toMap
    val coreIds = raw.filter(p => nbrs(p._1).size + 1 >= minPts)
      .map(_._1).toSet
    val label = scala.collection.mutable.Map[Long, Long]()
    coreIds.toSeq.sorted.foreach { c =>
      if (!label.contains(c)) {
        var frontier = Set(c); label(c) = c
        while (frontier.nonEmpty) {
          frontier = frontier.flatMap(u =>
            nbrs(u).filter(v => coreIds(v) && !label.contains(v)))
          frontier.foreach(label(_) = c)
        }
      }
    }
    val expected = raw.map { p =>
      if (coreIds(p._1)) p._1 -> ((label(p._1), true))
      else {
        val coreNb = nbrs(p._1).filter(coreIds).map(label)
        if (coreNb.nonEmpty) p._1 -> ((coreNb.min, false))
        else p._1 -> ((-1L, false))
      }
    }.toMap
    val got = Vectors.dbscan2d(raw.toDF("id", "x", "y"), "id", "x", "y",
      eps, minPts).collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1)), r.getBoolean(2)))
      .toMap
    assert(got === expected)
    graft.engine.Caches.releaseAll()
  }

  test("silhouette2d: hand values, singleton/single-cluster zero, " +
      "separated beats merged") {
    import spark.implicits._
    def run(rows: Seq[(Long, Long, Long)]) =
      graft.operators.Vectors.silhouette2d(
        rows.toDF("x", "y", "lbl"), "x", "y", "lbl")
        .orderBy("lbl", "x", "y").collect()
    // cluster 0 = {(0,0),(0,1)}, cluster 1 = {(10,0)} (squared metric)
    val hand = run(Seq((0L, 0L, 0L), (0L, 1L, 0L), (10L, 0L, 1L)))
    // (0,0): a = 1e6, b = 100e6 → s = 99e9 div 1e8 = 990
    assert((hand(0).getLong(3), hand(0).getLong(4), hand(0).getLong(5))
      === ((1000000L, 100000000L, 990L)))
    // (0,1): b = 101e6 → floor identical 990
    assert(hand(1).getLong(5) === 990L)
    // singleton cluster: a NULL, s = 0 by convention, b still real
    assert(hand(2).isNullAt(3) && hand(2).getLong(4) === 100500000L &&
      hand(2).getLong(5) === 0L)
    // single cluster overall: no b → 0
    val solo = run(Seq((0L, 0L, 7L), (3L, 0L, 7L)))
    assert(solo.forall(r => r.isNullAt(4) && r.getLong(5) === 0L))
    // separated labeling scores all-positive; shuffled labels negative
    val good = run(Seq((0L, 0L, 0L), (1L, 0L, 0L),
      (100L, 0L, 1L), (101L, 0L, 1L)))
    assert(good.forall(_.getLong(5) > 900L))
    val bad = run(Seq((0L, 0L, 0L), (1L, 0L, 1L),
      (100L, 0L, 0L), (101L, 0L, 1L)))
    assert(bad.forall(_.getLong(5) < 0L))
  }
}

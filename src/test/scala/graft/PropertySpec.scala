package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.native

/** Property-based checks of the native expressions against reference
  * implementations in plain Scala.
  */
class PropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local(2)

  override def afterAll(): Unit = spark.stop()

  /** Deterministic sampling in place of scalatestplus's forAll (the
    * scalatest-scalacheck bridge isn't on the offline classpath).
    */
  private def samples[A](gen: Gen[A], n: Int): Seq[A] = {
    val params = Gen.Parameters.default.withSize(20)
    (0 until n).map(i => gen.pureApply(params, Seed(42L + i)))
  }

  private val tokenGen = Gen.listOfN(12, Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta",
    "iota", "kappa", "lam", "mu", "nu", "xi"))

  test("blocklist matches exact tokens only - never substrings, counts every occurrence") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the class assignment passes"),      // substrings of "ass" only - no hit
      (2L, "ass"),                               // exact single token
      (3L, "an ass and another ass walked by"),  // two occurrences, one distinct term
      (4L, "spam ass spam"),                     // two distinct banned terms, 3 hits
      (5L, "clean text entirely"),
      (6L, "what an ass. truly"),                // punctuation-adjacent
      (7L, "ass\nnewline\tand spam,comma"),      // newline/tab/comma boundaries
      (8L, "assign ass's owner")                 // apostrophe splits; possessive stem hits
    ).toDF("doc_id", "text")
    val out = graft.textanalysis.Text.blocklistOf(docs, Seq("ass", "spam"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(!out.contains(1L), "substring matches must not flag")
    assert(!out.contains(5L))
    assert(out(2L) == ((1L, "ass")))
    assert(out(3L) == ((2L, "ass")))
    assert(out(4L) == ((3L, "ass,spam")))
    assert(out(6L) == ((1L, "ass")), "term adjacent to punctuation must flag")
    assert(out(7L) == ((2L, "ass,spam")), "newline/tab/comma are word boundaries")
    assert(out(8L) == ((1L, "ass")), "apostrophe is a boundary; 'assign' is not a hit")
  }

  test("blocklist membership becomes an InSet hash set above the conversion threshold") {
    // spark.range keeps the plan non-foldable — a literal LocalRelation
    // would be constant-folded away before the InSet rewrite is visible
    val docs = spark.range(1).select(
      col("id").as("doc_id"),
      concat(lit("t00042 present run"), col("id")).as("text"))
    val terms = (0 until 50).map(i => f"t$i%05d")
    val q = graft.textanalysis.Text.blocklistOf(docs, terms)
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("INSET") || optimized.toLowerCase.contains("inset"),
      s"50-term membership must optimize to InSet (O(1) hash probe per token):\n$optimized")
    val row = q.collect()
    assert(row.length == 1 && row(0).getLong(1) == 1L && row(0).getString(2) == "t00042")
  }

  test("minhash signatures are prefix-compatible across widths") {
    import spark.implicits._
    // the second band family is permutations 64..127 of the SAME
    // Carter-Wegman construction: sig[0..63] of a 128-perm signature must
    // be bit-identical to the 64-perm signature, so widening the LSH
    // never changes what the first 16 bands see (dedup_incremental and
    // the streaming band mirror keep their 64-perm contract untouched)
    for (tokens <- samples(tokenGen, 6)) {
      val df = Seq(Tuple1(tokens.distinct)).toDF("t")
      val row = df.select(
        native.minHashSignature(col("t")).as("s64"),
        native.minHashSignature(col("t"), 128).as("s128")).head
      val s64 = row.getSeq[Long](0)
      val s128 = row.getSeq[Long](1)
      assert(s128.length == 128 && s64.length == 64)
      assert(s128.take(64) == s64, "first 64 perms must match the 64-perm signature")
    }
  }

  test("minhash signature similarity estimates jaccard within tolerance") {
    import spark.implicits._
    for ((a, b) <- samples(tokenGen, 8).zip(samples(tokenGen.map(_.reverse), 8))) {
      {
        val sa = a.toSet
        val sb = b.toSet
        val trueJ = sa.intersect(sb).size.toDouble / sa.union(sb).size
        val df = Seq((a.distinct, b.distinct)).toDF("a", "b")
        val row = df.select(
          native.minHashSignature(col("a")).as("sa"),
          native.minHashSignature(col("b")).as("sb")).head
        val est = row.getSeq[Long](0).zip(row.getSeq[Long](1))
          .count { case (x, y) => x == y } / 64.0
        // 64 permutations: std err ~ sqrt(j(1-j)/64) <= 0.0625; 4 sigma
        assert(math.abs(est - trueJ) <= 0.3)
      }
    }
  }

  test("sortedIntersectCount equals Set.intersect for arbitrary long sets") {
    import spark.implicits._
    val setGen = Gen.listOf(Gen.chooseNum(-50L, 50L))
    for ((a, b) <- samples(setGen, 10).zip(samples(setGen.map(_.map(-_)), 10))) {
      val sa = a.distinct.sorted
      val sb = b.distinct.sorted
      val expected = sa.toSet.intersect(sb.toSet).size
      val got = Seq((sa, sb)).toDF("a", "b")
        .select(native.sortedIntersectCount(col("a"), col("b"))).head.getInt(0)
      assert(got == expected)
    }
  }

  test("cosineSim is bounded and symmetric") {
    import spark.implicits._
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-10.0, 10.0))
      .suchThat(_.exists(_ != 0.0))
    for ((a, b) <- samples(vecGen, 10).zip(samples(vecGen.map(_.map(- _)), 10))) {
      {
        val row = Seq((a, b), (b, a)).toDF("x", "y")
          .select(native.cosineSim(col("x"), col("y"))).collect()
        val c1 = row(0).getDouble(0)
        val c2 = row(1).getDouble(0)
        assert(c1 == c2) // symmetric
        assert(c1 >= -1.0000001 && c1 <= 1.0000001)
      }
    }
  }

  test("rollingHash matches the reference Scala implementation") {
    import spark.implicits._
    for (s <- samples(Gen.asciiPrintableStr, 10)) {
      val expected = s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * 1000003L + (b & 0xffL))
      val got = Seq(s).toDF("t").select(native.rollingHash(col("t"))).head.getLong(0)
      assert(got == expected)
    }
  }

  test("text_rep fractions match a plain-Scala reference on random docs") {
    import spark.implicits._
    for (words <- samples(tokenGen, 10) if words.nonEmpty) {
      val text = words.mkString(" ")
      val n = words.size
      val nd = words.distinct.size
      val grams = (1 to math.max(n - 1, 1)).map(i => words.slice(i - 1, i + 1).mkString(" "))
      // run the same expressions repetition() uses, on this single doc
      val got = Seq(Tuple1(text)).toDF("text")
        .withColumn("w", split(col("text"), " "))
        .withColumn("g2", expr(
          "transform(sequence(1, greatest(size(w) - 1, 1)), i -> array_join(slice(w, i, 2), ' '))"))
        .select(
          expr("cast(size(w) - size(array_distinct(w)) as double) / size(w)"),
          expr("cast(size(g2) - size(array_distinct(g2)) as double) / size(g2)"))
        .head
      assert(got.getDouble(0) == (n - nd).toDouble / n)
      assert(got.getDouble(1) == (grams.size - grams.distinct.size).toDouble / grams.size)
    }
  }

  test("emb_quant codes are int8-bounded and reconstruct within half a step") {
    import spark.implicits._
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-5.0, 5.0))
    for (v <- samples(vecGen, 10)) {
      val maxabs = math.max(v.map(math.abs).max, 1e-12)
      val codes = v.map(x => math.floor(x * 127.0 / maxabs + 0.5).toLong)
      assert(codes.forall(q => q >= -127 && q <= 127), s"code out of int8 range: $codes")
      // reconstruction error bounded by half a quantization step
      val step = maxabs / 127.0
      v.zip(codes).foreach { case (x, q) =>
        assert(math.abs(q * step - x) <= step / 2 + 1e-9)
      }
      // the Spark expression produces exactly these integer sums
      val got = Seq(Tuple1(v)).toDF("emb")
        .withColumn("maxabs", expr("greatest(array_max(transform(emb, x -> abs(x))), 1e-12d)"))
        .select(expr(
          "aggregate(emb, cast(0 as bigint), (acc, x) -> acc + cast(floor(x * 127.0 / maxabs + 0.5) as bigint))"))
        .head.getLong(0)
      assert(got == codes.sum)
    }
  }

  test("BpeMatcher agrees with a naive longest-match reference on random text") {
    // reference: at each position scan the WHOLE vocab for the longest
    // match (no index, no ordering tricks) — the indexed matcher must agree
    // exactly, and the walk must consume every codepoint exactly once
    val vocab = Array(" the", "the", " a", "and", "ing", "ther", "er",
      "row", "key", "t", "a", "e", " ", "0", "42")
    def naive(s: String): (Long, Long) = {
      var pos = 0; var ntok = 0L; var nfb = 0L
      while (pos < s.length) {
        val best = vocab.filter(t => s.startsWith(t, pos))
          .map(_.length).maxOption.getOrElse(0)
        ntok += 1
        if (best == 0) { nfb += 1; pos += Character.charCount(s.codePointAt(pos)) }
        else pos += best
      }
      (ntok, nfb)
    }
    val m = new org.apache.spark.sql.graft.BpeMatcher(vocab)
    val charGen = Gen.frequency(
      6 -> Gen.oneOf('t', 'h', 'e', 'a', 'n', 'd', 'i', 'g', 'r', 'o', 'w', 'k'),
      2 -> Gen.const(' '), 1 -> Gen.oneOf('z', 'q', '!', '4', '2', 'é', '世'))
    val textGen = Gen.listOfN(60, charGen).map(_.mkString)
    for (s <- samples(textGen, 40)) {
      val Array(ntok, nfb) = m.stats(s)
      assert((ntok, nfb) == naive(s), s"matcher diverged on: '$s'")
      assert(nfb <= ntok && ntok <= s.codePointCount(0, s.length).toLong)
      assert((s.nonEmpty && ntok > 0) || (s.isEmpty && ntok == 0))
    }
  }

  test("first-match LSH dedup emits each colliding pair EXACTLY once, at its lowest table") {
    import spark.implicits._
    val nTables = 8 // smaller than production's 24 so collisions are dense
    val sigGen = Gen.listOfN(nTables, Gen.choose(0L, 3L))
    locally {
      val sigs = samples(sigGen, 60).zipWithIndex
        .map { case (bs, id) => (id.toLong, bs) }
      // brute-force reference: (a, b, lowest agreeing table) for a < b
      val want = (for {
        (a, ba) <- sigs; (b, bb) <- sigs if a < b
        t = ba.zip(bb).indexWhere { case (x, y) => x == y } if t >= 0
      } yield (a, b, t)).sorted
      val rows = sigs.flatMap { case (id, bs) =>
        val sig = bs.zipWithIndex.map { case (b, t) => b << (2 * t) }.sum
        bs.zipWithIndex.map { case (b, t) => (id, sig, t, b) }
      }
      val ba = rows.toDF("vec_a", "sig_a", "ta", "ka")
      val bb = rows.toDF("vec_b", "sig_b", "tb", "kb")
      val got = ba.join(bb,
          col("ta") === col("tb") && col("ka") === col("kb")
            && col("vec_a") < col("vec_b"))
        .filter(expr(dedup.Dedup.firstMatchTableFilter(nTables)))
        .select(col("vec_a"), col("vec_b"), col("ta"))
        .as[(Long, Long, Int)].collect().toSeq.sorted
      // EXACT multiset equality: every colliding pair once, no dups, and
      // attributed to its lowest agreeing table
      assert(got == want, s"got ${got.size} vs want ${want.size}")
    }
  }

  test("spearman and kendall match O(n²) brute force on random tied datasets") {
    import spark.implicits._
    // heavy deliberate ties on BOTH axes: 5 quantity values × ~7 price
    // buckets over 120 rows — the midrank/tau-b tie corrections carry
    // real weight in every draw (unlike the near-unique testdata)
    val rowGen = Gen.listOfN(120, Gen.zip(
      Gen.chooseNum(1, 5), Gen.chooseNum(900, 1599)))
    for ((rows, i) <- samples(rowGen, 4).zipWithIndex) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_prop_rank$i").toString
      rows.map { case (q, p) => (q.toDouble, p.toDouble) }
        .toDF("l_quantity", "l_extendedprice")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      val pairs = rows.map { case (q, p) => (q.toLong, (p.toLong * 100) / 10000) }
      // --- spearman reference: doubled midranks + BigInt moments
      def dmr(xs: Seq[Long]): Map[Long, BigInt] = {
        val counts = xs.groupBy(identity).view.mapValues(_.size).toMap
        var below = 0L
        counts.toSeq.sortBy(_._1).map { case (v, c) =>
          val u = BigInt(2) * below + c + 1; below += c; v -> u
        }.toMap
      }
      val (us, vs) = (dmr(pairs.map(_._1)), dmr(pairs.map(_._2)))
      val sRow = operators.Insights.spearman(spark, dir).collect().head
      assert(BigInt(sRow.getAs[String]("suv")) ==
        pairs.map(p => us(p._1) * vs(p._2)).sum)
      assert(BigInt(sRow.getAs[String]("suu")) ==
        pairs.map(p => us(p._1) * us(p._1)).sum)
      assert(BigInt(sRow.getAs[String]("su")) == BigInt(rows.size) * (rows.size + 1))
      // --- kendall reference: O(n²) concordant/discordant
      var conc = 0L; var disc = 0L
      for (a <- pairs.indices; b <- (a + 1) until pairs.size) {
        val s = java.lang.Long.signum(pairs(a)._1 - pairs(b)._1) *
          java.lang.Long.signum(pairs(a)._2 - pairs(b)._2)
        if (s > 0) conc += 1 else if (s < 0) disc += 1
      }
      val kRow = operators.Insights.kendall(spark, dir).collect().head
      assert(BigInt(kRow.getAs[String]("conc")) == conc, s"draw $i conc")
      assert(BigInt(kRow.getAs[String]("disc")) == disc, s"draw $i disc")
      val id = BigInt(kRow.getAs[String]("n_pairs2")) -
        BigInt(kRow.getAs[String]("tie_x2")) -
        BigInt(kRow.getAs[String]("tie_y2")) +
        BigInt(kRow.getAs[String]("tie_xy2"))
      assert(id == 2 * (BigInt(conc) + BigInt(disc)), s"draw $i identity")
    }
  }

  test("emd matches a brute-force ECDF walk on random two-class orders") {
    import spark.implicits._
    val rowGen = Gen.listOfN(100, Gen.zip(
      Gen.chooseNum(100, 4999), Gen.oneOf("1-URGENT", "3-MEDIUM")))
      // guarantee both classes so n_a·n_b > 0 (the fixed-data contract)
      .map(rs => (150, "1-URGENT") :: (250, "3-MEDIUM") :: rs)
    for ((rows, i) <- samples(rowGen, 4).zipWithIndex) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_prop_emd$i").toString
      rows.map { case (d, pr) => (d.toDouble, pr) }
        .toDF("o_totalprice", "o_orderpriority")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      val bk = rows.map { case (d, pr) =>
        ((d.toLong * 100) / 10000, if (pr == "1-URGENT") 1L else 0L) }
      val byBk = bk.groupBy(_._1).map { case (b, a) =>
        (b, a.count(_._2 == 1L).toLong, a.count(_._2 == 0L).toLong)
      }.toSeq.sortBy(_._1)
      val na = bk.count(_._2 == 1L).toLong
      val nb = bk.count(_._2 == 0L).toLong
      var (cuma, cumb, num) = (BigInt(0), BigInt(0), BigInt(0))
      byBk.zip(byBk.drop(1)).foreach { case ((b, ca, cb), (b2, _, _)) =>
        cuma += ca; cumb += cb
        num += (cuma * nb - cumb * na).abs * (b2 - b)
      }
      val row = operators.Insights.emd(spark, dir).collect().head
      assert(row.getAs[Long]("n_a") == na && row.getAs[Long]("n_b") == nb)
      assert(BigInt(row.getAs[String]("w1_num")) == num, s"draw $i")
    }
  }

  test("hooked label propagation reaches the union-find fixpoint on random graphs") {
    import spark.implicits._
    val edgeGen = Gen.listOfN(55,
      Gen.zip(Gen.choose(0L, 39L), Gen.choose(0L, 39L))).map(_.filter(e => e._1 != e._2))
    for (edges <- samples(edgeGen, 5) if edges.nonEmpty) {
      // reference: plain union-find
      val parent = Array.tabulate(40)(identity)
      def find(v: Int): Int = { if (parent(v) != v) parent(v) = find(parent(v)); parent(v) }
      edges.foreach { case (a, b) => parent(find(a.toInt)) = find(b.toInt) }
      val want = (0 until 40).map { v =>
        val root = find(v)
        v.toLong -> (0 until 40).filter(find(_) == root).min.toLong
      }.toMap
      val verts = (0L until 40L).toDF("doc_id")
      val edf = edges.toDF("id_a", "id_b")
      val got = dedup.Dedup.connectedComponents(verts, edf)
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"diverged on ${edges.size} edges")
    }
  }

  test("diversity run-length fold matches the per-type recompute on long skewed docs") {
    import spark.implicits._
    // the r14 fold is O(L log L); this pins its integers to the quadratic
    // definition on documents long enough that the old per-type pass would
    // visibly drag (200k tokens, Zipf-ish skew), plus the degenerate edges
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 5000).map(i => s"tok$i")
    val long1 = Array.fill(200000)(vocab(math.min(4999,
      (math.pow(rnd.nextDouble(), 3) * 5000).toInt))).mkString(" ")
    val docs = Seq(
      (1L, long1), (2L, "solo"), (3L, "a a a a a"), (4L, ""),
      (5L, (1 to 1000).map(_ => "same").mkString(" ")))
      .toDF("doc_id", "text")
    val got = textanalysis.Text.withDiversity(docs)
      .select($"doc_id", $"n_tokens", $"n_types", $"ttr_ppm", $"simpson_ppm")
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    docs.select($"doc_id", $"text").as[(Long, String)].collect().foreach {
      case (id, text) =>
        val words = text.split(" ", -1)
        val n = words.length.toLong
        val counts = words.groupBy(identity).view.mapValues(_.length.toLong)
        val sumSq = counts.values.map(c => c * c).sum
        val (_, gn, gt, gttr, gsim) = got(id)
        assert(gn == n && gt == counts.size.toLong, s"doc $id counts")
        assert(gttr == counts.size.toLong * 1000000L / n, s"doc $id ttr")
        assert(gsim == sumSq * 1000000L / (n * n), s"doc $id simpson")
    }
  }
}

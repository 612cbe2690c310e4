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
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25").toString
    Seq((0L, "spark spark spark pad"), (1L, "spark spark pad pad"),
        (2L, "spark pad pad pad"), (3L, "pad pad pad pad"))
      .toDF("doc_id", "text").write.parquet(dir + "/documents.parquet")
    val s = operators.Search.bm25TopK(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(s(0L) > s(1L) && s(1L) > s(2L) && s(2L) > 0.0)
    assert(!s.contains(3L)) // no query term → filtered, never ranked
  }
}

package graft

import graft.functions.{CsvSerde, DelimitedSerde, Headers, JsonSerde, Paths, TextFns, Times, VectorFns}
import org.apache.spark.sql.functions._

/** Unit tests for the column-function layer (SURVEY.md §5.2-5.3):
  * bucket boundary cases, render/parse round trips, portable hashes. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("5-min bucketing floor semantics at boundaries (TimedUtils.scala:45)") {
    // exactly on a 300s boundary / 1s before / 1s after
    val df = Seq(
      "2024-01-01 00:05:00", "2024-01-01 00:04:59", "2024-01-01 00:05:01"
    ).toDF("s").select(to_timestamp($"s").as("ts"))
    val got = df.select(Times.fiveMinStr($"ts")).as[String].collect()
    assert(got.toSeq == Seq("202401010005", "202401010000", "202401010005"))
  }

  test("bucketEpoch is a floor: bucket(ts) <= ts < bucket(ts)+300") {
    val eps = Tables.events(spark, sf)
      .select(Times.bucketEpoch($"ts", 300L).as("b"), Times.epochSeconds($"ts").as("e"))
      .where(!($"b" <= $"e" && $"e" < $"b" + 300L))
    assert(eps.count() == 0)
  }

  test("partition spec render/parse round trip (P2 ∘ P5 = id)") {
    val df = Seq(("202401011200", "click"), ("x=1", "with/slash")).toDF("logdate", "cat")
    val spec = Paths.renderSpec("logdate" -> $"logdate", "category" -> $"cat")
    val got = df.select(
      Paths.partitionValue(spec, "logdate").as("ld"),
      Paths.partitionValues(spec).as("vals")).collect()
    assert(got(0).getString(0) == "202401011200")
    assert(got(0).getSeq[String](1) == Seq("202401011200", "click"))
  }

  test("header defaulting sentinels (TimedUtils.scala:82-93)") {
    val df = Seq[(Option[String], Option[String])](
      (None, None), (Some("click"), Some("not a ts")), (Some("x"), Some("2024-01-01 00:00:00"))
    ).toDF("cat", "tsraw")
    val got = df.select(
      Headers.categoryOrDefault($"cat").as("c"),
      Headers.timestampClass($"tsraw").as("t")).collect()
    assert(got(0).getString(0) == "no_category" && got(0).getString(1) == "no_timestamp")
    assert(got(1).getString(1) == "invalid_timestamp")
    assert(got(2).getString(1) == "202401010000")
  }

  test("polyHash: deterministic, matches reference fold") {
    def ref(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % TextFns.HashP)
    val got = Seq("hello world", "a", "").toDF("s")
      .select(TextFns.polyHash($"s")).as[Long].collect()
    assert(got.toSeq == Seq(ref("hello world"), ref("a"), 0L))
  }

  test("shingles: n-1 fewer than tokens; short docs → empty") {
    val df = Seq("a b c d e", "a b").toDF("text")
    val got = df.select(size(TextFns.shingles(TextFns.tokens($"text"), 3))).as[Int].collect()
    assert(got.toSeq == Seq(3, 0))
  }

  test("cdcChunksLocal: chunks reassemble the doc; boundaries are content-defined") {
    import graft.functions.TextFns
    val docs = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("text"))
      .collect().map(_.getString(0)).filter(_.nonEmpty)
    assert(docs.nonEmpty)
    var sawMulti = false
    docs.foreach { t =>
      val ch = TextFns.cdcChunksLocal(t)
      // partition property: contiguous, start at 1, cover the doc exactly
      assert(ch.head._1 == 1)
      assert(ch.map(_._2).sum == t.length)
      ch.sliding(2).foreach {
        case Seq((a1, l1, _), (a2, _, _)) => assert(a1 + l1 == a2)
        case _ => ()
      }
      // each chunk hash is the polyhash of its substring
      ch.foreach { case (a, l, h) =>
        assert(h == TextFns.polyHashLocal(t.substring(a - 1, a - 1 + l)))
      }
      if (ch.size > 1) sawMulti = true
    }
    assert(sawMulti, "fixture should produce multi-chunk docs")
    // content-defined, not offset-defined: a prefix insertion only changes
    // chunking up to the first boundary after the edit — the tail chunks
    // of the shifted doc match the original's tail chunk hashes
    val t = docs.maxBy(_.length)
    val orig = TextFns.cdcChunksLocal(t).map(_._3)
    val shifted = TextFns.cdcChunksLocal("zq7 " + t).map(_._3)
    assert(orig.size > 2)
    assert(shifted.takeRight(orig.size - 1) == orig.takeRight(orig.size - 1))
  }

  test("native ShingleHashes matches the HOF chain exactly (values and order)") {
    val toks = TextFns.tokens($"text")
    val mismatch = Tables.documents(spark, sf)
      .select(TextFns.shingleHashes(toks, 3).as("native"),
        TextFns.shingleHashesHof(toks, 3).as("hof"))
      .where(!($"native" <=> $"hof"))
    assert(mismatch.count() == 0)
    // boundary widths: n=1 (tokens themselves) and n > doc length (empty)
    val edge = Seq("a b", "a").toDF("text")
    val e = edge.select(
      TextFns.shingleHashes(TextFns.tokens($"text"), 1).as("n1"),
      TextFns.shingleHashesHof(TextFns.tokens($"text"), 1).as("n1h"),
      TextFns.shingleHashes(TextFns.tokens($"text"), 5).as("n5"),
      TextFns.shingleHashesHof(TextFns.tokens($"text"), 5).as("n5h")).collect()
    e.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
      assert(r.getSeq[Long](2) == r.getSeq[Long](3))
    }
  }

  test("native SimHash32 matches the HOF fold exactly") {
    val sh = TextFns.shingleHashes(TextFns.tokens($"text"), 3)
    val mismatch = Tables.documents(spark, sf)
      .select(TextFns.simhash32(sh).as("native"), TextFns.simhash32Hof(sh).as("hof"))
      .where(!($"native" <=> $"hof"))
    assert(mismatch.count() == 0)
  }

  test("simhash: identical token sets → identical hash; disjoint differ") {
    val df = Seq("spark query engine fast", "spark query engine fast", "totally different words here")
      .toDF("text")
    val h = df.select(TextFns.simhash32(
      transform(TextFns.tokens($"text"), t => TextFns.polyHash(t)))).as[Long].collect()
    assert(h(0) == h(1))
    assert(h(0) != h(2))
  }

  test("serde surface: JSON, CSV and delimited parse to identical structs") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("a", LongType), StructField("b", StringType)))
    val df = Seq((7L, "x"), (9L, "y z")).toDF("a", "b")
      .select($"a", $"b",
        concat(lit("""{"a":"""), $"a", lit(""","b":""""), $"b", lit("\"}")).as("jsonBody"),
        concat_ws(",", $"a", $"b").as("csvBody"),
        concat_ws("\t", $"a", $"b").as("tsvBody"))
    val parsed = df.select($"a", $"b",
      JsonSerde(schema).parse($"jsonBody").as("j"),
      CsvSerde(schema).parse($"csvBody").as("c"),
      DelimitedSerde(Seq("a" -> LongType, "b" -> StringType), "\t").parse($"tsvBody").as("d"))
    parsed.collect().foreach { r =>
      val (a, b) = (r.getLong(0), r.getString(1))
      Seq("j", "c", "d").foreach { f =>
        val s = r.getAs[org.apache.spark.sql.Row](f)
        assert(s.getLong(0) == a && s.getString(1) == b, s"serde $f mismatched")
      }
    }
  }

  test("serde surface: config-driven forName loading (the reference's reflective wiring)") {
    import graft.functions.{BinaryCodec, Serde}
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("a", LongType), StructField("b", StringType)))
    // class with a (StructType) constructor — the metastore-schema path
    val json = Serde.forName("graft.functions.JsonSerde", schema)
    assert(json.schema == schema)
    // DelimitedSerde by name, then the p1b query shape run through it:
    // serialize event fields → parse back → values recovered
    val delim = Serde.forName("graft.functions.DelimitedSerde", schema)
    assert(delim.schema == schema)
    val roundTrip = Seq((7L, "x"), (9L, "y")).toDF("a", "b")
      .select(concat_ws("\t", $"a", $"b").as("body"))
      .select(delim.parse($"body").as("p"))
      .select($"p.a", $"p.b").as[(Long, String)].collect().toSet
    assert(roundTrip == Set(7L -> "x", 9L -> "y"))
    // Scala objects and no-arg classes, via the codec twin
    assert(BinaryCodec.forName("graft.functions.ByteProbeCodec")
      .featureSchema == BinaryCodec.ProbeSchema)
    assert(BinaryCodec.forName("graft.functions.BatchedByteProbeCodec")
      .featureSchema == BinaryCodec.ProbeSchema)
    assert(BinaryCodec.forName("graft.functions.BmpPixelCodec")
      .featureSchema == graft.functions.Bmp.FeatureSchema)
    // the error surface a config typo hits: clear message, not a reflection stack
    val e1 = intercept[IllegalArgumentException](
      Serde.forName("graft.functions.NoSuchSerde", schema))
    assert(e1.getMessage.contains("NoSuchSerde"))
    val e2 = intercept[IllegalArgumentException](
      Serde.forName("graft.functions.ByteProbeCodec", schema)) // wrong kind
    assert(e2.getMessage.contains("not a Serde"))
  }

  test("serde surface: malformed bodies degrade to null fields, never fail the job") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("a", LongType), StructField("b", StringType)))
    val df = Seq("{not json", "xyz|ok", "|", "42|fine").toDF("body")
    val parsed = df.select(
      JsonSerde(schema).parse($"body").as("j"),
      CsvSerde(schema, "|").parse($"body").as("c"),
      DelimitedSerde(Seq("a" -> LongType, "b" -> StringType), "|").parse($"body").as("d"))
      .collect() // must not throw under ANSI mode
    assert(parsed.length == 4)
    val d0 = parsed(1).getAs[org.apache.spark.sql.Row]("d")
    assert(d0.isNullAt(0) && d0.getString(1) == "ok") // bad long -> null, good field kept
    val d3 = parsed(3).getAs[org.apache.spark.sql.Row]("d")
    assert(d3.getLong(0) == 42L && d3.getString(1) == "fine")
  }

  test("binary codecs: column stub and batched mapPartitions adapter agree") {
    val nMedia = graft.operators.Multimodal.mediaTable(spark, sf).count()
    val a = graft.operators.Multimodal
      .mediaFeatures(spark, sf, graft.functions.ByteProbeCodec).collect()
    val b = graft.operators.Multimodal
      .mediaFeatures(spark, sf, graft.functions.BatchedByteProbeCodec(batchSize = 7))
      .collect()
    assert(nMedia > 0 && a.length == nMedia)
    assert(a.toSeq == b.toSeq, "pluggable codecs diverged on identical payloads")
    // the codec's declared feature schema IS the decoded struct's schema
    val decoded = graft.functions.ByteProbeCodec
      .decode(graft.operators.Multimodal.mediaTable(spark, sf), "payload", "f")
    assert(decoded.schema("f").dataType == graft.functions.ByteProbeCodec.featureSchema)
  }

  test("DotProduct null semantics match the HOF form: mismatch/null-element → null") {
    val df = Seq(
      (Seq(1.0, 2.0), Seq(3.0, 4.0)),          // ok: 11.0
      (Seq(1.0, 2.0, 5.0), Seq(3.0, 4.0))      // length mismatch: null
    ).toDF("a", "b")
    val got = df.select(VectorFns.dot($"a", $"b").as("d")).collect()
    assert(got(0).getDouble(0) == 11.0)
    assert(got(1).isNullAt(0), "length mismatch must yield null, not a partial sum")
    // null element → null (same as zip_with/aggregate)
    val withNull = Seq(1).toDF("i")
      .select(array(lit(1.0), lit(null).cast("double")).as("a"),
        array(lit(2.0), lit(3.0)).as("b"))
    val r = withNull.select(VectorFns.dot($"a", $"b").as("d"),
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (acc, v) => acc + v).as("hof"))
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("native DotProduct is bit-identical to the higher-order fold") {
    val dv = transform($"embedding", x => x.cast("double"))
    val mismatch = Tables.embeddings(spark, sf)
      .select(
        aggregate(zip_with(dv, dv, (x, y) => x * y), lit(0.0), (acc, v) => acc + v).as("hof"),
        VectorFns.dot($"embedding", $"embedding").as("native"))
      .where($"hof" =!= $"native") // exact double comparison on purpose
    assert(mismatch.count() == 0)
  }

  test("vector cosine: self-similarity is 1.0") {
    val one = Tables.embeddings(spark, sf).limit(5)
      .select(round(VectorFns.cosine($"embedding", $"embedding"), 9).as("c"))
      .as[Double].collect()
    assert(one.forall(c => math.abs(c - 1.0) < 1e-9))
  }

  test("GraftExtensions: SQL surface equals the DataFrame surface") {
    // register() and the spark.sql.extensions class share one builder list,
    // so exercising the live-session path covers the injection path too
    GraftExtensions.register(spark)
    Tables.documents(spark, sf).limit(50).createOrReplaceTempView("ext_docs")
    Tables.embeddings(spark, sf).limit(50).createOrReplaceTempView("ext_embs")
    val sqlSide = spark.sql(
      """SELECT graft_polyhash(text) AS fp,
         graft_simhash32(graft_shingle_hashes(split(trim(lower(text)), '\\s+'), 3)) AS sh
         FROM ext_docs ORDER BY doc_id""").collect()
    val dfSide = Tables.documents(spark, sf).limit(50).orderBy($"doc_id")
      .select(TextFns.polyHash($"text").as("fp"),
        TextFns.simhash32(TextFns.shingleHashes(TextFns.tokens($"text"), 3)).as("sh"))
      .collect()
    assert(sqlSide.toSeq == dfSide.toSeq)
    val dotMismatch = spark.sql(
      "SELECT graft_dot(embedding, embedding) AS d, embedding FROM ext_embs")
      .where($"d" =!= VectorFns.dot($"embedding", $"embedding"))
    assert(dotMismatch.count() == 0)
    // the shingle width shapes codegen → must be a literal
    intercept[Exception] {
      spark.sql("SELECT graft_shingle_hashes(split(text, ' '), doc_id) FROM ext_docs").collect()
    }
    // wrong arity → clear error, not an index-out-of-bounds from the builder
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dot(embedding) FROM ext_embs").collect()
    }
    assert(e.getMessage.contains("expects 2 argument"))
  }

  test("Bmp: real 24-bit decode — hand-built fixture, padding, row flip, malformed") {
    import graft.functions.{Bmp, BmpSynth}
    // hand-built 3×2 BMP (stride 12 → 3 pad bytes/row); logical top-down
    // pixels (R,G,B): row0 (10,20,30),(11,21,31),(12,22,32)
    //                 row1 (40,50,60),(41,51,61),(42,52,62)
    val w = 3; val h = 2; val st = Bmp.stride(w)
    assert(st == 12)
    val bytes = new Array[Byte](54 + st * h)
    def put32(o: Int, v: Int): Unit = {
      bytes(o) = (v & 0xFF).toByte; bytes(o + 1) = ((v >> 8) & 0xFF).toByte
      bytes(o + 2) = ((v >> 16) & 0xFF).toByte; bytes(o + 3) = ((v >> 24) & 0xFF).toByte
    }
    def put16(o: Int, v: Int): Unit = {
      bytes(o) = (v & 0xFF).toByte; bytes(o + 1) = ((v >> 8) & 0xFF).toByte
    }
    bytes(0) = 'B'; bytes(1) = 'M'
    put32(2, bytes.length); put32(10, 54); put32(14, 40)
    put32(18, w); put32(22, h); put16(26, 1); put16(28, 24)
    put32(30, 0); put32(34, st * h)
    val px = Seq(Seq((10, 20, 30), (11, 21, 31), (12, 22, 32)),
      Seq((40, 50, 60), (41, 51, 61), (42, 52, 62)))
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(y)(x); val o = 54 + (h - 1 - y) * st + x * 3
      bytes(o) = b.toByte; bytes(o + 1) = g.toByte; bytes(o + 2) = r.toByte
    }
    val f = Bmp.decode(bytes).get
    assert(f.getLong(0) == 3 && f.getLong(1) == 2 && f.getLong(2) == 6)
    assert(f.getLong(3) == 10 + 11 + 12 + 40 + 41 + 42, "sum_r")
    assert(f.getLong(4) == 20 + 21 + 22 + 50 + 51 + 52, "sum_g")
    assert(f.getLong(5) == 30 + 31 + 32 + 60 + 61 + 62, "sum_b")
    // top-down weighting — a missed bottom-up flip scores 0*40+...+5*12
    assert(f.getLong(6) == 0 * 10 + 1 * 11 + 2 * 12 + 3 * 40 + 4 * 41 + 5 * 42, "wsum_r")
    assert(f.getLong(7) == 10, "first_r is the TOP-left pixel")
    // synth round trip over ids covering every stride-padding residue
    for (id <- 0L to 7L) {
      val g = Bmp.decode(BmpSynth.render(id)).get
      val wd = BmpSynth.width(id); val ht = BmpSynth.height(id)
      val n = wd.toLong * ht
      def s(a: Long, c: Long) = (0L until n).map(i => (a * id + c * i) % 256).sum
      assert(g.getLong(0) == wd && g.getLong(1) == ht && g.getLong(2) == n)
      assert(g.getLong(3) == s(7, 3) && g.getLong(4) == s(11, 5) && g.getLong(5) == s(13, 7))
      assert(g.getLong(6) == (0L until n).map(i => i * ((7 * id + 3 * i) % 256)).sum)
      assert(g.getLong(7) == (7 * id) % 256)
    }
    // malformed inputs → None (the codec maps these to a null struct)
    assert(Bmp.decode(null).isEmpty)
    assert(Bmp.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(Bmp.decode("XX".getBytes ++ new Array[Byte](60)).isEmpty)
    assert(Bmp.decode(BmpSynth.render(1L).take(60)).isEmpty, "truncated pixel data")
  }

  test("Png: real zlib decode — ImageIO differential, all-filter coverage, corruption") {
    import graft.functions.{BinaryCodec, Bmp, Png, PngSynth}
    for (id <- 0L to 9L) {
      val bytes = PngSynth.render(id)
      val f = Png.decode(bytes).get
      val wd = PngSynth.width(id); val ht = PngSynth.height(id)
      val n = wd.toLong * ht
      def s(a: Long, c: Long) = (0L until n).map(i => (a * id + c * i) % 256).sum
      assert(f.getLong(0) == wd && f.getLong(1) == ht && f.getLong(2) == n)
      assert(f.getLong(3) == s(7, 3) && f.getLong(4) == s(11, 5) && f.getLong(5) == s(13, 7))
      assert(f.getLong(6) == (0L until n).map(i => i * ((7 * id + 3 * i) % 256)).sum)
      assert(f.getLong(7) == (7 * id) % 256)
      // independent decoder: the JDK's own ImageIO must read identical
      // pixels — proof the synthesized stream is a real PNG (valid CRCs,
      // valid zlib, spec-correct filters), not a self-consistent dialect
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null && img.getWidth == wd && img.getHeight == ht)
      var ioSumR = 0L
      for (y <- 0 until ht; x <- 0 until wd) ioSumR += (img.getRGB(x, y) >> 16) & 0xFF
      assert(ioSumR == f.getLong(3), s"ImageIO disagrees on sum_r for id=$id")
    }
    // every image is ≥ 8 rows, so filters 0..4 all occur (y mod 5)
    assert((0L to 9L).forall(PngSynth.height(_) >= 8))
    // corruption → None: truncation, single-bit chunk damage (CRC catch)
    val good = PngSynth.render(3L)
    assert(Png.decode(null).isEmpty)
    assert(Png.decode(good.take(40)).isEmpty, "truncated stream")
    val flipped = good.clone(); flipped(40) = (flipped(40) ^ 1).toByte
    assert(Png.decode(flipped).isEmpty, "chunk corruption must fail the CRC")
    // reflective codec loading (the config-driven seam) resolves PNG too
    assert(BinaryCodec.forName("graft.functions.PngPixelCodec")
      .featureSchema == Bmp.FeatureSchema)
  }

  test("Wav: real PCM decode — javax.sound differential, chunk walk, corruption") {
    import graft.functions.{BinaryCodec, Wav, WavSynth}
    for (id <- 0L to 9L) {
      val bytes = WavSynth.render(id)
      val f = Wav.decode(bytes).get
      val n = WavSynth.nSamples(id)
      assert(f.getLong(0) == n && f.getLong(1) == WavSynth.sampleRate(id))
      val samples = (0 until n).map(t => WavSynth.sample(id, t).toLong)
      assert(f.getLong(2) == samples.sum, s"sum_s for $id")
      assert(f.getLong(3) == samples.map(s => s * s).sum, s"sum_sq for $id")
      assert(f.getLong(4) == samples.zipWithIndex.map { case (s, t) => t * s }.sum)
      assert(f.getLong(5) == samples.head)
      // independent decoder: the JDK's own javax.sound must read identical
      // samples — proof the bytes are a real WAV, not a private dialect
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      assert(fmt.getSampleRate.toInt == WavSynth.sampleRate(id) &&
        fmt.getChannels == 1 && fmt.getSampleSizeInBits == 16)
      val raw = ais.readAllBytes()
      assert(raw.length == n * 2)
      var jdkSum = 0L
      var t = 0
      while (t < n) {
        jdkSum += ((raw(2 * t) & 0xFF) | (raw(2 * t + 1) << 8)).toShort.toLong
        t += 1
      }
      assert(jdkSum == f.getLong(2), s"javax.sound disagrees on sum_s for id=$id")
    }
    // corruption → None: truncation, non-PCM format tag, stereo claim
    val good = WavSynth.render(5L)
    assert(Wav.decode(null).isEmpty)
    assert(Wav.decode(good.take(40)).isEmpty, "truncated header")
    assert(Wav.decode(good.take(200)).isEmpty, "data chunk overruns buffer")
    val nonPcm = good.clone(); nonPcm(20) = 3 // IEEE-float format tag
    assert(Wav.decode(nonPcm).isEmpty, "non-PCM must be rejected")
    val stereo = good.clone(); stereo(22) = 2
    assert(Wav.decode(stereo).isEmpty, "stereo must be rejected")
    // reflective codec loading resolves the audio codec too
    assert(BinaryCodec.forName("graft.functions.WavSampleCodec")
      .featureSchema == Wav.FeatureSchema)
  }

  test("Avi: real container frame sampling — chunk walk, even-frame subset, corruption") {
    import graft.functions.{Avi, AviSynth, BinaryCodec}
    for (id <- 0L to 9L) {
      val f = Avi.decode(AviSynth.render(id)).get
      val nf = AviSynth.nFrames(id)
      val w = AviSynth.width(id); val h = AviSynth.height(id)
      val n = w.toLong * h
      assert(f.getLong(0) == nf && f.getLong(1) == w && f.getLong(2) == h)
      assert(f.getLong(3) == (nf + 1) / 2, "every-2nd-frame count")
      // recompute from the closed form over ONLY the even frames — an
      // off-by-one sampler or a stride slip between chunks breaks these
      val sampled = (0 until nf).filter(_ % 2 == 0)
      def frameSum(fr: Int) = (0L until n).map(i => (7 * id + 3 * i + 19 * fr) % 256).sum
      assert(f.getLong(4) == sampled.map(frameSum).sum, s"sum_r for $id")
      assert(f.getLong(5) == sampled.map(fr => fr * frameSum(fr)).sum, s"wsum_r for $id")
      assert(f.getLong(6) == (7 * id) % 256)
    }
    // corruption → None: truncation, frame/header size disagreement, form tag
    val good = AviSynth.render(4L)
    assert(Avi.decode(null).isEmpty)
    assert(Avi.decode(good.take(100)).isEmpty, "truncated movi list")
    val badForm = good.clone(); badForm(8) = 'W'
    assert(Avi.decode(badForm).isEmpty, "non-AVI RIFF form")
    val badW = good.clone()
    badW(32 + 32) = (badW(32 + 32) + 1).toByte // avih dwWidth +1 → frame size mismatch
    assert(Avi.decode(badW).isEmpty, "frame chunk disagreeing with header dims")
    assert(BinaryCodec.forName("graft.functions.AviFrameCodec")
      .featureSchema == Avi.FeatureSchema)
  }

  test("Jpeg: real baseline decode — ImageIO differential, closed-form loss, corruption") {
    import graft.functions.{BinaryCodec, Jpeg, JpegSynth}
    for (id <- 0L to 23L) {
      // constant-block streams: the lossy round trip is CLOSED-FORM (the
      // Annex-K DC quantizer divides the DC scale), pinned exactly
      val f = Jpeg.decode(JpegSynth.render(id)).get
      val w = JpegSynth.width(id); val h = JpegSynth.height(id)
      val wb = w / 8; val hb = h / 8
      var sum = 0L; var wsum = 0L
      for (by <- 0 until hb; bx <- 0 until wb) {
        val p = JpegSynth.decodedValue(JpegSynth.blockValue(id, by.toLong * wb + bx))
        sum += 64L * p
        wsum += (8L * w * (64L * by + 28) + 8L * (64L * bx + 28)) * p
      }
      assert(f.getLong(0) == w && f.getLong(1) == h && f.getLong(2) == w.toLong * h)
      assert(f.getLong(3) == sum, s"sum_g for id=$id")
      assert(f.getLong(4) == wsum, s"wsum_g for id=$id")
      assert(f.getLong(5) == JpegSynth.decodedValue(JpegSynth.blockValue(id, 0)))
      // patterned streams exercise AC runs, ZRL and the full IDCT; the
      // JDK's own ImageIO must decode the same bytes to within the
      // standard's decoder-accuracy latitude (±1 per pixel)
      val pat = JpegSynth.renderPatterned(id)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(pat))
      assert(img != null && img.getWidth == w && img.getHeight == h,
        s"ImageIO rejected the synthesized stream for id=$id")
      val fp = Jpeg.decode(pat).get
      var ioSum = 0L
      for (y <- 0 until h; x <- 0 until w) ioSum += img.getRaster.getSample(x, y, 0)
      assert(math.abs(ioSum - fp.getLong(3)) <= w.toLong * h,
        s"ImageIO disagrees beyond the ±1/pixel budget for id=$id")
    }
    // restart intervals: RSTn markers re-sync the coder and reset DC
    // prediction — decoded pixels must be IDENTICAL to the marker-free
    // stream, and ImageIO must accept the DRI stream too
    for (id <- 0L to 5L) {
      val w = JpegSynth.width(id); val h = JpegSynth.height(id)
      def px(x: Int, y: Int): Int = ((7 * id + 3 * (y.toLong * w + x)) % 256).toInt
      val plain = Jpeg.decode(JpegSynth.encode(w, h, px)).get
      val withRst = JpegSynth.encode(w, h, px, restartInterval = 3)
      val rst = Jpeg.decode(withRst).get
      assert((0 until 6).forall(i => plain.getLong(i) == rst.getLong(i)),
        s"restart-interval stream decoded differently for id=$id")
      val io = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(withRst))
      assert(io != null && io.getWidth == w, s"ImageIO rejected the DRI stream for id=$id")
      // a stream whose RSTn sequence is out of order must be rejected
      val broken = withRst.clone()
      val rstPos = (0 until broken.length - 1).find(i =>
        (broken(i) & 0xFF) == 0xFF && (broken(i + 1) & 0xFF) == 0xD0).get
      broken(rstPos + 1) = 0xD5.toByte
      assert(Jpeg.decode(broken).isEmpty, "out-of-sequence RSTn must reject")
    }
    // 3-component 4:4:4 YCbCr: interleaved multi-component entropy decode
    // (per-component quant/Huffman tables and DC predictions); features
    // report the LUMA plane, so for block-constant planes the Y stats
    // must equal the grayscale closed form exactly — chroma loss cannot
    // leak into Y — and ImageIO's RGB must invert to Y within the
    // conversion-roundtrip budget
    for (id <- 0L to 7L) {
      val w = JpegSynth.width(id); val h = JpegSynth.height(id)
      val wb = w / 8
      def blk(x: Int, y: Int): Long = (y / 8).toLong * wb + (x / 8)
      def yP(x: Int, y: Int): Int = JpegSynth.blockValue(id, blk(x, y))
      // chroma near neutral: far-from-128 Cb/Cr clamp R/G/B out of gamut
      // in the RGB conversion, which destroys Y-invertibility — gamut
      // loss, not decoder error
      def cbP(x: Int, y: Int): Int = (118 + (91 * id + 5 * blk(x, y)) % 20).toInt
      def crP(x: Int, y: Int): Int = (118 + (53 * id + 3 * blk(x, y)) % 20).toInt
      val color = JpegSynth.encodeColor(w, h, yP, cbP, crP)
      val f = Jpeg.decode(color).get
      var sum = 0L
      for (by <- 0 until h / 8; bx <- 0 until wb)
        sum += 64L * JpegSynth.decodedValue(JpegSynth.blockValue(id, by.toLong * wb + bx))
      assert(f.getLong(0) == w && f.getLong(1) == h)
      assert(f.getLong(3) == sum, s"color-stream luma sum for id=$id")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(color))
      assert(img != null && img.getWidth == w && img.getHeight == h,
        s"ImageIO rejected the 4:4:4 color stream for id=$id")
      var ioY = 0.0
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        ioY += 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
          0.114 * (rgb & 0xFF)
      }
      assert(math.abs(ioY - f.getLong(3)) <= 3.0 * w * h,
        s"ImageIO RGB does not invert to the decoded luma for id=$id")
      // restart intervals compose with multi-component MCUs (all three DC
      // predictions reset at the marker)
      val rst = Jpeg.decode(JpegSynth.encodeColor(w, h, yP, cbP, crP,
        restartInterval = 2)).get
      assert((0 until 6).forall(i => f.getLong(i) == rst.getLong(i)),
        s"color restart stream decoded differently for id=$id")
    }
    // 4:2:0 — the near-universal real-world layout: 16×16 MCUs of four
    // luma blocks + one block per subsampled chroma plane. Same exactness
    // argument: block-constant luma decodes to the closed form, and the
    // luma block PLACEMENT inside the MCU is pinned by wsum_g (a swapped
    // 2×2 raster order hash-mismatches immediately)
    for (id <- 0L to 5L) {
      val w = 16 * (id % 3 + 1).toInt; val h = 16 * (id % 2 + 1).toInt
      val wb = w / 8
      def blk(x: Int, y: Int): Long = (y / 8).toLong * wb + (x / 8)
      def yP(x: Int, y: Int): Int = JpegSynth.blockValue(id, blk(x, y))
      def cP(x: Int, y: Int): Int = (118 + (7 * id + x + y) % 20).toInt
      val c420 = JpegSynth.encodeColor420(w, h, yP, cP, cP)
      val f = Jpeg.decode(c420).get
      var sum = 0L; var wsum = 0L
      for (by <- 0 until h / 8; bx <- 0 until wb) {
        val p = JpegSynth.decodedValue(JpegSynth.blockValue(id, by.toLong * wb + bx))
        sum += 64L * p
        wsum += (8L * w * (64L * by + 28) + 8L * (64L * bx + 28)) * p
      }
      assert(f.getLong(0) == w && f.getLong(1) == h)
      assert(f.getLong(3) == sum, s"4:2:0 luma sum for id=$id")
      assert(f.getLong(4) == wsum, s"4:2:0 luma wsum (block placement) for id=$id")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(c420))
      assert(img != null && img.getWidth == w && img.getHeight == h,
        s"ImageIO rejected the 4:2:0 stream for id=$id")
      var ioY = 0.0
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        ioY += 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
          0.114 * (rgb & 0xFF)
      }
      assert(math.abs(ioY - f.getLong(3)) <= 3.0 * w * h,
        s"ImageIO RGB does not invert to the 4:2:0 luma for id=$id")
      // restart intervals over 16×16 MCUs
      val rst = Jpeg.decode(JpegSynth.encodeColor420(w, h, yP, cP, cP,
        restartInterval = 1)).get
      assert((0 until 6).forall(i => f.getLong(i) == rst.getLong(i)),
        s"4:2:0 restart stream decoded differently for id=$id")
    }
    // corruption → None: truncation, entropy-stream damage, non-baseline
    val good = JpegSynth.render(5L)
    assert(Jpeg.decode(null).isEmpty)
    assert(Jpeg.decode(good.take(2)).isEmpty, "bare SOI")
    assert(Jpeg.decode(good.take(good.length / 2)).isEmpty, "truncated entropy stream")
    val sof = {
      var i = 2
      while (!((good(i) & 0xFF) == 0xFF && (good(i + 1) & 0xFF) == 0xC0)) i += 1
      i
    }
    val progressive = good.clone(); progressive(sof + 1) = 0xC2.toByte
    assert(Jpeg.decode(progressive).isEmpty, "progressive SOF must be rejected")
    val huge = good.clone()
    huge(sof + 5) = 0xFF.toByte; huge(sof + 6) = 0xFF.toByte // h = 65535
    huge(sof + 7) = 0xFF.toByte; huge(sof + 8) = 0xFF.toByte // w = 65535
    assert(Jpeg.decode(huge).isEmpty, "implausible dimensions must be rejected")
    assert(BinaryCodec.forName("graft.functions.JpegGrayCodec")
      .featureSchema == Jpeg.FeatureSchema)
  }

  test("codec hardening: Int-overflow lengths and allocation bombs degrade to None") {
    import graft.functions.{Avi, AviSynth, Bmp, Png, PngSynth, Wav, WavSynth}
    def findTag(b: Array[Byte], t: String): Int = {
      val pat = t.getBytes("US-ASCII")
      (0 until b.length - 4).find(i => pat.indices.forall(j => b(i + j) == pat(j))).get
    }
    def le32(b: Array[Byte], o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
      b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
    }
    // PNG chunk length near 2^31: the Int sum off+12+len wraps negative and
    // would pass the bounds check, then the CRC read throws — the Long-math
    // check must reject it instead
    val png = PngSynth.render(3L)
    val idatLenOff = findTag(png, "IDAT") - 4
    val bomb = png.clone()
    bomb(idatLenOff) = 0x7F.toByte; bomb(idatLenOff + 1) = 0xFF.toByte
    bomb(idatLenOff + 2) = 0xFF.toByte; bomb(idatLenOff + 3) = 0x00.toByte
    assert(Png.decode(bomb).isEmpty, "2^31-ish chunk length must reject, not throw")

    // PNG allocation bomb: a ~60-byte payload with VALID CRCs demanding a
    // multi-GB pixel buffer (or overflowing rowBytes*h) must be rejected by
    // the inflate-ratio cap BEFORE any allocation happens
    def pngChunk(out: java.io.ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
      def be32(v: Long): Array[Byte] = Array(((v >> 24) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
      val tg = typ.getBytes("US-ASCII")
      out.write(be32(data.length), 0, 4); out.write(tg, 0, 4)
      out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32(); crc.update(tg); crc.update(data)
      out.write(be32(crc.getValue), 0, 4)
    }
    def hugePng(w: Int, h: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte), 0, 8)
      val ihdr = new Array[Byte](13)
      def p32(o: Int, v: Int): Unit = {
        ihdr(o) = (v >> 24).toByte; ihdr(o + 1) = (v >> 16).toByte
        ihdr(o + 2) = (v >> 8).toByte; ihdr(o + 3) = v.toByte
      }
      p32(0, w); p32(4, h); ihdr(8) = 8; ihdr(9) = 2 // depth 8, truecolor
      pngChunk(out, "IHDR", ihdr)
      pngChunk(out, "IDAT", Array[Byte](0x78, 0x9C.toByte)) // bare zlib header
      pngChunk(out, "IEND", Array.emptyByteArray)
      out.toByteArray
    }
    assert(Png.decode(hugePng(20000, 20000)).isEmpty, "multi-GB alloc demand")
    assert(Png.decode(hugePng(40000, 40000)).isEmpty, "rowBytes*h Int overflow")

    // BMP width ≥ 715,827,883 wraps the stride negative, turning the Long
    // bounds check into a no-op — must be rejected on width
    assert(Bmp.strideOverflows(715827882) && !Bmp.strideOverflows(715827881))
    val bmp = new Array[Byte](54)
    bmp(0) = 'B'; bmp(1) = 'M'
    le32(bmp, 10, 54); le32(bmp, 18, 800000000); le32(bmp, 22, 1)
    bmp(28) = 24; le32(bmp, 30, 0)
    assert(Bmp.decode(bmp).isEmpty, "stride-overflow width must be rejected")

    // WAV data-chunk length near 2^31 wraps the walker offset negative
    val wav = WavSynth.render(5L).clone()
    le32(wav, 40, 0x7FFFFFF0)
    assert(Wav.decode(wav).isEmpty, "2^31-ish RIFF chunk length must reject")

    // AVI: huge frame-chunk length inside the movi list
    val avi = AviSynth.render(4L).clone()
    le32(avi, findTag(avi, "00db") + 4, 0x7FFFFFF0)
    assert(Avi.decode(avi).isEmpty, "2^31-ish movi chunk length must reject")
  }

  test("x11c: distributed BMP decode matches the closed-form pixel oracle per row") {
    import graft.functions.{BmpPixelCodec, BmpSynth}
    val rows = graft.operators.Multimodal.imageDecode(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val wd = BmpSynth.width(id); val ht = BmpSynth.height(id)
      val n = wd.toLong * ht
      assert(r.getLong(1) == wd && r.getLong(2) == ht && r.getLong(3) == n)
      assert(r.getLong(4) == (0L until n).map(i => (7 * id + 3 * i) % 256).sum, s"sum_r for $id")
      assert(r.getLong(8) == (7 * id) % 256, s"first_r for $id")
    }
    // null payload → null feature struct fields, not a crash
    val df = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(1L, null)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("payload",
          org.apache.spark.sql.types.BinaryType))))
    val d = BmpPixelCodec(batchSize = 2).decode(df, "payload", "f")
      .select(col("f.width")).collect().head
    assert(d.isNullAt(0))
  }

  test("f5/f6: per-key JSON semantics are pinned on missing/null/non-numeric k (DuckDB-verified)") {
    import java.sql.Timestamp
    import graft.operators.Relational
    // the sf fixtures only ever carry {"k": <int>} — pin the divergence
    // cases on a constructed events dir; expectations below are the exact
    // tuples DuckDB returns for the f5/f6 oracle SQL over the same props
    val props = Seq("""{"k": 5}""", """{"k": null}""", "{}", """{"k": "abc"}""", """{"k": "7"}""")
    val dir = graft.Tables.scratchDir("graft_json_edge_").toString
    props.zipWithIndex.map { case (p, i) =>
      (i + 1L, new Timestamp(1700000000000L + i * 1000L), 10L + i, "click", 1.0, p)
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")

    val f6 = Relational.mapFuncs(spark, dir).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1),
        r.getBoolean(2), r.getLong(3)))
    assert(f6.toSeq == Seq(
      (1L, 5L, true, 1L), (2L, null, true, 1L), (3L, null, false, 0L),
      (4L, null, true, 1L), (5L, 7L, true, 1L)),
      s"f6 per-key semantics diverged from the DuckDB oracle: ${f6.toSeq}")

    val f5 = Relational.jsonFuncs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getLong(2),
        r.getLong(3), r.getString(5)))
    assert(f5.toSeq == Seq(
      (1L, "5", 5L, 1L, "5"), (2L, null, null, 1L, null),
      (3L, null, null, 0L, null), (4L, "abc", null, 1L, "abc"),
      (5L, "7", 7L, 1L, "7")),
      s"f5 per-key semantics diverged from the DuckDB oracle: ${f5.toSeq}")
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Maintenance, VersionedLayers}

/** The reader-isolation contract of the versioned layer store
  * (VERDICT r16 #2): probes running CONCURRENTLY with folds observe
  * exactly a published snapshot — never a torn one — and the crash
  * discipline (orphan store dirs, crash-before-pointer, replay, GC)
  * holds without the legacy trash protocol. */
class VersionedLayersSpec extends SparkSpec {
  import spark.implicits._

  private def rows(ids: Range, stamp: Int): DataFrame =
    ids.map(i => (i.toLong, stamp)).toDF("doc_id", "stamp")

  private def observed(dir: String): Set[(Long, Int)] =
    VersionedLayers.readAny(spark, dir)
      .select(col("doc_id"), col("stamp")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet

  test("concurrent probes during delete/append/compact folds observe only " +
      "published snapshots, never partial state (VERDICT r16 #2)") {
    val dir = Tables.scratchDir("graft_vl_concurrent").toString
    VersionedLayers.init(spark, dir)

    def set(ids: Range, stamp: Int): Set[(Long, Int)] =
      ids.map(i => (i.toLong, stamp)).toSet

    // the scripted fold sequence and its legal snapshot states: every op
    // is one publish, so a reader at ANY point sees exactly one of these
    val l1 = set(1 to 100, 1)
    val l2 = set(51 to 100, 1)
    val l3 = l2 ++ set(1 to 50, 3)
    val l4 = set(1 to 50, 3)
    val l5 = l4 ++ set(51 to 100, 6)
    val legal = Set(l1, l2, l3, l4, l5)

    VersionedLayers.writeTagged(spark, dir, "a", rows(1 to 100, 1))
    assert(observed(dir) == l1)

    // readers hammer the artifact from other threads while the writer
    // folds; each observation must be a member of the legal set — a torn
    // read (half-rewritten layer, missing layer mid-compact, doubled
    // rows) is not a member
    val bad = new java.util.concurrent.ConcurrentLinkedQueue[Set[(Long, Int)]]()
    val nObs = new java.util.concurrent.atomic.AtomicInteger(0)
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val readers = (1 to 2).map { _ =>
      new Thread(() => {
        while (!done.get()) {
          val o = observed(dir)
          nObs.incrementAndGet()
          if (!legal.contains(o)) bad.add(o)
        }
      })
    }
    readers.foreach { t => t.setDaemon(true); t.start() }
    try {
      Dedup.dedupIndexDeleteKeys(spark, dir, (1 to 50).map(_.toLong).toDF("doc_id"))
      VersionedLayers.writeTagged(spark, dir, "b", rows(1 to 50, 3))
      Maintenance.compactLayers(spark, dir, "compacted", Seq.empty, "graft_vl_c1_")
      Dedup.dedupIndexDeleteKeys(spark, dir,
        (51 to 100).map(_.toLong).toDF("doc_id"))
      VersionedLayers.writeTagged(spark, dir, "c", rows(51 to 100, 6))
      Maintenance.compactLayers(spark, dir, "compacted", Seq.empty, "graft_vl_c2_")
    } finally {
      done.set(true)
      readers.foreach(_.join(30000L))
    }
    assert(nObs.get() > 0, "the reader threads never completed a probe")
    assert(bad.isEmpty,
      s"concurrent probes observed ${bad.size} non-snapshot states, e.g. " +
        s"${Option(bad.peek()).map(_.toSeq.sortBy(_._1).take(10)).orNull}")
    assert(observed(dir) == l5)
    assert(VersionedLayers.layers(spark, dir).map(_.tag) == Seq("compacted"))
  }

  test("crash discipline: orphan store dirs are invisible and GC'd; a crash " +
      "before the pointer move leaves the prior version intact; a replayed " +
      "publish converges; empty layers drop their tag") {
    import org.apache.hadoop.fs.Path
    val dir = Tables.scratchDir("graft_vl_crash").toString
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prevGrace = System.setProperty("graft.versioned.gcGraceMs", "0")
    try {
      VersionedLayers.init(spark, dir)
      VersionedLayers.writeTagged(spark, dir, "a", rows(1 to 10, 1))

      // crash mid-write: an orphan store dir no manifest references —
      // readers never see it
      rows(900 to 999, 9).write.parquet(new Path(root, "store/junk-g99").toString)
      assert(observed(dir) == (1 to 10).map(i => (i.toLong, 1)).toSet)

      // crash before the pointer move: a manifest file exists beyond the
      // pointer — the artifact still reads at the prior version, and the
      // (leased) writer's retry clobbers the orphan manifest
      val orphan = fs.create(new Path(root, "manifests/m-2"), true)
      try orphan.write("ghost\tghost-g2\n".getBytes("UTF-8")) finally orphan.close()
      assert(observed(dir) == (1 to 10).map(i => (i.toLong, 1)).toSet)

      // replayed publish of the same tag: ONE manifest entry, fresh
      // content, convergent
      VersionedLayers.writeTagged(spark, dir, "b", rows(11 to 20, 2))
      VersionedLayers.writeTagged(spark, dir, "b", rows(11 to 20, 3))
      assert(VersionedLayers.layers(spark, dir).count(_.tag == "b") == 1)
      assert(observed(dir) ==
        ((1 to 10).map(i => (i.toLong, 1)) ++ (11 to 20).map(i => (i.toLong, 3))).toSet)

      // GC (grace 0): after two more publishes the junk store dir and
      // stale manifests are gone; the live layers' dirs survive
      VersionedLayers.writeTagged(spark, dir, "gc1", rows(21 to 21, 4))
      VersionedLayers.writeTagged(spark, dir, "gc2", rows(22 to 22, 5))
      assert(!fs.exists(new Path(root, "store/junk-g99")),
        "unreferenced store dir survived GC")
      val live = VersionedLayers.layers(spark, dir).map(_.rel).toSet
      val onDisk = fs.listStatus(new Path(root, "store")).map(_.getPath.getName).toSet
      assert(live.subsetOf(onDisk), s"live layers missing from store: $live vs $onDisk")

      // an empty publish stays harmless: the footer-only layer reads as
      // 0 rows (schema preserved), the artifact's contents are unchanged,
      // and a delete fold that empties a tag still drops it (the
      // differential spec's rewrite path)
      val before = observed(dir)
      VersionedLayers.writeTagged(spark, dir, "empty1",
        rows(1 to 10, 1).where(lit(false)))
      assert(observed(dir) == before)
      // a tag emptied BY THE DELETE FOLD is dropped from the manifest
      Dedup.dedupIndexDeleteKeys(spark, dir, Seq(22L).toDF("doc_id"))
      assert(!VersionedLayers.layers(spark, dir).exists(_.tag == "gc2"),
        "a fold-emptied tag must leave the manifest")
    } finally {
      if (prevGrace == null) System.clearProperty("graft.versioned.gcGraceMs")
      else System.setProperty("graft.versioned.gcGraceMs", prevGrace)
    }
  }

  test("versioned delete fold matches the legacy fold row-for-row and prunes " +
      "untouched layers (the dirty-layer economics carry over)") {
    val vDir = Tables.scratchDir("graft_vl_diff_v").toString
    val lDir = Tables.scratchDir("graft_vl_diff_l").toString
    VersionedLayers.init(spark, vDir)
    Seq(vDir, lDir).foreach { d =>
      VersionedLayers.writeTagged(spark, d, "t1", rows(1 to 40, 1))
      VersionedLayers.writeTagged(spark, d, "t2", rows(41 to 80, 2))
      VersionedLayers.writeTagged(spark, d, "t3", rows(81 to 120, 3))
    }
    val keys = Seq(5L, 45L).toDF("doc_id")
    val dv = Dedup.dedupIndexDeleteKeys(spark, vDir, keys)
    val dl = Dedup.dedupIndexDeleteKeys(spark, lDir, keys)
    assert(dv == dl && dv == Seq("t1", "t2"), s"dirty tags: $dv vs $dl")
    val v = VersionedLayers.readAny(spark, vDir)
      .select(col("doc_id"), col("stamp"), col("batch")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val l = VersionedLayers.readAny(spark, lDir)
      .select(col("doc_id"), col("stamp"), col("batch")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(v == l, "versioned and legacy delete folds diverged")
    // the untouched layer kept its exact store dir (no rewrite)
    val t3 = VersionedLayers.layers(spark, vDir).find(_.tag == "t3").get
    assert(t3.rel == "t3-g3", s"untouched layer was rewritten: ${t3.rel}")
  }

  test("cell-granular artifact: a delete swaps only the dirty (tag, cell) " +
      "leaves — clean cells of the SAME tag keep their immutable dirs, and " +
      "the versioned fold matches the legacy fold row-for-row") {
    import graft.operators.Similarity
    def vecs(ids: Range): DataFrame =
      ids.map(i => (i.toLong, i % 4, i * 10L)).toDF("vec_id", "cell", "u")
    val vDir = Tables.scratchDir("graft_vl_cell_v").toString
    val lDir = Tables.scratchDir("graft_vl_cell_l").toString
    VersionedLayers.init(spark, vDir)
    Seq(vDir, lDir).foreach { d =>
      VersionedLayers.writeTagged(spark, d, "b0", vecs(1 to 40), Seq("cell"))
      VersionedLayers.writeTagged(spark, d, "b1", vecs(41 to 80), Seq("cell"))
    }
    val before = VersionedLayers.layers(spark, vDir)
    assert(before.map(_.tag).distinct.sorted == Seq("b0", "b1") &&
      before.forall(_.cell.isDefined) && before.size == 8,
      s"expected 2 tags x 4 cell leaves: $before")
    // vec 5 lives in (b0, cell 1); vec 44 in (b1, cell 0)
    val keys = Seq(5L, 44L).toDF("vec_id")
    val dv = Similarity.ivfPqLayerDeleteKeys(spark, vDir, keys)
    val dl = Similarity.ivfPqLayerDeleteKeys(spark, lDir, keys)
    assert(dv == dl && dv == Seq(("b0", 1), ("b1", 0)), s"dirty: $dv vs $dl")
    def contents(d: String): Set[(Long, Int, Long, String)] =
      VersionedLayers.readAny(spark, d)
        .select(col("vec_id"), col("cell"), col("u"), col("batch")).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3))).toSet
    assert(contents(vDir) == contents(lDir),
      "versioned and legacy cell folds diverged")
    // clean leaves (including clean cells of the DIRTY tags' siblings)
    // kept their exact store dirs; only the two dirty leaves re-genned
    val after = VersionedLayers.layers(spark, vDir)
    val changed = after.toSet -- before.toSet
    assert(changed.map(l => (l.tag, l.cell.get)) == Set("b0" -> 1, "b1" -> 0),
      s"rewrote more than the dirty leaves: $changed")
  }

  private def pointerSeq(dir: String): Long = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.streaming.StreamingIngest.readViewPointer(fs, root)
      .stripPrefix("m-").toLong
  }

  test("one-publish upsert folds (r18): indexUpsertFold equals the delete-then-" +
      "append composition in EXACTLY ONE manifest publish, drops emptied layers, " +
      "keeps clean layers' dirs, and a full replay converges") {
    val fDir = Tables.scratchDir("graft_vl_upfold").toString
    val tDir = Tables.scratchDir("graft_vl_uptwin").toString
    Seq(fDir, tDir).foreach { d =>
      VersionedLayers.init(spark, d)
      VersionedLayers.writeTagged(spark, d, "t1", rows(1 to 40, 1))
      VersionedLayers.writeTagged(spark, d, "t2", rows(41 to 80, 2))
      VersionedLayers.writeTagged(spark, d, "t3", rows(81 to 120, 3))
    }
    // keys dirty t1 (one row) and EMPTY t2 entirely; t3 stays clean
    val keys = (Seq(5L) ++ (41L to 80L)).toDF("doc_id")
    val fresh = rows(200 to 210, 9)
    // twin: the sequential two-step composition (two publishes)
    Dedup.dedupIndexDeleteKeys(spark, tDir, keys)
    VersionedLayers.writeTagged(spark, tDir, "b9", fresh)
    // fold: one publish — the pointer advances by EXACTLY one generation
    val seq0 = pointerSeq(fDir)
    val dirty = Dedup.indexUpsertFold(spark, fDir, keys, "b9", fresh)
    assert(pointerSeq(fDir) == seq0 + 1L,
      "the combined fold published more than once")
    assert(dirty == Seq("t1", "t2"), s"dirty tags: $dirty")
    assert(observed(fDir) == observed(tDir),
      "one-publish fold diverged from the delete-then-append composition")
    val tags = VersionedLayers.layers(spark, fDir)
    assert(tags.map(_.tag).sorted == Seq("b9", "t1", "t3"),
      s"emptied layer survived or append missing: ${tags.map(_.tag)}")
    assert(tags.find(_.tag == "t3").get.rel == "t3-g3",
      "clean layer was rewritten by the fold")
    // full-batch replay (keys already folded, own tag live): converges and
    // still publishes exactly once
    val seq1 = pointerSeq(fDir)
    assert(Dedup.indexUpsertFold(spark, fDir, keys, "b9", fresh).isEmpty)
    assert(pointerSeq(fDir) == seq1 + 1L)
    assert(observed(fDir) == observed(tDir), "fold replay diverged")
  }

  test("one-publish cell upsert (r18): ivfPqUpsertEncodedKeys equals the append-" +
      "then-delete composition in one publish; replay replaces its own tag's " +
      "leaves wholesale") {
    import graft.operators.Similarity
    def enc(ids: Range): DataFrame = ids.map(i => (i.toLong,
      Seq(i.toLong), Seq(i % 16), i % 4)).toDF("vec_id", "u", "codes", "cell")
    val fDir = Tables.scratchDir("graft_vl_cellup_f").toString
    val tDir = Tables.scratchDir("graft_vl_cellup_t").toString
    Seq(fDir, tDir).foreach { d =>
      VersionedLayers.init(spark, d)
      VersionedLayers.writeTagged(spark, d, "base",
        enc(1 to 40).select(col("vec_id"), col("u"), col("codes"), col("cell")),
        Seq("cell"))
    }
    val keys = Seq(5L, 6L).toDF("vec_id") // cells 1 and 2 of base go dirty
    val fresh = enc(41 to 60)
    // twin: append then delete (two publishes)
    VersionedLayers.writeTagged(spark, tDir, "grow",
      fresh.select(col("vec_id"), col("u"), col("codes"), col("cell")),
      Seq("cell"))
    Similarity.ivfPqLayerDeleteKeys(spark, tDir, keys)
    def contents(d: String): Set[(Long, Int, String)] =
      VersionedLayers.readAny(spark, d)
        .select(col("vec_id"), col("cell"), col("batch")).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val seq0 = pointerSeq(fDir)
    val dirty = Similarity.ivfPqUpsertEncodedKeys(spark, fDir, keys, "grow", fresh)
    assert(pointerSeq(fDir) == seq0 + 1L,
      "the combined cell fold published more than once")
    assert(dirty == Seq(("base", 1), ("base", 2)), s"dirty pairs: $dirty")
    assert(contents(fDir) == contents(tDir),
      "one-publish cell fold diverged from append-then-delete")
    // clean leaves of base keep their dirs; replay replaces grow's leaves
    val cleanBefore = VersionedLayers.layers(spark, fDir)
      .filter(l => l.tag == "base" && !Seq(1, 2).contains(l.cell.get)).toSet
    assert(Similarity.ivfPqUpsertEncodedKeys(spark, fDir, keys, "grow", fresh)
      .isEmpty)
    assert(contents(fDir) == contents(tDir), "cell fold replay diverged")
    val cleanAfter = VersionedLayers.layers(spark, fDir)
      .filter(l => l.tag == "base" && !Seq(1, 2).contains(l.cell.get)).toSet
    assert(cleanBefore == cleanAfter,
      "replay rewrote clean leaves of an untouched tag")
  }
}

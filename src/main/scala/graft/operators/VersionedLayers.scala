package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Copy-free snapshot isolation for `batch=`-layered swap artifacts
  * (VERDICT r16 #2 — "readers have no isolation during swaps").
  *
  * The in-place layout mutates the only copy of a layer (dynamic
  * partition overwrite, layer drops, the compaction trash swap), so every
  * swap core documents "no concurrent reader during the window". A
  * production pipeline serves probes WHILE maintaining, so the maintained
  * pipeline's artifacts move to the `_LATEST`-pointer discipline the
  * stats stores (t19/t21) already use — generalized to LAYERED artifacts
  * without copying the artifact per fold (a versioned ROOT would rewrite
  * 100 TB per batch; a versioned MANIFEST rewrites O(delta)):
  *
  * {{{
  *   <root>/_LATEST            pointer file → "m-<seq>"
  *   <root>/manifests/m-<seq>  one "<tag>\t<storeDirName>" line per layer
  *   <root>/store/<tag>-g<seq>/  immutable layer data (parquet, optional
  *                               sub-partitioning, e.g. cell=)
  * }}}
  *
  * Writers (single-writer, under the pipeline lease) never touch a
  * published store dir: every mutation writes NEW store dirs, then
  * publishes manifest `m-<seq+1>` and moves the pointer. A reader that
  * resolved the pointer before the move keeps reading the PREVIOUS
  * manifest's store dirs, which survive GC for one manifest generation
  * plus [[gcGraceMs]] — so a probe concurrent with any fold observes
  * exactly the pre-fold or the post-fold artifact, never a torn one.
  * (Isolation is per-PUBLISH: a pass that deletes then appends publishes
  * twice, and a reader between the two sees the consistent
  * deletes-applied version — the same intermediate the in-place layout
  * exposed, minus the torn windows.)
  *
  * Crash discipline — SIMPLER than the legacy trash protocol, because no
  * step destroys the only copy:
  *  - crash mid-store-write → an orphan store dir no manifest references:
  *    invisible to every reader, deleted by a later publish's GC;
  *  - crash before the pointer move → the artifact is bit-for-bit at the
  *    prior version (the half-written manifest file is unreferenced);
  *  - a replayed fold re-derives the same layer content into a fresh gen
  *    dir and re-publishes — convergent without markers (the x16 rule:
  *    the manifest REPLACES the tag's entry, it never appends a second).
  *
  * Like the lease and the trash protocol, pointer atomicity rides on the
  * filesystem's rename/create semantics — exact on HDFS-likes and local
  * filesystems, advisory on object stores without conditional writes.
  *
  * Adoption state: the multi-artifact orchestrator pipeline
  * (`Maintenance.MultiArtifactDirs` — corpus, exact, near triple, span,
  * SemDeDup, both decision logs, both cluster artifacts, AND the
  * layered IVF-PQ index, whose entries version at (tag, cell)-leaf
  * granularity) initializes versioned; the shared fold cores are
  * dual-mode (they detect the layout), so the standalone one-shot
  * fixtures (x86/x89/x98… — no concurrent reader exists inside a
  * one-shot oracle query) keep the in-place layout and their
  * byte-level drills.
  *
  * Reference anchor: the reference swaps bookkeeping under a ZK writer
  * lock and lets readers hit Hive's last-published partition list
  * (`dao/HiveSinkDetailDao.scala:73-98`) — the pointer generalizes that
  * published-version read to every maintained artifact. */
object VersionedLayers {

  /** One manifest entry. Flat artifacts publish one entry per layer tag
    * (`rel = <tag>-g<seq>`); cell-granular artifacts (the layered IVF-PQ
    * index — `subPartition = Seq("cell")`) publish one entry per
    * (tag, cell) LEAF (`rel = <tag>-g<seq>/cell=<c>` — a hive-style leaf
    * INSIDE its generation dir), so the delete fold can swap a single
    * dirty cell of a layer while every clean cell of the SAME tag keeps
    * its immutable dir — the x83 dirty-leaf economics, copy-free. The
    * hive-style leaf layout is what lets a reader batch every leaf of one
    * generation into ONE `spark.read` (partition discovery recovers
    * `cell`), instead of one read call per leaf — the r17 read-grouping
    * fix: per-leaf reads made every versioned ANN probe/fold pay ~16
    * extra planning+footer round-trips per tag. */
  final case class Layer(tag: String, rel: String, cell: Option[Int] = None)

  private def pointerPath(root: Path) = new Path(root, "_LATEST")
  private def manifestsPath(root: Path) = new Path(root, "manifests")
  private def storePath(root: Path) = new Path(root, "store")

  private def fsOf(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val root = new Path(dir)
    (root.getFileSystem(spark.sparkContext.hadoopConfiguration), root)
  }

  /** Grace age before an unreferenced store dir / stale manifest may be
    * GC'd (sys-prop `graft.versioned.gcGraceMs`, default 10 min): an
    * in-flight reader holds paths it resolved from a manifest that was
    * current when it planned; one generation of manifests plus this age
    * bounds how stale that plan may be and still scan successfully. */
  private[graft] def gcGraceMs: Long =
    java.lang.Long.getLong("graft.versioned.gcGraceMs", 10L * 60L * 1000L)

  /** Scale-adaptive write sizing (guide §6): REBALANCE before a layer
    * write lets AQE pick the output partition count from the data's
    * actual bytes (advisoryPartitionSizeInBytes) — a KB-sized micro-batch
    * layer lands as ONE file instead of one near-empty file per shuffle
    * partition, and every later scan of the layer runs one task instead
    * of 32; a 100 TB layer still fans out wide. Keyed by the write's
    * partition columns when present, so a partitionBy write stops
    * emitting (tasks x dirs) files. No-op when AQE is off (REBALANCE
    * falls back to a fixed-width shuffle that would help nothing). */
  private[graft] def sizedForWrite(df: DataFrame, keys: Seq[String]): DataFrame =
    if (df.sparkSession.conf.get("spark.sql.adaptive.enabled", "true") != "true") df
    else if (keys.isEmpty) df.hint("REBALANCE")
    else df.hint("REBALANCE", keys.map(col): _*)

  /** A versioned root = pointer AND manifests dir (the stats stores use
    * `_LATEST` alone — different discipline, snapshot-per-fold). */
  private[graft] def isVersioned(spark: SparkSession, dir: String): Boolean = {
    val (fs, root) = fsOf(spark, dir)
    fs.exists(pointerPath(root)) && fs.exists(manifestsPath(root))
  }

  /** Initialize an empty versioned artifact: manifest m-0 (no layers),
    * pointer at it. Idempotent — an existing versioned root is left
    * untouched. */
  private[graft] def init(spark: SparkSession, dir: String): Unit = {
    val (fs, root) = fsOf(spark, dir)
    if (isVersioned(spark, dir)) return
    fs.mkdirs(storePath(root))
    fs.mkdirs(manifestsPath(root))
    writeManifest(fs, root, 0L, Seq.empty)
    graft.streaming.StreamingIngest.writeViewPointer(fs, root, "m-0")
  }

  private def currentSeq(fs: FileSystem, root: Path): Long = {
    val name = graft.streaming.StreamingIngest.readViewPointer(fs, root)
    require(name.startsWith("m-") && name.drop(2).forall(_.isDigit),
      s"$root: malformed versioned-layer pointer '$name'")
    name.drop(2).toLong
  }

  private def writeManifest(fs: FileSystem, root: Path, seq: Long,
                            layers: Seq[Layer]): Unit = {
    // overwrite=true: a crash-before-pointer-move leaves an orphan
    // m-<seq> that the (leased, single) writer's retry may clobber
    val out = fs.create(new Path(manifestsPath(root), s"m-$seq"), true)
    try out.write(layers.map { l =>
      l.cell match {
        case Some(c) => s"${l.tag}\t$c\t${l.rel}\n"
        case None => s"${l.tag}\t${l.rel}\n"
      }
    }.mkString.getBytes("UTF-8"))
    finally out.close()
  }

  private def readManifest(fs: FileSystem, root: Path, seq: Long): Seq[Layer] = {
    val in = fs.open(new Path(manifestsPath(root), s"m-$seq"))
    val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    text.split("\n").toSeq.filter(_.nonEmpty).map { line =>
      line.split("\t", -1).toSeq match {
        case Seq(tag, rel) => Layer(tag, rel)
        case Seq(tag, cell, rel) => Layer(tag, rel, Some(cell.toInt))
        case _ => throw new IllegalStateException(
          s"$root: malformed manifest line '$line'")
      }
    }
  }

  /** The live layer list (resolved through the pointer). */
  private[graft] def layers(spark: SparkSession, dir: String): Seq[Layer] = {
    val (fs, root) = fsOf(spark, dir)
    readManifest(fs, root, currentSeq(fs, root))
  }

  /** Snapshot-isolated read of the artifact: the union of the manifest's
    * store dirs, each with its `batch` tag attached — schema-compatible
    * with the legacy partitioned read (batch column last, string). Own-tag
    * exclusion is MANIFEST pruning (the excluded layer is never even
    * listed, where the legacy read filtered it row-wise). `empty` when the
    * manifest holds no layers.
    *
    * Reads are BATCHED (guide §1.2 — fewer driver round-trips): flat
    * layers group into ONE `spark.read.parquet(dirs*)` per tag; cell
    * leaves group per (tag, generation dir) with hive partition discovery
    * recovering `cell` — so a 16-cell tag costs one read call, not 16.
    * The union width (and so planning cost) shrinks the same way. */
  private def readEntries(spark: SparkSession, root: Path,
                          live: Seq[Layer]): DataFrame = {
    val store = storePath(root)
    val groups: Seq[DataFrame] =
      live.groupBy(_.tag).toSeq.sortBy(_._1).flatMap { case (tag, ls) =>
        val (flat, leaves) = ls.partition(_.cell.isEmpty)
        val flatDf =
          if (flat.isEmpty) Seq.empty
          else Seq(spark.read
            .parquet(flat.map(l => new Path(store, l.rel).toString): _*)
            .withColumn("batch", lit(tag)))
        // cell leaves: one read per generation dir (rel = "<gen>/cell=<c>");
        // basePath pins discovery so only the LISTED leaves are scanned
        // while `cell` still comes from the directory name
        val leafDfs = leaves.groupBy(_.rel.takeWhile(_ != '/')).toSeq
          .sortBy(_._1).map { case (gen, gls) =>
            spark.read
              .option("basePath", new Path(store, gen).toString)
              .parquet(gls.map(l => new Path(store, l.rel).toString): _*)
              .withColumn("cell", col("cell").cast("int"))
              .withColumn("batch", lit(tag))
          }
        flatDf ++ leafDfs
      }
    groups.reduce(_.unionByName(_))
  }

  private[graft] def read(spark: SparkSession, dir: String,
                          exclude: Option[String] = None)
                         (empty: => DataFrame): DataFrame = {
    val (_, root) = fsOf(spark, dir)
    val live = layers(spark, dir).filterNot(l => exclude.contains(l.tag))
    if (live.isEmpty) empty else readEntries(spark, root, live)
  }

  /** Read ONLY the named tags' layers (manifest pruning — the versioned
    * delete folds read just the dirty layers, where the legacy layout
    * needed a partition filter). Caller guarantees a non-empty
    * intersection with the live manifest. */
  private[graft] def readTags(spark: SparkSession, dir: String,
                              tags: Set[String]): DataFrame = {
    val (_, root) = fsOf(spark, dir)
    val live = layers(spark, dir).filter(l => tags.contains(l.tag))
    require(live.nonEmpty, s"$dir: none of $tags is a live layer")
    readEntries(spark, root, live)
  }

  /** Read ONLY the named (tag, cell) leaves of a cell-granular artifact
    * — the IVF-PQ delete fold's manifest-pruned dirty read. */
  private[graft] def readCells(spark: SparkSession, dir: String,
                               pairs: Set[(String, Int)]): DataFrame = {
    val (_, root) = fsOf(spark, dir)
    val live = layers(spark, dir).filter(l =>
      l.cell.exists(c => pairs.contains((l.tag, c))))
    require(live.nonEmpty, s"$dir: none of $pairs is a live (tag, cell) leaf")
    readEntries(spark, root, live)
  }

  /** The live layers' store paths (the x95 policy's byte walk). */
  private[graft] def layerPaths(spark: SparkSession, dir: String): Seq[Path] = {
    val (_, root) = fsOf(spark, dir)
    layers(spark, dir).map(l => new Path(storePath(root), l.rel))
  }

  /** Layout-blind whole-artifact read (probes): versioned roots resolve
    * the pointer, legacy roots read the partitioned dir — both yield the
    * `batch` column. */
  private[graft] def readAny(spark: SparkSession, dir: String): DataFrame =
    if (isVersioned(spark, dir))
      read(spark, dir)(throw new IllegalStateException(
        s"$dir: versioned artifact has no layers — probe before init/append"))
    else spark.read.parquet(dir)

  /** Publish `next` as the new manifest: write m-<seq+1>, move the
    * pointer, GC. Single-writer (the pipeline lease). */
  private def publish(fs: FileSystem, root: Path,
                      next: Seq[Layer]): Unit = {
    val seq = currentSeq(fs, root)
    val prev = readManifest(fs, root, seq)
    writeManifest(fs, root, seq + 1L, next)
    graft.streaming.StreamingIngest.writeViewPointer(fs, root, s"m-${seq + 1L}")
    gc(fs, root, seq + 1L, keep = (next ++ prev).map(_.rel).toSet)
  }

  /** GC after a pointer move: drop store dirs referenced by NEITHER the
    * new nor the previous manifest (one-generation reader grace), and
    * manifests older than the previous — both only once they are older
    * than [[gcGraceMs]]. Orphans from crashed writes age out the same
    * way. A cell-granular `rel` ("<gen>/cell=<c>") references its whole
    * generation dir; inside a PARTIALLY referenced generation, leaf dirs
    * no rel names are dropped individually once past the grace (a cell
    * swap re-gens only the dirty leaves — the clean siblings' old gen
    * copies would otherwise linger until compaction). */
  private def gc(fs: FileSystem, root: Path, seq: Long,
                 keep: Set[String]): Unit = {
    val cutoff = System.currentTimeMillis() - gcGraceMs
    val keptTop = keep.map(_.takeWhile(_ != '/'))
    fs.listStatus(storePath(root)).foreach { st =>
      val name = st.getPath.getName
      if (!keptTop.contains(name)) {
        if (st.getModificationTime < cutoff) { fs.delete(st.getPath, true); () }
      } else if (!keep.contains(name)) {
        // a generation dir referenced only through SOME of its leaves:
        // drop the unreferenced leaves, keep the dir
        fs.listStatus(st.getPath).foreach { leaf =>
          val rel = s"$name/${leaf.getPath.getName}"
          if (leaf.isDirectory && !keep.contains(rel) &&
              leaf.getModificationTime < cutoff) {
            fs.delete(leaf.getPath, true); ()
          }
        }
      }
    }
    fs.listStatus(manifestsPath(root)).foreach { st =>
      val n = st.getPath.getName
      val stale = n.startsWith("m-") && n.drop(2).forall(_.isDigit) &&
        n.drop(2).toLong < seq - 1L
      if (stale && st.getModificationTime < cutoff) {
        fs.delete(st.getPath, false); ()
      }
    }
  }

  /** The versioned form of the tag-scoped layer overwrite: write `df` to
    * a fresh store dir, then publish a manifest where `tag` maps to it
    * (replacing any prior entry — the x16 replay rule; with
    * `replaceAll`, the manifest holds ONLY this layer — compaction). A
    * result with NO visible files (a write that produced not even a
    * footer-only part file) drops the tag rather than publish an
    * unreadable dir; a 0-row write that kept its schema footer stays a
    * valid (and harmless) layer, and the delete fold's rewrite drops
    * genuinely emptied tags regardless (`partitionBy` stages no dir for
    * them). */
  private[graft] def publishLayer(spark: SparkSession, dir: String, tag: String,
                                  df: DataFrame,
                                  subPartition: Seq[String] = Seq.empty,
                                  replaceAll: Boolean = false): Unit = {
    val (fs, root) = fsOf(spark, dir)
    val seq = currentSeq(fs, root) + 1L
    val entries: Seq[Layer] = subPartition match {
      case Seq() =>
        val rel = s"$tag-g$seq"
        val dest = new Path(storePath(root), rel)
        if (fs.exists(dest)) fs.delete(dest, true) // replay debris
        sizedForWrite(df, Seq.empty).write.mode("overwrite")
          .parquet(dest.toString)
        if (Dedup.hasVisibleData(spark, dest.toString)) Seq(Layer(tag, rel))
        else { fs.delete(dest, true); Seq.empty }
      case Seq(cellCol) =>
        // cell-granular artifact: ONE partitionBy job stages the layer,
        // then ONE rename lands the whole generation dir; each cell leaf
        // inside it gets its own manifest entry, so a later delete can
        // swap one cell without touching its siblings (the x83 dirty-leaf
        // economics), while readers batch the generation into one scan
        val stage = new Path(root, s".stage_g$seq")
        if (fs.exists(stage)) fs.delete(stage, true)
        sizedForWrite(df, Seq(cellCol)).write.mode("overwrite")
          .partitionBy(cellCol).parquet(stage.toString)
        val gen = s"$tag-g$seq"
        val dest = new Path(storePath(root), gen)
        if (fs.exists(dest)) fs.delete(dest, true) // replay debris
        require(fs.rename(stage, dest),
          s"$dir: could not land cell layer generation $gen")
        fs.listStatus(dest).toSeq
          .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"$cellCol="))
          .map { st =>
            val c = st.getPath.getName.stripPrefix(s"$cellCol=").toInt
            Layer(tag, s"$gen/${st.getPath.getName}", Some(c))
          }
      case other => throw new IllegalArgumentException(
        s"$dir: at most one sub-partition column is supported, got $other")
    }
    publish(fs, root, {
      if (replaceAll) entries
      else layers(spark, dir).filterNot(_.tag == tag) ++ entries
    })
  }

  /** The cell-granular dirty-leaf rewrite behind the IVF-PQ delete fold:
    * `survivors` (carrying `batch` and `cell`, restricted to
    * `dirtyPairs`) stages under ONE two-level `partitionBy` job, each
    * staged leaf renames into the store, and the manifest swaps all
    * dirty (tag, cell) entries at once — clean cells of the SAME tag
    * keep their immutable dirs. With `appendTag`, `survivors` ALSO
    * carries the batch's new `batch=<appendTag>` rows and the SAME
    * staged write + manifest publish lands them (any prior entry of
    * that tag is replaced wholesale — the x16 replay rule): the
    * delete-publish/append-publish pair of the layered-index upsert
    * becomes one write job and one pointer move (VERDICT r17 #1). */
  private[graft] def rewriteCellLayers(spark: SparkSession, dir: String,
                                       dirtyPairs: Seq[(String, Int)],
                                       survivors: DataFrame,
                                       appendTag: Option[String] = None): Unit = {
    val (fs, root) = fsOf(spark, dir)
    val seq = currentSeq(fs, root) + 1L
    val stage = new Path(root, s".stage_g$seq")
    if (fs.exists(stage)) fs.delete(stage, true)
    sizedForWrite(survivors, Seq("batch", "cell")).write.mode("overwrite")
      .partitionBy("batch", "cell").parquet(stage.toString)
    // land ONE generation dir per dirty tag (its rewritten cells inside),
    // then remap the dirty leaves to hive-style rels within it
    val remapped = fs.listStatus(stage).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .flatMap { bdir =>
        val t = bdir.getPath.getName.stripPrefix("batch=")
        val gen = s"$t-g$seq"
        val dest = new Path(storePath(root), gen)
        if (fs.exists(dest)) fs.delete(dest, true) // replay debris
        require(fs.rename(bdir.getPath, dest),
          s"$dir: could not land rewritten cell generation $gen")
        fs.listStatus(dest).toSeq
          .filter(st => st.isDirectory && st.getPath.getName.startsWith("cell="))
          .map { cdir =>
            val c = cdir.getPath.getName.stripPrefix("cell=").toInt
            (t, c) -> s"$gen/${cdir.getPath.getName}"
          }
      }.toMap
    fs.delete(stage, true)
    val dirty = dirtyPairs.toSet
    publish(fs, root, layers(spark, dir).flatMap { l =>
      // an appended tag's prior entries (a replayed batch's own earlier
      // attempt) are replaced wholesale by the staged generation
      if (appendTag.contains(l.tag)) None
      else l.cell match {
        case Some(c) if dirty.contains((l.tag, c)) =>
          remapped.get((l.tag, c)).map(rel => Layer(l.tag, rel, Some(c)))
        case _ => Some(l)
      }
    } ++ appendTag.toSeq.flatMap { t =>
      remapped.toSeq.collect { case ((tt, c), rel) if tt == t => (c, rel) }
        .sortBy(_._1).map { case (c, rel) => Layer(t, rel, Some(c)) }
    })
  }

  /** Route a tag-scoped layer write by layout: versioned roots go through
    * [[publishLayer]], legacy roots keep the byte-identical in-place
    * `batch=<tag>` overwrite. Every append site writes through here. */
  private[graft] def writeTagged(spark: SparkSession, dir: String, tag: String,
                                 df: DataFrame,
                                 subPartition: Seq[String] = Seq.empty): Unit =
    if (isVersioned(spark, dir)) publishLayer(spark, dir, tag, df, subPartition)
    else {
      // the legacy in-place layer gets the same adaptive sizing: a
      // KB-sized batch layer as one file, not one near-empty file per
      // shuffle partition (deterministic for a deterministic input, so
      // the replay byte-identity drills hold)
      val w = sizedForWrite(df, subPartition).write.mode("overwrite")
      (if (subPartition.nonEmpty) w.partitionBy(subPartition: _*) else w)
        .parquet(s"$dir/batch=$tag")
    }

  /** The versioned dirty-layer rewrite behind the delete folds:
    * `survivors` (carrying the `batch` column, restricted to
    * `dirtyTags`) stages under ONE `partitionBy(batch)` job — the same
    * single-job economics as the legacy dynamic overwrite — then each
    * staged layer renames into the store and the manifest swaps all
    * dirty tags at once (staged ones remapped, emptied ones dropped).
    * Readers of the pre-delete manifest keep their store dirs. */
  private[graft] def rewriteLayers(spark: SparkSession, dir: String,
                                   dirtyTags: Seq[String],
                                   survivors: DataFrame): Unit = {
    val (fs, root) = fsOf(spark, dir)
    val seq = currentSeq(fs, root)
    val stage = new Path(root, s".stage_g${seq + 1L}")
    if (fs.exists(stage)) fs.delete(stage, true)
    sizedForWrite(survivors, Seq("batch")).write.mode("overwrite")
      .partitionBy("batch").parquet(stage.toString)
    val staged = fs.listStatus(stage)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .map(_.getPath.getName.stripPrefix("batch=")).toSet
    val remapped = staged.toSeq.sorted.map { t =>
      val rel = s"$t-g${seq + 1L}"
      val dest = new Path(storePath(root), rel)
      if (fs.exists(dest)) fs.delete(dest, true) // replay debris
      require(fs.rename(new Path(stage, s"batch=$t"), dest),
        s"$dir: could not land rewritten layer $t")
      t -> rel
    }.toMap
    fs.delete(stage, true)
    val dirty = dirtyTags.toSet
    val prior = layers(spark, dir)
    val priorTags = prior.map(_.tag).toSet
    // staged tags the prior manifest never held are APPENDED (the cluster
    // fold stages its delete-survivors and its new batch layer in one
    // write — one publish, one reader-visible transition, instead of a
    // delete publish followed by an append publish); staged tags the
    // prior manifest held replace their entry, emptied dirty tags drop
    publish(fs, root, prior.flatMap { l =>
      if (!dirty.contains(l.tag)) Some(l)
      else remapped.get(l.tag).map(rel => Layer(l.tag, rel))
    } ++ remapped.toSeq.sortBy(_._1).collect {
      case (t, rel) if !priorTags.contains(t) => Layer(t, rel)
    })
  }

  /** The versioned compaction core: fold every live layer through
    * `content` into ONE `batch=<tag>` layer (manifest-atomic — no trash
    * protocol, no refusal window: a crash at any point leaves either the
    * old manifest or the new one, both complete). Returns the pre-fold
    * layer count, [[Maintenance.compactLayers]]' contract. */
  private[graft] def compactVersioned(spark: SparkSession, dir: String,
                                      tag: String, subPartition: Seq[String])
                                     (content: DataFrame => DataFrame): Int = {
    // the LAYER count is the distinct tag count — a cell-granular
    // artifact holds one entry per (tag, cell) leaf
    val live = layers(spark, dir).map(_.tag).distinct
    if (live.size <= 1) return live.size
    val folded = content(read(spark, dir)(
      throw new IllegalStateException(s"$dir: compacting an empty artifact")))
      .drop("batch")
    // no snapshot needed: the fold READS the live store dirs and WRITES a
    // fresh one — unlike the in-place core, source and destination never
    // collide, which is the whole point of the layout
    publishLayer(spark, dir, tag, folded, subPartition, replaceAll = true)
    live.size
  }
}

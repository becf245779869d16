package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** A PERSISTED IVF index — the production build-once / probe-many split of
  * [[Similarity.ivfTopK]] (which trains/assigns per call):
  *
  * {{{
  *   <path>/centroids/   k rows (idCol, vecCol) parquet
  *   <path>/assigned/    the corpus + centroid_id, PARTITIONED BY centroid_id
  * }}}
  *
  * The partitioned layout is the scale point: a probe collects its ≤ K
  * probed cell ids and pushes them as a static partition filter, so the
  * scan reads ~nprobe/K of the corpus FILES — file skipping, not row
  * filtering ([[Similarity.ivfTopKPreassigned]]; pinned by PlanAuditSpec).
  * At 100 TB of embeddings with K = 4096 cells, a 16-probe query batch
  * touches ~0.4% of the files; everything else is never opened. Index
  * build is one k-means (distributed Lloyd rounds, metadata-scale
  * centroids) + one map-only assignment + one partitioned write; rebuilds
  * are full-replace (`overwrite`), matching the static nature of IVF
  * indexes — append/merge belongs to a re-cluster cycle, not this layout.
  */
object SimilarityIndex {

  /** Train k-means centroids on the corpus, assign, persist. seedByHash +
    * roundDigits default to the engine's deterministic discipline so the
    * same corpus builds the identical index on any engine/cluster.
    */
  def buildIvf(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, path: String, seedByHash: Boolean = true,
      roundDigits: Int = 9): Unit = {
    val cents = Similarity.kmeans(corpus, idCol, vecCol, k, iters,
        seedByHash, roundDigits)
      .select(col("centroid_id").as(idCol), col(vecCol))
    buildIvfFromCentroids(corpus, cents, idCol, vecCol, path)
  }

  /** Pin a small model frame (centroids, codebook) as a deterministic
    * multi-consumer leaf: already-local plans (the driver-side Lloyd
    * loop's output, a collected sample) are leaves by construction — a
    * checkpoint job would buy nothing — everything else localCheckpoints
    * eagerly (K/m×k rows, metadata-scale). Release via
    * [[org.apache.spark.sql.graft.GraftColumnsBridge.releaseCheckpoint]],
    * a no-op for the local case.
    */
  private def pinned(df: DataFrame): DataFrame =
    df.queryExecution.optimizedPlan match {
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => df
      case _ => df.localCheckpoint(true)
    }

  /** Persist an index under GIVEN centroids (k rows, (idCol, vecCol)) —
    * pre-trained, sampled, or external. */
  def buildIvfFromCentroids(corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, path: String): Unit = {
    val cents = pinned(centroids.select(col(idCol), col(vecCol)))
      // K rows; consumed twice (write + assignment)
    try {
      // the two writes are independent (nothing reads either until the
      // stamps below / the caller's swap) — overlap them so the tiny
      // centroid write's job rides the assignment write's task tail
      // (guide §2.6); crash states are the same set as the sequential
      // form's (missing dir or missing stamp, both detected at load)
      ConcurrentJobs.run(
        () => cents.write.mode("overwrite").parquet(s"$path/centroids"),
        () => Similarity.ivfAssign(corpus, cents, idCol, vecCol)
          .write.mode("overwrite").partitionBy("centroid_id")
          .parquet(s"$path/assigned"))
      stampGeneration(corpus.sparkSession, path, IvfSubdirs)
    } finally org.apache.spark.sql.graft.GraftColumnsBridge.releaseCheckpoint(cents)
  }

  /** Stamp every subdir of one build with the SAME generation nonce
    * (an underscore-prefixed marker file — hidden from parquet readers,
    * travels with the dir through the rebuild swap's renames). Load
    * verifies the stamps agree ([[checkGeneration]]): the swap is not
    * transactional ACROSS subdirs, and without stamps a crash between
    * subdir installs would leave NEW centroids silently serving over OLD
    * assignments — wrong cells, no error. Written after all data writes
    * (`mode("overwrite")` deletes the dir, marker included; append /
    * dynamic-partition-overwrite paths never touch it).
    */
  private def stampGeneration(spark: SparkSession, path: String,
      subdirs: Seq[String]): Unit = {
    val hfs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val nonce = java.util.UUID.randomUUID().toString
    subdirs.foreach { d =>
      val out = hfs.create(
        new org.apache.hadoop.fs.Path(s"$path/$d", GenerationMarker), true)
      try out.write(nonce.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
  }

  private[graft] val GenerationMarker = "_GENERATION"

  /** Refuse a MIXED-GENERATION index: every stamped subdir must carry
    * the same build nonce. All-unstamped (a pre-stamp index) passes —
    * but a partial stamping means a rebuild swap crashed between subdir
    * installs, and probing new centroids against old assignments (or
    * codes against a foreign codebook) returns WRONG cells with no
    * error, so load fails loudly with the repair instead.
    */
  private def readStamp(hfs: org.apache.hadoop.fs.FileSystem, path: String,
      dir: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/$dir", GenerationMarker)
    if (!hfs.exists(p)) None
    else {
      val in = hfs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }
  }

  private def checkGeneration(spark: SparkSession, path: String,
      subdirs: Seq[String]): Unit = {
    val hfs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val stamps = subdirs.flatMap(d => readStamp(hfs, path, d).map(d -> _))
    require(stamps.isEmpty || (stamps.size == subdirs.size &&
        stamps.map(_._2).distinct.size == 1),
      s"index at $path mixes build generations " +
        s"(${stamps.map { case (d, n) => s"$d=${n.take(8)}" }.mkString(", ")}; " +
        s"unstamped: ${subdirs.filterNot(stamps.map(_._1).toSet).mkString(", ")}) — " +
        "a rebuild swap crashed between subdir installs; repair with " +
        "SimilarityIndex.rebuildIvf(path, ...) / rebuildIvfPq(path, corpus, ...)")
  }

  /** Open a persisted index for probing (restoring any subdir a crashed
    * rebuild swap left aside — see [[recoverAside]]). */
  def loadIvf(spark: SparkSession, path: String, idCol: String,
      vecCol: String): IvfIndex = {
    recoverAside(spark, path, IvfSubdirs)
    checkGeneration(spark, path, IvfSubdirs)
    new IvfIndex(spark, path, idCol, vecCol)
  }

  private val IvfSubdirs = Seq("centroids", "assigned")
  private val IvfPqSubdirs = Seq("centroids", "codebook", "encoded")

  /** Read-only health report for a persisted index layout (IVF or
    * IVF-PQ) — the [[graft.pool.Pool.fsck]] twin, pure driver metadata:
    * `staleStaging` (`_rebuild-*` dirs a crashed rebuild left — space
    * only, reclaimed at next rebuild), `asides` (`_old-*` dirs a swap
    * crash left — the last complete generation of a lost subdir;
    * load/rebuild restore them), `missingSubdirs` (expected dirs absent
    * even after an aside restore would run), and `mixedGeneration`
    * (stamps disagree — load refuses, [[rebuildIvf]]/[[rebuildIvfPq]]
    * repair). Diagnosis only; the repair verbs stay explicit.
    */
  def fsckIndex(spark: SparkSession, path: String): IndexFsck = {
    val root = new org.apache.hadoop.fs.Path(path)
    val hfs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!hfs.exists(root))
      return IndexFsck(Seq.empty, Seq.empty, Seq("<index root>"), mixedGeneration = false)
    val names = hfs.listStatus(root).toSeq.filter(_.isDirectory).map(_.getPath.getName)
    val subdirs = if (names.contains("codebook") || names.contains("encoded")
        || names.contains("_old-encoded")) IvfPqSubdirs else IvfSubdirs
    val asides = names.filter(_.startsWith("_old-"))
    val missing = subdirs.filterNot(d =>
      names.contains(d) || asides.contains(s"_old-$d"))
    // generation check over the POST-RESTORE layout: a missing subdir's
    // aside is what recoverAside will rename back, so its stamp is the
    // one a load would then compare — without this, the aside-crash
    // state (new centroids installed, old assigned only in its aside)
    // would report mixedGeneration=false while load refuses
    val effective = subdirs.flatMap { d =>
      if (names.contains(d)) Some(d)
      else if (names.contains(s"_old-$d")) Some(s"_old-$d")
      else None
    }
    val stamps = effective.flatMap(d => readStamp(hfs, path, d))
    val mixed = stamps.nonEmpty &&
      !(stamps.size == effective.size && stamps.distinct.size == 1)
    IndexFsck(
      staleStaging = names.filter(_.startsWith("_rebuild-")).sorted,
      asides = asides.sorted,
      missingSubdirs = missing,
      mixedGeneration = mixed)
  }

  /** [[fsckIndex]]'s report; `clean` means a load would succeed and no
    * crash leftovers are on disk. */
  final case class IndexFsck(staleStaging: Seq[String], asides: Seq[String],
      missingSubdirs: Seq[String], mixedGeneration: Boolean) {
    def clean: Boolean = staleStaging.isEmpty && asides.isEmpty &&
      missingSubdirs.isEmpty && !mixedGeneration
  }

  /** REPAIR a mixed-generation IVF index (a rebuild swap that crashed
    * between subdir installs — [[loadIvf]] refuses to probe it): the
    * retrain consumes only the `assigned` data, which is a complete,
    * single-generation set in every crash state, so re-running the
    * rebuild IS the repair. Bypasses the generation gate for exactly
    * that reason; returns a probeable handle.
    */
  def rebuildIvf(spark: SparkSession, path: String, idCol: String,
      vecCol: String, k: Int, iters: Int, seedByHash: Boolean = true,
      roundDigits: Int = 9): IvfIndex = {
    recoverAside(spark, path, IvfSubdirs)
    new IvfIndex(spark, path, idCol, vecCol)
      .rebuild(k, iters, seedByHash, roundDigits)
  }

  /** The IVF-PQ repair twin of [[rebuildIvf]]: the retrain's id
    * membership comes from the `encoded` data (complete and
    * internally consistent in every crash state — old or new
    * generation, the id set is the same live set), vectors from the
    * caller's corpus.
    */
  def rebuildIvfPq(spark: SparkSession, path: String, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, iters: Int, m: Int,
      codebookK: Int, seedByHash: Boolean = true,
      roundDigits: Int = 9): IvfPqIndex = {
    recoverAside(spark, path, IvfPqSubdirs)
    new IvfPqIndex(spark, path, idCol, vecCol)
      .rebuild(corpus, k, iters, m, codebookK, seedByHash, roundDigits)
  }

  /** Persist the IVF-PQ layout under GIVEN centroids + codebook: the two
    * models as small parquet tables, and the corpus as (idCol, codes)
    * partitioned by `centroid_id` — probes skip files by cell AND read
    * m int codes per surviving row, never a float vector (the two 100 TB
    * levers stacked; see [[Similarity.ivfPqTopKPreassigned]]). At m = 16
    * bytes per code over 768-dim float32 embeddings this table is ~190×
    * narrower than the raw vectors.
    */
  def buildIvfPqFromModels(corpus: DataFrame, centroids: DataFrame,
      codebook: DataFrame, idCol: String, vecCol: String,
      path: String): Unit = {
    val cents = pinned(centroids.select(col(idCol), col(vecCol)))
    // m×k rows; consumed twice (codebook write + encode) — pinned so a
    // caller-supplied NON-DETERMINISTIC codebook plan (e.g. built from a
    // sample) cannot evaluate differently per consumer and silently write
    // one codebook while encoding against another (r15 ADVICE)
    val book = pinned(codebook)
    try {
      // three independent writes (cents/codebook are pinned leaves; the
      // encode reads the FRAMES, never the written files; nothing reads
      // any dir until the stamps / the caller's swap) — overlap them
      // (guide §2.6), same crash-state set as the sequential form
      ConcurrentJobs.run(
        () => cents.write.mode("overwrite").parquet(s"$path/centroids"),
        () => book.write.mode("overwrite").parquet(s"$path/codebook"),
        () => Similarity.pqEncode(
            Similarity.ivfAssign(corpus, cents, idCol, vecCol),
            book, idCol, vecCol)
          .select(col(idCol), col("centroid_id"), col("codes"))
          .write.mode("overwrite").partitionBy("centroid_id")
          .parquet(s"$path/encoded"))
      stampGeneration(corpus.sparkSession, path, IvfPqSubdirs)
    } finally {
      org.apache.spark.sql.graft.GraftColumnsBridge.releaseCheckpoint(cents)
      org.apache.spark.sql.graft.GraftColumnsBridge.releaseCheckpoint(book)
    }
  }

  /** Train both models in-engine ([[Similarity.kmeans]] cells +
    * [[Similarity.pqTrain]] codebook, the deterministic discipline), then
    * persist via [[buildIvfPqFromModels]].
    */
  def buildIvfPq(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, m: Int, codebookK: Int, path: String,
      seedByHash: Boolean = true, roundDigits: Int = 9): Unit = {
    // the two trainers are INDEPENDENT (each reads only `corpus`; nothing
    // consumes either model until buildIvfPqFromModels below) and each is
    // a serial loop of small jobs that never fills the scheduler — overlap
    // them (guide §2.6); each trains exactly what the sequential form did.
    // Await-all publication (ConcurrentJobs) makes the writes visible here.
    var cents: DataFrame = null
    var book: DataFrame = null
    ConcurrentJobs.run(
      () => cents = Similarity.kmeans(corpus, idCol, vecCol, k, iters,
          seedByHash, roundDigits)
        .select(col("centroid_id").as(idCol), col(vecCol)),
      () => book = Similarity.pqTrain(corpus, idCol, vecCol, m, codebookK,
        iters, seedByHash, roundDigits))
    buildIvfPqFromModels(corpus, cents, book, idCol, vecCol, path)
  }

  /** Open a persisted IVF-PQ index for probing (restoring any subdir a
    * crashed rebuild swap left aside — see [[recoverAside]]). */
  def loadIvfPq(spark: SparkSession, path: String, idCol: String,
      vecCol: String): IvfPqIndex = {
    recoverAside(spark, path, IvfPqSubdirs)
    checkGeneration(spark, path, IvfPqSubdirs)
    new IvfPqIndex(spark, path, idCol, vecCol)
  }

  /** Shared targeted delete over a `centroid_id`-partitioned corpus
    * table (takedown / right-to-be-forgotten for a persisted ANN index):
    * locate the cells holding `ids` with one narrow (id, centroid_id)
    * scan probed by the broadcast id list, rewrite ONLY those cell
    * partitions without the ids (dynamic partition overwrite — untouched
    * cells' files are never listed, read, or rewritten), and remove the
    * directories of cells whose rows were all deleted. At 100 TB with
    * K = 4096 cells, deleting a takedown list touches the handful of
    * cells its members assigned to; the other ~4090 cells' files stay
    * byte-identical. The table is a DERIVED artifact (rebuildable from
    * the corpus), so the rewrite is not manifest-transactional like a
    * [[graft.pool.Pool]] commit; a crash mid-delete is repaired by
    * re-running the delete (idempotent) or rebuilding the index.
    *
    * @return number of index rows deleted.
    */
  private def deleteFromCellTable(tablePath: String, table: DataFrame,
      idCol: String, ids: DataFrame): Long = {
    val idList = ids.select(col(idCol)).distinct()
      .localCheckpoint(true) // takedown-list-scale; consumed by two jobs
    try {
      // _cdir is the cell's PARTITION DIRECTORY NAME, rendered by Spark
      // itself: Cast-to-string (session timezone, matching the writer's
      // partitionPathExpression) + the catalog escaping rules — so
      // string/decimal/timestamp centroid ids map to the exact dir the
      // writer created, not a raw toString guess (which for e.g. a
      // string cell id containing '/' would name a path that does not
      // exist, and the deleted vectors would keep being served)
      val dirName = udf((s: String) =>
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .getPartitionPathString("centroid_id", if (s == null) "" else s))
      // one narrow pass serves THREE consumers that used to be two jobs:
      // per affected cell, the matched count (delete accounting), the
      // cell's TOTAL rows (total == matched ⇔ the cell empties — the
      // former post-write `live` distinct-collect over the survivors),
      // and the rendered partition dir. The left join + filter keeps the
      // scan the same broadcast-probed (id, centroid_id) projection.
      val byCell = table.select(col(idCol), col("centroid_id"))
        .join(broadcast(idList.withColumn("_hit", lit(1))), Seq(idCol), "left")
        .groupBy(col("centroid_id"), dirName(col("centroid_id").cast("string")).as("_cdir"))
        .agg(count(lit(1)).as("_total"), count(col("_hit")).as("_matched"))
        .filter(col("_matched") > 0)
        .collect()
      if (byCell.isEmpty) return 0L
      val cells = byCell.map(_.get(0)).toSeq
      val cellDirs = byCell.map(r => r.get(0) -> r.getString(1)).toMap
      val deleted = byCell.map(_.getLong(3)).sum
      val emptied = byCell.filter(r => r.getLong(2) == r.getLong(3))
        .map(_.get(0)).toSet
      // sever lineage from tablePath before the overwrite (Spark refuses
      // to overwrite a path its plan reads); materialized size is the
      // surviving rows of the affected cells — exactly the data being
      // rewritten anyway
      val survivors = table
        .filter(col("centroid_id").isin(cells: _*))
        .join(broadcast(idList), Seq(idCol), "left_anti")
        .localCheckpoint(true)
      try {
        survivors.write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("centroid_id")
          .parquet(tablePath)
        // a fully-deleted cell is absent from the overwrite output, so
        // dynamic overwrite leaves its old files — drop the dir explicitly
        // (through the path's Hadoop FileSystem: on an object store a
        // local-FS delete would silently leave the files and the deleted
        // vectors would KEEP being retrieved). Which cells emptied fell
        // out of pass 1 (total == matched) — no post-write collect needed.
        val hfs = new org.apache.hadoop.fs.Path(tablePath)
          .getFileSystem(table.sparkSession.sessionState.newHadoopConf())
        cells.filter(emptied).foreach { c =>
          val dir = new org.apache.hadoop.fs.Path(tablePath, cellDirs(c))
          // the cell HAD rows (it matched ids), so its dir must exist —
          // absence means the rendered name diverged from the writer's,
          // i.e. the takedown hazard above; fail loudly, never serve on
          require(hfs.exists(dir),
            s"takedown: expected partition dir $dir for fully-deleted cell " +
              s"$c not found — rendered name diverged from the writer's")
          hfs.delete(dir, true)
        }
        deleted
      } finally org.apache.spark.sql.graft.GraftColumnsBridge.releaseCheckpoint(survivors)
    } finally org.apache.spark.sql.graft.GraftColumnsBridge.releaseCheckpoint(idList)
  }

  /** Fold the multi-file cells of a `centroid_id`-partitioned table back
    * to one file each: every [[IvfIndex.append]] adds a file per touched
    * cell, and thousands of appends recreate the small-files hazard pool
    * compaction exists for (listing time, sub-stats row groups). Cells
    * with at most `maxFiles` files are left byte-identical — only the
    * fragmented cells are read and rewritten (dynamic partition
    * overwrite), so the cost is O(fragmented cells), not O(index).
    * Returns the number of cells compacted.
    */
  private def compactCellTable(tablePath: String, table: DataFrame,
      maxFiles: Int): Int = {
    // directory work goes through the path's HADOOP FileSystem, not
    // java.nio: the index lives wherever the DataFrame writer put it
    // (HDFS/object store at deployment scale), and a local-FS listing
    // there would silently report "nothing fragmented" forever
    val root = new org.apache.hadoop.fs.Path(tablePath)
    val hfs = root.getFileSystem(table.sparkSession.sessionState.newHadoopConf())
    if (!hfs.exists(root)) return 0
    val fragmented = hfs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("centroid_id="))
      .filter(s => hfs.listStatus(s.getPath)
        .count(_.getPath.getName.endsWith(".parquet")) > maxFiles)
      .map(_.getPath.getName.stripPrefix("centroid_id="))
    if (fragmented.isEmpty) return 0
    // typed literals on the UNCAST partition column keep the read
    // partition-pruned to the fragmented cells; repartition on the cell
    // id gives dynamic overwrite one task per cell = one file per cell
    val dt = table.schema("centroid_id").dataType
    val hit = fragmented.map(v => col("centroid_id") === lit(v).cast(dt))
      .reduce(_ || _)
    val folded = table
      .filter(hit)
      .repartition(math.max(1, fragmented.size), col("centroid_id"))
      .localCheckpoint(true) // sever lineage: the overwrite reads this path
    try {
      folded.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("centroid_id")
        .parquet(tablePath)
      fragmented.size
    } finally org.apache.spark.sql.graft.GraftColumnsBridge.releaseCheckpoint(folded)
  }

  /** Reclaim `_rebuild-*` staging left by a CRASHED rebuild (safe under
    * the single-writer contract; underscore-prefixed dirs are invisible
    * to readers — the FileInputFormat hidden-path convention — so the
    * leftovers only waste space, never answers). Run at rebuild start. */
  private def dropStaleStaging(spark: SparkSession, path: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val hfs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (hfs.exists(root))
      hfs.listStatus(root).foreach { st =>
        if (st.isDirectory && st.getPath.getName.startsWith("_rebuild-"))
          hfs.delete(st.getPath, true)
      }
  }

  /** Swap a STAGED rebuild into place. Per subdir: the live copy is
    * renamed ASIDE (`_old-<subdir>` — underscore-prefixed, so hidden
    * from readers), the staged one renamed in, and every aside is
    * dropped only after ALL subdirs are installed — at no point is a
    * subdir's only copy being destroyed (for [[IvfIndex]] the live
    * `assigned` dir is the only full-vector copy; a delete-then-rename
    * here would leave a crash with the data marooned in staging and no
    * recovery path). A crash leaves each subdir either live or
    * restorable from its aside — [[recoverAside]] (run at load and at
    * rebuild start) renames a lost one back. Not transactional ACROSS
    * subdirs: a crash mid-swap can leave mixed generations (new
    * centroids over old assignments), answered consistently only after
    * the rebuild is re-run — the documented repair for this DERIVED
    * artifact. Readers racing the swap see the operator-scheduled/
    * single-writer contract, as with [[graft.pool.Pool.vacuum]].
    *
    * The whole protocol RELIES on rename being all-or-nothing, so it
    * REFUSES to run on stores where rename degrades to delete+copy
    * ([[graft.pool.Pool.renameIsAtomicStore]]'s classification): a crash
    * mid directory-copy there would leave a partially copied aside (or a
    * partially deleted live dir) that no recovery can tell from a
    * complete one — a silently truncated index. On such stores, rebuild
    * to a FRESH path and repoint readers (the index is derived; the
    * manifest-pointer discipline lives in [[graft.pool.Pool]], which IS
    * object-store-safe).
    */
  private def swapStagedIndex(spark: SparkSession, path: String,
      staged: String, subdirs: Seq[String]): Unit = {
    requireAtomicRenameStore(spark, path, "rebuild swap")
    val hfs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    subdirs.foreach { d =>
      val live = new org.apache.hadoop.fs.Path(path, d)
      val s = new org.apache.hadoop.fs.Path(staged, d)
      require(hfs.exists(s), s"rebuild: staged dir $s missing")
      val aside = new org.apache.hadoop.fs.Path(path, s"_old-$d")
      // leftover aside from a prior COMPLETED install of this subdir
      if (hfs.exists(aside)) hfs.delete(aside, true)
      if (hfs.exists(live))
        require(hfs.rename(live, aside), s"rebuild: rename $live aside failed")
      require(hfs.rename(s, live), s"rebuild: rename $s -> $live failed")
    }
    subdirs.foreach(d =>
      hfs.delete(new org.apache.hadoop.fs.Path(path, s"_old-$d"), true))
    hfs.delete(new org.apache.hadoop.fs.Path(staged), true)
  }

  /** Restore any index subdir lost to a crash between its aside-rename
    * and its staged-install: live missing + `_old-<subdir>` present means
    * the aside IS the last complete generation — rename it back.
    * Idempotent and read-only when nothing is wrong; run by [[loadIvf]]/
    * [[loadIvfPq]] and at rebuild start (single-writer contract), so the
    * repair needs no human in the loop.
    */
  private def recoverAside(spark: SparkSession, path: String,
      subdirs: Seq[String]): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val hfs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!hfs.exists(root)) return
    subdirs.foreach { d =>
      val live = new org.apache.hadoop.fs.Path(path, d)
      val aside = new org.apache.hadoop.fs.Path(path, s"_old-$d")
      if (!hfs.exists(live) && hfs.exists(aside)) {
        // an aside is only trustworthy where rename is all-or-nothing —
        // on a delete+copy store it may be a partial copy of the lost
        // subdir (even one carrying the generation stamp, copied early),
        // and restoring it would install a silently truncated table
        requireAtomicRenameStore(spark, path, s"crash recovery (restore of $aside)")
        require(hfs.rename(aside, live),
          s"index recovery: rename $aside -> $live failed")
      }
    }
  }

  /** Refuse the aside-swap protocol on stores whose rename is
    * delete+copy — see [[swapStagedIndex]]'s contract. */
  private def requireAtomicRenameStore(spark: SparkSession, path: String,
      what: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val hfs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    require(graft.pool.Pool.renameIsAtomicStore(hfs, conf),
      s"index $what at $path requires an atomic-rename store; scheme " +
        s"'${Option(hfs.getUri.getScheme).getOrElse("file")}' renames are " +
        "delete+copy, where a crash mid-swap leaves a silently truncated " +
        "copy no recovery can detect — rebuild to a fresh path and " +
        "repoint readers, or (for a store with real atomic rename) add " +
        s"its scheme to ${graft.pool.Pool.AtomicRenameSchemesKey}")
  }

  /** Streaming entry for the gated vector ingest: each micro-batch of
    * `vectors` (a streaming DataFrame) runs through one
    * [[VectorIngestSession]] against the persisted index — the
    * continuous-ANN loop as a Structured Streaming sink, the
    * [[graft.streaming.CorpusIngest.startNear]] twin. Replay safety is
    * the gate itself: a replayed batch's vectors score cosine 1.0
    * against their landed twins and drop — state lives in the sink.
    */
  def startIngest(vectors: DataFrame, index: IvfIndex, threshold: Double,
      checkpoint: String, nprobe: Int = 1, interval: String = "5 seconds",
      compactEvery: Int = 0, compactMaxFiles: Int = 4,
      maxBatchPerCell: Int = 1 << 16)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(threshold < 1.0, // the ingestNear replay-idempotence contract —
      s"startIngest threshold must be < 1.0 (got $threshold)") // fail at start(), not first batch
    val session = new VectorIngestSession(index, threshold, nprobe,
      compactEvery, compactMaxFiles, maxBatchPerCell)
    vectors.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(interval))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        session.ingest(batch)
        ()
      }
      .start()
  }

  /** Continuous-ANN driver loop — the [[graft.streaming.CorpusIngestSession]]
    * twin for vectors: each batch runs the near-dup gate
    * ([[IvfIndex.ingestNear]]) and every `compactEvery` appending batches
    * folds the cells the appends fragmented ([[IvfIndex.compactCells]]).
    * All state lives in the index itself (the gate probes stored
    * vectors), so the session object is just cadence. Not thread-safe:
    * one session drives one index from one loop.
    */
  final class VectorIngestSession(idx: IvfIndex, threshold: Double,
      nprobe: Int = 1, compactEvery: Int = 0, compactMaxFiles: Int = 4,
      maxBatchPerCell: Int = 1 << 16) {
    private var appendsSinceCompact = 0

    /** Gate + append one batch; returns vectors appended. */
    def ingest(vectors: DataFrame): Long = {
      val n = idx.ingestNear(vectors, threshold, nprobe, maxBatchPerCell)
      if (compactEvery > 0 && n > 0) {
        appendsSinceCompact += 1
        if (appendsSinceCompact >= compactEvery) {
          idx.compactCells(compactMaxFiles)
          appendsSinceCompact = 0
        }
      }
      n
    }
  }

  final class IvfPqIndex private[SimilarityIndex] (spark: SparkSession,
      path: String, idCol: String, vecCol: String) {
    val centroids: DataFrame = spark.read.parquet(s"$path/centroids")
    val codebook: DataFrame = spark.read.parquet(s"$path/codebook")

    /** The cell-partitioned codes scan (lazy; probes prune partitions). */
    def encoded: DataFrame = spark.read.parquet(s"$path/encoded")

    /** ADC top-k per query over the probed cells' codes only. Output:
      * (query_id, rank, neighbor_id) — [[Similarity.ivfPqTopK]] semantics
      * against the stored assignment + codes.
      */
    def topK(queries: DataFrame, k: Int, nprobe: Int = 1): DataFrame =
      Similarity.ivfPqTopKPreassigned(encoded, queries, centroids, codebook,
        idCol, vecCol, k, nprobe)

    /** Targeted delete of the given ids (one `idCol` column) from the
      * encoded table — only the cells holding them are rewritten
      * ([[deleteFromCellTable]]). Returns rows deleted.
      */
    def delete(ids: DataFrame): Long =
      deleteFromCellTable(s"$path/encoded", encoded, idCol, ids)

    /** Incrementally index new vectors: assign against the STORED
      * centroids and encode against the STORED codebook (both map-only
      * under 1-row broadcasts), append into the cell partitions —
      * O(batch) per call, the [[IvfIndex.append]] twin. Both models stay
      * frozen (the standard IVF/PQ ingest contract; a re-cluster cycle
      * rebuilds via [[buildIvfPq]] when drift matters). Caller owns id
      * uniqueness.
      */
    def append(vectors: DataFrame): Unit =
      Similarity.pqEncode(
          Similarity.ivfAssign(vectors,
            centroids.select(col(idCol), col(vecCol)), idCol, vecCol),
          codebook, idCol, vecCol)
        .select(col(idCol), col("centroid_id"), col("codes"))
        .write.mode("append").partitionBy("centroid_id")
        .parquet(s"$path/encoded")

    /** Fold fragmented cells (more than `maxFiles` files from repeated
      * [[append]]s) back to one file each; other cells stay
      * byte-identical ([[compactCellTable]]). Returns cells compacted.
      */
    def compactCells(maxFiles: Int = 4): Int =
      compactCellTable(s"$path/encoded", encoded, maxFiles)

    /** The RE-CLUSTER cycle for IVF-PQ. Unlike [[IvfIndex.rebuild]] this
      * needs the SOURCE vectors: the stored codes are lossy (m subspace
      * ids), and re-training k-means/PQ on reconstructions would bake
      * one generation's quantization error into the next's models. The
      * caller passes the corpus; the retrain input is `corpus` SEMI-
      * JOINED to the index's current id set, so deletes stay deleted
      * even when the source table still holds the taken-down rows — the
      * index's id set, not the corpus, is the authority on membership.
      * Atomic swap + crash story as [[swapStagedIndex]]. Returns a fresh
      * handle (this one's cached models are stale).
      */
    def rebuild(corpus: DataFrame, k: Int, iters: Int, m: Int,
        codebookK: Int, seedByHash: Boolean = true,
        roundDigits: Int = 9): IvfPqIndex = {
      recoverAside(spark, path, IvfPqSubdirs) // a prior rebuild's crashed swap
      // refuse BEFORE the retrain burn, not at the final swap
      requireAtomicRenameStore(spark, path, "rebuild")
      // deleted-out index (no files -> schema inference fails) or a corpus
      // that no longer carries the ids — refuse clearly either way
      // MATERIALIZED once (localCheckpoint): the retrain input feeds both
      // trainers' Lloyd rounds AND the final encode — ~2·iters+2 executions
      // of the corpus×index semi-join otherwise (§1.2/§3.3 truncate-the-
      // plan); the eager checkpoint job replaces the former isEmpty probe.
      val live =
        try {
          val l = corpus.join(encoded.select(col(idCol)), Seq(idCol), "left_semi")
            .localCheckpoint(true)
          require(!l.isEmpty, "empty")
          l
        } catch {
          case e @ (_: org.apache.spark.sql.AnalysisException
                    | _: IllegalArgumentException) =>
            throw new IllegalArgumentException(
              s"rebuild: no corpus rows match the index at $path — nothing " +
                "to re-train on (deleted-out index, or the wrong corpus)", e)
        }
      try {
        dropStaleStaging(spark, path)
        val staged = s"$path/_rebuild-${System.nanoTime().toHexString}"
        buildIvfPq(live, idCol, vecCol, k, iters, m, codebookK, staged,
          seedByHash, roundDigits)
        swapStagedIndex(spark, path, staged,
          Seq("centroids", "codebook", "encoded"))
      } finally org.apache.spark.sql.graft.GraftColumnsBridge.releaseCheckpoint(live)
      new IvfPqIndex(spark, path, idCol, vecCol)
    }
  }

  final class IvfIndex private[SimilarityIndex] (spark: SparkSession,
      path: String, idCol: String, vecCol: String) {
    /** K rows — read once per index handle (metadata-scale). */
    val centroids: DataFrame = spark.read.parquet(s"$path/centroids")

    /** The cell-partitioned corpus scan (lazy; probes prune partitions). */
    def assigned: DataFrame = spark.read.parquet(s"$path/assigned")

    /** Top-k cosine neighbors per query over the probed cells only.
      * Output: (query_id, rank, neighbor_id) — [[Similarity.ivfTopK]]
      * semantics against the stored assignment.
      */
    def topK(queries: DataFrame, k: Int, nprobe: Int = 1): DataFrame =
      Similarity.ivfTopKPreassigned(assigned, queries, centroids,
        idCol, vecCol, k, nprobe)

    /** Incrementally index new vectors: assign against the STORED
      * centroids (map-only) and append into the cell partitions — the
      * continuous-ingest move for ANN, O(batch) per call. The coarse
      * quantizer stays frozen (the standard IVF ingest contract: cell
      * balance drifts as the distribution does; a re-cluster cycle
      * rebuilds via [[buildIvf]] when it matters). Caller owns id
      * uniqueness, like the pool ingest paths.
      */
    def append(vectors: DataFrame): Unit =
      Similarity.ivfAssign(vectors, centroids.select(col(idCol), col(vecCol)),
          idCol, vecCol)
        .write.mode("append").partitionBy("centroid_id")
        .parquet(s"$path/assigned")

    /** Targeted delete of the given ids (one `idCol` column) from the
      * assigned table — only the cells holding them are rewritten
      * ([[deleteFromCellTable]]). Returns rows deleted.
      */
    def delete(ids: DataFrame): Long =
      deleteFromCellTable(s"$path/assigned", assigned, idCol, ids)

    /** Fold fragmented cells (more than `maxFiles` files from repeated
      * [[append]]s) back to one file each; other cells stay
      * byte-identical ([[compactCellTable]]). Returns cells compacted.
      */
    def compactCells(maxFiles: Int = 4): Int =
      compactCellTable(s"$path/assigned", assigned, maxFiles)

    /** The RE-CLUSTER cycle: re-train k-means on the index's CURRENT
      * contents — post-appends, post-deletes, the assigned table holds
      * the full vectors — re-assign, and atomically swap the new
      * centroids + assigned dirs into place ([[swapStagedIndex]]).
      * Returns a fresh handle (this one's cached centroids are stale).
      *
      * When to run it: [[append]]/[[ingestNear]] hold the coarse
      * quantizer frozen, so a drifting ingest distribution piles new
      * vectors into the nearest OLD cells — cells bloat (probe cost
      * grows: a probe reads whole cells) and recall@k at fixed nprobe
      * decays because true neighbors increasingly straddle cell
      * boundaries drawn for the old distribution. The rebuild redraws
      * the Voronoi cells for the data actually in the index; deletes
      * STAY deleted (the retrain input is the surviving rows — nothing
      * reaches back to any pre-delete state). Cost is one full k-means +
      * re-assign + rewrite, O(index) — the probe for when drift warrants
      * it is tools/DriftScale, pinned in SCALING.md.
      */
    def rebuild(k: Int, iters: Int, seedByHash: Boolean = true,
        roundDigits: Int = 9): IvfIndex = {
      recoverAside(spark, path, IvfSubdirs) // a prior rebuild's crashed swap
      // refuse BEFORE the retrain burn, not at the final swap
      requireAtomicRenameStore(spark, path, "rebuild")
      // deletes can empty an index; k-means on zero rows (or a schema
      // inference over zero files) would fail obscurely — refuse clearly
      val current =
        try {
          val a = assigned.drop("centroid_id")
          require(!a.isEmpty, "empty")
          a
        } catch {
          case e @ (_: org.apache.spark.sql.AnalysisException
                    | _: IllegalArgumentException) =>
            throw new IllegalArgumentException(
              s"rebuild: index at $path has no rows — nothing to re-train " +
                "on (rebuild from the source corpus instead)", e)
        }
      dropStaleStaging(spark, path)
      val staged = s"$path/_rebuild-${System.nanoTime().toHexString}"
      buildIvf(current, idCol, vecCol, k, iters,
        staged, seedByHash, roundDigits)
      swapStagedIndex(spark, path, staged, Seq("centroids", "assigned"))
      new IvfIndex(spark, path, idCol, vecCol)
    }

    /** Near-dup-GATED incremental indexing — the embedding twin of the
      * corpus-ingest near gate: a new vector lands only if no LANDED
      * vector in its `nprobe` probed cells scores cosine ≥ `threshold`
      * against it, and within the batch the lower id survives any near
      * pair sharing a probed cell (the incremental-near-dup discipline).
      * The index's own stored vectors ARE the landed state — no side
      * table — so replay is idempotent for free: an exact (or scaled)
      * copy scores cosine 1.0 against its landed twin and drops.
      *
      * Scale: the gate reads only the batch's probed cell PARTITIONS
      * (file skipping via the collected ≤ batch-cells id list, the topK
      * probe's machinery); the landed side never shuffles — the
      * batch-sized assigned queries broadcast into the cell join. The
      * survivor append is [[append]], O(batch). `nprobe` is the recall
      * knob: near-dups hiding across a cell boundary need nprobe > 1,
      * exactly as in search.
      *
      * The in-batch gate is a per-cell batch self-join — O(Σ b_c²) over
      * per-cell batch counts b_c. Micro-batch sizing keeps that trivial,
      * but an adversarial batch concentrated in ONE cell pays
      * quadratically, so the gate REFUSES (loudly, before any quadratic
      * work) when any cell's probed batch rows exceed
      * `maxBatchPerCell` — split the batch upstream, or raise the knob
      * deliberately for a one-off backfill. The check is one map-side
      * aggregation over the batch-scale assignment, not over the index.
      *
      * @return number of vectors appended (batch minus gated drops).
      */
    def ingestNear(vectors: DataFrame, threshold: Double,
        nprobe: Int = 1, maxBatchPerCell: Int = 1 << 16): Long = {
      // replay safety rests on a replayed vector scoring cosine 1.0
      // against its landed twin and dropping; threshold == 1.0 would
      // flip on floating-point self-cosine landing at 1 − ε and
      // re-append every replayed row — refuse up front
      require(threshold < 1.0,
        s"ingestNear threshold must be < 1.0 (got $threshold): replay " +
          "idempotence needs the landed-twin self-cosine to pass the gate")
      // same-id duplicates inside one batch (an at-least-once upstream
      // repeating a row) slip BOTH gates — the in-batch pair rule needs
      // strictly ordered ids and the landed side holds neither copy yet —
      // so collapse to one deterministic row per id first (the
      // uniqPerContent discipline; arrays order lexicographically, so
      // conflicting payloads under one id pick the minimum, not a
      // partition-order coin flip). Persisted: the gate evaluates the
      // batch several times (probe-cell collect, both gate joins, the
      // survivor count) and a streaming source would re-scan per pass.
      // Null and ZERO-NORM vectors have no cosine identity (self-cosine
      // NaN) — they can neither be gated nor gate others, so a replay
      // would re-append them forever: dropped up front, the null-text
      // discipline of the corpus ingest.
      val cols = vectors.columns.toSeq
      val batch = vectors
        .filter(col(vecCol).isNotNull &&
          !isnan(Similarity.cosine(col(vecCol), col(vecCol))))
        .groupBy(col(idCol))
        .agg(min(struct(cols.filterNot(_ == idCol).map(col): _*)).as("_r"))
        .select(col(idCol) +: cols.filterNot(_ == idCol).map(c => col(s"_r.$c")): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try ingestNearUniq(batch, threshold, nprobe, maxBatchPerCell)
      finally batch.unpersist()
    }

    private def ingestNearUniq(vectors: DataFrame, threshold: Double,
        nprobe: Int, maxBatchPerCell: Int): Long = {
      // the per-cell counts fall out of the probe's own eager cell pass
      // (probeCellsCounted) — the former separate max-count job is fused
      val (aq, pruned, cellCounts) = Similarity.probeCellsCounted(assigned,
        vectors, centroids.select(col(idCol), col(vecCol)), idCol, vecCol,
        nprobe)
      // the quadratic-corner guard (see ingestNear doc): fail before the
      // per-cell self-join below can melt on a single-cell batch
      if (cellCounts.nonEmpty) {
        val worst = cellCounts.values.max
        require(worst <= maxBatchPerCell,
          s"ingestNear: $worst batch vectors probe one cell " +
            s"(> maxBatchPerCell = $maxBatchPerCell); the in-batch gate is " +
            "quadratic per cell — split the batch, or raise maxBatchPerCell " +
            "deliberately")
      }
      val landedHits = aq
        .join(pruned.select(col(vecCol).as("cv"), col("centroid_id")),
          Seq("centroid_id"))
        .filter(Similarity.cosine(col("qv"), col("cv")) >= threshold)
        .select(col("query_id"))
      val inBatchHits = aq.select(col("query_id").as("_hi"), col("qv").as("_hv"),
          col("centroid_id"))
        .join(aq.select(col("query_id").as("_lo"), col("qv").as("_lv"),
          col("centroid_id")), Seq("centroid_id"))
        .filter(col("_lo") < col("_hi") &&
          Similarity.cosine(col("_hv"), col("_lv")) >= threshold)
        .select(col("_hi").as("query_id"))
      val drops = landedHits.unionByName(inBatchHits).distinct()
        .withColumnRenamed("query_id", idCol)
      val survivors = vectors.join(drops, Seq(idCol), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val n = survivors.count()
        if (n > 0) append(survivors)
        n
      } finally survivors.unpersist()
    }
  }
}

package graft.ops

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import java.nio.charset.StandardCharsets

/** A PERSISTED, PARTITION-PRUNED landed-signature index — the 100 TB form
  * of the incremental near-dup probe's landed side, mirroring
  * [[SimilarityIndex]]'s cell-partitioned discipline for MinHash/LSH keys.
  *
  * Without it, a continuous ingest loop scans and band-shuffles EVERY
  * landed signature per micro-batch (the stored `sig` column is narrow,
  * but O(corpus) per 5-second batch is still the bill a 100 TB pipeline
  * cannot pay). With it, the probe reads only the landed buckets the
  * incoming batch can possibly collide with:
  *
  * {{{
  *   <path>/
  *     _MANIFEST          # params + active generation + covered pool
  *                        # segments + committed delta dirs; the atomic
  *                        # manifest swap IS the commit point (Pool's rule)
  *     keys-<gen>/        # banded bucket keys (bk, id), PARTITIONED BY
  *                        # (band, pfx = first pfxLen hex chars of bk)
  *     sigs-<gen>/        # wide signature rows (id, m0..m{p-1}),
  *                        # PARTITIONED BY (idp = md5(id) prefix)
  *     delta-<nano>/keys, /sigs   # per-append batch-sized deltas
  * }}}
  *
  * Probe shape (one batch): the batch's own band keys yield its distinct
  * (band, pfx) pairs — a driver collect bounded by `bands * 16^pfxLen`
  * (the PARTITION key space, never the corpus); the landed key read is then
  * an explicit-subdirectory parquet scan of just those partitions plus the
  * (batch-sized, bounded-count) deltas. Candidate verification collects the
  * candidates' distinct id-prefixes the same way and prunes `sigs-<gen>`
  * to those partitions. Probe read-bytes are therefore
  * ~(batch buckets x bucket size) + deltas — FLAT in landed size once
  * `pfxLen` is sized so buckets stay near `targetRowsPerBucket` (rebuild
  * and fold re-pick it as the corpus grows, the LSM rescaling move).
  *
  * Write shape: appends go to DELTAS (one small dir per batch — never a
  * thousand-partition dynamic write per micro-batch, the small-files
  * hazard); [[fold]] periodically rewrites base + deltas into a fresh
  * generation ([[CorpusIngestSession]] runs it on its compaction cadence).
  * Old generations die after the manifest swap, so readers racing a fold
  * keep their explicit paths.
  *
  * Consistency contract (single-writer, the pool's rule): `_MANIFEST`
  * records exactly which pool segments the index covers. The session
  * reconciles at seed time — missing segments are caught up with one
  * narrow scan OF THOSE SEGMENTS ONLY; covered-but-gone segments (a
  * takedown or out-of-band rewrite changed history) force a REBUILD,
  * because a stale landed signature would wrongfully drop new documents
  * that match deleted content. The session's own leveled pool compaction
  * is content-preserving and just remaps the covered list
  * ([[remapCovered]]).
  */
final class SignatureIndex private (val spark: SparkSession, root: Path,
    val n: Int, val numPerms: Int, val bands: Int,
    @volatile private var state: SignatureIndex.Manifest) {
  import SignatureIndex._

  private val hadoopConf = spark.sessionState.newHadoopConf()
  private val fs: FileSystem = root.getFileSystem(hadoopConf)
  private val renameIsAtomic = graft.pool.Pool.renameIsAtomicStore(fs, hadoopConf)
  private lazy val fc: FileContext = FileContext.getFileContext(fs.getUri, hadoopConf)

  def pfxLen: Int = state.pfxLen
  def coveredSegments: Seq[String] = state.segments
  def deltaCount: Int = state.deltas.size
  private[graft] def generation: String = state.gen

  // ---- schemas (exact, from manifest params — no inference anywhere, so
  // empty partitions/pools read as typed empty frames and partition-value
  // parsing can never guess "04" into an int)
  private def idType: DataType = DataType.fromDDL(state.idType)
  private def keysDataSchema = StructType(Seq(
    StructField("bk", StringType), StructField("id", idType)))
  private def keysFullSchema = StructType(keysDataSchema.fields ++ Seq(
    StructField("band", IntegerType), StructField("pfx", StringType)))
  private def sigsDataSchema = StructType(
    StructField("id", idType) +:
      (0 until numPerms).map(p => StructField(s"m$p", StringType)))
  private def sigsFullSchema = StructType(sigsDataSchema.fields :+
    StructField("idp", StringType))

  private def keysBase: Path = new Path(root, s"keys-${state.gen}")
  private def sigsBase: Path = new Path(root, s"sigs-${state.gen}")

  // base partition listing, cached per generation: the probe prunes against
  // this set driver-side (no per-batch exists() storm, no partition
  // discovery job) — invalidated by fold/rebuild (new generation)
  @volatile private var partCache: Option[(String, Set[(Int, String)], Set[String])] = None
  private def basePartitions(): (Set[(Int, String)], Set[String]) =
    partCache match {
      case Some((g, k, s)) if g == state.gen => (k, s)
      case _ =>
        def list(base: Path): Seq[String] =
          if (!fs.exists(base)) Seq.empty
          else fs.listStatus(base).toSeq.filter(_.isDirectory).map(_.getPath.getName)
        val keyParts = (for {
          b <- list(keysBase) if b.startsWith("band=")
          p <- list(new Path(keysBase, b)) if p.startsWith("pfx=")
        } yield (b.drop(5).toInt, p.drop(4))).toSet
        val sigParts = list(sigsBase).filter(_.startsWith("idp=")).map(_.drop(4)).toSet
        partCache = Some((state.gen, keyParts, sigParts))
        (keyParts, sigParts)
    }

  /** The landed band-key rows (band, bk, id) the incoming batch can collide
    * with: base partitions pruned to `prefixes` (explicit subdirectory
    * paths — file skipping, the [[graft.pool.Pool.readRange]] discipline)
    * plus the committed deltas filtered to the same pairs. `prefixes` is
    * partition-keyspace-bounded by construction (its collect is
    * <= bands * 16^pfxLen rows, metadata-scale — never corpus-sized).
    */
  def prunedKeys(prefixes: Seq[(Int, String)]): DataFrame = {
    val (keyParts, _) = basePartitions()
    val want = prefixes.toSet
    val dirs = want.intersect(keyParts).toSeq.sorted
      .map { case (b, p) => new Path(new Path(keysBase, s"band=$b"), s"pfx=$p").toString }
    val base =
      if (dirs.isEmpty) emptyFrame(keysFullSchema)
      else spark.read.schema(keysFullSchema)
        .option("basePath", keysBase.toString).parquet(dirs: _*)
    val matches = (b: org.apache.spark.sql.Column, p: org.apache.spark.sql.Column) =>
      struct(b, p).isin(want.toSeq.map { case (bb, pp) => struct(lit(bb), lit(pp)) }: _*)
    val deltas = state.deltas.map(d =>
      spark.read.schema(keysFullSchema)
        .parquet(new Path(new Path(root, d), "keys").toString)
        .filter(matches(col("band"), col("pfx"))))
    (base +: deltas).reduce(_ unionByName _).select("band", "bk", "id")
  }

  /** The wide landed signature rows (id, m0..m{p-1}) for candidate ids
    * whose md5-prefix falls in `idPrefixes` — the verification side,
    * pruned exactly like the keys (the collect feeding this is
    * <= 16^pfxLen distinct prefixes, partition-keyspace-bounded).
    */
  def prunedSigs(idPrefixes: Seq[String]): DataFrame = {
    val (_, sigParts) = basePartitions()
    val want = idPrefixes.toSet
    val dirs = want.intersect(sigParts).toSeq.sorted
      .map(p => new Path(sigsBase, s"idp=$p").toString)
    val base =
      if (dirs.isEmpty) emptyFrame(sigsFullSchema)
      else spark.read.schema(sigsFullSchema)
        .option("basePath", sigsBase.toString).parquet(dirs: _*)
    val deltas = state.deltas.map(d =>
      spark.read.schema(sigsFullSchema)
        .parquet(new Path(new Path(root, d), "sigs").toString)
        .filter(col("idp").isin(want.toSeq.map(lit): _*)))
    (base +: deltas).reduce(_ unionByName _).drop("idp")
  }

  private def emptyFrame(schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Append one batch's signatures as a DELTA covering `newSegments` of the
    * pool: one small parquet dir (batch-sized — never a dynamic write
    * across the base's partitions), committed by the manifest swap. The
    * caller hands the WIDE frame ([[Dedup.minhashSignatureFrame]] of the
    * appended rows — the ingest session reuses the probe's own persisted
    * frame, so the batch is not re-shingled).
    */
  def appendDelta(batchSig: DataFrame, newSegments: Seq[String]): Unit = {
    val d = f"delta-${System.nanoTime()}%x"
    val dir = new Path(root, d)
    writeDeltaData(batchSig, dir)
    swapManifest(state.copy(
      segments = (state.segments ++ newSegments).distinct,
      deltas = state.deltas :+ d))
  }

  private def writeDeltaData(batchSig: DataFrame, dir: Path): Unit = {
    // batchSig feeds BOTH delta files; when the caller hands a bare plan
    // (bench/CLI paths — the ingest session hands its already-persisted
    // probe frame), persist for the two reads or the batch's whole
    // signature aggregation runs twice (measured ~0.9 s of the 2.2 s
    // append at sf0.1)
    val preCached = batchSig.storageLevel.isValid
    val src = if (preCached) batchSig
      else batchSig.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val keys = Dedup.bandKeys(src, numPerms, bands)
        .select(col("bk"), col("id"), col("band"),
          substring(col("bk"), 1, state.pfxLen).as("pfx"))
      val sigs = src
        .select(sigsDataSchema.fieldNames.map(col).toSeq :+
          idPrefix(col("id"), state.pfxLen).as("idp"): _*)
      // the two writes are independent (separate files under the delta dir,
      // committed only by the later manifest swap) — submit them as
      // concurrent jobs so the second's scheduling fills the first's task
      // tail (guide §2.6); crash semantics unchanged: either failure
      // propagates before the swap, leaving an orphan the fold sweeps
      ConcurrentJobs.run(
        () => keys.coalesce(1).write.parquet(new Path(dir, "keys").toString),
        () => sigs.coalesce(1).write.parquet(new Path(dir, "sigs").toString))
    } finally if (!preCached) src.unpersist(false)
  }

  /** Rewrite base + deltas into a fresh generation (re-picking `pfxLen`
    * for the grown key count) and swap the manifest — the LSM fold the
    * ingest session runs on its compaction cadence, so delta count stays
    * bounded and probe read-bytes stay flat. Old generation and folded
    * delta dirs are deleted AFTER the swap (best-effort; orphans are
    * retired by the next fold's sweep).
    */
  def fold(): Unit = {
    val all = prunedKeysAll().select("id", "bk", "band")
    val sigs = allSigs()
    rebuildFrom(sigs, state.segments, Some(all))
  }

  // unpruned reads of the current state (fold/rebuild inputs)
  private def prunedKeysAll(): DataFrame = {
    val base =
      if (!fs.exists(keysBase)) emptyFrame(keysFullSchema)
      else spark.read.schema(keysFullSchema)
        .option("basePath", keysBase.toString).parquet(keysBase.toString)
    val deltas = state.deltas.map(d =>
      spark.read.schema(keysFullSchema)
        .parquet(new Path(new Path(root, d), "keys").toString))
    (base +: deltas).reduce(_ unionByName _)
  }
  private def allSigs(): DataFrame = {
    val base =
      if (!fs.exists(sigsBase)) emptyFrame(sigsFullSchema)
      else spark.read.schema(sigsFullSchema)
        .option("basePath", sigsBase.toString).parquet(sigsBase.toString)
    val deltas = state.deltas.map(d =>
      spark.read.schema(sigsFullSchema)
        .parquet(new Path(new Path(root, d), "sigs").toString))
    (base +: deltas).reduce(_ unionByName _).drop("idp")
  }

  /** Full rebuild from a landed signature frame (id, m0..m{p-1}) covering
    * `segments` — the recovery path when covered history changed under the
    * index (takedown, out-of-band rewrite), and the initial build.
    */
  def rebuild(landedSig: DataFrame, segments: Seq[String]): Unit =
    rebuildFrom(landedSig, segments, None)

  private def rebuildFrom(sig: DataFrame, segments: Seq[String],
      precomputedKeys: Option[DataFrame]): Unit = {
    val cached = sig.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val rows = cached.count()
      val newPfx = pickPfxLen(rows * bands)
      val gen = f"${System.nanoTime()}%x"
      val keys = precomputedKeys.getOrElse(Dedup.bandKeys(cached, numPerms, bands))
        .select(col("bk"), col("id"), col("band"),
          substring(col("bk"), 1, newPfx).as("pfx"))
      // one file per (band, pfx): the repartition clusters each partition
      // into one task, sorted by bk inside for row-group stats. The keys
      // and sigs writes both read the persisted signature frame and land
      // in generation dirs nothing references until the swap below — run
      // them as concurrent jobs (guide §2.6: neither small write alone
      // fills the scheduler; measured 3.7 → ~2.6 s on the rebuild phase)
      ConcurrentJobs.run(
        () => keys.repartition(col("band"), col("pfx"))
          .sortWithinPartitions(col("bk"))
          .write.partitionBy("band", "pfx")
          .parquet(new Path(root, s"keys-$gen").toString),
        () => cached.select(sigsDataSchema.fieldNames.map(col).toSeq :+
            idPrefix(col("id"), newPfx).as("idp"): _*)
          .repartition(col("idp"))
          .write.partitionBy("idp")
          .parquet(new Path(root, s"sigs-$gen").toString))
      val old = state
      swapManifest(state.copy(gen = gen, pfxLen = newPfx,
        segments = segments, deltas = Seq.empty))
      // post-swap reclamation, best-effort (the manifest no longer points
      // at any of these; a crash here leaves orphans the next fold sweeps)
      try {
        (Seq(s"keys-${old.gen}", s"sigs-${old.gen}") ++ old.deltas)
          .foreach(dname => fs.delete(new Path(root, dname), true))
        sweepOrphans()
      } catch { case scala.util.control.NonFatal(_) => () }
    } finally cached.unpersist()
  }

  /** Replace the covered-segments list WITHOUT touching index data — the
    * session calls this after ITS OWN pool compaction, which folds
    * segments content-preservingly (same rows, new segment names), so the
    * index rows still describe the pool exactly.
    */
  def remapCovered(segments: Seq[String]): Unit =
    swapManifest(state.copy(segments = segments))

  // delete any dir the manifest does not reference (crashed fold/rebuild
  // leftovers, deltas written but never committed)
  private def sweepOrphans(): Unit = {
    val live = Set(s"keys-${state.gen}", s"sigs-${state.gen}") ++ state.deltas
    fs.listStatus(root).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName)
      .filterNot(live)
      .foreach(dname => fs.delete(new Path(root, dname), true))
  }

  private def swapManifest(next: Manifest): Unit = synchronized {
    writeAtomic(new Path(root, ManifestFile), render(next))
    state = next
  }

  private def writeAtomic(target: Path, content: String): Unit =
    if (renameIsAtomic) {
      val tmp = new Path(target.getParent,
        s".${target.getName}.tmp.${System.nanoTime()}")
      val out = fs.create(tmp, true)
      try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
      fc.rename(tmp, target, Options.Rename.OVERWRITE)
    } else {
      val out = fs.create(target, true)
      try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
    }
}

object SignatureIndex {
  val ManifestFile = "_MANIFEST"

  /** Target base-partition size: `pfxLen` is picked so each (band, pfx)
    * bucket holds about this many key rows — the knob that keeps probe
    * read-bytes flat as the corpus grows (buckets stay FIXED-size, their
    * COUNT grows with the corpus, and a micro-batch's probe reads at most
    * its own key count of them). 4096 keys ≈ a few hundred KB per bucket
    * file — small enough that a micro-batch prunes hard, large enough
    * that the base never degenerates into a small-files swamp; past the
    * pfxLen = 4 cap (65536 buckets per band) buckets grow again, which a
    * deployment at that size trades against a longer prefix alphabet. */
  val TargetRowsPerBucket: Long = 1L << 12

  private[graft] def pickPfxLen(totalKeys: Long): Int = {
    var len = 1
    // buckets per band = 16^len; grow until bucket size <= target (cap 4:
    // 65536 partitions per band is already cluster-scale). Multiplied form,
    // not totalKeys / buckets > target — integer division would truncate a
    // just-over-threshold corpus back under it
    while (len < 4 && totalKeys > TargetRowsPerBucket * (16L << (4 * (len - 1))))
      len += 1
    len
  }

  /** Deterministic id partition key: first `pfxLen` hex chars of
    * md5(id as string) — engine-portable, uniform whatever the id type. */
  def idPrefix(id: org.apache.spark.sql.Column, pfxLen: Int): org.apache.spark.sql.Column =
    substring(md5(id.cast("string")), 1, pfxLen)

  private[ops] final case class Manifest(n: Int, numPerms: Int, bands: Int,
      pfxLen: Int, idType: String, gen: String,
      segments: Seq[String], deltas: Seq[String])

  private def render(m: Manifest): String =
    (s"v1 n=${m.n} numPerms=${m.numPerms} bands=${m.bands} " +
      s"pfxLen=${m.pfxLen} gen=${m.gen} idType=${m.idType}") +:
      (m.segments.map("seg " + _) ++ m.deltas.map("delta " + _)) mkString "\n"

  private def parse(text: String): Manifest = {
    val lines = text.split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
    val head = lines.head
    require(head.startsWith("v1 "), s"unknown signature-index manifest: $head")
    val kv = head.drop(3).split(" ").map { t =>
      val Array(k, v) = t.split("=", 2); k -> v
    }.toMap
    Manifest(kv("n").toInt, kv("numPerms").toInt, kv("bands").toInt,
      kv("pfxLen").toInt, kv("idType"), kv("gen"),
      lines.tail.collect { case l if l.startsWith("seg ") => l.drop(4) },
      lines.tail.collect { case l if l.startsWith("delta ") => l.drop(6) })
  }

  /** Create an EMPTY index at `path` for the given signature parameters
    * and id type (DDL string, e.g. "bigint"). */
  def create(spark: SparkSession, path: String, n: Int, numPerms: Int,
      bands: Int, idTypeDdl: String): SignatureIndex = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    require(!fs.exists(new Path(root, ManifestFile)),
      s"signature index already exists at $path — use open()")
    fs.mkdirs(root)
    val m = Manifest(n, numPerms, bands, pfxLen = 1, idType = idTypeDdl,
      gen = "0", segments = Seq.empty, deltas = Seq.empty)
    val idx = new SignatureIndex(spark, root, n, numPerms, bands, m)
    idx.swapManifest(m)
    idx
  }

  /** Open an existing index; parameters come from its manifest. The caller
    * must verify they match the probe's (n, numPerms, bands) — a mismatch
    * would compare incomparable signatures ([[openChecked]] does both). */
  def open(spark: SparkSession, path: String): SignatureIndex = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val mf = new Path(root, ManifestFile)
    require(fs.exists(mf), s"no signature index at $path")
    val len = fs.getFileStatus(mf).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(mf)
    try in.readFully(0, buf) finally in.close()
    val m = parse(new String(buf, StandardCharsets.UTF_8))
    new SignatureIndex(spark, root, m.n, m.numPerms, m.bands, m)
  }

  /** Open-or-create with parameter verification: signatures are only
    * comparable when (n, numPerms, bands) match the writer's — drift
    * fails loudly here instead of silently mismatching every slot. */
  def openChecked(spark: SparkSession, path: String, n: Int, numPerms: Int,
      bands: Int, idTypeDdl: String): SignatureIndex = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(new Path(root, ManifestFile)))
      create(spark, path, n, numPerms, bands, idTypeDdl)
    else {
      val idx = open(spark, path)
      require(idx.n == n && idx.numPerms == numPerms && idx.bands == bands &&
        DataType.fromDDL(idx.state.idType) == DataType.fromDDL(idTypeDdl),
        s"signature index at $path was built with (n=${idx.n}, " +
          s"numPerms=${idx.numPerms}, bands=${idx.bands}, " +
          s"idType=${idx.state.idType}) — probe wants " +
          s"(n=$n, numPerms=$numPerms, bands=$bands, idType=$idTypeDdl); " +
          "rebuild or match")
      idx
    }
  }
}

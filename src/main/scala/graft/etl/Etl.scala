package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pool.{Envelope, Pool}

/** The CDC ETL transform model (reference: etl/yaml.go:9-29 `Transform` /
  * `Rule`; compiler etl/build.go:20-107; executor etl/pipeline.go).
  *
  * A transform reads CDC envelopes from an input pool, routes each
  * not-yet-processed record through the first matching rule (switch/case,
  * build.go:92-107), applies stateless or denormalizing (join) logic, and
  * atomically commits output records plus per-input `done` markers —
  * reprocessing is prevented by an anti-join against those markers
  * (build.go:111-116; README.md:349-389), so the pipeline is exactly-once
  * and restart-safe with no state store: state lives in the output pool.
  *
  * Spark-first divergence from the reference: instead of generating Zed text
  * and shipping it to a lake service, rules compile directly into one
  * DataFrame plan — scans, anti-join, switch branches, the denorm join, and
  * offset assignment all optimize together under Catalyst (pushdown reaches
  * the parquet scans; AQE sizes the anti-join strategy).
  *
  * Rule expression surface: `where`/`out` are SQL text evaluated over the
  * record bound as a struct column `in` (stateless) or `left`/`right`
  * (denorm) — the Q11 `yield {left:this}` wrapping from build.go:171,199-200,
  * which makes joins collision-free by construction.
  */
sealed trait Rule {
  def where: Option[String]
}

/** Stateless rule (etl/build.go:163-185): one input topic, `out*` SQL over
  * `in`.
  */
final case class StatelessRule(
    inTopic: String,
    where: Option[String],
    outKey: String,
    outValue: String) extends Rule

/** Denormalizing rule (etl/build.go:187-216): join `leftTopic` × `rightTopic`
  * on `joinOn` (SQL over `left`/`right`), `out*` SQL over both.
  */
final case class DenormRule(
    leftTopic: String,
    rightTopic: String,
    joinOn: String,
    where: Option[String],
    outKey: String,
    outValue: String) extends Rule

/** One output topic's transform (etl/yaml.go:9-18; routes constraint: all
  * inputs come from one pool, etl/routes.go:66-69).
  */
final case class Transform(
    inputTopics: Seq[String],
    outputTopic: String,
    rules: Seq[Rule])

object Etl {

  /** Compile + run one transform pass (the reference's one-shot `zync etl`,
    * cmd/zync/etl/command.go:82-91): read input pool, drop already-done
    * records, apply rules, assign output offsets, atomically commit records
    * + markers. Returns (records, markers) counts.
    */
  def run(spark: SparkSession, input: Pool, output: Pool, t: Transform): (Long, Long) = {
    val state = outputState(output)
    try {
      // compile inside the try: it runs eager jobs (offset counts, rule SQL
      // analysis), and a throw must still release outputState's cache
      val (batch, persisted, records) = compilePlanCounted(spark, input.read(), state, t)
      try {
        // The record count fell out of offset assignment's own counts job;
        // the marker count is a filter over the batch union that Catalyst
        // prunes to JUST the marker legs (the records leg folds to an empty
        // scan), so neither count executes the record path — and the append
        // below reads the compiled plan's internal caches rather than a
        // third copy of the batch (the former batch.cache()).
        val markers = batch.filter(col(Envelope.KindCol) === Envelope.KindDone).count()
        if (records + markers > 0)
          output.append(batch, knownRows = Some(records + markers))
        (records, markers)
      } finally persisted.foreach(_.unpersist())
    } finally state.persisted.foreach(_.unpersist())
  }

  /** The output pool's relevant state: done-marker keys (potentially huge —
    * stays distributed), per-topic offset bases (tiny — a scalar map, the
    * reference's own metadata query, etl/pool.go:60-81), and per-topic
    * cursors.
    *
    * Cursor (T9, design.md:89-161 — designed in the reference, left
    * unimplemented there as "brute force… scan the entire range",
    * etl/build.go:9-18): the bound below which every input offset is known
    * done. Detected cheaply: markers are distinct by construction, so a
    * topic whose done-count equals done-max+1 has a contiguous [0, max]
    * prefix → cursor = max+1. Both the input scan and the anti-join's
    * done-key side are then pruned to `offset >= cursor`, turning the
    * re-scan from O(full history) into O(unprocessed tail) — the win that
    * matters when the input pool is 100 TB of history.
    */
  final case class OutputState(
      doneKeys: Option[DataFrame],
      baseOffsets: Map[String, Long],
      cursors: Map[String, Long] = Map.empty,
      persisted: Seq[DataFrame] = Seq.empty)

  def outputState(output: Pool): OutputState =
    if (output.isEmpty) OutputState(None, Map.empty)
    else {
      // ONE scan of the output pool serves both consumers: the narrow
      // (topic, offset, kind) projection is persisted, the eager stats
      // aggregate materializes it, and the anti-join's done-key side then
      // reads the cache instead of re-scanning pool parquet — the
      // compiled pass's second-largest fixed cost after the input scan.
      // (Three columns: at 10⁹ committed markers this is ~tens of GB
      // spread across executors, MEMORY_AND_DISK spills the rest.)
      // [[run]] unpersists via `persisted` after the commit.
      val narrow = output.read()
        .select(col("kafka.topic").as("_done_topic"),
          col("kafka.offset").as("_done_offset"),
          col(Envelope.KindCol).as("_k"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // one metadata pass: per (topic, kind) count/min/max serves both the
      // record offset bases and the done-prefix cursor detection
      val stats = narrow
        .groupBy(col("_done_topic").as("t"), col("_k").as("k"))
        .agg(count(lit(1)).as("n"), min(col("_done_offset")).as("mn"), max(col("_done_offset")).as("mx"))
        .collect()
      val done = narrow.filter(col("_k") === Envelope.KindDone)
        .select(col("_done_topic"), col("_done_offset"))
      val base = stats.collect {
        case r if r.getString(1) == Envelope.KindRecord => r.getString(0) -> r.getLong(4)
      }.toMap
      val cursors = stats.collect {
        case r if r.getString(1) == Envelope.KindDone &&
            r.getLong(3) == 0L && r.getLong(2) == r.getLong(4) + 1 =>
          r.getString(0) -> (r.getLong(4) + 1)
      }.toMap
      OutputState(Some(done), base, cursors, Seq(narrow))
    }

  /** Plan compiler — testable without pools on any envelope DataFrame. */
  def compile(spark: SparkSession, input: DataFrame, state: OutputState, t: Transform): DataFrame =
    compilePlan(spark, input, state, t)._1

  /** As [[compile]], also returning the intermediate persisted DataFrames so
    * callers can unpersist after the batch is committed.
    */
  def compilePlan(spark: SparkSession, input: DataFrame, state: OutputState,
      t: Transform): (DataFrame, Seq[DataFrame]) = {
    val (batch, persisted, _) = compilePlanCounted(spark, input, state, t)
    (batch, persisted)
  }

  /** As [[compilePlan]], also returning the output-record count (free — the
    * offset-assignment counts job computes it anyway).
    */
  def compilePlanCounted(spark: SparkSession, input: DataFrame, state: OutputState,
      t: Transform): (DataFrame, Seq[DataFrame], Long) =
    try compilePlanInner(spark, input, state, t)
    catch {
      case t0: Throwable =>
        // compilation runs eager jobs (rule SQL analysis, the offsets count)
        // AFTER registering its internal persists — a throw mid-way must not
        // strand them, or a service retrying Etl.run accumulates pinned
        // executor storage. The registry is filled as each persist is
        // created, so whatever exists at throw time is released.
        compileRegistry.get().foreach { d =>
          try d.unpersist() catch { case scala.util.control.NonFatal(_) => () }
        }
        compileRegistry.remove()
        throw t0
    }
    finally compileRegistry.remove()

  private val compileRegistry =
    new ThreadLocal[Seq[DataFrame]] { override def initialValue: Seq[DataFrame] = Seq.empty }
  private def trackPersist(df: DataFrame): DataFrame = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    compileRegistry.set(compileRegistry.get() :+ p)
    p
  }

  private def compilePlanInner(spark: SparkSession, input: DataFrame, state: OutputState,
      t: Transform): (DataFrame, Seq[DataFrame], Long) = {
    // 1. Source per input topic with T7 anti-join vs done markers
    //    (build.go:111-116 fromTemplate). Single unioned scan + join on
    //    (topic, offset) — the reference scans per topic because each
    //    generated scan is already topic-filtered; one scan + pushdown is
    //    the Spark-shaped equivalent (SURVEY Q21 note).
    // T9 cursor pruning: offsets below the contiguously-done prefix can be
    // skipped on BOTH sides — these predicates reach the parquet row-group
    // stats of pools sorted by (topic, offset).
    def cursorPrune(df: DataFrame, topicCol: Column, offsetCol: Column): DataFrame =
      state.cursors.foldLeft(df) { case (acc, (topic, cur)) =>
        acc.filter(!(topicCol === topic) || offsetCol >= cur)
      }
    val scoped = cursorPrune(
      input
        .filter(col("kafka.topic").isin(t.inputTopics: _*))
        .filter(col(Envelope.KindCol) === Envelope.KindRecord),
      col("kafka.topic"), col("kafka.offset"))
    // Join strategy intentionally left to AQE: the done-key side is small
    // early on (broadcast) but grows with processed history — at scale it
    // must be allowed to fall back to a shuffled join.
    val fresh = state.doneKeys match {
      case None => scoped
      case Some(done) =>
        scoped.join(
          cursorPrune(done, col("_done_topic"), col("_done_offset")),
          col("kafka.topic") === col("_done_topic") &&
            col("kafka.offset") === col("_done_offset"),
          "left_anti")
    }

    // 2. Switch routing with strict first-match parity (build.go:92-107):
    //    each rule's branch predicate excludes all earlier rules' matches.
    //    The post-anti-join input feeds every branch (the reference's `fork`
    //    shares one scan) — persist it so branches filter materialized data
    //    instead of each recomputing the scan + anti-join subtree.
    val in = trackPersist(fresh.select(struct(col("*")).as("in")))
    val matches: Seq[Column] = t.rules.map {
      case r: StatelessRule =>
        val base = col("in.kafka.topic") === r.inTopic
        r.where.map(w => base && expr(w)).getOrElse(base)
      case r: DenormRule =>
        val base = col("in.kafka.topic").isin(r.leftTopic, r.rightTopic)
        r.where.map(w => base && expr(w)).getOrElse(base)
    }
    def branchInput(i: Int): DataFrame = {
      val notEarlier = matches.take(i).foldLeft(matches(i))((acc, m) => acc && !coalesce(m, lit(false)))
      in.filter(notEarlier)
    }

    // 3. Per-rule outputs: (out-records, done-markers, persisted handles)
    val branches: Seq[(DataFrame, DataFrame, Seq[DataFrame])] = t.rules.zipWithIndex.map {
      case (r: StatelessRule, i) =>
        val b = branchInput(i)
        val outs = b.select(
          col("in.kafka").as("_src_kafka"),
          expr(r.outKey).as("key"),
          expr(r.outValue).as("value"))
        val dones = b.select(col("in.kafka").as("_done_kafka"))
        (outs, dones, Seq.empty[DataFrame])
      case (r: DenormRule, i) =>
        val b = branchInput(i)
        val left = b.filter(col("in.kafka.topic") === r.leftTopic).select(col("in").as("left"))
        val right = b.filter(col("in.kafka.topic") === r.rightTopic).select(col("in").as("right"))
        // build.go:202: inner equi-join; both sides wrapped → collision-free.
        // Projected + persisted immediately: the join feeds both the output
        // records and BOTH marker legs — one execution instead of three.
        val joined = trackPersist(left.join(right, expr(r.joinOn), "inner")
          .select(
            col("left.kafka").as("_src_kafka"), // out.kafka := left in.kafka (build.go:207-209)
            col("right.kafka").as("_right_kafka"),
            expr(r.outKey).as("key"),
            expr(r.outValue).as("value")))
        val outs = joined.select(col("_src_kafka"), col("key"), col("value"))
        // done markers for BOTH joined sides (build.go:210-213); unjoined
        // records stay unmarked → picked up when their partner arrives.
        val dones = joined.select(col("_src_kafka").as("_done_kafka"))
          .unionByName(joined.select(col("_right_kafka").as("_done_kafka")))
        (outs, dones, Seq(joined))
    }

    // 4. Merge branches (Q25 union — rules may emit DIFFERENT value shapes,
    //    e.g. demo/invoices.yaml's denorm {ID,customer,item,invoice_status}
    //    next to the update rule's {ID,invoice_status}, so the union widens
    //    to the nullable superset like the pools themselves do), then assign
    //    output offsets (Q32, etl/pipeline.go:127-164): consecutive per
    //    output topic, ordered by source kafka meta, continuing from the
    //    output pool's max.
    //
    //    Scale note: globally-consecutive numbering is inherently ordered,
    //    but it does NOT need a single-partition window — range-partition by
    //    the ordering key, sort within partitions, then add per-partition
    //    prefix sums (Offsets.assignSequential: only P counts touch the
    //    driver). The reference holds the whole update in driver memory here
    //    (pipeline.go:87-91, a known TODO); this stays fully distributed and
    //    fully inside the DataFrame plan (no RDD hop, no row conversion).
    val allOuts = graft.pool.SchemaUnion.unionAll(branches.map(_._1))
    // ONE global distinct over every branch's markers: the denorm join can
    // mark the same input from several partners, and a decoder may emit
    // several records per (topic, offset) — e.g. ZNG multi-record message
    // values — which would otherwise commit duplicate markers from the
    // stateless branches and permanently break outputState's cursor
    // invariant ("markers are distinct by construction"). Branches are
    // first-match exclusive, so one distinct covers all of them; persisted
    // because it feeds both the marker count and the committed write.
    val allDones = trackPersist(branches.map(_._2).reduce(_ unionByName _).distinct())
    val branchPersists = branches.flatMap(_._3) :+ allDones

    val baseOffset = state.baseOffsets.getOrElse(t.outputTopic, -1L)
    // Output order is the POOL-KEY order of the source records — kafka.offset
    // ascending, interleaved across input topics (the reference reads its
    // input sorted by the lake's kafka.offset pool key, fifo/lake.go:22;
    // ztests/etl-demo.yaml:52-64 pins it: the denorm record sourced at
    // Invoices/4 takes the output offset BEFORE the update sourced at
    // InvoiceStatus/5). Topic is the tie-breaker for determinism.
    // persisted: the offset assignment's count job and the output pass must
    // see identical partitioning, and the upstream pipeline must not run twice
    val sorted = trackPersist(allOuts
      .repartitionByRange(col("_src_kafka.offset"), col("_src_kafka.topic"))
      .sortWithinPartitions(col("_src_kafka.offset"), col("_src_kafka.topic")))
    val outTopic = t.outputTopic
    val (assigned, recordCount) = Offsets.assignSequentialCounted(sorted, baseOffset + 1, "_offset")
    val records = assigned
      .select(
        struct(
          lit(outTopic).as("topic"),
          lit(0L).as("partition"),
          col("_offset").as("offset")).as("kafka"),
        col("key"), col("value"),
        lit(Envelope.KindRecord).as(Envelope.KindCol))

    val markers = allDones.select(
      col("_done_kafka").as("kafka"),
      lit(null).cast(records.schema("key").dataType).as("key"),
      lit(null).cast(records.schema("value").dataType).as("value"),
      lit(Envelope.KindDone).as(Envelope.KindCol))

    // superset union, not unionByName: the markers' kafka struct is the
    // INPUT's shape (which may lack `partition`, e.g. ZSON-loaded fixtures)
    // while records carry the full {topic,partition,offset}
    (graft.pool.SchemaUnion.unionAll(Seq(records, markers)),
      Seq(in, sorted) ++ branchPersists, recordCount)
  }
}

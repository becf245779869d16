package graft.streaming

import scala.jdk.CollectionConverters._

/** Topic administration (S7/S8): idempotent topic creation and per-topic
  * watermarks — the reference's fifo/admin.go:13-31 (`CreateMissingTopics`,
  * already-exists ignored) and fifo/consumer.go:184-227 (`Watermarks`: min
  * start offset / max end offset across partitions).
  *
  * `InMemoryTopicAdmin` backs offline tests; [[KafkaTopicAdmin]] drives a
  * real broker through the standard `AdminClient`.
  */
trait TopicAdmin {
  /** Create topics that don't exist yet; existing topics are left untouched
    * (fifo/admin.go:20-29: TopicAlreadyExists is not an error).
    */
  def createMissingTopics(partitions: Int, replicationFactor: Short,
      topics: Seq[String]): Unit

  /** (earliest, latest) offsets for a topic: min start across partitions,
    * max end across partitions (fifo/consumer.go:184-227).
    */
  def watermarks(topic: String): (Long, Long)

  /** All topic names. */
  def listTopics(): Seq[String]
}

/** Offline fake with the same semantics; watermarks are settable by tests. */
final class InMemoryTopicAdmin extends TopicAdmin {
  private val topics0 =
    new java.util.concurrent.ConcurrentHashMap[String, (Int, Short)]()
  private val marks =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()

  def createMissingTopics(partitions: Int, replicationFactor: Short,
      topics: Seq[String]): Unit =
    topics.foreach(t => topics0.putIfAbsent(t, (partitions, replicationFactor)))

  def setWatermarks(topic: String, lo: Long, hi: Long): Unit =
    marks.put(topic, (lo, hi))

  def watermarks(topic: String): (Long, Long) = {
    require(topics0.containsKey(topic), s"unknown topic $topic")
    Option(marks.get(topic)).getOrElse((0L, 0L))
  }

  def listTopics(): Seq[String] = topics0.keySet.asScala.toSeq.sorted

  def partitionsOf(topic: String): Option[Int] =
    Option(topics0.get(topic)).map(_._1)
}

/** Broker-backed admin over `org.apache.kafka.clients.admin.AdminClient`.
  *
  * kafka-clients is deployment-provided (the same policy as the Kafka DSv2
  * connector jar the sources bind to by format string), so it is reached via
  * reflection: this class compiles and loads without the jar and fails with
  * a clear message only when actually used without it.
  *
  * @param clientOptions raw AdminClient config (bootstrap plus TLS/SASL:
  *   `security.protocol`, `sasl.mechanism`, … — no `kafka.` prefix here,
  *   these go straight to the client like cli/flags.go:95-139).
  */
final class KafkaTopicAdmin(bootstrap: String,
    clientOptions: Map[String, String] = Map.empty) extends TopicAdmin with AutoCloseable {

  private def cls(name: String) =
    try Class.forName(name)
    catch {
      case e: ClassNotFoundException =>
        throw new IllegalStateException(
          "KafkaTopicAdmin needs kafka-clients on the classpath (deployment-provided, " +
            "like the spark-sql-kafka connector)", e)
    }

  private lazy val admin: AnyRef = {
    val props = new java.util.Properties()
    props.put("bootstrap.servers", bootstrap)
    clientOptions.foreach { case (k, v) => props.put(k, v) }
    cls("org.apache.kafka.clients.admin.AdminClient")
      .getMethod("create", classOf[java.util.Properties])
      .invoke(null, props)
  }

  private def futureGet(kafkaFuture: AnyRef): AnyRef =
    kafkaFuture.getClass.getMethod("get").invoke(kafkaFuture)

  def createMissingTopics(partitions: Int, replicationFactor: Short,
      topics: Seq[String]): Unit = {
    val newTopicCls = cls("org.apache.kafka.clients.admin.NewTopic")
    val ctor = newTopicCls.getConstructor(classOf[String], classOf[Int], classOf[Short])
    // one at a time, like fifo/admin.go:19-21 (avoids one slow broker timing
    // out the whole batch), ignoring TopicExistsException
    topics.foreach { t =>
      val nt = ctor.newInstance(t, Int.box(partitions), Short.box(replicationFactor))
      val result = admin.getClass.getMethod("createTopics", classOf[java.util.Collection[_]])
        .invoke(admin, java.util.List.of(nt))
      val all = result.getClass.getMethod("all").invoke(result)
      try futureGet(all)
      catch {
        case e: java.lang.reflect.InvocationTargetException
            if rootCauseIs(e, "org.apache.kafka.common.errors.TopicExistsException") => ()
        case e: java.util.concurrent.ExecutionException
            if rootCauseIs(e, "org.apache.kafka.common.errors.TopicExistsException") => ()
      }
    }
  }

  private def rootCauseIs(e: Throwable, className: String): Boolean = {
    var t: Throwable = e
    while (t != null) {
      if (t.getClass.getName == className) return true
      t = t.getCause
    }
    false
  }

  def watermarks(topic: String): (Long, Long) = {
    val tpCls = cls("org.apache.kafka.common.TopicPartition")
    val tpCtor = tpCls.getConstructor(classOf[String], classOf[Int])
    val offsetSpecCls = cls("org.apache.kafka.clients.admin.OffsetSpec")

    // partition ids via describeTopics
    val described = admin.getClass
      .getMethod("describeTopics", classOf[java.util.Collection[_]])
      .invoke(admin, java.util.List.of(topic))
    val allNames = described.getClass.getMethod("allTopicNames").invoke(described)
    val descMap = futureGet(allNames).asInstanceOf[java.util.Map[String, AnyRef]]
    val td = descMap.get(topic)
    val parts = td.getClass.getMethod("partitions").invoke(td)
      .asInstanceOf[java.util.List[AnyRef]].asScala
      .map(p => p.getClass.getMethod("partition").invoke(p).asInstanceOf[Integer])

    def list(spec: String): Seq[Long] = {
      val specObj = offsetSpecCls.getMethod(spec).invoke(null)
      val req = new java.util.HashMap[AnyRef, AnyRef]()
      parts.foreach(p => req.put(tpCtor.newInstance(topic, p).asInstanceOf[AnyRef], specObj))
      val res = admin.getClass.getMethod("listOffsets", classOf[java.util.Map[_, _]])
        .invoke(admin, req)
      val resMap = futureGet(res.getClass.getMethod("all").invoke(res))
        .asInstanceOf[java.util.Map[AnyRef, AnyRef]]
      resMap.values().asScala.toSeq
        .map(i => i.getClass.getMethod("offset").invoke(i).asInstanceOf[java.lang.Long].longValue())
    }

    (list("earliest").min, list("latest").max) // consumer.go:196-227 min/max fold
  }

  def listTopics(): Seq[String] = {
    val res = admin.getClass.getMethod("listTopics").invoke(admin)
    futureGet(res.getClass.getMethod("names").invoke(res))
      .asInstanceOf[java.util.Set[String]].asScala.toSeq.sorted
  }

  def close(): Unit =
    admin.getClass.getMethod("close").invoke(admin)
}

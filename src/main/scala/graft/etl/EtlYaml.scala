package graft.etl

import scala.jdk.CollectionConverters._
import org.yaml.snakeyaml.Yaml

/** YAML transform config (reference: etl/yaml.go:9-45 `Transform`/`Rule`;
  * spec README.md:268-317; validation etl/build.go:30-53 and
  * etl/routes.go:53-73).
  *
  * {{{
  * inputs:
  *   - pool: Raw
  *     topics: [Orders, Statuses]
  * output:
  *   pool: Staging
  *   topic: Enriched
  * etls:
  *   - type: denorm
  *     left: Orders
  *     right: Statuses
  *     join-on: left.value.after.id = right.value.after.left_id
  *     where: in.value.op = 'c'
  *     out-key: named_struct('id', left.value.after.id)
  *     out-value: named_struct('id', left.value.after.id)
  *   - type: stateless
  *     in: Orders
  *     where: in.value.op = 'u'
  *     out-key: ...
  *     out-value: ...
  * }}}
  *
  * Where the reference rules carry Zed scripts, ours carry SQL expressions
  * over the bound `in` / `left` / `right` structs (SURVEY Q31 decision).
  */
final case class EtlConfig(inputPool: String, outputPool: String, transform: Transform)

object EtlYaml {

  def parse(text: String): EtlConfig = {
    val root = new Yaml().load[java.util.Map[String, Object]](text).asScala

    val inputs = root.getOrElse("inputs", err("missing inputs"))
      .asInstanceOf[java.util.List[java.util.Map[String, Object]]].asScala.map(_.asScala)
    // all-inputs-one-pool constraint (routes.go:66-69)
    val pools = inputs.map(_.getOrElse("pool", err("input missing pool")).toString).distinct
    require(pools.size == 1, s"all inputs must come from one pool, got $pools")
    val topics = inputs.flatMap(_.getOrElse("topics", err("input missing topics"))
      .asInstanceOf[java.util.List[Object]].asScala.map(_.toString)).toSeq

    val out = root.getOrElse("output", err("missing output"))
      .asInstanceOf[java.util.Map[String, Object]].asScala
    val outPool = out.getOrElse("pool", err("output missing pool")).toString
    val outTopic = out.getOrElse("topic", err("output missing topic")).toString

    val rules = root.getOrElse("etls", err("missing etls"))
      .asInstanceOf[java.util.List[java.util.Map[String, Object]]].asScala.map(_.asScala)
      .map { r =>
        def req(k: String): String = r.getOrElse(k, err(s"rule missing $k")).toString
        def opt(k: String): Option[String] = r.get(k).map(_.toString)
        r.getOrElse("type", err("rule missing type")).toString match {
          case "stateless" => // build.go:44-53: stateless needs in
            StatelessRule(req("in"), opt("where"), req("out-key"), req("out-value"))
          case "denorm" => // build.go:30-43: denorm needs left+right
            DenormRule(req("left"), req("right"), req("join-on"), opt("where"),
              req("out-key"), req("out-value"))
          case other => err(s"unknown rule type $other")
        }
      }.toSeq
    require(rules.nonEmpty, "no rules")

    EtlConfig(pools.head, outPool, Transform(topics, outTopic, rules))
  }

  private def err(msg: String): Nothing = throw new IllegalArgumentException(s"etl yaml: $msg")
}

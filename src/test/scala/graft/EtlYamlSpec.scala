package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.{DenormRule, EtlYaml, StatelessRule}

class EtlYamlSpec extends AnyFunSuite {

  private val goldenYaml =
    """inputs:
      |  - pool: Raw
      |    topics: [Orders, Statuses]
      |output:
      |  pool: Staging
      |  topic: Enriched
      |etls:
      |  - type: denorm
      |    left: Orders
      |    right: Statuses
      |    join-on: left.value.after.id = right.value.after.left_id
      |    where: in.value.op = 'c'
      |    out-key: named_struct('id', left.value.after.id)
      |    out-value: named_struct('id', left.value.after.id, 'st', right.value.after.st)
      |  - type: stateless
      |    in: Orders
      |    where: in.value.op = 'u'
      |    out-key: named_struct('id', in.value.after.id)
      |    out-value: named_struct('id', in.value.after.id, 'st', cast(null as string))
      |""".stripMargin

  test("parses the demo-style config (demo/invoices.yaml analog)") {
    val cfg = EtlYaml.parse(goldenYaml)
    assert(cfg.inputPool == "Raw" && cfg.outputPool == "Staging")
    assert(cfg.transform.inputTopics == Seq("Orders", "Statuses"))
    assert(cfg.transform.outputTopic == "Enriched")
    val Seq(d: DenormRule, s: StatelessRule) = cfg.transform.rules
    assert(d.joinOn.contains("left.value.after.id"))
    assert(s.inTopic == "Orders" && s.where.contains("in.value.op = 'u'"))
  }

  test("rejects multi-pool inputs (routes.go:66-69)") {
    val bad = goldenYaml.replace("    topics: [Orders, Statuses]",
      "    topics: [Orders]\n  - pool: Other\n    topics: [Statuses]")
    val e = intercept[IllegalArgumentException](EtlYaml.parse(bad))
    assert(e.getMessage.contains("one pool"))
  }

  test("rejects denorm without right side (build.go:30-43)") {
    val bad =
      """inputs:
        |  - pool: Raw
        |    topics: [A]
        |output: {pool: S, topic: T}
        |etls:
        |  - type: denorm
        |    left: A
        |    join-on: x = y
        |    out-key: k
        |    out-value: v
        |""".stripMargin
    val e = intercept[IllegalArgumentException](EtlYaml.parse(bad))
    assert(e.getMessage.contains("right"))
  }
}

package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.cli.Zng

/** Property fuzz for the ZNG binary codec: generated JSON-line batches
  * must round-trip write → read exactly, compressed and not. Complements
  * ZngSpec's fixture/golden tests with generated shapes. Generator range:
  * nested records (distinct field names), homogeneous scalar arrays
  * (including empty), int64 extremes, empty / whitespace / control-char
  * strings, booleans, nulls. Floats and duplicate field names are NOT
  * generated — float rendering is pinned by ZngSpec's golden cases, and
  * duplicate names aren't representable in a Zed record type.
  */
class ZngPropertySpec extends AnyFunSuite {

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private val name: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar)).map(_.mkString)

  // JSON value text, by depth budget. Arrays are HOMOGENEOUS (one element
  // kind per array): mixed-type arrays are representable in JSON but are
  // union types in the Zed model, which the writer's documented subset
  // excludes — they raise a clear error rather than round-tripping.
  private def value(depth: Int): Gen[String] =
    if (depth <= 0) scalar
    else Gen.frequency(
      5 -> scalar,
      2 -> homogeneousArray,
      2 -> record(depth - 1))

  private val longGen: Gen[String] =
    Gen.choose(Long.MinValue, Long.MaxValue).map(_.toString)
  private val strGen: Gen[String] = Gen.frequency(
    3 -> Gen.choose(1, 10).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar))
      .map(cs => "\"" + esc(cs.mkString) + "\""),
    1 -> Gen.oneOf("\"\"", "\" \"", "\"\\u0001\""))
  private val boolGen: Gen[String] = Gen.oneOf("true", "false")

  private val scalar: Gen[String] = Gen.frequency(
    3 -> longGen, 3 -> strGen, 1 -> boolGen, 1 -> Gen.const("null"))

  private val homogeneousArray: Gen[String] =
    for {
      elem <- Gen.oneOf(longGen, strGen, boolGen)
      n <- Gen.choose(0, 3)
      vals <- Gen.listOfN(n, elem)
    } yield vals.mkString("[", ",", "]")

  private def record(depth: Int): Gen[String] =
    for {
      n <- Gen.choose(1, 4)
      names <- Gen.listOfN(n, name).map(_.distinct)
      vals <- Gen.listOfN(names.length, value(depth))
    } yield names.zip(vals).map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")

  test("generated record batches round-trip through the ZNG writer/reader") {
    val batches = Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, record(3)))
    // forAllNoShrink: the default String shrinker leaves the generator's
    // domain (shrinks a record line toward ""), producing spurious minima
    val prop = Prop.forAllNoShrink(batches) { lines: List[String] =>
      // the generator emits the same compact form the reader renders, so
      // equality is exact strings
      Zng.readJsonLines(Zng.write(lines)) == lines &&
        Zng.readJsonLines(Zng.write(lines, compress = true)) == lines
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}

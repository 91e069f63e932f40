package graft.config

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class ExprUtilsSpec extends AnyFunSuite with Matchers {

  test("splits top-level commas only (the reference's split-bug case)") {
    ExprUtils.splitTopLevel("full_name:concat(first, ' ', last),annual:salary * 12") shouldBe
      List("full_name:concat(first, ' ', last)", "annual:salary * 12")
  }

  test("handles nested parens and brackets") {
    ExprUtils.splitTopLevel("a:f(g(x, y), h[1, 2]),b:k(z)") shouldBe
      List("a:f(g(x, y), h[1, 2])", "b:k(z)")
  }

  test("ignores commas and quotes inside string literals") {
    ExprUtils.splitTopLevel("a:concat(x, ',', y),b:z") shouldBe
      List("a:concat(x, ',', y)", "b:z")
    ExprUtils.splitTopLevel("""a:case when x = 'it''s, ok' then 1 end,b:y""").size shouldBe 2
  }

  test("parseAliased: alias must be an identifier; CAST colon-free") {
    ExprUtils.parseAliased("total:sum(x)") shouldBe (Some("total"), "sum(x)")
    ExprUtils.parseAliased("sum(x)") shouldBe (None, "sum(x)")
  }

  test("parseAggregations: compact alias:func(expr) with expression aggregate") {
    val cols = ExprUtils.parseAggregations("revenue:sum(price * quantity),n:count(*)")
    cols.map(_.toString) shouldBe List("sum(price * quantity) AS revenue", "count(*) AS n")
  }

  test("property: joining split parts with commas at depth 0 round-trips") {
    val genPart = for {
      n <- Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(5))
      args <- Gen.chooseNum(1, 4)
    } yield s"$n:f(${(1 to args).map(i => s"a$i").mkString(", ")})"
    val prop = Prop.forAll(Gen.nonEmptyListOf(genPart)) { parts =>
      ExprUtils.splitTopLevel(parts.mkString(",")) == parts
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }
}

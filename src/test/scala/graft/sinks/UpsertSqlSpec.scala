package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class UpsertSqlSpec extends AnyFunSuite with Matchers {
  private val cols = Seq("id", "name", "total")

  test("postgres ON CONFLICT DO UPDATE, key columns excluded from SET") {
    UpsertSql.postgres("sales", "sales_stg", cols, Seq("id")) shouldBe
      "INSERT INTO sales (id, name, total) SELECT id, name, total FROM sales_stg " +
      "ON CONFLICT (id) DO UPDATE SET name = EXCLUDED.name, total = EXCLUDED.total"
  }

  test("postgres all-key table degrades to DO NOTHING") {
    UpsertSql.postgres("t", "s", Seq("a", "b"), Seq("a", "b")) should endWith("DO NOTHING")
  }

  test("mysql ON DUPLICATE KEY UPDATE with VALUES()") {
    UpsertSql.mysql("sales", "sales_stg", cols, Seq("id")) shouldBe
      "INSERT INTO sales (id, name, total) SELECT id, name, total FROM sales_stg " +
      "ON DUPLICATE KEY UPDATE name = VALUES(name), total = VALUES(total)"
  }

  test("mysql all-key table emits a no-op self-assignment (never a dangling UPDATE)") {
    UpsertSql.mysql("t", "s", Seq("a", "b"), Seq("a", "b")) shouldBe
      "INSERT INTO t (a, b) SELECT a, b FROM s ON DUPLICATE KEY UPDATE a = VALUES(a)"
  }

  test("composite keys excluded from both dialects' update lists") {
    UpsertSql.postgres("t", "s", cols :+ "k2", Seq("id", "k2")) should not include "k2 = EXCLUDED"
    UpsertSql.mysql("t", "s", cols :+ "k2", Seq("id", "k2")) should not include "k2 = VALUES"
  }
}

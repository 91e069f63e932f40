package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** README's registry counts drifted for three straight rounds (127/119
  * hand-stated while the truth moved to 134/125). The counts are now
  * DERIVED: every number in README that depends on the query registry is
  * wrapped in a `<!--count:KEY-->N<!--/count-->` marker (invisible when
  * rendered), and this spec asserts each marker equals the live registry —
  * adding a query without updating README turns the suite red instead of
  * shipping a stale doc. */
class ReadmeCountsSpec extends AnyFunSuite with Matchers {
  private val Marker = """<!--count:([a-z_]+)-->(\d+)<!--/count-->""".r

  private lazy val readme = java.nio.file.Files.readString(
    java.nio.file.Paths.get("README.md"))

  private lazy val truth = Map(
    "queries" -> SparkEntry.queries.size,
    "oracles" -> SparkEntry.oracleSql.size,
    // rows-only = registry entries with no DuckDB-expressible oracle
    "rows_only" -> (SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet).size,
  )

  test("every README count marker matches the live query registry") {
    val found = Marker.findAllMatchIn(readme).toList
    found should not be empty
    for (m <- found) {
      val (key, value) = (m.group(1), m.group(2).toInt)
      withClue(s"README marker count:$key (run `sbt test` after editing " +
        "the registry and update the marker to the asserted value): ") {
        truth.get(key) match {
          case Some(t) => value shouldBe t
          case None => fail(s"unknown count marker '$key' — known: ${truth.keys.toSeq.sorted.mkString(", ")}")
        }
      }
    }
  }

  test("README carries a marker for each derived count (deleting the " +
    "markers must not silently disable the gate)") {
    val keys = Marker.findAllMatchIn(readme).map(_.group(1)).toSet
    keys shouldBe truth.keySet
  }

  test("the oracle map never names a query missing from the registry " +
    "(rows_only arithmetic assumes oracles ⊆ queries)") {
    (SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet) shouldBe empty
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the hand-assigned category registry
  * (docs/query_categories.tsv — the input of tools/survey_table.py,
  * which generates SURVEY §2.4's evidence table) to the DECLARED
  * query surface, in both directions: a query added to
  * SparkEntry.queries without a category, or a stale tsv row for a
  * removed query, fails the build. This kills the
  * reconcile-the-narrative failure mode of the hand-maintained §2.4
  * prose (round-10/11 incidents; round-12 verdict ask #5). */
class RegistrySpec extends AnyFunSuite {

  private def tsv(): Map[String, String] = {
    val path = java.nio.file.Paths.get("docs/query_categories.tsv")
    assert(java.nio.file.Files.exists(path),
      s"registry missing at $path (cwd=${System.getProperty("user.dir")})")
    scala.jdk.CollectionConverters.ListHasAsScala(
        java.nio.file.Files.readAllLines(path)).asScala
      .filter(_.nonEmpty)
      .map { l =>
        val parts = l.split("\t")
        assert(parts.length == 2, s"malformed tsv line: '$l'")
        (parts(0), parts(1))
      }.toMap
  }

  test("every declared query has exactly one category; no stale rows") {
    val reg = tsv()
    val declared = SparkEntry.queries.keySet
    val uncategorized = declared -- reg.keySet
    val stale = reg.keySet -- declared
    assert(uncategorized.isEmpty,
      s"queries missing from docs/query_categories.tsv: " +
        s"${uncategorized.toSeq.sorted.mkString(", ")}")
    assert(stale.isEmpty,
      s"stale tsv rows for undeclared queries: " +
        s"${stale.toSeq.sorted.mkString(", ")}")
  }

  test("every declared query has an oracle (the driver gate's precondition)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty,
      s"queries with no oracleSql entry: ${missing.toSeq.sorted.mkString(", ")}")
  }
}

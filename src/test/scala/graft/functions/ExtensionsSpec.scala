package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions injection path — what a user configures
  * via `spark.sql.extensions=graft.functions.GraftExtensions` — must
  * expose the same SQL functions as Curves.register. */
class ExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .appName("graft-extensions-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .withExtensions(new GraftExtensions)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("injected functions resolve through the SQL parser") {
    val r = spark.sql(
      """SELECT curve_key_str(hilbert_encode(array(tinyint(1), tinyint(2), tinyint(3)))) AS h,
        |       curve_key_str(morton_encode(array(tinyint(1), tinyint(2), tinyint(3)))) AS m,
        |       hilbert_decode(22, 3, false, false, 32) AS pt
        |""".stripMargin).head()
    assert(r.getString(0) == "22") // reference golden test/sql/lindel.test:15-18
    assert(r.getString(1) == "29") // :20-23
    assert(r.getSeq[Int](2) == Seq(1, 2, 3)) // :25-28
  }

  test("DESCRIBE FUNCTION surfaces the registered usage docs (reference :959-978)") {
    Curves.functions.foreach { case (name, _, usage) =>
      val desc = spark.sql(s"DESCRIBE FUNCTION $name")
        .collect().map(_.getString(0)).mkString("\n")
      assert(desc.contains(s"Function: $name"), desc)
      assert(desc.contains(usage), s"usage doc missing for $name:\n$desc")
    }
  }
}

package graft.graph

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral contracts of the integer PageRank that the oracle's
  * value-hash can't state as invariants: isolated nodes pin to the
  * base rank, regular graphs are exact fixed points, hubs outrank
  * leaves, and edge orientation doesn't matter.
  */
class GraphRankSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-graphrank-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val Scale = 1000000000000L
  private val Base = Scale * 15 / 100

  private def nodes(ids: Long*) = {
    import spark.implicits._
    ids.toDF("doc_id")
  }
  private def pairs(es: (Long, Long)*) = {
    import spark.implicits._
    es.toDF("doc_a", "doc_b")
  }

  private def ranks(n: org.apache.spark.sql.DataFrame,
      p: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
    val m = GraphRank.pageRank(n, p).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.catalog.clearCache()
    m
  }

  test("isolated nodes pin to the base rank; every node is emitted") {
    val r = ranks(nodes(1L, 2L, 3L, 4L), pairs(1L -> 2L))
    assert(r.keySet == Set(1L, 2L, 3L, 4L))
    assert(r(3L) == Base && r(4L) == Base)
    // a mutual pair is a 1-regular graph: exact fixed point at scale
    assert(r(1L) == Scale && r(2L) == Scale)
  }

  test("a cycle (2-regular) is an exact fixed point at scale") {
    val r = ranks(nodes(1L, 2L, 3L, 4L, 5L),
      pairs(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 1L))
    assert(r.values.toSet == Set(Scale))
  }

  test("a star's hub outranks its leaves, which outrank isolation") {
    val r = ranks(nodes(0L, 1L, 2L, 3L, 4L, 9L),
      pairs(0L -> 1L, 0L -> 2L, 0L -> 3L, 0L -> 4L))
    assert(r(0L) > r(1L), s"hub must outrank leaf: $r")
    assert(Set(1L, 2L, 3L, 4L).map(r).size == 1, "leaves tie by symmetry")
    assert(r(1L) > r(9L), "connected leaf must outrank the isolated node")
  }

  test("edge orientation is irrelevant: swapped pairs give identical ranks") {
    val es = Seq(1L -> 2L, 2L -> 3L, 1L -> 4L, 4L -> 5L, 3L -> 5L)
    val a = ranks(nodes(1L, 2L, 3L, 4L, 5L), pairs(es: _*))
    val b = ranks(nodes(1L, 2L, 3L, 4L, 5L), pairs(es.map(_.swap): _*))
    assert(a == b)
  }
}

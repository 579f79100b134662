package graft

import graft.functions.CmSketch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Count-Min laws: the deterministic no-undercount direction, the
  * probabilistic ε-overcount bound (measured), and the exact-merge
  * property — the counter matrix must be BIT-IDENTICAL under any
  * partitioning, the strongest distribution law a sketch can carry.
  */
class CmSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Depth = 5
  private val Width = 256

  private def zipf(n: Int, seed: Int): Seq[String] = {
    val rnd = new Random(seed)
    (1 to n).map { _ =>
      val r = rnd.nextDouble()
      val rank = math.min(200, math.max(1, math.floor(1.0 / (r * r * 0.14 + 0.005)).toInt))
      s"item_$rank"
    }
  }

  private def stateOf(items: Seq[String], parts: Int): Array[Long] =
    items.toDF("it").repartition(parts)
      .agg(CmSketch.state(col("it"), Depth, Width).as("s"))
      .head().getSeq[Long](0).toArray

  test("no undercount, ever: estimate >= true count for EVERY item") {
    val items = zipf(20000, seed = 7)
    val state = stateOf(items, parts = 8)
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong)
    for ((it, n) <- truth)
      assert(CmSketch.estimate(state, it, Depth, Width) >= n,
        s"$it undercounted")
    // absent items estimate >= 0 trivially; spot that they stay small
    assert(CmSketch.estimate(state, "never_seen_item", Depth, Width) <=
      math.ceil(math.E / Width * items.size).toLong)
  }

  test("epsilon bound holds on the fixture: estimate <= truth + ceil(e/width * N)") {
    val items = zipf(20000, seed = 13)
    val state = stateOf(items, parts = 8)
    val bound = math.ceil(math.E / Width * items.size).toLong
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong)
    for ((it, n) <- truth) {
      val est = CmSketch.estimate(state, it, Depth, Width)
      assert(est <= n + bound, s"$it: est $est vs truth $n + bound $bound")
    }
  }

  test("merge is EXACT: the counter matrix is bit-identical under any partitioning") {
    val items = zipf(8000, seed = 29)
    val a = stateOf(items, parts = 1)
    val b = stateOf(items, parts = 7)
    val c = stateOf(items, parts = 32)
    assert(a.toSeq === b.toSeq)
    assert(a.toSeq === c.toSeq)
    // and the matrix total is exactly depth * N — nothing lost or invented
    assert(a.sum === Depth.toLong * items.size)
  }

  test("null items are skipped; non-string input rejected") {
    val state = Seq(Some("a"), None, Some("a"), None).toDF("it")
      .agg(CmSketch.state(col("it"), Depth, Width).as("s"))
      .head().getSeq[Long](0).toArray
    assert(state.sum === Depth.toLong * 2)
    assert(CmSketch.estimate(state, "a", Depth, Width) === 2L)
    val e = intercept[Exception] {
      Seq(1L).toDF("it").agg(CmSketch.state(col("it"), Depth, Width)).collect()
    }
    assert(e.getMessage.contains("STRING"))
  }

  test("estimate rejects a state of the wrong geometry") {
    val e = intercept[IllegalArgumentException] {
      CmSketch.estimate(new Array[Long](10), "x", Depth, Width)
    }
    assert(e.getMessage.contains("depth*width"))
  }
}

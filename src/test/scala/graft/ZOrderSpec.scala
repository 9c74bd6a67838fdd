package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

/**
 * Z-order layout invariants (q80). The layout's correctness contract is the
 * SUPERSET property: for any 2-D box, every point inside the box maps to a
 * z-bucket in `bucketsForBox` — a dropped bucket would silently lose rows
 * from every box query over the layout. The property is checked both in
 * pure Scala (mirroring the Column arithmetic) and through the actual
 * Column expressions on a DataFrame.
 */
class ZOrderSpec extends SparkSpec {

  private def check(prop: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  // pure-Scala mirror of ZOrder.dilate16/interleave on 11-bit coords
  private def dilate(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    (x | (x << 1)) & 0x55555555L
  }
  private def zbucket(x: Long, y: Long): Long =
    (dilate(x) | (dilate(y) << 1)) >> 16

  test("superset property: every in-box point's bucket is enumerated") {
    val coord = Gen.choose(0L, 2047L)
    check(Prop.forAll(coord, coord, coord, coord, coord, coord) {
      (a, b, c, d, px, py) =>
        val (xLo, xHi) = (math.min(a, b), math.max(a, b))
        val (yLo, yHi) = (math.min(c, d), math.max(c, d))
        val buckets = ZOrder.bucketsForBox(xLo, xHi, yLo, yHi).toSet
        // clamp the probe point into the box
        val x = xLo + (if (xHi > xLo) px % (xHi - xLo + 1) else 0L)
        val y = yLo + (if (yHi > yLo) py % (yHi - yLo + 1) else 0L)
        buckets.contains(zbucket(x, y))
    })
  }

  test("bucket enumeration is tight on single-cell boxes") {
    // a box inside one grid cell must touch exactly one bucket
    assert(ZOrder.bucketsForBox(0L, 255L, 0L, 255L) == Seq(0L))
    assert(ZOrder.bucketsForBox(256L, 511L, 0L, 255L).length == 1)
    // and the full plane touches all 64
    assert(ZOrder.bucketsForBox(0L, 2047L, 0L, 2047L).length == 64)
  }

  test("Column arithmetic agrees with the Scala mirror") {
    val rows = for (x <- 0L until 2048L by 97; y <- 0L until 2048L by 89) yield (x, y)
    import spark.implicits._
    val df = rows.toDF("x", "y")
      .withColumn("zb", ZOrder.bucket(col("x"), col("y")))
      .collect()
    df.foreach { r =>
      assert(r.getLong(2) == zbucket(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("z-locality: adjacent points in one grid cell share a bucket") {
    // the point of the layout — both coordinates' high bits decide the
    // directory, so near-equal coordinates co-locate
    assert(zbucket(100, 200) == zbucket(101, 201))
    assert(zbucket(300, 300) == zbucket(310, 290))
  }
}

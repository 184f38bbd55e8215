package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.{PropSupport, SparkSupport}

/** Bit-exactness of the Morton interleave: the executed Spark
  * expression must agree with the driver-side reference decode on
  * every bit, for 2- and 3-column keys, across the full domain
  * including the corners.
  */
class ZOrderSpec extends AnyFunSuite with SparkSupport with PropSupport {

  test("2-column interleave round-trips through deinterleave across the 16-bit domain") {
    import spark.implicits._
    val corners = Seq(0L, 1L, 2L, 32767L, 32768L, 65534L, 65535L)
    val rnd = new scala.util.Random(42)
    val pairs = (for (x <- corners; y <- corners) yield (x, y)) ++
      Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pairs.toDF("x", "y")
      .withColumn("z", ZOrder.interleave(Seq($"x", $"y"), 16))
      .collect()
    got.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(ZOrder.deinterleave(z, 2, 16, 0) == x, s"x bits lost for ($x,$y) -> $z")
      assert(ZOrder.deinterleave(z, 2, 16, 1) == y, s"y bits lost for ($x,$y) -> $z")
      assert(z >= 0 && z < (1L << 32))
    }
  }

  test("3-column interleave round-trips and masks out-of-domain input") {
    import spark.implicits._
    val rows = Seq((5L, 1023L, 512L), (1024L + 7L, 0L, 1023L), (-1L, 3L, 4L))
    val got = rows.toDF("a", "b", "c")
      .withColumn("z", ZOrder.interleave(Seq($"a", $"b", $"c"), 10))
      .collect()
    got.foreach { r =>
      val mask = (1L << 10) - 1
      val (a, b, c, z) = (r.getLong(0) & mask, r.getLong(1) & mask, r.getLong(2) & mask, r.getLong(3))
      assert(ZOrder.deinterleave(z, 3, 10, 0) == a)
      assert(ZOrder.deinterleave(z, 3, 10, 1) == b)
      assert(ZOrder.deinterleave(z, 3, 10, 2) == c)
    }
  }

  test("single-column interleave is the masked identity; width guard rejects sign-bit keys") {
    import spark.implicits._
    val got = Seq(300L, 65535L, 70000L).toDF("x")
      .withColumn("z", ZOrder.interleave(Seq($"x"), 16))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    got.foreach { case (x, z) => assert(z == (x & 65535L)) }
    assertThrows[IllegalArgumentException](ZOrder.interleave(Seq(lit(1L)), 64))
    assertThrows[IllegalArgumentException](ZOrder.interleave(Seq(lit(1L), lit(2L)), 32))
    assertThrows[IllegalArgumentException](ZOrder.interleave(Nil, 8))
  }
}

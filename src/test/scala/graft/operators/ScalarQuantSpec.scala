package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSupport

class ScalarQuantSpec extends AnyFunSuite with SparkSupport {

  private val Dims = 16

  private def corpus(n: Int = 100) = {
    import spark.implicits._
    spark.range(n.toLong).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(Dims - 1)), d =>
        pmod(xxhash64($"id", d), lit(1000)).cast("double") / 100.0 - 5.0).as("e"))
  }

  test("encode matches a driver-side affine quantizer; decode error bounded by step/2") {
    import spark.implicits._
    val v = corpus()
    val (lo, step) = ScalarQuant.ranges(v, "e")
    assert(lo.length == Dims && step.length == Dims)
    val got = ScalarQuant.encode(v, "e", "vec_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val vArr = v.collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    vArr.foreach { case (id, e) =>
      val expect = e.zipWithIndex.map { case (x, i) =>
        if (step(i) == 0.0) 0L
        else math.min(255L, math.floor((x - lo(i)) / step(i)).toLong)
      }
      assert(got(id) == expect, s"vec $id")
    }
    // codes in range, max value hits 255 somewhere (the clamp path runs)
    val flat = got.values.flatten
    assert(flat.forall(c => c >= 0 && c <= 255))
    assert(flat.max == 255L)
    // midpoint decode: |x - decode(encode(x))| <= step/2 per dimension
    val dec = v.select($"vec_id",
      ScalarQuant.decodeExpr(
        ScalarQuant.encodeExpr($"e", lo, step), lo, step).as("d"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    vArr.foreach { case (id, e) =>
      e.zip(dec(id)).zipWithIndex.foreach { case ((x, xd), i) =>
        assert(math.abs(x - xd) <= step(i) / 2 + 1e-12,
          s"vec $id dim $i: |$x - $xd| > ${step(i) / 2}")
      }
    }
  }

  test("degenerate dimension (constant value) codes to 0; null element codes to null") {
    import spark.implicits._
    val v = corpus(20).withColumn("e",
      concat($"e", array(lit(7.5), lit(null).cast("double"))))
    val (lo, step) = ScalarQuant.ranges(v, "e")
    assert(step(Dims) == 0.0, "constant dimension must have step 0")
    val codes = v.select(ScalarQuant.encodeExpr($"e", lo, step).as("c"))
      .collect().map(_.getSeq[Any](0))
    codes.foreach { c =>
      assert(c(Dims) == 0L, "constant dim must code 0")
      assert(c(Dims + 1) == null, "null element must code null, not 255")
    }
  }

  test("out-of-range values clamp at BOTH ends of the 0..255 code range (r10 review)") {
    import spark.implicits._
    val v = corpus(20)
    val (lo, step) = ScalarQuant.ranges(v, "e")
    // a query vector far outside the stats corpus' range in both directions
    val q = Seq((0L, Seq.fill(Dims)(-1e9) ++ Seq.empty)).toDF("vec_id", "e")
      .unionByName(Seq((1L, Seq.fill(Dims)(1e9))).toDF("vec_id", "e"))
    val codes = q.orderBy($"vec_id")
      .select(ScalarQuant.encodeExpr($"e", lo, step).as("c"))
      .collect().map(_.getSeq[Long](0))
    assert(codes(0).forall(_ == 0L), s"below-range must clamp to 0, got ${codes(0).distinct}")
    assert(codes(1).forall(_ == 255L), s"above-range must clamp to 255, got ${codes(1).distinct}")
  }
}

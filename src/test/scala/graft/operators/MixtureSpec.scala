package graft.operators

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.PropSupport

/** The mixture-rate algebra on arbitrary count profiles (the q81 gate
  * pins one corpus against DuckDB; these pin the math itself, including
  * the huge-count regime the r10 review showed overflowing the earlier
  * Long form — counts up to 1e12 docs per stratum are exercised).
  */
class MixtureSpec extends AnyFunSuite with PropSupport {

  private val profiles: Gen[(List[Long], Long)] = for {
    n <- Gen.choose(1, 12)
    counts <- Gen.listOfN(n, Gen.oneOf(
      Gen.choose(1L, 1000L), Gen.choose(1L, 1000000L), Gen.choose(1L, 1000000000000L)))
    epoch <- Gen.choose(0L, 10000000L)
  } yield (counts, epoch)

  test("rates: base/thresh ranges, per-doc monotonicity, and the exact rational (BigInt vs BigDecimal reference)") {
    forAllSamples(profiles, n = 300) { case (counts, epoch) =>
      val keyed = counts.zipWithIndex.map { case (c, i) => (s"l$i", c) }
      val rs = Mixture.rates(keyed, epoch)
      assert(rs.map(_._1) == keyed.map(_._1))
      val mass = keyed.map { case (_, c) => Mixture.weight(c) }.sum
      rs.zip(keyed).foreach { case ((_, base, thresh), (_, c)) =>
        assert(base >= 0 && thresh >= 0 && thresh <= 999, s"ranges: $base/$thresh")
        // reference: r = q*epoch / (mass*c) in exact rationals via
        // BigDecimal at ample scale; base = floor(r), thresh = floor(frac*1000)
        val num = BigDecimal(Mixture.weight(c) * epoch)
        val den = BigDecimal(mass * c)
        val r = num / den
        val refBase = r.setScale(0, BigDecimal.RoundingMode.FLOOR).toLong
        val refThresh = ((r - refBase) * 1000)
          .setScale(0, BigDecimal.RoundingMode.FLOOR).toLong
        assert(base == refBase && thresh == refThresh,
          s"c=$c epoch=$epoch: got ($base,$thresh), ref ($refBase,$refThresh)")
      }
      // per-doc rate decreases with stratum size: for c_a < c_b the rate
      // (base + thresh/1000) of a must be >= that of b
      val byCount = rs.zip(keyed).map { case ((_, b, t), (_, c)) => (c, b * 1000 + t) }
      for (Seq((ca, ra), (cb, rb)) <- byCount.sortBy(_._1).sliding(2) if ca < cb)
        assert(ra >= rb, s"rate must not increase with count: c=$ca r=$ra vs c=$cb r=$rb")
    }
  }

  test("weight: exact floor of an exactly-scaled IEEE sqrt, huge counts included") {
    forAllSamples(Gen.choose(1L, 4000000000000000L), n = 300) { c =>
      assert(Mixture.weight(c) == BigInt(math.floor(math.sqrt(c.toDouble) * 1048576.0).toLong))
    }
    assert(Mixture.weight(1L) == BigInt(1048576))
    assert(Mixture.weight(4L) == BigInt(2097152))
  }

  test("degenerate shapes: single stratum takes the whole epoch; epoch 0 is all-zero") {
    assert(Mixture.rates(Seq(("only", 7L)), 21L) == Seq(("only", 3L, 0L)))
    assert(Mixture.rates(Seq(("a", 5L), ("b", 500L)), 0L)
      .forall { case (_, b, t) => b == 0L && t == 0L })
  }

  test("fracScale: sub-per-mille rates round to zero at 1000 but resolve at a finer scale") {
    // one tiny stratum against a huge one: its rate is ~1, the huge
    // stratum's is far below 1/1000 — invisible per-mille, visible at 1e9
    val counts = Seq(("rare", 1L), ("web", 1000000000L))
    val epoch = 1000L // r_web ≈ 1e-6: invisible per-mille, ~1000/1e9 fine
    val perMille = Mixture.rates(counts, epoch).map { case (k, b, t) => k -> (b, t) }.toMap
    val fine = Mixture.rates(counts, epoch, fracScale = 1000000000L)
      .map { case (k, b, t) => k -> (b, t) }.toMap
    assert(perMille("web") == ((0L, 0L)), "per-mille cannot see the web stratum's rate")
    assert(fine("web")._1 == 0L && fine("web")._2 > 0L,
      s"a finer scale must resolve the sub-per-mille rate, got ${fine("web")}")
    // the default is unchanged (q81's oracle contract)
    assert(Mixture.rates(counts, epoch) == Mixture.rates(counts, epoch, 1000L))
  }
}

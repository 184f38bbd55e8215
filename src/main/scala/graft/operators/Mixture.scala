package graft.operators

/** Temperature-scaled mixture rates — the data-mixing calculus behind
  * q81, extracted so pipelines can compute repeat plans directly and so
  * the arithmetic is property-testable off-cluster (the gate pins one
  * corpus; the spec pins the algebra on arbitrary count profiles).
  *
  * Public recipe (multilingual corpus sampling with α-temperature,
  * α = 1/2): stratum l with `c_l` documents gets mixture weight
  * w_l ∝ sqrt(c_l); a target of `epochDocs` total draws makes the
  * per-document expected repeat rate r_l = epochDocs·w_l / (Σw · c_l) =
  * epochDocs / (Σw · sqrt(c_l)) — monotonically DECREASING in c_l, which
  * is the point: rare strata are upsampled per-doc.
  *
  * Determinism and scale: sqrt is IEEE (identical in every engine);
  * `floor(sqrt(c)·2^20)` scales by a power of two, so the flooring is
  * exact; everything after is arbitrary-precision BigInt — no operand
  * can overflow at ANY corpus size (the in-plan Long form this replaced
  * wrapped its fraction cross-multiply at ~1e8 docs per stratum). The
  * rate ships as (base, thresh): a doc repeats `base` times, plus one
  * more when an independent per-doc draw in [0, 1000) falls under
  * `thresh` — realizing the fractional part without floats.
  */
object Mixture {

  /** Fixed-point temperature weight: floor(sqrt(c) · 2^20). */
  def weight(c: Long): BigInt = {
    require(c > 0, s"stratum count must be positive, got $c")
    BigInt(math.floor(math.sqrt(c.toDouble) * 1048576.0).toLong)
  }

  /** Per-stratum (base, thresh) repeat plan for `epochDocs` target
    * draws: base = floor(r_l), thresh = floor(frac(r_l)·fracScale) ∈
    * [0, fracScale). `fracScale` is the fractional-rate resolution
    * (VERDICT r10 nit): the default per-mille matches q81's oracle; a
    * production mixture over millions of strata — where real repeat
    * rates sit far below 1/1000 — raises it (the arithmetic is BigInt
    * throughout, so any scale is exact).
    */
  def rates(counts: Seq[(String, Long)], epochDocs: Long,
      fracScale: Long = 1000L): Seq[(String, Long, Long)] = {
    require(epochDocs >= 0, "epochDocs must be non-negative")
    require(fracScale >= 1, s"fracScale must be positive, got $fracScale")
    val weighted = counts.map { case (k, c) => (k, c, weight(c)) }
    val mass = weighted.map(_._3).sum
    weighted.map { case (k, c, q) =>
      val num = q * epochDocs
      val den = mass * c
      (k, (num / den).toLong, ((num % den) * fracScale / den).toLong)
    }
  }
}

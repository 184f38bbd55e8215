package graft.testkit

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal deterministic property harness over ScalaCheck generators —
  * the scalatest↔scalacheck bridge artifact is not available offline, so
  * suites sample a fixed-seed stream themselves (same coverage,
  * reproducible failures).
  */
trait PropSupport {
  def forAllSamples[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var produced = 0
    var attempts = 0
    while (produced < n && attempts < n * 5) {
      gen.apply(Gen.Parameters.default, seed) match {
        case Some(a) => f(a); produced += 1
        case None    => ()
      }
      seed = seed.next
      attempts += 1
    }
    require(produced > 0, "generator produced no samples")
  }
}

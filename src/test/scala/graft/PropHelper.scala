package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal deterministic property-runner (no scalatest↔scalacheck bridge
  * jar in the offline cache): sample a Gen with a fixed seed sequence and
  * run the assertion per sample.
  */
object PropHelper {
  def forAllSeeded[A](gen: Gen[A], n: Int = 100, seed: Long = 42L)(f: A => Unit): Unit = {
    var s = Seed(seed)
    var i = 0
    var produced = 0
    while (produced < n && i < n * 20) {
      gen.apply(Gen.Parameters.default.withSize(1 + i % 50), s) match {
        case Some(a) =>
          try f(a)
          catch {
            case e: Throwable =>
              throw new AssertionError(s"property failed for sample #$produced: $a", e)
          }
          produced += 1
        case None =>
      }
      s = s.next
      i += 1
    }
    require(produced > 0, "generator produced no samples")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Calibration

/** Closed-form pins for the weighted PAV solve (pure arithmetic — no
  * session needed). The minimax identity must reproduce the textbook
  * pooling behavior bin by bin.
  */
class CalibrationSpec extends AnyFunSuite {

  test("classic violation pools the first two bins: [1,0,1] -> [0.5,0.5,1]") {
    val iso = Calibration.pav(IndexedSeq(1L, 1L, 1L), IndexedSeq(1L, 0L, 1L))
    assert(iso === IndexedSeq(0.5, 0.5, 1.0))
  }

  test("already-isotonic rates pass through untouched") {
    val w = IndexedSeq(4L, 2L, 4L)
    val s = IndexedSeq(1L, 1L, 3L) // rates 0.25, 0.5, 0.75
    assert(Calibration.pav(w, s) === IndexedSeq(0.25, 0.5, 0.75))
  }

  test("weights steer the pooled mean toward the heavy bin") {
    // rates 1.0 (w=1) then 0.0 (w=9): pooled mean = 1/10, both bins
    val iso = Calibration.pav(IndexedSeq(1L, 9L), IndexedSeq(1L, 0L))
    assert(iso === IndexedSeq(0.1, 0.1))
  }

  test("a global violation pools everything to the grand mean") {
    val iso = Calibration.pav(IndexedSeq(2L, 2L, 2L), IndexedSeq(2L, 1L, 0L))
    assert(iso === IndexedSeq(0.5, 0.5, 0.5))
  }

  test("output is always non-decreasing on a noisy profile") {
    val w = IndexedSeq(5L, 3L, 7L, 2L, 6L, 4L)
    val s = IndexedSeq(1L, 2L, 2L, 2L, 3L, 4L)
    val iso = Calibration.pav(w, s)
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b })
    // total positives are conserved under pooling
    val mass = iso.zip(w).map { case (r, wi) => r * wi }.sum
    assert(math.abs(mass - s.sum.toDouble) < 1e-9)
  }
}

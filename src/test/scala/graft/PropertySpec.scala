package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based coverage (ScalaCheck) for the driver-side scalar
  * kernels the oracle mirrors depend on — the invariants that must
  * hold for EVERY input, not just the corpus the example specs see.
  */
class PropertySpec extends AnyFunSuite {

  /** Run a ScalaCheck property under scalatest (scalatestplus bridge
    * is not in the offline cache; raw ScalaCheck is).
    */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private def forAll[A](g: Gen[A])(f: A => Boolean): Unit =
    check(Prop.forAll(g)(f))

  private val reasonable: Gen[Double] =
    Gen.chooseNum(-1e9, 1e9).suchThat(d => !d.isNaN && !d.isInfinity)

  test("rL (HALF_UP away-from-zero) is odd-symmetric — the property math.round lacks") {
    forAll(reasonable) { x =>
      queries.StatsQueries.rL(-x) == -queries.StatsQueries.rL(x)
    }
    // the exact negative .5 tie that motivated the convention:
    assert(queries.StatsQueries.rL(-2.5) === -3L)
    assert(math.round(-2.5d) === -2L) // the trap
  }

  test("rL fixes integers and never strays more than half a unit") {
    forAll(Gen.chooseNum(-1000000L, 1000000L)) { n =>
      queries.StatsQueries.rL(n.toDouble) == n
    }
    forAll(reasonable) { x =>
      math.abs(queries.StatsQueries.rL(x) - x) <= 0.5 + 1e-9
    }
  }

  test("psiTerms: every micro term is non-negative and the total is bin-order-free") {
    val binGen = Gen.listOfN(6, Gen.zip(Gen.chooseNum(0L, 10000L), Gen.chooseNum(0L, 10000L)))
    forAll(binGen) { counts =>
      val bins = counts.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
      val (terms, total) = operators.Eval.psiTerms(bins)
      val (_, totalPerm) = operators.Eval.psiTerms(bins.reverse)
      // KL-style terms are >= 0; integer total is order-free
      terms.forall(_._4 >= 0L) && total == totalPerm
    }
  }

  test("normTwoSidedP stays in [0, 1] and decreases as |z| grows") {
    forAll(Gen.chooseNum(0.0, 40.0)) { z =>
      val p = operators.TsFeatures.normTwoSidedP(z)
      p >= 0.0 && p <= 1.0 &&
        operators.TsFeatures.normTwoSidedP(z + 0.5) <= p + 1e-12
    }
    assert(math.abs(operators.TsFeatures.normTwoSidedP(1.959964) - 0.05) < 1e-4)
  }

  test("chi2TailP (df 1,2) stays in [0, 1] and decreases in the statistic") {
    check(Prop.forAll(Gen.chooseNum(0.0, 200.0), Gen.oneOf(1L, 2L)) { (h, df) =>
      val p = operators.TsFeatures.chi2TailP(h, df)
      p >= 0.0 && p <= 1.0 &&
        operators.TsFeatures.chi2TailP(h + 1.0, df) <= p + 1e-12
    })
  }

  test("Poisson-bootstrap weight is a monotone step function of the hash, capped at 7, mean ~ 1") {
    def w(h: Long): Long =
      if (h < 24109) 0 else if (h < 48218) 1 else if (h < 60273) 2
      else if (h < 64291) 3 else if (h < 65296) 4 else if (h < 65497) 5
      else if (h < 65530) 6 else 7
    forAll(Gen.chooseNum(0L, 65534L)) { h =>
      w(h) <= w(h + 1) && w(h) >= 0 && w(h) <= 7
    }
    // expected weight under a uniform 16-bit hash is within 0.1% of 1
    val mean = (0L until 65536L).map(w).sum.toDouble / 65536
    assert(math.abs(mean - 1.0) < 1e-3)
  }

  test("RangeV2 generator value is deterministic and stays in [0, 1)") {
    forAll(Gen.chooseNum(0L, 10000000L)) { id =>
      val v = sources.RangeV2.valOf(id)
      v >= 0.0 && v < 1.0 && v == sources.RangeV2.valOf(id)
    }
  }
}

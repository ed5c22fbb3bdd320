package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the budget-system contracts the r8 driver record motivated
  * (VERDICT r8 "next round" #1): the 3 s metrology floor, the
  * sample-behind-the-budget map the drift fallback reads, and the
  * drift median itself. */
class BudgetsSpec extends AnyFunSuite {

  test("every budget respects the metrology floor") {
    val below = Budgets.perQuery.filter(_._2 < Budgets.Floor)
    assert(below.isEmpty, s"budgets below the ${Budgets.Floor}s floor: $below")
  }

  test("sampleSec covers exactly the unfloored entries at budget/2.5") {
    Budgets.sampleSec.foreach { case (q, s) =>
      val b = Budgets.perQuery(q)
      assert(b > Budgets.Floor, s"$q is floored but has a sample")
      assert(math.abs(s - b / 2.5) < 1e-12)
    }
    // Floored entries carry no drift signal: their budget no longer
    // encodes the measured sample.
    assert(Budgets.perQuery.keySet.diff(Budgets.sampleSec.keySet) ==
      Budgets.perQuery.filter(_._2 <= Budgets.Floor).keySet)
  }

  test("drift median: empty -> 1.0, odd -> middle, even -> upper middle") {
    assert(Bench.driftMedian(Nil) == 1.0)
    assert(Bench.driftMedian(Seq(1.3)) == 1.3)
    assert(Bench.driftMedian(Seq(2.0, 1.0, 1.2)) == 1.2)
    // even n: deterministic upper median, order-insensitive
    assert(Bench.driftMedian(Seq(1.4, 1.0, 1.2, 1.1)) == 1.2)
  }
}

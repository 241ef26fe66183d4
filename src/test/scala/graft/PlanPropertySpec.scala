package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Compact
import graft.model.FileMeta
import graft.ops.EventOps

/** Property-style tests (SURVEY.md §5.2(3)) over seeded random inputs:
  * filegroup-planning invariants and identifier round-trips. */
class PlanPropertySpec extends AnyFunSuite {

  private val rnd = new Random(42)

  private def randomFiles(n: Int): List[FileMeta] =
    List.tabulate(n)(i => FileMeta("t", f"p$i%04d", 1 + rnd.nextInt(50).toLong, ""))

  test("planGroups: groups ≤ cap unless singleton; order preserved") {
    for (_ <- 1 to 200) {
      val files = randomFiles(1 + rnd.nextInt(80))
      val cap = 10L + rnd.nextInt(90)
      val groups = Compact.planGroups(files, cap)
      groups.foreach { g =>
        assert(g.nonEmpty)
        if (g.size > 1) assert(g.map(_.sizeBytes).sum <= cap)
      }
      assert(groups.flatten === files)
    }
  }

  test("planGroups is maximal-greedy: next group's head would overflow previous") {
    for (_ <- 1 to 200) {
      val files = randomFiles(1 + rnd.nextInt(80))
      val cap = 10L + rnd.nextInt(90)
      val groups = Compact.planGroups(files, cap)
      groups.sliding(2).foreach {
        case Seq(prev, next) =>
          assert(prev.map(_.sizeBytes).sum + next.head.sizeBytes > cap)
        case _ =>
      }
    }
  }

  test("parseIdent drops exactly the first dotted level") {
    for (_ <- 1 to 200) {
      def seg = Random.alphanumeric.take(1 + rnd.nextInt(8)).mkString
      val (a, b, c) = (seg, seg, seg)
      assert(EventOps.parseIdent(s"$a.$b.$c") === s"$b.$c")
    }
  }
}

package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Freshness gate for the generated OPERATORS.md (round-9 verdict item
  * 7): regenerate the index from the live registry + PlanAudit maps and
  * diff it against the checked-in file. A new entry, a re-pinned budget,
  * or a moved implementation fails HERE with the regeneration command,
  * never as silent doc drift. (No SparkSession needed — the generator is
  * pure source/registry introspection.)
  */
class OperatorsDocSpec extends AnyFunSuite with Matchers {

  test("OPERATORS.md is fresh (regenerate-and-diff)") {
    val checkedIn = Files.readString(Paths.get("OPERATORS.md"))
    val rendered = OperatorsDoc.render()
    withClue("OPERATORS.md is stale — regenerate with " +
      "`sbt 'runMain graft.OperatorsDoc'` and commit the result:\n") {
      checkedIn shouldBe rendered
    }
  }

  test("index covers the whole registry with resolvable anchors") {
    val doc = OperatorsDoc.render()
    SparkEntry.queries.keys.foreach { n =>
      doc should include (s"| `$n` |")
    }
    // every anchor points at an existing file
    val anchor = """\| `([^`]+\.scala)(:\d+)?` \|""".r
    anchor.findAllMatchIn(doc).map(_.group(1)).toSet.foreach { (f: String) =>
      withClue(s"anchor file $f") {
        Files.exists(Paths.get(f)) shouldBe true
      }
    }
  }
}

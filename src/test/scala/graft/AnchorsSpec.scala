package graft

import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r11 #5: the gate-key anchoring check (tools/anchors.py) as
  * a suite — registering a CORRECTNESS key in `SparkEntry.queries`
  * without a backticked anchor in a SURVEY.md §2 gate CELL now fails
  * `sbt test`, not just the manually-run round ritual. The cell
  * parser mirrors tools/anchors.py exactly: only table rows whose
  * first cell is a component id ([A-H]digits) count, only the LAST
  * cell of the row is the gate cell, pipes escaped as \| do not
  * split, and prose mentions outside backticks never anchor.
  */
class AnchorsSpec extends AnyFunSuite {
  import AnchorsSpec._

  private def surveyText: String = {
    val local = new java.io.File("SURVEY.md")
    val f = if (local.exists()) local
      else new java.io.File("/root/repo/SURVEY.md")
    val src = scala.io.Source.fromFile(f, "UTF-8")
    try src.mkString finally src.close()
  }

  test("every SparkEntry.queries key is anchored in a §2 gate cell, " +
      "and no gate cell anchors a key that is not registered") {
    val keys = SparkEntry.queries.keySet
    val anchored = anchoredKeys(surveyText)
    val unanchored = (keys -- anchored).toSeq.sorted
    val dangling = (anchored -- keys).toSeq.sorted
    assert(unanchored.isEmpty,
      s"gate keys with no §2 gate-cell anchor: ${unanchored.mkString(", ")}")
    assert(dangling.isEmpty,
      s"§2 gate-cell keys not registered in SparkEntry.queries: " +
        dangling.mkString(", "))
  }

  test("a deliberately broken fixture is caught: missing anchor, " +
      "prose-only mention, non-gate-cell mention, dangling key") {
    val fixture =
      """## §1 Something else
        || Z9 | not in §2 | `q_ignored_section` |
        |## §2 Operator inventory
        |Some prose mentioning `q_prose_only` outside any table.
        || # | component | impl | gates |
        ||---|---|---|---|
        || A1 | good row | yes | `q_good` |
        || B2 | mention in WRONG cell `q_wrong_cell` | yes | plain |
        || C3 | unbackticked gate mention | yes | q_unbackticked |
        || D4 | two keys | yes | `q_two_a`; `q_two_b` |
        || E5 | escaped pipe P(v\|u) in design | yes | `q_escaped` |
        |not-a-row `q_not_row`
        |## §3 After
        || F6 | outside §2 | yes | `q_after_s2` |
        |""".stripMargin
    val anchored = anchoredKeys(fixture)
    assert(anchored ==
      Set("q_good", "q_two_a", "q_two_b", "q_escaped"))
    // a registered key missing from the fixture is reported unanchored
    val keys = Set("q_good", "q_two_a", "q_two_b", "q_escaped",
      "q_missing")
    assert((keys -- anchored) == Set("q_missing"))
    // a fixture key not registered is reported dangling
    val fewer = keys - "q_escaped" - "q_missing"
    assert((anchored -- fewer) == Set("q_escaped"))
  }
}

object AnchorsSpec {
  /** Anchored `q_*` keys: backticked tokens in the LAST cell of §2
    * component rows — the tools/anchors.py semantics, kept in sync
    * by the fixture test above. */
  def anchoredKeys(survey: String): Set[String] = {
    val keyRe = "`(q_[a-z0-9_]+)`".r
    val idRe = "[A-H]\\d+"
    var inS2 = false
    val out = scala.collection.mutable.Set.empty[String]
    survey.linesIterator.foreach { raw =>
      val line = raw
      if (line.startsWith("## ")) inS2 = line.startsWith("## §2")
      if (inS2 && line.startsWith("|")) {
        val trimmed = line.trim.stripPrefix("|").stripSuffix("|")
        // split on UNESCAPED pipes only (design cells legitimately
        // contain \|, e.g. P(v\|u))
        val cells = trimmed.split("(?<!\\\\)\\|", -1).map(_.trim)
        if (cells.length >= 2 && cells.head.matches(idRe)) {
          val gate = cells.reverse.dropWhile(_.isEmpty).headOption
            .getOrElse("")
          keyRe.findAllMatchIn(gate).foreach(m => out += m.group(1))
        }
      }
    }
    out.toSet
  }
}

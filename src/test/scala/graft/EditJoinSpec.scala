package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EditJoin

class EditJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def naive(df: DataFrame, tau: Int): Set[(String, Long, Long, Long)] = {
    val a = df.toDF("key_a", "block", "str_a")
    val b = df.toDF("key_b", "block", "str_b")
    a.join(b, Seq("block"))
      .filter($"key_a" < $"key_b")
      .withColumn("dist", levenshtein($"str_a", $"str_b", tau).cast("long"))
      .filter($"dist" >= 0)
      .select($"block", $"key_a", $"key_b", $"dist")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
  }

  private def pass(df: DataFrame, tau: Int): Set[(String, Long, Long, Long)] =
    EditJoin.selfJoin(df.toDF("key", "block", "str"), "key", "str", "block", tau)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

  test("crafted pairs: 0/1/2 edits, head/middle/tail, shifts") {
    val rows = Seq(
      (1L, "g", "goldenrod lavender spring"),
      (2L, "g", "goldenrod lavender spring"),   // dist 0
      (3L, "g", "goldenrod lavander spring"),   // 1 substitution, middle
      (4L, "g", "xgoldenrod lavender spring"),  // 1 insertion at head (shifts all)
      (5L, "g", "goldenrod lavender sprin"),    // 1 deletion at tail
      (6L, "g", "aoldenrod lavender sprinh"),   // 2 subs, both ends
      (7L, "g", "completely different text!"),  // far away
      (8L, "h", "goldenrod lavender spring"))   // other block: never paired
      .toDF("key", "block", "str")
    val got = pass(rows, 2)
    val want = naive(rows.toDF("key", "block", "str")
      .select($"key", $"block", $"str"), 2)
    assert(got == want)
    // sanity on specific members
    assert(got.contains(("g", 1L, 2L, 0L)))
    assert(got.contains(("g", 1L, 3L, 1L)))
    assert(got.contains(("g", 1L, 4L, 1L)))
    assert(got.contains(("g", 1L, 5L, 1L)))
    assert(got.contains(("g", 1L, 6L, 2L)))
    assert(!got.exists(t => t._2 == 7L || t._3 == 7L))
    assert(!got.exists(t => t._2 == 8L || t._3 == 8L))
  }

  test("short strings (pigeonhole-void) still pair correctly") {
    val rows = Seq(
      (1L, "b", "ab"),      // shorter than τ+1 = 3
      (2L, "b", "ax"),      // dist 1 from "ab"
      (3L, "b", "abcd"),    // dist 2 from "ab"
      (4L, "b", "a"),
      (5L, "b", "zzzzzzzz"))
      .toDF("key", "block", "str")
    val got = pass(rows, 2)
    assert(got == naive(rows, 2))
    assert(got.contains(("b", 1L, 2L, 1L)))
    assert(got.contains(("b", 1L, 3L, 2L)))
    assert(got.contains(("b", 1L, 4L, 1L)))
  }

  test("randomized equivalence with the naive blocked join") {
    val rnd = new scala.util.Random(42)
    val vocab = Seq("rose", "mint", "sand", "teal", "plum", "jade")
    def word() = vocab(rnd.nextInt(vocab.length))
    def mutate(s: String): String = {
      if (s.isEmpty) return s
      val i = rnd.nextInt(s.length)
      rnd.nextInt(3) match {
        case 0 => s.updated(i, ('a' + rnd.nextInt(26)).toChar)       // sub
        case 1 => s.substring(0, i) + s.substring(math.min(i + 1, s.length)) // del
        case _ => s.substring(0, i) + ('a' + rnd.nextInt(26)).toChar + s.substring(i) // ins
      }
    }
    val basePool = (1 to 40).map(_ => s"${word()} ${word()} ${word()}")
    val rows = (1 to 300).map { k =>
      var s = basePool(rnd.nextInt(basePool.length))
      (0 until rnd.nextInt(4)).foreach(_ => s = mutate(s))
      (k.toLong, s"blk${k % 3}", s)
    }.toDF("key", "block", "str")
    rows.cache()
    assert(pass(rows, 2) == naive(rows, 2))
    assert(pass(rows, 1) == naive(rows, 1))
    rows.unpersist()
  }

  test("equivalence on the real part table (sf0.001 brand blocking)") {
    val p = graft.table(spark, "/root/testdata/sf0.001", "part")
      .select($"p_partkey", $"p_brand", $"p_name")
    val naiveRes = naive(p.toDF("key", "block", "str"), 2)
    val passRes = pass(p.toDF("key", "block", "str"), 2)
    assert(passRes == naiveRes)
    assert(naiveRes.nonEmpty) // the comparison must not be vacuous
  }
}

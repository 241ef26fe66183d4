package graft

import org.scalatest.funsuite.AnyFunSuite

/** The r19 memo container ([[SessionMemo]]) — the r18-ADVICE fix: the
  * old WeakHashMap keyed by SparkSession could never collect (cached
  * DataFrames strongly reference their key session), so eviction is now
  * explicit. Pins the eviction levers: per-session keying via the
  * conf-minted UUID, session isolation, the per-session entry bound,
  * and the session-index bound. */
class SessionMemoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("per-session maps are isolated and stable across calls") {
    val memo = new SessionMemo[String](maxPerSession = 4)
    val m1 = memo.map(spark)
    m1.put("k", "v")
    assert(memo.map(spark) eq m1, "same session must reuse its map")
    val other = spark.newSession()
    val m2 = memo.map(other)
    assert(!(m2 eq m1), "a newSession must get its own map")
    assert(m2.get("k") == null)
    assert(memo.sessionCount >= 2)
  }

  test("per-session entry bound clears past maxPerSession") {
    val memo = new SessionMemo[String](maxPerSession = 3)
    val m = memo.map(spark)
    (1 to 4).foreach(i => m.put(s"k$i", "v"))
    // next touch is over the bound: the map resets rather than growing
    assert(memo.map(spark).size === 0)
  }

  test("the session index itself resets past MaxSessions") {
    val memo = new SessionMemo[String](maxPerSession = 8)
    memo.map(spark).put("seed", "v")
    (1 to SessionMemo.MaxSessions + 1).foreach { _ =>
      memo.map(spark.newSession()).put("x", "y")
    }
    assert(memo.sessionCount <= SessionMemo.MaxSessions + 1,
      s"session index must stay bounded, got ${memo.sessionCount}")
  }
}

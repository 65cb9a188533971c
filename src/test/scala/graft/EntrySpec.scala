package graft

/** The driver's first contract check: SparkEntry.entry must return a
  * non-empty flagship result on the smallest fixture. */
class EntrySpec extends SparkSpec {
  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}

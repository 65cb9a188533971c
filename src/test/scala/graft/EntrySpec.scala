package graft

/** The driver's first contract check: SparkEntry.entry must return a
  * non-empty flagship result on the smallest fixture. */
class EntrySpec extends SparkSpec {
  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle and every oracle has a query") {
    // a typo'd key silently downgrades the driver's hash gate to a
    // rows-only check (or errors on a dangling oracle) — pin the
    // full-oracle contract so map edits can't drift
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without a query: ${o -- q}")
    assert((q -- o).isEmpty, s"queries missing an oracle: ${q -- o}")
  }
}

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

  test("no compared output carries a DecimalType column (SURVEY §4 money convention)") {
    // The round-13 q36 driver miss: a per-row double→DECIMAL(18,2) cast
    // hashed differently under the driver's DuckDB rendering while every
    // rounded-DOUBLE / integer money column passed. §4's convention is
    // that money/size arithmetic runs in DECIMAL but EXITS as rounded
    // DOUBLE or exact integers — so a decimal column in a compared
    // output schema is a representation-fragility bug, not a style
    // choice. Walk every query's output schema (nested types included);
    // whitelist = columns that are decimal END-TO-END from parquet
    // (none today).
    import org.apache.spark.sql.types._
    def decimals(dt: DataType, path: String): Seq[String] = dt match {
      case _: DecimalType     => Seq(path)
      case s: StructType      => s.fields.flatMap(f => decimals(f.dataType, s"$path.${f.name}")).toSeq
      case a: ArrayType       => decimals(a.elementType, s"$path[]")
      case m: MapType         => decimals(m.keyType, s"$path.key") ++ decimals(m.valueType, s"$path.value")
      case _                  => Nil
    }
    val whitelist = Set.empty[String]
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      decimals(fn(spark, sf).schema, name).filterNot(whitelist)
    }
    assert(offenders.isEmpty,
      s"decimal columns in compared outputs (re-emit per §4 as rounded DOUBLE or integer units): ${offenders.mkString(", ")}")
  }
}

package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-stable column helpers.
  *
  * Everything here has an exact DuckDB equivalent (documented inline)
  * so queries built from these helpers hash-match the driver's oracle:
  *   - money/size math in DECIMAL(18,2) — exact in both engines;
  *   - integer hashing via the first 8 hex chars of md5 — md5 is
  *     byte-identical everywhere, unlike murmur/xxhash variants;
  *   - text normalization via lower + regexp, identical RE semantics.
  */
package object functions {

  /** Exact money arithmetic. DuckDB: CAST(x AS DECIMAL(18,2)). */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Final numeric output: exact decimal → double (identical bits in
    * both engines). DuckDB: CAST(x AS DOUBLE). */
  def asDouble(c: Column): Column = c.cast("double")

  /** Unsigned 32-bit integer hash of a string, stable across engines.
    * DuckDB: CAST(concat('0x', substr(md5(x), 1, 8)) AS BIGINT).
    * Spark side uses the native [[Hash32]] kernel (first 4 digest
    * bytes big-endian — identical value, no hex round-trip). */
  def hash32(c: Column): Column = Hash32(c)

  /** Lowercase, strip non [a-z0-9 ], collapse runs of spaces, trim.
    * DuckDB: trim(regexp_replace(regexp_replace(lower(x),
    *   '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')). */
  def normText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", ""), " +", " "))
}

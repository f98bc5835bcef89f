package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing.
  *
  * All pseudo-randomness in the engine (minhash permutations, simhash bit
  * contributions, LSH band ids) derives from `md5(string)` truncated to 60
  * bits. Both Spark (`conv(substr(md5(s),1,15),16,10)`) and DuckDB
  * (`cast(concat('0x',substr(md5(s),1,15)) as bigint)`) compute the exact
  * same value, which is what makes the dedup/similarity operators
  * hash-for-hash verifiable against a SQL oracle — and keeps results stable
  * across cluster re-runs (no JVM `hashCode`, no seed drift).
  *
  * 15 hex digits = 60 bits, always positive in a signed 64-bit long.
  */
object Hashing {
  /** 60-bit positive hash of a string column. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Salted variant: independent hash family member `i` (minhash perms,
    * simhash per-token, band ids). */
  def md5Long(c: Column, salt: Int): Column =
    md5Long(concat(lit(salt.toString), lit(":"), c))

  /** Deterministic hash bucket of an id column: `md5('<salt>:'||id) % n`.
    * The ONE bucket derivation the packing operators share — a plain
    * `id % n` is constant within any stratum whose membership was
    * itself assigned by an id modulus (the fixture does exactly that). */
  def bucketCol(id: Column, salt: String, n: Int): Column =
    md5Long(concat(lit(s"$salt:"), id)) % n

  /** DuckDB mirror of [[bucketCol]]. */
  def sqlBucket(expr: String, salt: String, n: Int): String =
    s"${sqlMd5Long(s"concat('$salt:', $expr)")} % $n"

  /** SQL fragment mirroring [[md5Long]] for the DuckDB oracle. */
  def sqlMd5Long(expr: String): String =
    s"CAST(concat('0x', substr(md5($expr), 1, 15)) AS BIGINT)"

  def sqlMd5Long(expr: String, salt: Int): String =
    sqlMd5Long(s"concat('$salt:', $expr)")

  /** JVM-side mirror of [[md5Long]] — the same 60-bit value computed on
    * the driver (weight-table materialization, spec fixtures): first 15
    * hex digits of the lowercase md5, parsed base-16. */
  def md5LongLocal(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Long.parseLong(
      d.take(8).map(b => f"$b%02x").mkString.substring(0, 15), 16)
  }
}

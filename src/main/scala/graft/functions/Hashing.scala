package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine exact hashing: every hash here has a DuckDB twin that
  * produces the SAME value, so probabilistic operators built on them
  * (MinHash, SimHash, rolling fingerprints) are oracle-checkable
  * bit-for-bit. Shared by the dedup and text surfaces.
  */
object Hashing {
  /** Mersenne prime 2^31 - 1: modulus for permutation/rolling families;
    * products of two residues fit signed-64 exactly in both engines.
    */
  val P = 2147483647L

  /** 60-bit hash: first 15 hex chars of md5, parsed base 16 (fits a
    * signed long). Spark side.
    */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB twin of [[h60]]. */
  def h60Sql(e: String): String =
    s"CAST(concat('0x', substr(md5($e),1,15)) AS BIGINT)"
}

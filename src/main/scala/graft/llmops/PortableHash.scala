package graft.llmops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A 52-bit hash computable bit-for-bit in both Spark and ANSI-ish SQL
  * engines (DuckDB): the first 13 hex chars of md5, parsed as an integer.
  *
  * 52 bits keep the value exact in a signed 64-bit integer AND in a double
  * (< 2^53), so every downstream arithmetic step — modular permutations for
  * MinHash, per-bit majority votes for SimHash — produces identical values
  * on both engines. That is what upgrades the approximate-dedup operators
  * from rows-only checks to full DuckDB hash-match oracles.
  *
  * Collision rate at 52 bits (~4.5e15 values) is negligible for shingle /
  * token vocabularies (birthday bound ~10^7 distinct values per doc set),
  * and any collision affects both engines identically anyway.
  */
object PortableHash {

  /** Modulus for MinHash permutations: 2^31 − 1 (Mersenne prime). Inputs are
    * reduced mod P first so a·x + b stays < 2^62 — no 64-bit overflow on
    * either engine.
    */
  val P: Long = 2147483647L

  /** Fixed permutation coefficients (a_i, b_i), a_i ∈ [1, P−1]. Hardcoded —
    * the deterministic equivalent of a seeded RNG, mirrored verbatim into
    * the SQL oracle.
    */
  val MinHashA: Array[Long] = Array(
    1103515245L, 1299709L, 15485863L, 32452843L, 49979687L, 67867967L,
    86028121L, 104395301L, 122949823L, 141650939L, 160481183L, 179424673L,
    198491317L, 217645177L, 236887691L, 256203161L)
  val MinHashB: Array[Long] = Array(
    12345L, 54321L, 13579L, 24680L, 11111L, 22222L, 33333L, 44444L,
    55555L, 66666L, 77777L, 88888L, 99999L, 123123L, 321321L, 456456L)

  /** Spark side: conv(hex, 16, 10) is codegen'd; result ∈ [0, 2^52). */
  def hash52(c: Column): Column =
    conv(substring(md5(c), 1, 13), 16, 10).cast("long")

  /** The same 52-bit hash computed driver-side (for generating constant
    * tables like LSH hyperplanes that the SQL oracle re-derives via md5).
    */
  def hash52Jvm(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 13), 16)
  }

  /** Pseudo-random uniform in [−0.5, 0.5) from a key, EXACTLY representable
    * in float32 (24-bit numerator over 2^24) so a Spark float literal and a
    * SQL double compute the identical value.
    */
  def unitUniformJvm(key: String): Float =
    ((hash52Jvm(key) % 16777216L).toDouble / 16777216.0 - 0.5).toFloat

  /** The same uniform as a DuckDB fragment (DOUBLE — equal to the float32
    * value by construction).
    */
  def duckUnitUniform(expr: String): String =
    s"((${duckHash52(expr)} % 16777216) / 16777216.0 - 0.5)"

  /** The identical computation as a DuckDB SQL fragment. */
  def duckHash52(expr: String): String =
    s"('0x' || substr(md5($expr), 1, 13))::BIGINT"

  /** MinHash signature value i for a pre-hashed set element. */
  def minhashPerm(h: Column, i: Int): Column =
    (lit(MinHashA(i)) * (h % P) + lit(MinHashB(i))) % P

  /** Same permutation as a DuckDB fragment over a BIGINT column expr. */
  def duckMinhashPerm(expr: String, i: Int): String =
    s"(${MinHashA(i)} * ($expr % $P) + ${MinHashB(i)}) % $P"
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Content-hash bucketing shared by the deterministic-sampling /
  * sharding / feature-hashing family. One definition — the DuckDB oracles
  * replay this arithmetic bit-for-bit
  * (`CAST(('0x' || substr(md5(x), 1, 4)) AS INT)`), so every operator
  * must bucket identically; a drifted copy would silently break oracle
  * parity.
  */
object HashBuckets {

  /** First 16 md5 bits as an integer in [0, 65536). */
  def md5Bits16(c: Column): Column =
    conv(substring(md5(c), 1, 4), 16, 10).cast("int")

  /** Deterministic bucket in [0, n). */
  def md5Bucket(c: Column, n: Int): Column = {
    require(n >= 1 && n <= 65536, s"bucket count out of range: $n")
    md5Bits16(c) % n
  }

  /** Deterministic uniform draw in [0, 1) — the keep-rate predicate form. */
  def md5Uniform(c: Column): Column =
    md5Bits16(c).cast("double") / 65536.0
}

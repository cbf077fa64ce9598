package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join strategies for the two shuffle pathologies that appear only at
  * scale: key skew and repeated co-partitioned joins.
  *
  * (AQE's skew-join split handles many skew cases at runtime; explicit
  * salting is for the cases AQE can't fix — a single hot key exceeding
  * one task's memory, or a deterministic plan requirement.)
  */
object ScaleJoins {

  /** Salted inner equi-join for a skewed LEFT side.
    *
    * The classic fix: split each hot key's rows across `salts`
    * partitions by hashing a per-row column, and replicate the (small
    * per key) RIGHT side once per salt bucket, so no single reducer
    * receives the whole hot key. Deterministic (salt = hash of a
    * caller-named unique column, not rand()) — same result set and
    * hashes on every run.
    *
    * Cost model: right side is duplicated `salts` times THROUGH THE
    * SHUFFLE (not in storage) — pick salts ~ (hot key rows / target
    * partition rows), and keep the right side per-key small (dims,
    * aggregated lookups).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      leftUniqueCol: String, salts: Int): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(col(leftUniqueCol)), lit(salts)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-sided salting for skewed x skewed self-proximity joins is a
    * cross-replication (salts^2) — not provided on purpose: block by a
    * content key instead (see the LSH/IVF operators). */
}

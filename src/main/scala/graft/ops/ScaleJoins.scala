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

  /** Sketch-driven salting: salt ONLY the hot keys.
    *
    * [[saltedJoin]] replicates the whole right side `salts` times —
    * correct, but at 100 TB the replication tax is paid for every
    * cold key too. The production pattern detects the hot keys first
    * and splits only them:
    *
    *   1. a [[graft.functions.MisraGries]] sketch pass over the left
    *      join key finds every key holding > 1/denom of the rows
    *      (<= k counters per partition shuffle — the key multiset
    *      itself is never shuffled; the result is a tiny driver-side
    *      candidate list, like AQE's runtime statistics);
    *   2. left rows with a hot key get a deterministic salt in
    *      [0, salts); cold rows salt 0;
    *   3. right rows with a hot key are replicated `salts` times;
    *      cold rows once — the replication factor applies only to
    *      the handful of hot keys.
    *
    * Same result set as the plain equi-join (oracle-checked as
    * `q_adaptive_salted_join`); no reducer receives a whole hot key.
    */
  /** The sketch-detected hot keys of `df(key)`: keys that MAY hold
    * more than 1/denom of the rows. Misra–Gries counts underestimate
    * by at most total/(k+1), so `count + total/(k+1) > total/denom`
    * keeps every true hot key and discards every key at or below
    * `total/denom - total/(k+1)` — without this threshold, any key
    * surviving the sketch (ALL keys when distinct keys <= k) would be
    * treated as hot and salting would degenerate to the blanket form. */
  def hotKeys(df: DataFrame, key: String, denom: Int, k: Int): Set[String] = {
    val out = df
      .select(graft.functions.MisraGries.sketch(col(key).cast("string"), k).as("s"))
      .select(col("s.counts"), col("s.total")).head()
    val (counts, total) = (out.getMap[String, Long](0), out.getLong(1))
    val slack = total.toDouble / (k + 1)
    counts.filter { case (_, c) => c + slack > total.toDouble / denom }
      .keys.toSet
  }

  def adaptiveSaltedJoin(left: DataFrame, right: DataFrame, key: String,
      leftUniqueCol: String, salts: Int, denom: Int = 64): DataFrame = {
    val hot = hotKeys(left, key, denom, math.max(denom, 64)).toSeq.sorted
    val isHot = col(key).cast("string").isin(hot: _*)
    val salted = left.withColumn("__salt",
      when(isHot, pmod(xxhash64(col(leftUniqueCol)), lit(salts)).cast("int"))
        .otherwise(lit(0)))
    val replicated = right.withColumn("__salt",
      explode(when(isHot, sequence(lit(0), lit(salts - 1)))
        .otherwise(sequence(lit(0), lit(0)))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-sided salting for skewed x skewed self-proximity joins is a
    * cross-replication (salts^2) — not provided on purpose: block by a
    * content key instead (see the LSH/IVF operators). */

  /** Bloom-reduced equi-join: semi-join reduction for the
    * big-fact ⋈ selective-dim shape where the dim side is too big (or
    * too late-filtered) for the cost model to broadcast, so the plan
    * shuffles BOTH sides — including every fact row whose key the dim
    * side doesn't even contain.
    *
    * The classic fix (Bloom-join, Mackert & Lohman '86; what AQE's
    * InjectRuntimeFilter plants opportunistically under shuffle
    * joins): sketch the dim keys into a bloom filter (one aggregate →
    * one bounded blob on the driver, like a broadcast var), and kill
    * definitely-absent fact rows with a narrow codegen'd filter
    * BEFORE the fact side's exchange. No false negatives, and the
    * join itself re-verifies every survivor, so the result is
    * IDENTICAL to the plain join for any sketch size — the sizing
    * knobs trade only shuffle bytes (false-positive rate) against
    * blob size. Making it an explicit operator (vs hoping the runtime
    * filter fires) pins the plan: the reduction applies at EVERY
    * scale factor, not just when AQE's heuristics notice.
    *
    * Scale posture: at 100 TB the fact exchange is the dominant cost
    * of this join shape; with fpp ~1% the shuffled fact bytes drop to
    * ~(selectivity + 0.01) of the table for one extra fact-scan
    * predicate and one dim-side aggregate. The blob (`nBits/8` bytes)
    * rides the plan as a literal — size it for the dim's TRUE key
    * count (1<<23 bits ≈ 1 MB handles ~1M keys at ~2% fpp).
    */
  def bloomReducedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, nItems: Long = 1L << 20,
      nBits: Long = 1L << 23): DataFrame = {
    // both sides must hash the SAME representation: xxhash64 over an
    // int and over the equal bigint differ, so a type-mismatched pair
    // would produce bloom FALSE NEGATIVES — matching fact rows
    // silently dropped. Join-compatible integral pairs widen to long
    // (lossless, so a fact value equal to any dim value hashes
    // identically); anything else must already share a type — failing
    // loudly beats a join that quietly loses rows.
    import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}
    def integral(t: DataType) = t match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val (ft, dt) =
      (fact.schema(factKey).dataType, dim.schema(dimKey).dataType)
    val hashType =
      if (ft == dt) ft
      else {
        require(integral(ft) && integral(dt),
          s"bloomReducedJoin: key types must match or both be integral " +
            s"(got $factKey: $ft vs $dimKey: $dt)")
        LongType
      }
    val blob = dim
      .agg(graft.functions.BloomSketch
        .bloomAgg(xxhash64(col(dimKey).cast(hashType)), nItems, nBits)
        .as("bf"))
      .head().getAs[Array[Byte]](0)
    // an empty dim aggregates to a null sketch; the join result is
    // empty either way — keep the pre-filter total so the plan shape
    // (filter below the exchange) is invariant
    val pre =
      if (blob == null) fact.filter(lit(false))
      else fact.filter(graft.functions.BloomSketch
        .mightContain(lit(blob), xxhash64(col(factKey).cast(hashType))))
    pre.join(dim, col(factKey) === col(dimKey))
  }
}

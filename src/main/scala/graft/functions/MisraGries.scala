package graft.functions

import scala.collection.immutable.HashMap

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitters sketch as a typed `Aggregator` — the
  * candidate-generation half of two-pass exact heavy hitters
  * ([[graft.ext.TextFunctions.heavyHitters]]).
  *
  * Why a sketch at 100 TB: the naive `groupBy(token).count()` shuffles
  * the ENTIRE token multiset; this aggregator keeps at most `k`
  * counters per partition and ships only those to the merge, so the
  * shuffle is O(k x partitions) regardless of corpus size.
  *
  * Guarantee (Misra–Gries + mergeable-summaries merge rule): every
  * counter underestimates its token's true frequency by at most
  * n/(k+1), so any token with true frequency > n/(k+1) SURVIVES in the
  * final counter set. The candidate set is partitioning-dependent, but
  * a superset of the true heavy hitters — an exact verification pass
  * over just the candidates restores determinism.
  */
class MisraGries(k: Int)
    extends Aggregator[String, MisraGries.Buf, MisraGries.Out] {
  import MisraGries.{Buf, Out}

  override def zero: Buf = Buf(HashMap.empty, 0L)

  override def reduce(b: Buf, token: String): Buf = {
    val c = b.counters
    val next =
      if (c.contains(token)) c.updated(token, c(token) + 1L)
      else if (c.size < k) c.updated(token, 1L)
      // decrement-all (amortized O(1): each decrement round is paid
      // for by the k increments that preceded it)
      else c.flatMap { case (t, n) => if (n > 1L) Some(t -> (n - 1L)) else None }
    Buf(next, b.total + 1L)
  }

  /** Mergeable-summaries rule (Agarwal et al., TODS '13): sum
    * counters, then subtract the (k+1)-th largest count from all and
    * drop the non-positive — total error stays <= n/(k+1). */
  override def merge(x: Buf, y: Buf): Buf = {
    val summed = y.counters.foldLeft(x.counters) { case (acc, (t, n)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + n)
    }
    val trimmed =
      if (summed.size <= k) summed
      else {
        val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
        summed.flatMap { case (t, n) =>
          if (n > cut) Some(t -> (n - cut)) else None
        }
      }
    Buf(trimmed, x.total + y.total)
  }

  override def finish(b: Buf): Out =
    Out(b.counters.keys.toSeq.sorted, b.counters, b.total)

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Out] = Encoders.product[Out]
}

object MisraGries {
  case class Buf(counters: Map[String, Long], total: Long)

  /** `candidates` ⊇ every token with frequency > total/(k+1);
    * `counts` are the surviving counters, each UNDERestimating its
    * token's true frequency by at most total/(k+1) — so
    * `count + total/(k+1)` is a safe upper bound for thresholding. */
  case class Out(candidates: Seq[String], counts: Map[String, Long], total: Long)

  /** Column entry point over a string column. */
  def sketch(tokens: Column, k: Int): Column =
    udaf(new MisraGries(k), Encoders.STRING)(tokens)
}

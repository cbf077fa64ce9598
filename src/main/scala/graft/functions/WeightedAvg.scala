package graft.functions

import java.math.{BigDecimal => JBigDecimal, MathContext}

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Weighted average as a typed `Aggregator[IN, BUF, OUT]` (the custom-
  * UDAF surface, SURVEY.md §2.1). Accumulates in exact decimal so the
  * result is independent of partitioning/merge order — a UDAF that
  * summed doubles would produce run-to-run different bits under
  * parallel merge, which would fail any hash-based correctness gate.
  *
  * Spark runs this as a partial aggregation per partition + merge
  * (same shape as built-in aggregates), so it scales like sum().
  */
object WeightedAvg extends Aggregator[(Double, Double), (JBigDecimal, JBigDecimal), Double] {

  private val mc = MathContext.DECIMAL128

  override def zero: (JBigDecimal, JBigDecimal) =
    (JBigDecimal.ZERO, JBigDecimal.ZERO)

  override def reduce(b: (JBigDecimal, JBigDecimal), a: (Double, Double)): (JBigDecimal, JBigDecimal) = {
    val (v, w) = a
    // 2-decimal inputs are exact in decimal; v*w is exact at 4 decimals
    val vd = new JBigDecimal(java.lang.Double.toString(v))
    val wd = new JBigDecimal(java.lang.Double.toString(w))
    (b._1.add(vd.multiply(wd, mc), mc), b._2.add(wd, mc))
  }

  override def merge(x: (JBigDecimal, JBigDecimal), y: (JBigDecimal, JBigDecimal)): (JBigDecimal, JBigDecimal) =
    (x._1.add(y._1, mc), x._2.add(y._2, mc))

  // Divide as doubles (not decimals): decimal division needs a rounding
  // choice that other engines won't reproduce; double/double of two
  // exactly-accumulated sums is one IEEE op — bit-identical everywhere.
  override def finish(r: (JBigDecimal, JBigDecimal)): Double =
    if (r._2.signum() == 0) Double.NaN
    else r._1.doubleValue() / r._2.doubleValue()

  override def bufferEncoder: Encoder[(JBigDecimal, JBigDecimal)] =
    Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)
      .asInstanceOf[Encoder[(JBigDecimal, JBigDecimal)]]

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column entry point: weightedAvg(value, weight). */
  def apply(value: Column, weight: Column): Column = {
    val fn = udaf(this, Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
    fn(value, weight)
  }
}

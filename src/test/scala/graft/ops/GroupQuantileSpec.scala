package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.ops.QuantileSketch.QSketch

/** Per-group quantile sketches (QuantileSketchAgg in
  * KeyValueGroupedDataset.agg): each group's aggregated sketch equals
  * the from-scratch QSketch of that group's rows bit-for-bit,
  * regardless of partitioning — the mergeability contract applied
  * per key.
  */
class GroupQuantileSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  // below the ~25 docs per source at sf0.001 so per-group level
  // raising actually engages (the query's k=64 raises from sf0.01 up)
  private val K = 8

  test("per-group Aggregator == per-group from-scratch model") {
    import spark.implicits._
    val docs = Tables(spark, sfDir, "documents").select(
      col("source"),
      QuantileSketch.hash60(col("doc_id").cast("string")).as("h"),
      col("n_chars").cast("long").as("v"))
    val agg = new QuantileSketch.QuantileSketchAgg(K)
    val viaAgg = docs.as[(String, Long, Long)]
      .repartition(7) // group rows deliberately scattered
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(agg.toColumn.name("sk"))
      .collect().toMap
    val local = docs.collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1)
    assert(viaAgg.keySet === local.keySet)
    local.foreach { case (src, rows) =>
      val model = QSketch.fromRows(rows.map(_._2), K)
      val got = viaAgg(src)
      assert(model.level > 0, s"$src must raise at K=$K")
      assert(got.level === model.level, s"$src level")
      assert(got.total === model.total, s"$src total")
      assert(got.canonical === model.canonical, s"$src items")
      // and the quantile rule the query reads off the sketch
      assert(got.quantile(5000L) === model.quantile(5000L))
      assert(got.quantile(9500L) === model.quantile(9500L))
    }
  }
}

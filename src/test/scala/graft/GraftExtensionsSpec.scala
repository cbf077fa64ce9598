package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Builds a session WITH the extensions installed and drives every
  * injected piece through the plain SQL surface — the exact experience
  * of `--conf spark.sql.extensions=graft.GraftExtensions`.
  *
  * getOrCreate() would silently reuse the shared test session (and
  * drop the extensions), so the default session is cleared first and
  * restored afterwards for the other suites.
  */
class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var prevDefault: Option[SparkSession] = None
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    prevDefault = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    prevDefault.foreach { s =>
      SparkSession.setDefaultSession(s)
      SparkSession.setActiveSession(s)
    }
  }

  test("all injected functions are callable from SQL") {
    val row = spark.sql("""
      SELECT
        simhash64(array('a','b','c')) AS sh,
        minhash_sig(array('x y z'), 8) AS mh,
        shingle_set('a b c d', 3) AS sg,
        dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
        sig_agreement(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS sa,
        rollinghash_min('hello world hello world') AS rh
    """).collect()(0)
    assert(row.getAs[Long]("sh") !== 0L)
    assert(row.getAs[Seq[Long]]("mh").length === 8)
    assert(row.getAs[Seq[String]]("sg") === Seq("a b c", "b c d"))
    assert(row.getAs[Double]("dp") === 11.0)
    assert(row.getAs[Double]("sa") === 2.0 / 3.0)
    assert(row.getAs[Long]("rh") !== 0L)
  }

  test("functions appear in DESCRIBE FUNCTION") {
    val desc = spark.sql("DESCRIBE FUNCTION simhash64")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("simhash64"))
  }

  test("injected optimizer rule rewrites window top-k from pure SQL") {
    val s = spark // stable identifier for implicits
    import s.implicits._
    (1L to 200L).map(i => (i % 7, i, (i * 31 % 97).toDouble))
      .toDF("k", "id", "v").createOrReplaceTempView("t_ext")
    val df = spark.sql("""
      SELECT k, id, v FROM (
        SELECT k, id, v,
          ROW_NUMBER() OVER (PARTITION BY k ORDER BY v DESC, id) AS rn
        FROM t_ext) WHERE rn <= 2""")
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("TopKPerKeyFinal"), plan)
    assert(df.count() === 14)
  }
}

package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._
  import DedupFunctions._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog", "en", "web", 43L),
    (1L, "quick brown fox jumps over the lazy dog", "en", "web", 39L), // near-dup of 0
    (2L, "completely different text with other words entirely", "en", "web", 51L),
    (3L, "the quick brown fox jumps over the lazy dog", "en", "web", 43L) // exact dup of 0
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("shingles: token 3-grams in order") {
    val out = Seq("a b c d").toDF("text")
      .select(shingles(TextFunctions.wsTokens(col("text"))).as("sh"))
      .as[Seq[String]].head()
    assert(out === Seq("a b c", "b c d"))
  }

  test("shingles: short docs yield a single (possibly partial) shingle") {
    val out = Seq("a b").toDF("text")
      .select(shingles(TextFunctions.wsTokens(col("text"))).as("sh"))
      .as[Seq[String]].head()
    assert(out === Seq("a b"))
  }

  test("jaccard: exact set semantics") {
    val out = Seq(1).toDF("x").select(
      jaccard(array(lit("a"), lit("b"), lit("c")),
        array(lit("b"), lit("c"), lit("d"))).as("j"))
      .as[Double].head()
    assert(out === 0.5) // |{b,c}| / |{a,b,c,d}|
  }

  test("minhash signature: deterministic, k slots, identical sets agree") {
    val df = docs.select(col("doc_id"),
      minhashSignature(distinctShingles(col("text")), 16).as("sig"))
    val sigs = df.as[(Long, Seq[Long])].collect().toMap
    assert(sigs(0L).length === 16)
    assert(sigs(0L) === sigs(3L)) // exact dup -> identical signature
    assert(sigs(0L) !== sigs(2L)) // different text -> different signature
  }

  test("band hashes: bands count, exact dups collide on every band") {
    val df = docs.select(col("doc_id"),
      bandHashes(minhashSignature(distinctShingles(col("text")), 16), 4, 4).as("bh"))
    val bh = df.as[(Long, Seq[Long])].collect().toMap
    assert(bh(0L).length === 4)
    assert(bh(0L) === bh(3L))
  }

  test("minhash near-dups of a shared prefix collide on some band") {
    // doc 1 = doc 0 minus first token: high Jaccard, should share >= 1 band
    val df = docs.select(col("doc_id"),
      bandHashes(minhashSignature(distinctShingles(col("text")), 64), 16, 4).as("bh"))
    val bh = df.as[(Long, Seq[Long])].collect().toMap
    assert(bh(0L).zip(bh(1L)).exists { case (a, b) => a == b })
  }

  test("withPlantedNearDups plants a first-token-dropped copy of every 5th doc") {
    val planted = withPlantedNearDups(docs)
    assert(planted.count() === 4 + 1) // only doc_id 0 satisfies % 5 == 0
    val copy = planted.filter(col("doc_id") === 1000000L).select("text").as[String].head()
    assert(copy === "quick brown fox jumps over the lazy dog")
  }

  test("repeated passages: mirrored docs and their sources fully flagged") {
    val res = graft.SparkEntry.queries("q_repeated_passages")(
      spark, "/root/testdata/sf0.001")
      .select("doc_id", "n_windows", "n_shared", "flagged")
      .as[(Long, Long, Long, Long)].collect()
    val mirrors = res.filter(_._1 >= 800000L)
    assert(mirrors.nonEmpty)
    // a mirror is "mirrorN " + source: EXACTLY one window (the leading
    // one holding the unique mirror token) is unshared — the sharp
    // invariant, independent of doc length
    mirrors.foreach { case (id, nw, ns, flag) =>
      assert(ns === nw - 1, s"mirror $id: $ns of $nw shared")
      if (nw >= 3) assert(flag === 1L, s"mirror $id nw=$nw unflagged") }
    // every window of a mirrored SOURCE also lives in its mirror
    val sources = res.filter { case (id, _, _, _) =>
      id < 800000L && id % 7 == 0 }
    sources.foreach { case (id, nw, ns, flag) =>
      assert(ns === nw && flag === 1L, s"source $id: $ns of $nw shared") }
    // docs without a mirror must not be mass-flagged by organic
    // 8-gram collisions (the window is long enough to be specific)
    val others = res.filter { case (id, _, _, _) => id < 800000L && id % 7 != 0 }
    assert(others.count(_._4 == 1L) < others.length / 4,
      s"${others.count(_._4 == 1L)} of ${others.length} unmirrored docs flagged")
  }

  test("containment: planted concatenations recovered; Jaccard would miss them") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q_containment_neardup")(spark, sf)
      .as[(Long, Long, Double)].collect()
    val byPair = rows.map { case (a, b, c) => (a, b) -> c }.toMap
    // every planted concat doc p = d+2000000 fully contains docs d, d+1
    val plantedHeads = rows.map(_._2).filter(_ >= 2000000L).map(_ - 2000000L)
      .distinct
    assert(plantedHeads.nonEmpty, "no planted containments recovered")
    plantedHeads.foreach { d =>
      val p = d + 2000000L
      assert(byPair.get((d, p)).contains(1.0), s"doc $d not contained in $p")
      assert(byPair.get((d + 1, p)).contains(1.0),
        s"doc ${d + 1} not contained in $p")
    }
    // the case that motivates the operator: a contained pair whose
    // Jaccard sits BELOW the near-dup threshold (subset, not twin)
    val docs = graft.Tables(spark, sf, "documents")
      .filter(col("doc_id") < 200)
      .select(col("doc_id"), DedupFunctions.distinctShingles(col("text")).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    val jaccardMissed = plantedHeads.exists { d =>
      val (a, b) = (docs(d).toSet, docs(d).toSet ++ docs(d + 1).toSet)
      a.intersect(b).size.toDouble / a.union(b).size < 0.6
    }
    assert(jaccardMissed,
      "fixture degenerate: every planted containment is also a Jaccard near-dup")
  }

  test("q_lsh_eval: banding recall floor holds and the metric is honest") {
    // the hash gate proves the COUNTS match DuckDB; this pins the
    // quality floor the hash can't express — at 16 bands x 4 rows the
    // collision curve at j>=0.6 must recover (essentially) the whole
    // truth set, while raw band candidates over-generate (fp > 0), so
    // precision < 1 proves the metric isn't vacuously self-agreeing
    val row = graft.SparkEntry.queries("q_lsh_eval")(
      spark, "/root/testdata/sf0.001").collect().head
    val (tp, fp) = (row.getAs[Long]("tp"), row.getAs[Long]("fp"))
    assert(tp > 0, "degenerate fixture: empty truth set")
    assert(row.getAs[Double]("recall") >= 0.9,
      s"LSH banding recall regressed: ${row.getAs[Double]("recall")}")
    val p = row.getAs[Double]("precision")
    assert(p > 0.0 && p <= 1.0)
    assert(fp > 0, "suspicious: zero raw-candidate false positives")
    info(f"recall=${row.getAs[Double]("recall")}%.3f precision=$p%.3f " +
      s"tp=$tp fp=$fp fn=${row.getAs[Long]("fn")}")
  }

  test("q_dedup_agreement: counts equal the set algebra of the two pair sets") {
    val sf = "/root/testdata/sf0.001"
    def pairs(q: String): Set[(Long, Long)] =
      graft.SparkEntry.queries(q)(spark, sf)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val mh = pairs("q_neardup_minhash")
    val sm = pairs("q_neardup_simhash")
    assert(mh.nonEmpty && sm.nonEmpty, "degenerate fixture: empty pair set")
    val row = graft.SparkEntry.queries("q_dedup_agreement")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    val (mhN, smN, both, mhOnly, smOnly, bp) = row
    assert(mhN === mh.size.toLong)
    assert(smN === sm.size.toLong)
    assert(both === mh.intersect(sm).size.toLong)
    assert(mhOnly === mh.diff(sm).size.toLong)
    assert(smOnly === sm.diff(mh).size.toLong)
    assert(bp === both * 10000L / mh.union(sm).size)
  }

  test("q_ngram_novelty: late replicas measure zero novelty; counts bounded") {
    val out = graft.SparkEntry.queries("q_ngram_novelty")(
      spark, "/root/testdata/sf0.001").collect()
    val (replicas, originals) = out.partition(_.getAs[Long]("doc_id") >= 900000L)
    assert(replicas.nonEmpty, "fixture lost its planted replicas")
    // every replica's text exists verbatim at a smaller doc_id, so no
    // window can first-occur at the replica: novelty must be exactly 0
    replicas.foreach { r =>
      assert(r.getAs[Long]("n_novel") === 0L, r.toString)
      assert(r.getAs[Long]("redundant") === 1L, r.toString)
    }
    // structural bounds on everything else
    out.foreach { r =>
      val (novel, win) = (r.getAs[Long]("n_novel"), r.getAs[Long]("n_windows"))
      assert(novel >= 0L && novel <= win, r.toString)
    }
    // the corpus is mostly non-duplicated: originals keep real novelty
    val fracs = originals.map(_.getAs[Double]("novelty_frac"))
    assert(fracs.count(_ > 0.5) > originals.length / 2,
      s"novelty collapsed: ${fracs.take(5).mkString(",")}")
  }
}

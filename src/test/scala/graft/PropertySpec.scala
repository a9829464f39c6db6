package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Algebraic-law property tests (SURVEY.md §5.2 layer 3). ScalaCheck
  * generators drive the cases with fixed seeds (the scalatest-scalacheck
  * bridge artifact is not on the offline classpath, so sampling is
  * explicit — which also keeps runs deterministic). */
class PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    val params = Gen.Parameters.default.withSize(40)
    (0 until n * 3).iterator
      .flatMap(i => g.apply(params, org.scalacheck.rng.Seed(i.toLong)))
      .take(n).toSeq
  }

  private val rowsGen: Gen[List[(Long, String, Double)]] =
    Gen.listOf(for {
      k <- Gen.choose(0L, 20L)
      s <- Gen.oneOf("a", "b", "c")
      v <- Gen.choose(-100.0, 100.0)
    } yield (k, s, v))

  test("bandedRangeJoin equals the plain range join on random data") {
    import spark.implicits._
    // negative values + band-straddling pairs exercised by construction;
    // the decomposition must be lossless and duplicate-free across the
    // documented domain (|v|/width far below 2^50 — see the scaladoc
    // precondition; raw-double keys at astronomical magnitudes are out).
    val pairGen: Gen[(List[Double], List[Double])] = for {
      xs <- Gen.listOfN(60, Gen.choose(-200.0, 200.0))
      ys <- Gen.listOfN(60, Gen.choose(-200.0, 200.0))
    } yield (xs, ys)
    for ((xs, ys) <- samples(pairGen, 4)) {
      val l = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("lid", "x")
      val r = ys.zipWithIndex.map { case (y, i) => (i.toLong, y) }.toDF("rid", "y")
      val w = 25.0
      val plain = l.join(r, col("x") > col("y") - w && col("x") < col("y"))
        .select("lid", "rid").collect().map(t => (t.getLong(0), t.getLong(1))).sorted
      val banded = ops.Scale.bandedRangeJoin(l, r, "x", "y", w)
        .select("lid", "rid").collect().map(t => (t.getLong(0), t.getLong(1))).sorted
      assert(banded.toSeq === plain.toSeq)
      assert(banded.length === banded.distinct.length, "duplicate pairs from banding")
    }
  }

  test("union-all count additivity") {
    import spark.implicits._
    for (Seq(xs, ys) <- samples(rowsGen, 10).grouped(2)) {
      val a = xs.toDF("k", "s", "v"); val b = ys.toDF("k", "s", "v")
      assert(a.union(b).count() === xs.length + ys.length)
    }
  }

  test("distinct is idempotent and bounded by input size") {
    import spark.implicits._
    for (xs <- samples(rowsGen, 5)) {
      val d = xs.toDF("k", "s", "v").distinct()
      assert(d.count() === d.distinct().count())
      assert(d.count() <= xs.length)
    }
  }

  test("inner join is a subset of the cross join") {
    import spark.implicits._
    for (Seq(xs, ys) <- samples(rowsGen, 6).grouped(2)) {
      val a = xs.toDF("k", "s", "v"); val b = ys.toDF("k2", "s2", "v2")
      val joined = a.join(b, col("k") === col("k2")).count()
      assert(joined <= xs.length.toLong * ys.length.toLong)
    }
  }

  test("row_number is a bijection within each partition key") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    for (xs <- samples(rowsGen, 5) if xs.nonEmpty) {
      val w = Window.partitionBy("k").orderBy(col("v").asc, col("s").asc)
      val rn = xs.toDF("k", "s", "v").withColumn("rn", row_number().over(w))
      val byKey = rn.groupBy("k").agg(count(lit(1)).as("n"),
        min(col("rn")).as("lo"), max(col("rn")).as("hi"),
        countDistinct(col("rn")).as("nd")).collect()
      byKey.foreach { r =>
        assert(r.getAs[Long]("lo") === 1L)
        assert(r.getAs[Long]("hi") === r.getAs[Long]("n"))
        assert(r.getAs[Long]("nd") === r.getAs[Long]("n"))
      }
    }
  }

  test("decimal aggregation is partition-order independent") {
    import spark.implicits._
    for (xs <- samples(rowsGen, 5) if xs.nonEmpty) {
      val df = xs.toDF("k", "s", "v")
      val s1 = df.repartition(1).agg(Tables.dsum(col("v"))).head.getDecimal(0)
      val s7 = df.repartition(7).agg(Tables.dsum(col("v"))).head.getDecimal(0)
      assert(s1 === s7)
    }
  }

  test("streaming tumbling agg equals batch agg on generated event streams") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val evGen: Gen[List[(Long, Long, String, Double)]] = Gen.listOfN(30, for {
      id <- Gen.choose(0L, 1000000L)
      sec <- Gen.choose(0L, 600L)
      ty <- Gen.oneOf("click", "view")
      v <- Gen.choose(0.0, 10.0)
    } yield (id, sec, ty, v))
    for ((xs, i) <- samples(evGen, 3).zipWithIndex) {
      val rows = xs.zipWithIndex.map { case ((_, sec, ty, v), j) =>
        graft.streaming.Ev(j.toLong,
          java.sql.Timestamp.valueOf(java.time.LocalDateTime.ofEpochSecond(
            1704067200L + sec, 0, java.time.ZoneOffset.UTC)), 1L, ty, v)
      }
      val mem = MemoryStream[graft.streaming.Ev]
      val name = s"prop_equiv_$i"
      val q = mem.toDF()
        .groupBy(window(col("ts"), "1 minute"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Complete()).start()
      try {
        mem.addData(rows.take(15)); q.processAllAvailable()
        mem.addData(rows.drop(15)); q.processAllAvailable()
        val streamed = spark.table(name).collect()
          .map(r => (r.getStruct(0).getTimestamp(0), r.getString(1), r.getLong(2))).toSet
        val static = rows.toDF()
          .groupBy(window(col("ts"), "1 minute"), col("event_type"))
          .agg(count(lit(1)).as("n")).collect()
          .map(r => (r.getStruct(0).getTimestamp(0), r.getString(1), r.getLong(2))).toSet
        assert(streamed === static)
      } finally q.stop()
    }
  }

  test("minhash signature similarity approximates exact Jaccard") {
    import spark.implicits._
    val wordGen = Gen.oneOf((1 to 30).map(i => s"w$i"))
    val docGen = Gen.listOfN(40, wordGen).map(_.mkString(" "))
    for (Seq(t1, t2) <- samples(docGen, 8).grouped(2)) {
      val df = Seq((0L, t1), (1L, t2)).toDF("doc_id", "text")
        .select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
        .select(col("doc_id"), expr(
          """array_distinct(transform(sequence(0, size(toks) - 3),
            | i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))"""
            .stripMargin.replace("\n", " ")).as("sh"))
        .withColumn("sig", expr(
          "transform(sequence(0, 63), i -> array_min(transform(sh, t -> xxhash64(t, i))))"))
      val rows = df.select("sh", "sig").collect()
      val sh = rows.map(_.getSeq[String](0).toSet)
      val sig = rows.map(_.getSeq[Long](1))
      val exact =
        if (sh(0).isEmpty && sh(1).isEmpty) 1.0
        else sh(0).intersect(sh(1)).size.toDouble / sh(0).union(sh(1)).size
      val est = sig(0).zip(sig(1)).count { case (a, b) => a == b } / 64.0
      // 64 permutations: stddev ≈ sqrt(j(1-j)/64) <= 0.0625 → generous bound
      assert(math.abs(est - exact) <= 0.3,
        s"minhash estimate $est vs exact $exact")
    }
  }
}

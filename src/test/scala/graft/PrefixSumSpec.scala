package graft

import graft.operators.PrefixSum
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** runningTotal must equal the single-partition `sum() OVER (ORDER BY)`
  * it replaces, across slice boundaries and degenerate sizes. */
class PrefixSumSpec extends SparkSpec {

  test("running total equals a global ordered window") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (1 to 5000).map(i => (i.toLong, rnd.nextInt(100).toLong))
      .toDF("k", "v")
      .repartition(16) // scrambled input: the operator must re-order
    val got = PrefixSum.runningTotal(df, "k", "v", "cum")
      .orderBy(col("k")).select(col("k"), col("cum")).collect()
    val want = df
      .withColumn("cum", sum(col("v")).over(Window.orderBy(col("k"))))
      .orderBy(col("k")).select(col("k"), col("cum")).collect()
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getLong(0) === w.getLong(0))
      assert(g.getLong(1) === w.getLong(1), s"k=${g.getLong(0)}")
    }
  }

  test("single row and empty input") {
    import spark.implicits._
    val one = Seq((1L, 5L)).toDF("k", "v")
    val r = PrefixSum.runningTotal(one, "k", "v", "cum").collect()
    assert(r.length === 1 && r(0).getAs[Long]("cum") === 5L)
    val empty = Seq.empty[(Long, Long)].toDF("k", "v")
    assert(PrefixSum.runningTotal(empty, "k", "v", "cum").count() === 0L)
  }

  test("t_pack packs are contiguous and budget-aligned") {
    val df = operators.Pipeline.tPack.fn(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val cum = r.getAs[Long]("cum_tokens")
      val pack = r.getAs[Long]("pack_id")
      assert(pack === (cum - n) / 512,
        s"doc ${r.getAs[Long]("doc_id")}: pack $pack vs cum $cum n $n")
    }
    // pack ids never decrease in doc order and never skip more than
    // one boundary per doc unless the doc itself spans multiple packs
    val packs = rows.map(_.getAs[Long]("pack_id"))
    assert(packs.zip(packs.tail).forall { case (a, b) => b >= a })
  }

  test("packSplit: hand-computed slices, budget 10") {
    import spark.implicits._
    // docs of 4, 8, 25, 3 tokens -> global starts 0, 4, 12, 37
    //   doc 1: [0,4)   -> pack 0, slice [0,4)
    //   doc 2: [4,12)  -> pack 0 slice [0,6), pack 1 slice [6,8)
    //   doc 3: [12,37) -> pack 1 [0,8), pack 2 [8,18), pack 3 [18,25)
    //   doc 4: [37,40) -> pack 3, slice [0,3)
    val df = Seq((1L, 4L), (2L, 8L), (3L, 25L), (4L, 3L)).toDF("doc_id", "n")
    val got = PrefixSum.packSplit(df, "doc_id", "n", budget = 10L)
      .orderBy("doc_id", "pack_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, 0L, 0L, 4L),
      (2L, 0L, 0L, 6L), (2L, 1L, 6L, 8L),
      (3L, 1L, 0L, 8L), (3L, 2L, 8L, 18L), (3L, 3L, 18L, 25L),
      (4L, 3L, 0L, 3L)))
  }

  test("packSplit: randomized sizes (incl. zeros and giants) keep the tiling exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // sizes span empty docs, sub-budget docs, and multi-pack giants
    val docs = (1L to 400L).map { i =>
      (i, rnd.nextInt(4) match {
        case 0 => 0L
        case 1 => rnd.nextInt(50).toLong
        case 2 => rnd.nextInt(512).toLong
        case _ => (512 + rnd.nextInt(3000)).toLong
      })
    }
    val df = docs.toDF("doc_id", "n").repartition(16)
    val got = PrefixSum.packSplit(df, "doc_id", "n", budget = 512L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nonZero = docs.filter(_._2 > 0)
    // per-doc: slices tile [0, n) contiguously in pack order
    val byDoc = got.groupBy(_._1)
    assert(byDoc.keySet === nonZero.map(_._1).toSet) // zero-token docs absent
    for ((id, n) <- nonZero) {
      val slices = byDoc(id).sortBy(_._2)
      assert(slices.head._3 === 0L, s"doc $id must start at token 0")
      assert(slices.last._4 === n, s"doc $id must end at token $n")
      slices.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._2 === a._2 + 1, s"doc $id: packs must be consecutive")
          assert(b._3 === a._4, s"doc $id: slices must be contiguous")
        case _ => ()
      }
    }
    // per-pack: exactly 512 tokens except the last
    val fills = got.groupBy(_._2).view
      .mapValues(_.map(s => s._4 - s._3).sum).toSeq.sortBy(_._1)
    assert(fills.map(_._1) === (0L until fills.length)) // no gaps in pack ids
    assert(fills.dropRight(1).forall(_._2 === 512L))
    assert(fills.last._2 <= 512L && fills.last._2 > 0L)
    // global: total packed tokens equals total input tokens
    assert(fills.map(_._2).sum === nonZero.map(_._2).sum)
  }

  test("decileKey: exact at the documented bound, loud past it") {
    import spark.implicits._
    // at the bound: max legal (n_toks, doc_id) computes without error
    // and stays collision-free against its neighbors
    val ok = Seq((9200000L, 999999999999L), (9200000L, 0L), (0L, 0L),
        (9199999L, 999999999999L))
      .toDF("n_toks", "doc_id")
      .select(operators.Pipeline.decileKey(col("n_toks"), col("doc_id")).as("k"))
      .collect().map(_.getLong(0))
    assert(ok.distinct.length === ok.length)
    assert(ok(0) === 9200000L * 1000000000000L + 999999999999L)
    // one past either bound: fail-fast, not a silent mis-rank
    def boom(nToks: Long, docId: Long): Unit = {
      val e = intercept[Exception] {
        Seq((nToks, docId)).toDF("n_toks", "doc_id")
          .select(operators.Pipeline.decileKey(col("n_toks"), col("doc_id")))
          .collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("composite key bound exceeded")), e.toString)
    }
    boom(9200001L, 0L)
    boom(0L, 1000000000000L)
    boom(-1L, 0L)
  }

  test("packSplit invariants on the corpus: full coverage, exact pack fill") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokenCountWs(col("text")).as("n_tokens"))
    val slices = PrefixSum.packSplit(docs, "doc_id", "n_tokens", budget = 512L)
    // every document's slices tile [0, n_tokens) exactly
    val cover = slices.groupBy("doc_id")
      .agg(sum(col("tok_end") - col("tok_start")).as("covered"),
        min(col("tok_start")).as("mn"))
      .join(docs, "doc_id")
      .filter(col("covered") =!= col("n_tokens") || col("mn") =!= 0L)
    assert(cover.count() === 0L)
    // every pack except the last holds exactly 512 tokens
    val fills = slices.groupBy("pack_id")
      .agg(sum(col("tok_end") - col("tok_start")).as("fill"))
      .orderBy(col("pack_id")).collect()
    assert(fills.dropRight(1).forall(_.getLong(1) === 512L))
    assert(fills.last.getLong(1) <= 512L)
  }
}

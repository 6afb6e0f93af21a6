package graft

import graft.operators.{Corpus, Dedup, Relational, Retrieval}
import org.apache.spark.sql.functions._

/** Properties of the retrieval / corpus-management operators (round-11
  * additions): integer-BM25/TF-IDF ranking invariants, DSIR importance
  * weight semantics, MERGE upsert row accounting, per-domain caps,
  * cross-corpus delta dedup vs the single-corpus pair kernel, and the
  * dedup report's conservation identities. */
class RetrievalSpec extends SparkSpec {

  test("t_tfidf: at most 5 ranked terms per doc, scores descending, ranks dense") {
    val out = Retrieval.tTfidf.fn(spark, sf).cache()
    val perDoc = out.groupBy("doc_id").agg(
      count(lit(1)).as("n"), max("rnk").as("max_rnk"),
      min("rnk").as("min_rnk")).collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach { r =>
      assert(r.getAs[Long]("n") <= 5 && r.getAs[Long]("min_rnk") == 1L)
      assert(r.getAs[Long]("max_rnk") == r.getAs[Long]("n")) // dense ranks
    }
    // scores never increase as rank grows within a doc
    val bad = out.as("a").join(out.as("b"),
      col("a.doc_id") === col("b.doc_id") &&
        col("a.rnk") < col("b.rnk") && col("a.score") < col("b.score"))
    assert(bad.isEmpty)
  }

  test("t_bm25: every hit contains a query term; ranks dense and score-ordered") {
    val out = Retrieval.tBm25.fn(spark, sf).cache()
    assert(out.filter(col("rnk") > 10).isEmpty)
    assert(out.filter(col("score") <= 0).isEmpty)
    val docs = Tables.load(spark, sf, "documents")
    val terms = Seq("spark", "join", "filter", "vector", "hash", "merge",
      "customer", "query", "order", "window")
    val hasTerm = docs.select(col("doc_id"),
      terms.map(t => array_contains(split(lower(trim(col("text"))), "\\s+"), t))
        .reduce(_ || _).as("has"))
    val misses = out.join(hasTerm, "doc_id").filter(!col("has"))
    assert(misses.isEmpty)
    val badOrder = out.as("a").join(out.as("b"),
      col("a.query_id") === col("b.query_id") &&
        col("a.rnk") < col("b.rnk") && col("a.score") < col("b.score"))
    assert(badOrder.isEmpty)
  }

  test("t_dsir: selected ≡ w_norm >= neutral, and English docs score higher on average") {
    val out = Retrieval.tDsir.fn(spark, sf).cache()
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "lang")
    assert(out.count() == docs.count())
    val j = out.join(docs, "doc_id")
      .withColumn("is_en", col("lang") === "en")
    val means = j.groupBy("is_en").agg(avg(col("w_norm")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    // the target slice must look more target-like than the rest — the
    // operator's entire reason to exist
    assert(means(true) > means(false),
      s"en mean ${means(true)} !> non-en mean ${means(false)}")
    // re-derive the neutral threshold from the output's own token
    // accounting (tot_r = all tokens, tot_t = target-slice tokens) and
    // check the selection flag is exactly w_norm >= 10000*tot_r div tot_t
    val tots = j.agg(sum("n_grams").as("tot_r"),
      sum(when(col("is_en"), col("n_grams")).otherwise(0L)).as("tot_t"))
      .collect()(0)
    val neutral = 10000L * tots.getLong(0) / tots.getLong(1)
    val flagBad = out.filter(
      col("selected") =!= (col("w_norm") >= lit(neutral)))
    assert(flagBad.isEmpty)
    assert(out.filter(col("n_grams") <= 0).isEmpty)
  }

  test("q_merge: update/insert/carry-over row accounting") {
    val out = Relational.qMerge.fn(spark, sf).cache()
    val base = Tables.load(spark, sf, "orders").cache()
    val nBase = base.count()
    val nIns = base.filter(col("o_orderkey") % 97 === 0).count()
    assert(out.count() == nBase + nIns)
    // every updated key carries status U and price shifted by exactly 1000
    val upd = out.filter(col("o_orderkey") % 10 === 3 && col("o_orderkey") > 0)
    assert(upd.filter(col("o_orderstatus") =!= "U").isEmpty)
    val priceCheck = upd.as("u").join(base.as("b"), "o_orderkey")
      .filter(col("u.o_totalprice") =!= col("b.o_totalprice") + 1000.0)
    assert(priceCheck.isEmpty)
    // inserts landed at negated keys with status N
    val ins = out.filter(col("o_orderkey") < 0)
    assert(ins.count() == nIns)
    assert(ins.filter(col("o_orderstatus") =!= "N").isEmpty)
    // untouched keys are byte-identical to base
    val untouched = out.filter(col("o_orderkey") % 10 =!= 3 && col("o_orderkey") > 0)
    assert(untouched.exceptAll(
      base.filter(col("o_orderkey") % 10 =!= 3)).isEmpty)
  }

  test("q_merge_evolve: widened column is null exactly on untouched rows; evolve=false rejects") {
    import spark.implicits._
    val out = Relational.qMergeEvolve.fn(spark, sf).cache()
    // schema gained the evolved column, nullable
    assert(out.schema.fieldNames.contains("o_channel"))
    // untouched base rows: null channel; touched rows: stamped
    assert(out.filter(col("o_channel").isNull &&
      (col("o_orderkey") % 10 === 3 || col("o_orderkey") < 0)).isEmpty)
    assert(out.filter(col("o_channel").isNotNull &&
      col("o_orderkey") % 10 =!= 3 && col("o_orderkey") > 0).isEmpty)
    assert(out.filter(col("o_channel") === "api").count() ==
      out.filter(col("o_orderkey") < 0).count())
    // the non-evolving merge refuses a widened change batch at plan time
    val base = Seq((1L, "a")).toDF("k", "v")
    val wide = Seq((2L, "b", "extra")).toDF("k", "v", "w")
    intercept[org.apache.spark.sql.AnalysisException] {
      Relational.mergeUpsert(base, wide, "k")
    }
    ()
  }

  test("t_domain_cap: at most 12 docs per source, priority respected") {
    val out = Corpus.tDomainCap.fn(spark, sf).cache()
    val per = out.groupBy("source").agg(count(lit(1)).as("n")).collect()
    per.foreach(r => assert(r.getAs[Long]("n") <= 12))
    // rank 1 has the max n_chars of its source's kept set
    val bad = out.as("a").join(out.as("b"),
      col("a.source") === col("b.source") &&
        col("a.rnk") < col("b.rnk") && col("a.n_chars") < col("b.n_chars"))
    assert(bad.isEmpty)
  }

  test("crossCorpusPairs ≡ cross-side slice of the single-corpus pair kernel") {
    val docs = Tables.load(spark, sf, "documents")
    val delta = Corpus.dDedupDelta.fn(spark, sf)
    val full = Dedup.minhashPairs(docs, "text", "doc_id",
      numHashes = 64, bands = 16)
    val expected = full
      .filter(col("id_a") % 2 =!= col("id_b") % 2)
      .select(
        when(col("id_a") % 2 === 1, col("id_a")).otherwise(col("id_b")).as("doc_id"),
        when(col("id_a") % 2 === 1, col("id_b")).otherwise(col("id_a")).as("ref_id"),
        col("jaccard"))
    assert(delta.exceptAll(expected).isEmpty &&
      expected.exceptAll(delta).isEmpty)
    // and no within-side pair ever leaks out
    assert(delta.filter(col("doc_id") % 2 =!= 1).isEmpty)
    assert(delta.filter(col("ref_id") % 2 =!= 0).isEmpty)
  }

  test("t_bpe_pairs: 30 dense ranks, counts descending, pairs are 2 chars") {
    val out = Retrieval.tBpePairs.fn(spark, sf).cache()
    assert(out.count() == 30)
    assert(out.filter(length(col("pair")) =!= 2).isEmpty)
    val rows = out.orderBy("rnk").collect()
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_occ") >= b.getAs[Long]("n_occ"))
      assert(a.getAs[Long]("rnk") + 1 == b.getAs[Long]("rnk"))
    }
    // the top pair must actually occur that often: recount one pair
    val top = rows.head
    val docs = Tables.load(spark, sf, "documents")
    val n = docs.select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("p"))
      .filter(col("p") === top.getAs[String]("pair")).count()
    assert(n == top.getAs[Long]("n_occ"))
  }

  test("q_hll_sketch: union estimate and per-group estimates inside the 3% contract") {
    val r = Relational.qHllSketch.fn(spark, sf).collect()(0)
    assert(r.getAs[Boolean]("union_ok") && r.getAs[Boolean]("groups_ok"))
    assert(r.getAs[Long]("n_exact") ==
      Tables.load(spark, sf, "customer").select("c_custkey").distinct().count())
  }

  test("q_quantile_sketch: every approximate quantile ranks within 1% of target") {
    val r = Relational.qQuantileSketch.fn(spark, sf).collect()(0)
    assert(r.getAs[Boolean]("ranks_ok"))
    assert(r.getAs[Long]("n_rows") == Tables.load(spark, sf, "lineitem").count())
  }

  test("t_zorder: buckets cover all rows; z-buckets bound the partkey span") {
    val out = Corpus.tZorder.fn(spark, sf).cache()
    val li = Tables.load(spark, sf, "lineitem")
    assert(out.agg(sum("n_rows")).collect()(0).getLong(0) == li.count())
    // the whole point of z-ordering: a z bucket pins the high bits of
    // BOTH keys, so per-bucket key spans are a fraction of the global
    // range (a bucket spanning the full key range = no pruning value)
    val pkRange = li.agg(max("l_partkey") - min("l_partkey")).collect()(0).getLong(0)
    val worst = out.agg(max(col("pk_max") - col("pk_min"))).collect()(0).getLong(0)
    assert(worst <= pkRange / 2,
      s"worst bucket partkey span $worst vs global range $pkRange")
  }

  test("q_scd2_incremental ≡ full SCD-2 rebuild") {
    val full = Relational.qScd2.fn(spark, sf)
    val inc = Relational.qScd2Incremental.fn(spark, sf)
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty)
  }

  test("q_window_range: frame bounded by value distance, not row count") {
    val out = Relational.qWindowRange.fn(spark, sf).cache()
    // every frame holds at least its own row, and revenue is positive
    assert(out.filter(col("n_30d") < 1).isEmpty)
    assert(out.filter(col("rev_30d") <= 0).isEmpty)
    // recompute one customer's trailing counts by brute force
    val ck = out.select("o_custkey").first().getLong(0)
    val rows = out.filter(col("o_custkey") === ck)
      .select("o_orderkey", "day", "n_30d").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val days = rows.map(_._2)
    rows.foreach { case (_, d, n) =>
      val expect = days.count(x => x >= d - 30 && x <= d)
      assert(n == expect, s"cust $ck day $d: $n vs $expect")
    }
  }

  test("t_bpe_merge: merged pair vanishes from the re-encoded corpus") {
    val before = Retrieval.tBpePairs.fn(spark, sf).orderBy("rnk")
      .select("pair").first().getString(0)
    val after = Retrieval.tBpeMerge.fn(spark, sf).cache()
    assert(after.count() == 10)
    // the merged pair cannot survive as a plain pair (every occurrence
    // collapsed to the 1-char marker), and marker pairs render as <pair>
    assert(after.filter(col("pair") === before).isEmpty)
    // counts never increase down the ranking
    val rows = after.orderBy("rnk").collect()
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_occ") >= b.getAs[Long]("n_occ"))
    }
  }

  test("d_dedup_report: conservation — docs partition into clusters") {
    val docs = Tables.load(spark, sf, "documents")
    val rep = Corpus.dDedupReport.fn(spark, sf).cache()
    val tot = rep.agg(sum("n_docs"), sum(expr("n_clusters")),
      sum("n_dropped")).collect()(0)
    assert(tot.getLong(0) == docs.count()) // every doc in exactly one cluster
    assert(tot.getLong(0) - tot.getLong(1) == tot.getLong(2)) // dropped = docs - keepers
    // per-row identity: n_docs = size * n_clusters, dropped = docs - clusters
    val bad = rep.filter(
      col("n_docs") =!= col("cluster_size") * col("n_clusters") ||
        col("n_dropped") =!= col("n_docs") - col("n_clusters"))
    assert(bad.isEmpty)
  }

  test("t_rrf: a doc on both top lists outranks single-list docs at equal ranks") {
    import graft.operators.Retrieval
    val out = Retrieval.tRrf.fn(spark, sf).collect()
    // 10 fused results per query, ranks 1..10, fused scores non-increasing
    val byQ = out.groupBy(_.getLong(0))
    byQ.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq === (1L to sorted.length))
      val fused = sorted.map(_.getLong(3))
      assert(fused.zip(fused.tail).forall { case (a, b) => a >= b })
      // the theoretical RRF range: one list contributes at most
      // 1000000/61, two at most 2*1000000/61
      assert(fused.head <= 2 * (1000000 / 61))
      assert(fused.last >= 1000000 / 160) // rank <= 100 on some list
    }
    assert(byQ.size === 3)
  }

  test("bpeTrain learns the hand-computed merge table on a known vocabulary") {
    import spark.implicits._
    // vocab: abcabc x2, abc x3, zq x4
    // round 1 pairs: ab 2*2+3=7, bc 2*2+3=7, ca 2, zq 4
    //   -> tie at 7 broken by pair order: 'ab' < 'bc', so merge 'ab' (7)
    // after replace(w,'ab',\x01): {\x01c\x01c x2, \x01c x3, zq x4}
    // round 2 pairs: \x01c 2*2+3=7, c\x01 2, zq 4 -> merge \x01c (7),
    //   rendered '<ab>c'
    val wc = Seq(("abcabc", 2L), ("abc", 3L), ("zq", 4L)).toDF("w", "wn")
    val got = Retrieval.bpeTrain(wc, iters = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, "ab", 7L), (2L, "<ab>c", 7L)))
    // the full 3-merge driver query runs end-to-end and renders
    // every row marker-free (markers exist only inside the loop)
    val q = Retrieval.tBpeTrain.fn(spark, sf).collect()
    assert(q.length === 3)
    assert(q.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    q.foreach(r => assert(!r.getString(1).exists(_ < ' '),
      s"unrendered marker escaped: ${r.getString(1)}"))
  }

  test("bpeEncode replays the trained merges word-for-word on a known corpus") {
    import spark.implicits._
    // same vocabulary as the bpeTrain test, as documents; with 2
    // merges (ab -> \x01, then \x01c -> \x02):
    //   "abcabc abc" -> words abcabc (6 sym -> \x02\x02 = 2), abc (3 -> 1)
    //   "zq zq"      -> untouched: 2 + 2 symbols
    val docs = Seq(
      (1L, "abcabc abc"), (2L, "zq zq"), (3L, "abc")
    ).toDF("doc_id", "text")
    val wc = Seq(("abcabc", 2L), ("abc", 3L), ("zq", 4L)).toDF("w", "wn")
    val got = Retrieval.bpeEncode(docs, wc, iters = 2)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) === ((2L, 9L, 3L, 66L)),
      s"doc 1: 9 symbols must collapse to 3 (66% saved), got ${got(1L)}")
    assert(got(2L) === ((2L, 4L, 4L, 0L)), "zq words are untouched by the merges")
    assert(got(3L) === ((1L, 3L, 1L, 66L)))
  }

  test("rrfFuse: an everywhere-mid doc beats top-ranked-once docs; hybrid query is deterministic") {
    import graft.operators.{Ranking, Retrieval}
    import spark.implicits._
    // two lists for one query: doc 99 is rank 2 in BOTH; docs 1 and 2
    // are rank 1 in exactly one list each. RRF must put 99 first:
    // 2/(60+2) > 1/(60+1) + 1/(60+3)-ish — exactly the summed path.
    val ranked = Seq(
      (1L, 1L, 1L), (1L, 99L, 2L), (1L, 3L, 3L),
      (1L, 2L, 1L), (1L, 99L, 2L), (1L, 4L, 3L))
      .toDF("query_id", "doc_id", "rnk")
    val fused = Ranking.rrfFuse(ranked).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(fused.head._2 === 99L,
      s"doc 99 (mid-ranked everywhere) must win: ${fused.toSeq}")
    assert(fused.head._4 === 2L)
    // its score is the exact integer sum of both contributions
    assert(fused.head._3 === 2 * (1000000L / 62))
    // singles score exactly one contribution
    assert(fused.filter(_._2 != 99L).forall(_._4 == 1L))
    // full query: 5 fused rows per query, scores descending, and the
    // no-overlap property of this corpus (n_lists = 1) holds
    val out = Retrieval.tHybridSearch.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.map(_._1).distinct.sorted.toSeq === Seq(1L, 2L, 3L))
    out.groupBy(_._1).values.foreach { rows =>
      val s = rows.sortBy(_._2)
      assert(s.length === 5)
      assert(s.map(_._4).sliding(2).forall(p => p.head >= p.last))
    }
    // n_lists is 1 or 2 by construction; at this tiny SF (50 docs,
    // two top-10 lists) chance overlap occurs — at sf0.01/sf0.1 the
    // oracle shows none (unrelated token/embedding spaces)
    assert(out.forall(r => r._5 == 1L || r._5 == 2L))
  }

  test("t_retrieval_eval: metric invariants hold and P@5 matches an independent replay") {
    import graft.operators.Retrieval
    val out = Retrieval.tRetrievalEval.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L))
    out.foreach { case (q, nRel, h5, h10, rec, mrr) =>
      assert(h5 <= 5 && h5 <= h10 && h10 <= 10 && h10 <= nRel,
        s"query $q: inconsistent hit counts ($h5, $h10, $nRel)")
      assert(rec === h10 * 1000000L / nRel)
      // MRR is 10^6/first_rel: it is 0 iff no hits, and >= 10^5 when
      // any of the 10 retrieved is relevant (rank <= 10)
      assert(if (h10 == 0) mrr === 0L else mrr >= 100000L && mrr <= 1000000L)
    }
    // independent P@5 replay for query 1: top-5 BM25 docs vs the
    // contains-all-terms definition checked on raw text
    val top5 = Retrieval.tBm25.fn(spark, sf)
      .filter(col("query_id") === 1L && col("rnk") <= 5)
      .collect().map(_.getLong(2))
    val texts = Tables.load(spark, sf, "documents")
      .filter(col("doc_id").isin(top5: _*))
      .collect().map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.trim.split("\\s+").toSet).toMap
    val p5 = top5.count(d =>
      Set("spark", "join", "filter").subsetOf(texts(d))).toLong
    assert(out.find(_._1 == 1L).get._3 === p5,
      s"P@5 replay mismatch: query says ${out.find(_._1 == 1L).get._3}, text says $p5")
  }
}

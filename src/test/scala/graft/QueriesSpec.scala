package graft

import org.apache.spark.sql.functions.{col, floor}
import org.scalatest.funsuite.AnyFunSuite

/** Sanity over the declared inventory on sf0.001 (full oracle equivalence
  * is the driver's t2 gate; tools/check.py runs it locally).
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("every declared query runs and yields rows on sf0.001") {
    QueryRegistry.all.foreach { q =>
      val n = q.fn(spark, sf).count()
      assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("oracle SQL exists for EVERY query — no rows-only exceptions") {
    val noOracle = QueryRegistry.all.filter(_.oracle.isEmpty).map(_.name).toSet
    // q38/q46 were the last two (probabilistic / trained): both now
    // train and search with cross-engine-deterministic arithmetic and
    // output per-probe recall the oracle hash-matches
    assert(noOracle.isEmpty, s"unexpected rows-only queries: $noOracle")
  }

  test("q113 PII counts follow the augmentation rule; scrubbing shrinks") {
    QueryRegistry.queries("q113_pii_scrub")(spark, sf).collect().foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_email") == (if (id % 3 != 0) 1L else 0L), s"doc $id email")
      assert(r.getAs[Long]("n_ip") == (if (id % 2 == 0) 2L else 1L), s"doc $id ip")
      assert(r.getAs[Long]("n_phone") == (if (id % 5 == 0) 1L else 0L), s"doc $id phone")
      assert(r.getAs[Long]("len_scrubbed") < r.getAs[Long]("len_raw"), s"doc $id len")
    }
  }

  test("q114 mixing weights are a distribution and alpha<1 flattens") {
    val rows = QueryRegistry.queries("q114_source_mixing")(spark, sf).collect()
    val wSum = rows.map(_.getAs[Double]("mix_weight")).sum
    assert(math.abs(wSum - 1.0) < 1e-4, s"weights sum $wSum")
    // temperature < 1 upsamples the smallest source, downsamples the largest
    val bySh = rows.sortBy(_.getAs[Double]("token_share"))
    assert(bySh.head.getAs[Double]("mix_weight") >=
      bySh.head.getAs[Double]("token_share"))
    assert(bySh.last.getAs[Double]("mix_weight") <=
      bySh.last.getAs[Double]("token_share"))
    rows.foreach(r => assert(r.getAs[Double]("eff_epochs") > 0))
  }

  test("q115 shards are contiguous in doc order and balanced") {
    val rows = QueryRegistry.queries("q115_shard_layout")(spark, sf).collect()
    val target = graft.text.TextQueries.ShardTargetBytes
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("shard") + 1 == b.getAs[Long]("shard"))
        // contiguity: next shard starts where this one ends
        assert(a.getAs[Long]("last_doc") + 1 == b.getAs[Long]("first_doc"))
      case _ => ()
    }
    // balance: every shard except the last reaches the target boundary
    // (a doc whose START is inside the shard belongs to it, so a shard
    // can only end once its byte range is filled)
    rows.dropRight(1).foreach { r =>
      assert(r.getAs[Long]("bytes") >= target - 10000,
        s"shard ${r.getAs[Long]("shard")} under-filled")
    }
  }

  test("q121 PQ/ADC: full candidate budget, recall within [0,1]") {
    val r = QueryRegistry.queries("q121_pq_adc_recall")(spark, sf).head()
    assert(r.getAs[Long]("n_candidates") == 50L)
    val rec = r.getAs[Double]("recall_at_10")
    assert(rec >= 0.0 && rec <= 1.0)
    assert(r.getAs[Long]("hits") == math.round(rec * 10))
    // the 16x-smaller-scan path must stay useful: at least half the
    // exact top-10 inside a 10%-of-corpus re-rank budget
    assert(rec >= 0.5, s"PQ recall degraded to $rec")
  }

  test("q122 chunks tile each document: stride, clamp, full coverage") {
    import graft.text.TextQueries.{ChunkW, ChunkS}
    val rows = QueryRegistry.queries("q122_doc_chunking")(spark, sf)
      .collect().groupBy(_.getAs[Long]("doc_id"))
    assert(rows.nonEmpty)
    rows.foreach { case (doc, ch) =>
      val sorted = ch.sortBy(_.getAs[Long]("chunk_id"))
      assert(sorted.head.getAs[Long]("start_tok") == 1L, s"doc $doc start")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("start_tok") -
            a.getAs[Long]("start_tok") == ChunkS, s"doc $doc stride")
        case _ => ()
      }
      sorted.foreach { r =>
        val n = r.getAs[Long]("n_chunk_tokens")
        assert(n > 0 && n <= ChunkW, s"doc $doc chunk width $n")
        assert(r.getAs[String]("chunk_text").split(" ").length == n)
      }
      // all but the last chunk are full-width; consecutive chunks
      // overlap by W - S tokens
      sorted.dropRight(1).foreach(r =>
        assert(r.getAs[Long]("n_chunk_tokens") == ChunkW))
    }
  }

  test("q123 surviving row is the earliest (ts, event_id) of its key") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        floor(col("value")).cast("long").as("vkey"),
        col("ts"), col("event_id")).collect()
      .groupBy(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val rows = QueryRegistry.queries("q123_event_dedup")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val key = (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("vkey"))
      val grp = ev(key)
      assert(grp.length == r.getAs[Long]("n_dups"))
      val kept = grp.minBy(g =>
        (g.getAs[java.time.LocalDateTime]("ts")
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli,
          g.getAs[Long]("event_id")))
      assert(kept.getAs[Long]("event_id") == r.getAs[Long]("kept_event_id"))
    }
  }

  test("q42 sketch error bounds hold (ok_* booleans all true)") {
    val r = QueryRegistry.queries("q42_approx_distinct")(spark, sf).head()
    Seq("ok_orders", "ok_parts", "ok_supps").foreach { c =>
      assert(r.getAs[Boolean](c), s"$c false: sketch outside 5% of exact")
    }
  }

  test("q46 IVF recall rows: one per probe, hits <= k <= n_candidates " +
      "bound, recall consistent with hits") {
    val rows = QueryRegistry.queries("q46_ann_ivf")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("probe_id")).toSet
      == (0L until 10L).toSet, "expected all 10 probes")
    rows.foreach { r =>
      val hits = r.getAs[Long]("hits")
      assert(hits >= 0 && hits <= 10)
      assert(r.getAs[Long]("n_candidates") > 0)
      assert(r.getAs[Double]("recall_at_10") == hits / 10.0)
    }
  }

  test("q38 LSH ANN: probe 0's ranked neighbors carry the exact cosine " +
      "(agrees with q31 where they overlap) and per-probe recall is " +
      "consistent") {
    val rows = QueryRegistry.queries("q38_ann_lsh")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("probe_id")).toSet == (0L until 10L).toSet)
    val exact = QueryRegistry.queries("q31_cosine_topk")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val p0 = rows.filter(_.getAs[Long]("probe_id") == 0L)
    assert(p0.nonEmpty, "probe 0 returned no neighbors")
    // same re-ranking arithmetic as the brute force: overlapping ids
    // must score identically
    p0.foreach { r =>
      exact.get(r.getAs[Long]("nbr_id")).foreach(c =>
        assert(c == r.getAs[Double]("cos_sim"),
          s"score mismatch for ${r.getAs[Long]("nbr_id")}"))
    }
    rows.foreach { r =>
      val hits = r.getAs[Long]("hits")
      assert(r.getAs[Double]("recall_at_10") == hits / 10.0)
      assert(r.getAs[Long]("rnk") >= 1 && r.getAs[Long]("rnk") <= 10)
    }
  }

  test("q52 sketch percentiles stay within the declared bound per group") {
    val rows = QueryRegistry.queries("q52_approx_percentiles")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("ok_p50"), s"${r.getString(0)} p50 outside bound")
      assert(r.getAs[Boolean]("ok_p90"), s"${r.getString(0)} p90 outside bound")
    }
  }

  test("q61 quantization error is within the rounding bound per vector") {
    // symmetric int8 with q = floor(v/scale + 0.5): per-dim error is at
    // most scale/2, so the L2 error is bounded by sqrt(64) * scale / 2.
    QueryRegistry.queries("q61_embedding_quantize")(spark, sf).collect()
      .foreach { r =>
        val scale = r.getAs[Double]("scale")
        val err = r.getAs[Double]("l2_err")
        assert(err <= math.sqrt(64.0) * scale / 2 + 1e-9,
          s"vec ${r.get(0)}: err $err exceeds bound for scale $scale")
      }
  }

  test("q55 tfidf ranks are dense 1..3 per doc with descending scores") {
    val byDoc = QueryRegistry.queries("q55_tfidf")(spark, sf).collect()
      .groupBy(_.getLong(0))
    byDoc.foreach { case (doc, rows) =>
      val byRank = rows.sortBy(_.getLong(1))
      assert(byRank.map(_.getLong(1)).toSeq == (1L to byRank.length).toSeq)
      val scores = byRank.map(_.getAs[Double]("score")).toSeq
      assert(scores == scores.sorted.reverse, s"doc $doc not descending")
    }
  }

  test("q19 distinct flags: exactly the 6 known (rf, ls) pairs") {
    val rows = QueryRegistry.queries("q19_distinct_flags")(spark, sf).collect()
    assert(rows.length == 6)
  }

  test("q31 cosine topk returns 10 neighbors with sim in [-1, 1]") {
    val rows = QueryRegistry.queries("q31_cosine_topk")(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach(r => assert(math.abs(r.getAs[Double]("cos_sim")) <= 1.0))
  }

  test("q73 z-order tiles are axis-aligned 4x4 spatial blocks") {
    val rows = QueryRegistry.queries("q73_zorder_layout")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (zLo, zHi) = (r.getAs[Int]("z_lo"), r.getAs[Int]("z_hi"))
      val (xLo, xHi) = (r.getAs[Int]("x_lo"), r.getAs[Int]("x_hi"))
      // a contiguous morton>>4 range = one aligned 4x4 block: both axes
      // span within a single aligned 4-stride
      assert(zLo / 4 == zHi / 4 && xLo / 4 == xHi / 4,
        s"tile not an aligned 4x4 block: $r")
      assert(r.getAs[Long]("n_cells") == 16L, s"tile not dense: $r")
    }
  }

  test("minhash estimates track exact jaccard for high-sim pairs") {
    import org.apache.spark.sql.functions._
    val est = dedup.DedupQueries.minhashPairs(spark, sf)
      .filter(col("est_jaccard") >= 0.75).limit(20).collect()
    if (est.nonEmpty) {
      val exact = QueryRegistry.queries("q29_jaccard_vs_doc0")(spark, sf)
      // spot-check shape only here; numeric agreement is probabilistic.
      assert(exact.columns.toSeq == Seq("doc_id", "jaccard"))
    }
  }

  test("q124 segment dedup conserves segments; survivors = distinct segs") {
    import org.apache.spark.sql.functions._
    val rows = QueryRegistry.queries("q124_segment_dedup")(spark, sf).collect()
    rows.foreach { r =>
      val (tot, kept) = (r.getAs[Long]("n_segments"), r.getAs[Long]("n_kept"))
      assert(kept <= tot && kept >= 0, s"doc ${r.get(0)}: kept $kept of $tot")
      // the reassembled text holds exactly the kept segments
      val txt = r.getAs[String]("text_kept")
      if (kept == 0) assert(txt.isEmpty)
    }
    // every distinct segment survives exactly once corpus-wide
    val segs = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(explode(expr(
        s"transform(sequence(0, cast(ceil(size(toks) / ${dedup.DedupQueries.SegW}.0) as int) - 1, 1), " +
          s"k -> concat_ws(' ', slice(toks, k * ${dedup.DedupQueries.SegW} + 1, ${dedup.DedupQueries.SegW})))"))
        .as("seg"))
    val distinctSegs = segs.distinct().count()
    assert(rows.map(_.getAs[Long]("n_kept")).sum == distinctSegs)
    assert(rows.map(_.getAs[Long]("n_segments")).sum == segs.count())
  }

  test("q125 containment is asymmetric and above threshold") {
    val rows =
      QueryRegistry.queries("q125_containment_pairs")(spark, sf).collect()
    assert(rows.nonEmpty)
    val t = dedup.DedupQueries.ContainT
    rows.foreach { r =>
      val c = r.getAs[Double]("containment")
      assert(c >= t - 1e-9 && c <= 1.0 + 1e-9, s"containment $c out of band")
      assert(r.getAs[Long]("doc_a") != r.getAs[Long]("doc_b"))
    }
    // near-identical docs must contain each other in BOTH directions
    // (a fully-contained SMALLER doc needn't contain the larger one,
    // so only the existence of one mutual pair is asserted)
    val both = rows.map(r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(both.exists { case (a, b) => both.contains((b, a)) },
      "expected at least one mutually-containing (near-identical) pair")
  }

  test("q126 rerank emits dense ranks with non-increasing scores per query") {
    val rows =
      QueryRegistry.queries("q126_retrieve_rerank")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (qid, rs) =>
      assert(qid % text.TextQueries.RetrQMod == 0, s"qid $qid not a query doc")
      val byRank = rs.sortBy(_.getAs[Long]("rank"))
      assert(byRank.map(_.getAs[Long]("rank")).toSeq ==
        (1L to byRank.length).toSeq, s"ranks not dense for $qid")
      assert(byRank.length <= text.TextQueries.RerankK)
      val scores = byRank.map(_.getAs[Double]("score"))
      assert(scores.zip(scores.drop(1)).forall { case (a, b) => a >= b },
        s"scores increase within query $qid")
    }
  }

  test("q127 stratified sample: per-stratum counts bounded and en-biased") {
    val rows =
      QueryRegistry.queries("q127_stratified_sample")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sampled") <= r.getAs[Long]("n_total")) }
    // aggregate rates: en keeps ~50%, others ~20%; with LCG determinism
    // the corpus-level totals must at least ORDER that way when both
    // strata are populated
    val en = rows.filter(_.getAs[String]("lang") == "en")
    val other = rows.filter(_.getAs[String]("lang") != "en")
    if (en.nonEmpty && other.nonEmpty) {
      def rate(rs: Array[org.apache.spark.sql.Row]) =
        rs.map(_.getAs[Long]("n_sampled")).sum.toDouble /
          math.max(1L, rs.map(_.getAs[Long]("n_total")).sum)
      assert(rate(en) > rate(other),
        s"en rate ${rate(en)} not above other ${rate(other)}")
    }
  }

  test("q128 BPE pairs: 2-char pairs, counts non-increasing, top cap") {
    val rows =
      QueryRegistry.queries("q128_bpe_pair_merges")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= text.TextQueries.BpeTopN)
    rows.foreach(r => assert(r.getAs[String]("pair").length == 2))
    val cnts = rows.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.drop(1)).forall { case (a, b) => a >= b })
  }

  test("q131 SCD2 intervals tile each user's history without overlap") {
    val rows = QueryRegistry.queries("q131_scd2_history")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rs) =>
      val seq = rs.sortBy(_.getAs[java.time.LocalDateTime]("valid_from"))
      seq.sliding(2).foreach {
        case Array(a, b) =>
          // contiguous: each interval closes exactly where the next opens
          assert(a.getAs[java.time.LocalDateTime]("valid_to") ==
            b.getAs[java.time.LocalDateTime]("valid_from"),
            s"gap/overlap in user $u history")
          // compacted: consecutive states differ
          assert(a.getAs[String]("event_type") !=
            b.getAs[String]("event_type"), s"uncompacted repeat for $u")
        case _ => ()
      }
      // the open interval closes at the sentinel
      assert(seq.last.getAs[java.time.LocalDateTime]("valid_to")
        .getYear == 9999, s"user $u last interval not open-ended")
    }
  }

  test("q132 keep is the conjunction of its rule flags; rules both fire") {
    val rows = QueryRegistry.queries("q132_quality_filter")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val conj = r.getAs[Boolean]("ok_len") && r.getAs[Boolean]("ok_wordlen") &&
        r.getAs[Boolean]("ok_stop") && r.getAs[Boolean]("ok_rep")
      assert(r.getAs[Boolean]("keep") == conj, s"keep != conjunction: $r")
    }
    // the thresholds are tuned to split the corpus: some kept, some not
    assert(rows.exists(_.getAs[Boolean]("keep"))
      && rows.exists(!_.getAs[Boolean]("keep")),
      "quality filter did not split the corpus")
  }

  test("q129 phrase hits point at real adjacent occurrences") {
    import org.apache.spark.sql.functions._
    val rows = QueryRegistry.queries("q129_phrase_search")(spark, sf).collect()
    assert(rows.nonEmpty)
    val texts = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    rows.foreach { r =>
      val toks = texts(r.getAs[Long]("doc_id")).split(" ")
      val p = r.getAs[Long]("first_pos").toInt // 1-based
      assert(toks(p - 1) == text.TextQueries.PhraseA
        && toks(p) == text.TextQueries.PhraseB,
        s"first_pos $p is not a phrase occurrence in doc ${r.get(0)}")
      assert(r.getAs[Long]("n_hits") >= 1)
    }
  }

  test("q133 pagerank: top-20 ordered, positive, mass below the total") {
    val rows =
      QueryRegistry.queries("q133_copurchase_pagerank")(spark, sf).collect()
    assert(rows.length == 20)
    val ranks = rows.map(_.getAs[Double]("pagerank"))
    assert(ranks.zip(ranks.drop(1)).forall { case (a, b) => a >= b },
      "top-20 not rank-ordered")
    assert(ranks.forall(_ > 0) && ranks.sum < 1.0,
      "ranks must be a positive sub-unit share of total mass")
    rows.foreach(r => assert(r.getAs[Long]("copurchase_w") >= 1))
  }

  test("q134 outlier flag is the z-threshold; the filter splits labels") {
    val rows =
      QueryRegistry.queries("q134_embedding_outlier")(spark, sf).collect()
    assert(rows.length ==
      Tables.embeddings(spark, sf).count().toInt)
    rows.foreach { r =>
      val cos = r.getAs[Double]("cos_centroid")
      assert(cos <= 1.000001 && cos >= -1.000001)
      assert(r.getAs[Boolean]("is_outlier") == (r.getAs[Double]("z") > 1.0))
    }
    assert(rows.exists(_.getAs[Boolean]("is_outlier"))
      && rows.exists(!_.getAs[Boolean]("is_outlier")),
      "z-threshold did not split the corpus")
  }

  test("q135 peak concurrency matches a driver-side sweep of the sessions") {
    val row =
      QueryRegistry.queries("q135_peak_concurrency")(spark, sf).collect()
    assert(row.length == 1)
    // independent oracle: re-derive sessions naively from the raw events
    // and sweep the closed intervals in plain Scala
    val evs = Tables.events(spark, sf)
      .select(col("user_id"),
        org.apache.spark.sql.functions.unix_micros(col("ts").cast("timestamp")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sessions = evs.groupBy(_._1).values.flatMap { es =>
      val ts = es.map(_._2).sorted
      val bounds = scala.collection.mutable.ArrayBuffer((ts.head, ts.head))
      ts.drop(1).foreach { t =>
        if (t - bounds.last._2 > 1800000000L) bounds += ((t, t))
        else bounds(bounds.length - 1) = (bounds.last._1, t)
      }
      bounds
    }.toSeq
    val peaks = sessions.map(_._1).distinct.map { t =>
      sessions.count { case (s, e) => s <= t && e >= t }
    }
    assert(row.head.getAs[Long]("peak_sessions") == peaks.max.toLong,
      s"sweep-line peak ${row.head} != naive ${peaks.max}")
    assert(row.head.getAs[Long]("n_sessions") == sessions.size.toLong)
  }

  test("q136 A-ES sample: dense ranks, keys in [0,1] descending, long-doc bias") {
    val rows =
      QueryRegistry.queries("q136_weighted_sample")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val seq = rs.sortBy(_.getAs[Long]("rk"))
      assert(seq.map(_.getAs[Long]("rk")).toSeq == (1L to seq.length).toSeq)
      val keys = seq.map(_.getAs[Double]("es_key"))
      assert(keys.forall(k => k >= 0.0 && k <= 1.0))
      assert(keys.zip(keys.drop(1)).forall { case (a, b) => a >= b })
    }
    // weight = n_chars: the weighted sample must skew longer than the
    // corpus average (the property A-ES exists to provide)
    val lens = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sampledMean = rows.map(r => lens(r.getAs[Long]("doc_id"))).sum
      .toDouble / rows.length
    val corpusMean = lens.values.sum.toDouble / lens.size
    assert(sampledMean > corpusMean,
      s"weighted sample mean length $sampledMean not above corpus $corpusMean")
  }

  test("q137 hard negatives: one per vector, strictly cross-label, valid cos") {
    val rows =
      QueryRegistry.queries("q137_hard_negatives")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == rows.length,
      "more than one negative emitted for some vector")
    rows.foreach { r =>
      assert(r.getAs[Int]("label") != r.getAs[Int]("neg_label"),
        s"same-label pair leaked: $r")
      assert(r.getAs[Long]("vec_id") != r.getAs[Long]("neg_id"))
      val c = r.getAs[Double]("cos")
      assert(c <= 1.000001 && c >= -1.000001)
    }
  }

  test("q138 source sketches: ordered pairs, estimates track exact jaccard") {
    val docs = Tables.documents(spark, sf)
    val rows =
      QueryRegistry.queries("q138_source_sketch_union")(spark, sf).collect()
    assert(rows.nonEmpty)
    // every unordered source pair appears (the declared query is the
    // sketch-only dashboard — no pair can vanish through an exact join)
    val nSrc = docs.select("source").distinct().count()
    assert(rows.length == (nSrc * (nSrc - 1) / 2).toInt)
    rows.foreach { r =>
      assert(r.getAs[String]("src_a") < r.getAs[String]("src_b"))
      val est = r.getAs[Double]("est_jaccard")
      assert(est >= 0.0 && est <= 1.0)
    }
    // calibration probe: estimates track token-level exact Jaccard.
    // 16 permutations: sd = sqrt(J(1-J)/16) <= 0.125; the 0.5 band is
    // conservative — a break means the sketch merge is wrong, not that
    // the estimator is noisy
    val cal = graft.dedup.DedupQueries.exactSourceJaccardOf(docs).collect()
    assert(cal.length == rows.length)
    cal.foreach { r =>
      val est = r.getAs[Double]("est_jaccard")
      val ex = r.getAs[Double]("exact_jaccard")
      assert(ex >= 0.0 && ex <= 1.0)
      assert(math.abs(est - ex) <= 0.5,
        s"sketch estimate $est implausibly far from exact $ex")
    }
    graft.CacheScope.flush(spark)
  }

  test("q140 BPE trainer: hand-computed merges, leftmost re-segmentation") {
    import spark.implicits._
    // words: aaab x3, ab x2.
    //  iter1 pairs: (a,a)=6, (a,b)=5        -> merge (a,a)
    //  iter2 (aaab=[aa,a,b]): (a,b)=3+2=5, (aa,a)=3 -> merge (a,b)
    //  iter3 (aaab=[aa,ab], ab=[ab]): (aa,ab)=3     -> merge (aa,ab)
    //  iter4: no pairs left -> no row (trainer stops early)
    val docs = Seq((0L, "aaab aaab ab"), (1L, "aaab ab"))
      .toDF("doc_id", "text")
    val out = graft.text.BpeTrainer.bpeTrainerOf(docs)
      .collect().map(r => (r.getAs[Int]("step"), r.getAs[String]("pair"),
        r.getAs[Long]("cnt"))).toSeq
    assert(out == Seq((1, "a a", 6L), (2, "a b", 5L), (3, "aa ab", 3L)))
    graft.CacheScope.flush(spark)
  }

  test("q140 BPE trainer first merge agrees with q128's top pair") {
    val trained = QueryRegistry.queries("q140_bpe_trainer")(spark, sf)
      .collect()
    assert(trained.length == graft.text.BpeTrainer.BpeIters)
    val first = trained.minBy(_.getAs[Int]("step"))
    val q128 = QueryRegistry.queries("q128_bpe_pair_merges")(spark, sf)
      .collect().head
    assert(first.getAs[String]("pair").replace(" ", "")
      == q128.getAs[String]("pair"))
    assert(first.getAs[Long]("cnt") == q128.getAs[Long]("cnt"))
    graft.CacheScope.flush(spark)
  }

  test("q141 BPE encode: token counts bracketed; trained merges compress") {
    val rows = QueryRegistry.queries("q141_bpe_encode")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nw = r.getAs[Long]("n_words"); val nt = r.getAs[Long]("n_tokens")
      assert(nw >= 1 && nt >= nw,
        s"each word costs at least one symbol: $r")
      assert(r.getAs[Double]("chars_per_token") >= 1.0)
    }
    // against a 0-merge (pure character) encoding, the 4 adopted merges
    // must strictly shrink the corpus token count
    val docs = Tables.documents(spark, sf)
    val t4 = rows.map(_.getAs[Long]("n_tokens")).sum
    val t0 = graft.text.BpeTrainer.bpeEncodeOf(docs, 0).collect()
      .map(_.getAs[Long]("n_tokens")).sum
    assert(t4 < t0, s"merges did not compress: $t4 !< $t0")
    graft.CacheScope.flush(spark)
  }

  test("q146 (artifact-served encode) equals q141 (recompute) row for row") {
    val a = QueryRegistry.queries("q141_bpe_encode")(spark, sf)
      .collect().toSeq
    graft.CacheScope.flush(spark)
    val b = QueryRegistry.queries("q146_bpe_encode_served")(spark, sf)
      .collect().toSeq
    graft.CacheScope.flush(spark)
    assert(a.nonEmpty && a == b)
  }

  test("q132 repetition stat is the max token count, linear on long docs") {
    import spark.implicits._
    // 200k tokens, all distinct except one token repeated 37 times:
    // the retired per-distinct-token scan shape was O(L^2) here
    // (~4x10^10 comparisons); the one-pass sorted-run form must handle
    // it in bounded time
    val n = 200000
    val toks = (0 until n).map(i => s"t$i") ++ Seq.fill(36)("t42")
    val df = Seq((toks.mkString(" "))).toDF("text")
    val got = df.select(graft.text.TextQueries.maxTokenCount(
      org.apache.spark.sql.functions.split(col("text"), " ")).as("m"))
      .head().getAs[Int]("m")
    assert(got == 37)
    // degenerate shapes
    val e = Seq(("solo"), ("x x x")).toDF("text")
      .select(graft.text.TextQueries.maxTokenCount(
        org.apache.spark.sql.functions.split(col("text"), " ")).as("m"))
      .collect().map(_.getAs[Int]("m")).toSeq
    assert(e == Seq(1, 3))
  }

  test("q158 n-gram repetition signals match hand-computed fixtures") {
    import spark.implicits._
    // doc 1 "a b a b a b": top 2-gram 'a b' x3 covers 3*2=6 of 6 chars
    // (frac 1.0); 3-gram tie (2x each) breaks to the LARGER gram
    // 'b a b' -> 2*3=6 (1.0); 4-gram 'a b a b' x2 -> 2*4=8 (1.3333);
    // no 5-gram repeats. doc 2: 30 distinct 2-char tokens -> every
    // top gram is a 1-count (lex-largest wins), all dup fracs 0, keeps.
    val toks30 = (1 to 30).map(i => f"t${i}%02d")
    val df = Seq((1L, "a b a b a b"), (2L, toks30.mkString(" ")))
      .toDF("doc_id", "text")
    val rows = graft.text.TextQueries.repetitionSignalsOf(df)
      .orderBy("doc_id").collect()
    val a = rows(0)
    assert(a.getAs[Double]("top_2_frac") == 1.0)
    assert(a.getAs[Double]("top_3_frac") == 1.0)
    assert(a.getAs[Double]("top_4_frac") == 1.3333)
    assert(a.getAs[Double]("dup_5_frac") == 0.0)
    assert(!a.getAs[Boolean]("keep_ngram"))
    val b = rows(1)
    // 30 tokens x 3 chars = 90; lex-largest among the 1-count 2-grams
    // is 't29 t30' (7 chars) -> 1*(7-1)/90 = 0.0667
    assert(b.getAs[Double]("top_2_frac") == 0.0667)
    assert(b.getAs[Double]("top_3_frac") == 0.1)
    assert(b.getAs[Double]("top_4_frac") == 0.1333)
    assert(b.getAs[Double]("dup_10_frac") == 0.0)
    assert(b.getAs[Boolean]("keep_ngram"))
    graft.CacheScope.flush(spark)
  }

  test("q158 line/paragraph repetition signals match hand-computed fixtures") {
    import spark.implicits._
    // doc 1 (no line augmentation): L=4, P=3; 12 toks -> lines
    // [pqrs, pqrs, abcd] -> 2 of 3 slots duplicated (0.6667); one
    // paragraph -> dup_para 0. doc 6 (augmented): L=4, P=2; 8 distinct
    // toks -> [l1,l2] ++ 3x[l1,l2] -> all 8 slots dup (1.0), all 4
    // paragraphs identical (1.0).
    val df = Seq(
      (1L, "p q r s p q r s a b c d"),
      (6L, "e f g h i j k l")).toDF("doc_id", "text")
    val rows = graft.text.TextQueries.lineRepetitionSignalsOf(df)
      .orderBy("doc_id").collect()
    assert(rows(0).getAs[Double]("dup_line_frac") == 0.6667)
    assert(rows(0).getAs[Double]("dup_para_frac") == 0.0)
    assert(!rows(0).getAs[Boolean]("keep_line"))
    assert(rows(1).getAs[Double]("dup_line_frac") == 1.0)
    assert(rows(1).getAs[Double]("dup_para_frac") == 1.0)
    assert(!rows(1).getAs[Boolean]("keep_line"))
    graft.CacheScope.flush(spark)
  }

  test("q158 augmentation fires every signal family; keep is the conjunction") {
    val rows = QueryRegistry.queries("q158_repetition_signals")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val th = graft.text.TextQueries.RepThreshold
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      // the self-repeat augmentation guarantees within-doc >=5-gram
      // repeats on every 4th doc; line re-append guarantees duplicate
      // lines AND paragraphs on every 6th
      if (id % 4 == 0) assert(r.getAs[Double]("dup_5_frac") > 0, s"doc $id")
      if (id % 6 == 0) {
        assert(r.getAs[Double]("dup_line_frac") > 0, s"doc $id")
        assert(r.getAs[Double]("dup_para_frac") > 0, s"doc $id")
      }
      val keep = (2 to 4).forall(n =>
        r.getAs[Double](s"top_${n}_frac") <= th(n)) &&
        (5 to 10).forall(n => r.getAs[Double](s"dup_${n}_frac") <= th(n)) &&
        r.getAs[Double]("dup_line_frac") <=
          graft.text.TextQueries.RepLineThreshold &&
        r.getAs[Double]("dup_para_frac") <=
          graft.text.TextQueries.RepParaThreshold
      assert(r.getAs[Boolean]("keep_repetition") == keep, s"doc $id keep")
    }
    // both fates occur — the gate is not vacuous on the corpus
    assert(rows.exists(_.getAs[Boolean]("keep_repetition")))
    assert(rows.exists(!_.getAs[Boolean]("keep_repetition")))
    graft.CacheScope.flush(spark)
  }

  test("q145 skew profile: dense ranks, non-increasing counts, sane shares") {
    val rows = QueryRegistry.queries("q145_skew_profile")(spark, sf)
      .collect()
    assert(rows.nonEmpty
      && rows.length <= relational.RelationalQueries.SkewTopK)
    assert(rows.map(_.getAs[Long]("rk")).toSeq
      == (1L to rows.length).toSeq)
    val cnts = rows.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.drop(1)).forall { case (a, b) => a >= b })
    var cum = 0.0
    rows.foreach { r =>
      val share = r.getAs[Double]("share_pct")
      val cumShare = r.getAs[Double]("cum_share_pct")
      assert(share > 0.0 && share <= 100.0)
      assert(cumShare >= cum - 1e-9 && cumShare <= 100.0 + 1e-9)
      cum = cumShare
      assert(r.getAs[Double]("x_mean") > 0.0)
    }
    graft.CacheScope.flush(spark)
  }

  test("q144 curation attrition is monotone and consistent with " +
      "q132 and q158") {
    val rows = QueryRegistry.queries("q144_curation_pipeline")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (raw, q, rep, dd, s) = (r.getAs[Long]("n_raw"),
        r.getAs[Long]("n_quality"), r.getAs[Long]("n_repetition"),
        r.getAs[Long]("n_dedup"), r.getAs[Long]("n_sampled"))
      assert(raw >= q && q >= rep && rep >= dd && dd >= s && s >= 0,
        s"attrition not monotone: $r")
    }
    // stage-1 totals must equal q132's keep count exactly
    val qTotal = rows.map(_.getAs[Long]("n_quality")).sum
    val q132Keep = QueryRegistry.queries("q132_quality_filter")(spark, sf)
      .filter(col("keep")).count()
    assert(qTotal == q132Keep, s"quality stage $qTotal != q132 $q132Keep")
    // stage-2 totals must equal |q132 keep ∩ q158 keep_repetition|:
    // the composed gate IS the standalone dashboards' conjunction
    val repTotal = rows.map(_.getAs[Long]("n_repetition")).sum
    val want = QueryRegistry.queries("q132_quality_filter")(spark, sf)
      .filter(col("keep")).select("doc_id")
      .join(QueryRegistry.queries("q158_repetition_signals")(spark, sf)
        .filter(col("keep_repetition")).select("doc_id"), "doc_id")
      .count()
    assert(repTotal == want, s"repetition stage $repTotal != $want")
    // the stage must genuinely fire on the synthetic corpus
    assert(repTotal < qTotal,
      "repetition gate dropped nothing — augmentation not firing?")
    graft.CacheScope.flush(spark)
  }

  test("q143 CMS mergeability: half-corpus sketches merge to the whole") {
    import org.apache.spark.sql.functions._
    import graft.text.TextQueries.{HhEps, HhConf, HhSeed}
    val docs = Tables.documents(spark, sf)
    def toks(d: org.apache.spark.sql.DataFrame) =
      d.select(explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
    def sketch(d: org.apache.spark.sql.DataFrame) =
      org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(
          toks(d).agg(count_min_sketch(col("token"), lit(HhEps),
            lit(HhConf), lit(HhSeed)).as("c"))
            .head().getAs[Array[Byte]]("c")))
    val whole = sketch(docs)
    val merged = sketch(docs.filter(col("doc_id") % 2 === 0))
    merged.mergeInPlace(sketch(docs.filter(col("doc_id") % 2 === 1)))
    assert(merged.totalCount() == whole.totalCount())
    val vocab = toks(docs).distinct().collect().map(_.getString(0))
    assert(vocab.nonEmpty)
    vocab.foreach { t =>
      assert(merged.estimateCount(t) == whole.estimateCount(t),
        s"merge law broken for token '$t'")
    }
  }

  test("q149 explain covers every q30 pair with a real band trail") {
    val pairs = QueryRegistry.queries("q30_minhash_lsh_pairs")(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.CacheScope.flush(spark)
    val rows = QueryRegistry.queries("q149_neardup_explain")(spark, sf)
      .collect()
    // every verified pair appears exactly once, and vice versa
    assert(rows.map(r => (r.getAs[Long]("doc_a"),
      r.getAs[Long]("doc_b"))).toSet == pairs)
    assert(rows.length == pairs.size)
    val nBands = graft.dedup.DedupQueries.NumHashes /
      graft.dedup.DedupQueries.BandRows
    rows.foreach { r =>
      val bands = r.getAs[String]("shared_bands").split(",").map(_.toInt)
      assert(bands.nonEmpty && bands.sameElements(bands.sorted))
      assert(bands.forall(b => b >= 0 && b < nBands))
      assert(r.getAs[Long]("n_shared") == bands.length)
    }
    graft.CacheScope.flush(spark)
  }

  test("q148 cascade: total partition of the corpus, exact stage exact") {
    val rows = QueryRegistry.queries("q148_dedup_cascade")(spark, sf)
      .collect()
    val docs = Tables.documents(spark, sf)
    assert(rows.length == docs.count())
    val byStatus = rows.groupBy(_.getAs[String]("status"))
      .view.mapValues(_.length).toMap
    assert(byStatus.keySet.subsetOf(
      Set("kept", "exact_dup", "near_dup", "semantic_dup")))
    assert(byStatus.getOrElse("kept", 0) > 0)
    // the exact stage must drop exactly (docs - distinct texts)
    val distinctTexts = docs.select("text").distinct().count()
    assert(byStatus.getOrElse("exact_dup", 0)
      == (docs.count() - distinctTexts))
    graft.CacheScope.flush(spark)
  }

  test("q147 filtered ANN: predicate enforced, dense ranks, ordered sims") {
    val rows = QueryRegistry.queries("q147_filtered_ann")(spark, sf)
      .collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.map(_.getAs[Long]("rank")).toSeq
      == (1L to rows.length).toSeq)
    rows.foreach { r =>
      assert(r.getAs[Int]("label") % 2 == 1,
        s"even-label vector leaked through the filter: $r")
      val c = r.getAs[Double]("cos_sim")
      assert(c >= -1.000001 && c <= 1.000001)
    }
    val sims = rows.map(_.getAs[Double]("cos_sim"))
    assert(sims.zip(sims.drop(1)).forall { case (a, b) => a >= b })
    graft.CacheScope.flush(spark)
  }

  test("q142 centroid drift: every vector lands in exactly one base list") {
    val rows = QueryRegistry.queries("q142_centroid_drift")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    // the frozen quantizer assigns the WHOLE corpus (base + arrivals):
    // membership must total the corpus exactly
    val total = rows.map(_.getAs[Long]("n_members")).sum
    val n = Tables.embeddings(spark, sf).count()
    assert(total == n, s"list membership $total != corpus size $n")
    rows.filter(_.getAs[Long]("n_members") > 0).foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("drift"))
        && r.getAs[Double]("drift") >= 0.0, s"bad drift: $r")
    }
    graft.CacheScope.flush(spark)
  }

  test("q157 relative gate: per-source score cut is clean, ties uniform, " +
      "degenerate sources kept whole") {
    import spark.implicits._
    val rows =
      QueryRegistry.queries("q157_source_quality_gate")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val (kept, dropped) = rs.partition(_.getAs[Boolean]("keep"))
      assert(kept.nonEmpty, s"source $src kept nothing")
      // the gate is a clean score cut, strict because equal scores
      // must share a fate
      if (dropped.nonEmpty)
        assert(kept.map(_.getAs[Double]("score")).min
          > dropped.map(_.getAs[Double]("score")).max,
          s"$src cut not clean / split a score tie across the gate")
      // tie-aware percentile: same score -> same pct
      rs.groupBy(_.getAs[Double]("score")).foreach { case (_, g) =>
        assert(g.map(_.getAs[Double]("pct")).distinct.length == 1)
      }
    }
    // degenerate partitions: an all-tied source and a single-doc source
    // have NO bottom share — the gate must keep them whole (cume_dist
    // is 1.0 everywhere; percent_rank would drop the entire feed)
    val tied = graft.text.TextQueries.sourceQualityGate(Seq(
      (0L, "alpha beta gamma", "tied"), (1L, "alpha beta gamma", "tied"),
      (2L, "alpha beta gamma", "tied"), (3L, "solo doc here", "single"))
      .toDF("doc_id", "text", "source")).collect()
    assert(tied.length == 4 && tied.forall(_.getAs[Boolean]("keep")),
      s"degenerate sources must be kept whole: ${tied.mkString(",")}")
  }

  test("q139 domain matrix: full SxS, own-domain model scores its text best") {
    val rows =
      QueryRegistry.queries("q139_domain_mismatch")(spark, sf).collect()
    val srcs = rows.map(_.getAs[String]("lm_source")).distinct
    assert(rows.length == srcs.length * srcs.length, "matrix not full SxS")
    rows.groupBy(_.getAs[String]("scored_source")).foreach { case (sc, rs) =>
      val best = rs.maxBy(_.getAs[Double]("avg_logprob"))
      assert(best.getAs[String]("lm_source") == sc,
        s"source $sc scored higher under ${best.getAs[String]("lm_source")}'s LM")
    }
  }

  test("q184 vocab coverage: Zipf curve agrees with a driver-side " +
    "recount — ranks, counts, and cumulative shares") {
    val rows = QueryRegistry.queries("q184_vocab_coverage")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    // driver-side recount from the same whitespace convention
    val texts = graft.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0))
    val freq = texts.flatMap(_.split(" ", -1))
      .groupBy(identity).map { case (t, o) => (t, o.length.toLong) }
    // sf0.001's vocabulary is smaller than the curve depth — the
    // curve covers what exists
    assert(rows.length ==
      math.min(graft.text.TextQueries.VocabCurveK, freq.size))
    val total = freq.values.sum.toDouble
    val want = freq.toSeq.sortBy { case (t, n) => (-n, t) }
      .take(graft.text.TextQueries.VocabCurveK)
    def r6(x: Double) = BigDecimal.valueOf(x)
      .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    var cum = 0L
    want.zipWithIndex.foreach { case ((tok, n), i) =>
      cum += n
      val (gRank, gTok, gN, gShare) = rows(i)
      assert(gRank == i + 1 && gTok == tok && gN == n,
        s"rank ${i + 1}: got ($gTok, $gN), want ($tok, $n)")
      assert(gShare == r6(cum / total),
        s"rank ${i + 1} share $gShare != ${r6(cum / total)}")
    }
    // the curve is monotone and the head carries real mass
    assert(rows.map(_._4).sliding(2).forall(p => p(0) <= p(1)))
    assert(rows.last._4 > 0.0 && rows.last._4 <= 1.0)
  }

  test("q189 markup extraction recovers exactly the original text plus " +
    "the decoded entity tail; no tag or entity survives") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = QueryRegistry.queries("q189_markup_extract")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(rows.length == docs.size)
    rows.foreach { case (id, clean, n) =>
      val want = s"${docs(id)} from <corpus> & doc A${id % 10}"
      assert(clean == want, s"doc $id: '$clean' != '$want'")
      assert(n == clean.split(" ", -1).length)
      assert(!clean.contains("<script") && !clean.contains("&#")
        && !clean.contains("boilerplate footer")
        && !clean.contains("home | about"))
    }
    // the one-copy rule chain, off-corpus: nested/multiline blocks,
    // every entity, quotes inside attributes, footer boilerplate,
    // comments CARRYING markup (must vanish whole, before the block
    // rules — a commented-out <script> must not open a block match),
    // and a quoted '>' inside an attribute value (must not truncate
    // the tag strip mid-tag)
    import spark.implicits._
    val crafted = "<html><head><title>t</title>\n<style>\nbody{}\n" +
      "</style></head><body><nav>\nmenu\n</nav>" +
      // CDATA whose tail would LEAK if the tag strip saw it first
      // (`<![CDATA[x >` parses as one tag, stranding `1]] >` etc.)
      "<![CDATA[x > 1 && <b>raw</b> --> tail]]>" +
      // UNCLOSED <script> inside the comment: if blocks ran before
      // comments, (?is)<script.*?</script> would match from here
      // through the real </SCRIPT> below and swallow the keep-text
      "<!-- draft:\n<script>evil()\n<p>old copy</p> -->" +
      "<img alt=\"w > h\" src=\"/i.png\"><div class=\"a b\" " +
      "data-x='1'>keep &quot;this&quot; &apos;text&apos; &lt;ok&gt; " +
      "&amp; more</div><SCRIPT>\nif (1 < 2) { x(); }\n</SCRIPT>" +
      "<Footer>\ncopyright\n</Footer></body></html>"
    val got = Seq(crafted).toDF("h")
      .select(graft.text.TextQueries.markupExtract(col("h")).as("c"))
      .head().getString(0)
    // uppercase/mixed-case blocks drop too — real crawls are not
    // lowercase, and a case-sensitive block rule would tag-strip
    // <SCRIPT> and admit the JavaScript text into the corpus
    assert(got == "keep \"this\" 'text' <ok> & more", s"got '$got'")
  }

  test("q193 URL canonicalization is non-vacuous: real dup clusters " +
    "exist, per-domain caps fire both ways, no markup of messiness " +
    "survives, and every doc lands in exactly one canonical") {
    val nDocs = graft.Tables.documents(spark, sf).count()
    val rows = QueryRegistry.queries("q193_url_canonical_dedup")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    // partition: canonicals' doc counts sum to the corpus
    assert(rows.map(_._4).sum == nDocs)
    // genuine dup clusters AND singletons
    assert(rows.exists(_._4 > 1) && rows.exists(_._4 == 1))
    // both cap branches fire and ranks are per-domain consecutive
    assert(rows.exists(_._6) && rows.exists(!_._6))
    rows.groupBy(_._2).foreach { case (dom, rs) =>
      assert(rs.map(_._5).sorted.toSeq == (1L to rs.length).toSeq, dom)
      rs.foreach { r =>
        assert(r._6 == (r._5 <= graft.text.TextQueries.UrlDomainCap)) }
    }
    // canonical urls carry none of the synthesized messiness: no
    // scheme/host case, default ports (both schemes), www, tracking
    // params, fragments, trailing slashes; percent-encoding is FULLY
    // normalized — unreserved codes decoded (%7E/%7e -> ~,
    // %41 -> A), reserved codes uppercased never decoded (%2f -> %2F,
    // %3f -> %3F: the encoded '?' must not become a query delimiter)
    rows.foreach { case (u, dom, _, _, _, _) =>
      assert(u.startsWith("https://site") || u.startsWith("http://site"), u)
      assert(!u.contains("www.") && !u.contains(":443")
        && !u.contains(":80") && !u.contains("utm_") && !u.contains("#")
        && !u.endsWith("/"), u)
      assert(!u.contains("%7E") && !u.contains("%7e")
        && !u.contains("%2f") && !u.contains("%3f")
        && !u.contains("%41"), u)
      // the AUTHORITY is lowercase (paths are case-significant: a
      // decoded %41 legitimately leaves an uppercase 'A' there)
      val auth = u.split('/')(2)
      assert(auth == auth.toLowerCase, u)
      assert(u.contains(s"://$dom/") || u.split('?').head.endsWith(dom), u)
    }
    // keeper/n_docs are genuine: rebuild EVERY cluster independently
    // from the synthesis rule (scheme by mod 13, domain slot mod 7,
    // path slot mod 53, percent segments by mod 9 / 10 / 17 / 14,
    // page param only when doc_id % 11 == 0) and demand exact
    // agreement — a keeper aggregation that regressed to anything
    // but the cluster min goes red here, not just vs the oracle
    // (which shares min() by construction)
    import spark.implicits._
    val ids = graft.Tables.documents(spark, sf)
      .select("doc_id").as[Long].collect()
    val rebuilt = ids.groupBy { id =>
      val scheme = if (id % 13 == 0) "http" else "https"
      val vseg =
        if (id % 9 == 0 || id % 9 == 3 || id % 9 == 6) "/v~1" else ""
      val xseg = if (id % 10 == 0 || id % 10 == 5) "/x%2Fy" else ""
      val qseg = if (id % 17 == 0) "/q%3Fx" else ""
      val nseg = if (id % 14 == 0 || id % 14 == 7) "/nAme" else ""
      val lseg =
        if (id % 19 == 0 || id % 19 == 9 || id % 19 == 5) "/log" else ""
      val page = if (id % 11 == 0) s"?page=${id % 3}" else ""
      s"$scheme://site${id % 7}.example.com/docs/page-${id % 53}" +
        s"$vseg$xseg$qseg$nseg$lseg$page"
    }.map { case (u, members) =>
      u -> (members.min, members.length.toLong)
    }
    assert(rows.map(r => r._1 -> (r._3, r._4)).toMap == rebuilt)
  }

  test("q190 web-ingest gate is non-vacuous: kept and dropped docs " +
    "both exist, and counts tie to the q189-extracted text under the " +
    "q132 rules") {
    val rows = QueryRegistry.queries("q190_web_ingest_pipeline")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val raw = rows.map(_._2).sum
    val kept = rows.map(_._3).sum
    // both branches fire corpus-wide — a threshold/wrapper change that
    // makes the extracted-text gate uniformly pass or drop must go red
    // here, not stay oracle-green as a vacuous composition
    assert(kept > 0 && kept < raw, s"vacuous gate: $kept of $raw kept")
    rows.foreach { case (_, r, k) => assert(k >= 0 && k <= r) }
  }
}

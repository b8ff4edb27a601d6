package graft.dedup

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` (exact, n-gram Jaccard,
  * MinHash-LSH). Exact + Jaccard have DuckDB oracles; MinHash is
  * probabilistic machinery the oracle can't express -> rows-only check,
  * with ScalaTest asserting its estimates against exact Jaccard.
  */
object DedupQueries {
  /** Distinct (doc_id, token) pairs — the set representation of each doc. */
  private def tokenSets(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .distinct()

  /** Number of MinHash permutations; 4 bands x 4 rows (collision prob
    * J^4 per band keeps the candidate set near-dup-only on corpora with a
    * heavily shared vocabulary).
    */
  val NumHashes = 16
  val BandRows = 4

  /** Per-doc MinHash signature: min over tokens of xxhash64(seed, token)
    * per seed — one groupBy, signatures are NumHashes longs per doc.
    * Scales as word-count does; no pairwise work yet.
    */
  def minhashSignatures(s: SparkSession, d: String): DataFrame = {
    val toks = tokenSets(s, d)
    val aggs = (0 until NumHashes).map(i =>
      min(xxhash64(lit(i), col("token"))).as(s"h$i"))
    toks.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** LSH candidate pairs: docs sharing any band bucket. Band hash joins
    * replace the O(n^2) cross join — the scale path for near-dup at 100 TB.
    */
  def minhashCandidates(s: SparkSession, d: String): DataFrame =
    candidatesFrom(minhashSignatures(s, d))

  private def candidatesFrom(sig: DataFrame): DataFrame = {
    val bands = (0 until NumHashes / BandRows).map { b =>
      val cols = (b * BandRows until (b + 1) * BandRows).map(i => col(s"h$i"))
      sig.select(col("doc_id"), lit(b).as("band"),
        xxhash64(cols: _*).as("bucket"))
    }.reduce(_ unionAll _)
    val l = bands.as("l"); val r = bands.as("r")
    l.join(r, col("l.band") === col("r.band")
        && col("l.bucket") === col("r.bucket")
        && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
  }

  /** Estimated Jaccard from signature agreement for candidate pairs.
    * Signatures are persisted: they feed the band buckets AND both sides
    * of the pair join — without the persist the explode+groupBy over all
    * tokens runs three times.
    */
  def minhashPairs(s: SparkSession, d: String): DataFrame = {
    val sig = minhashSignatures(s, d).persist()
    val cand = candidatesFrom(sig)
    val a = sig.as("a"); val b = sig.as("b")
    val agree = (0 until NumHashes)
      .map(i => when(col(s"a.h$i") === col(s"b.h$i"), 1).otherwise(0))
      .reduce(_ + _)
    cand.join(a, col("doc_a") === col("a.doc_id"))
      .join(b, col("doc_b") === col("b.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        round(agree.cast("double") / NumHashes, 4).as("est_jaccard"))
      .filter(col("est_jaccard") >= 0.5)
      .orderBy("doc_a", "doc_b")
  }

  def defs: Seq[Q] = Seq(
    // ---- exact dedup groups keyed by content hash. At scale: one shuffle
    // on the 128-bit hash, never on the full text.
    Q("q28_exact_dup_groups",
      (s, d) =>
        Tables.documents(s, d)
          .withColumn("fp", md5(col("text")))
          .groupBy("fp")
          .agg(count(lit(1)).as("n"), min("doc_id").as("canonical"))
          .orderBy("fp"),
      Some("""SELECT md5(text) AS fp, count(*) AS n, min(doc_id) AS canonical
             FROM documents GROUP BY 1 ORDER BY fp""")),

    // ---- exact token-set Jaccard of every doc vs doc 0 (the brute-force
    // ground truth the MinHash estimate is validated against in tests).
    Q("q29_jaccard_vs_doc0",
      (s, d) => {
        val toks = tokenSets(s, d)
        val t0 = toks.filter(col("doc_id") === 0).select(col("token").as("token0"))
        val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("n"))
        val inter = toks.join(broadcast(t0), col("token") === col("token0"))
          .groupBy("doc_id").agg(count(lit(1)).as("ni"))
        val n0 = sizes.filter(col("doc_id") === 0).select(col("n").as("n0"))
        sizes.join(inter, Seq("doc_id"), "left")
          .crossJoin(broadcast(n0))
          .select(col("doc_id"),
            round(coalesce(col("ni"), lit(0L)).cast("double")
              / (col("n") + col("n0") - coalesce(col("ni"), lit(0L))), 6).as("jaccard"))
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (SELECT DISTINCT doc_id, token FROM
               (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents) x),
             sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
             t0 AS (SELECT token FROM tok WHERE doc_id = 0),
             inter AS (SELECT tok.doc_id, count(*) AS ni FROM tok
                       JOIN t0 USING (token) GROUP BY tok.doc_id)
             SELECT s.doc_id,
             round(CAST(coalesce(ni, 0) AS DOUBLE) /
                   (s.n + (SELECT count(*) FROM t0) - coalesce(ni, 0)), 6) AS jaccard
             FROM sizes s LEFT JOIN inter USING (doc_id) ORDER BY doc_id""")),

    // ---- MinHash+LSH near-dup candidates (probabilistic; rows-only check;
    // ScalaTest validates estimates against q29's exact Jaccard).
    Q("q30_minhash_lsh_pairs", (s, d) => minhashPairs(s, d), None),

    // ---- 64-bit SimHash signatures (xxhash64 per token, sign-sum per
    // bit). xxhash64 has no DuckDB counterpart -> rows-only; DedupSpec
    // pins invariances (identical text => identical signature).
    Q("q36_simhash", (s, d) => simhash(s, d), None),

    // ---- embedding-cosine near-dup: top-20 most-similar pairs within a
    // bounded id range (the corpus has no true near-dups; max cos ~0.47).
    // Exact arithmetic mirrored in DuckDB; rank on the rounded value.
    Q("q37_embedding_dup_pairs",
      (s, d) => {
        val flat = graft.Tables.embeddings(s, d)
          .filter(col("vec_id") < 300)
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "v")))
          .withColumn("v", col("v").cast("double"))
        val norms = flat.groupBy("vec_id").agg(sqrt(sum(col("v") * col("v"))).as("nrm"))
        val b = flat.select(col("vec_id").as("vb"), col("i").as("ib"), col("v").as("wv"))
        val dots = flat.join(b, col("i") === col("ib") && col("vec_id") < col("vb"))
          .groupBy(col("vec_id").as("va"), col("vb"))
          .agg(sum(col("v") * col("wv")).as("dot"))
        val na = norms.select(col("vec_id").as("va"), col("nrm").as("na"))
        val nb = norms.select(col("vec_id").as("vb"), col("nrm").as("nb"))
        dots.join(na, "va").join(nb, "vb")
          .select(col("va"), col("vb"),
            round(col("dot") / (col("na") * col("nb")), 6).as("cos_sim"))
          .orderBy(col("cos_sim").desc, col("va"), col("vb"))
          .limit(20)
      },
      Some("""WITH flat AS (SELECT vec_id, CAST(v AS DOUBLE) AS v, i FROM (
               SELECT vec_id, unnest(embedding) AS v,
                      generate_subscripts(embedding, 1) AS i
               FROM embeddings WHERE vec_id < 300) x),
             norms AS (SELECT vec_id, sqrt(sum(v*v)) AS nrm FROM flat GROUP BY 1),
             dots AS (SELECT a.vec_id AS va, b.vec_id AS vb, sum(a.v*b.v) AS dot
                      FROM flat a JOIN flat b ON a.i = b.i AND a.vec_id < b.vec_id
                      GROUP BY 1, 2)
             SELECT va, vb, round(dot / (na.nrm * nb.nrm), 6) AS cos_sim
             FROM dots JOIN norms na ON va = na.vec_id
             JOIN norms nb ON vb = nb.vec_id
             ORDER BY cos_sim DESC, va, vb LIMIT 20"""))
  )

  /** 64-bit SimHash per document: bit i set iff the sign-sum over token
    * hashes' bit i is positive. One explode + one groupBy with 64
    * codegen'd conditional sums — no UDF, fully distributed.
    */
  def simhash(s: SparkSession, d: String): DataFrame = {
    val toks = tokenSets(s, d).withColumn("h", xxhash64(col("token")))
    val bitSums = (0 until 64).map(i =>
      sum(shiftright(col("h"), i).bitwiseAND(1) * 2 - 1).as(s"b$i"))
    val sums = toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map(i =>
        when(col(s"b$i") > 0, lit(1L << i)).otherwise(0L))
      .reduce(_.bitwiseOR(_))
    sums.select(col("doc_id"), sig.as("simhash")).orderBy("doc_id")
  }
}

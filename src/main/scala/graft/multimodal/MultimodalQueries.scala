package graft.multimodal

import graft.Q
import org.apache.spark.sql.functions._

/** Harness queries for the multimodal surface. q40 checks the binary
  * column + metadata plumbing against DuckDB; q41 runs the batched
  * feature-extraction pipeline (stub codec -> rows-only check, with
  * ScalaTest asserting its deterministic outputs).
  */
object MultimodalQueries {
  def defs: Seq[Q] = Seq(
    Q("q40_media_meta",
      (s, d) =>
        Multimodal.mediaFromDocuments(s, d).toDF()
          .groupBy("kind")
          .agg(count(lit(1)).as("n"),
            sum(octet_length(col("bytes"))).as("total_bytes"),
            round(avg("width"), 4).as("avg_w"),
            round(avg("height"), 4).as("avg_h"))
          .orderBy("kind"),
      Some("""SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                         WHEN doc_id % 3 = 1 THEN 'audio'
                         ELSE 'video' END AS kind,
             count(*) AS n,
             CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
             round(avg(doc_id % 640 + 16), 4) AS avg_w,
             round(avg(doc_id % 480 + 16), 4) AS avg_h
             FROM documents GROUP BY 1 ORDER BY 1""")),

    Q("q41_media_features",
      (s, d) =>
        Multimodal.extractFeatures(Multimodal.mediaFromDocuments(s, d)).toDF()
          .select(col("media_id"), col("kind"), col("n_bytes"),
            round(col("entropy"), 6).as("entropy"),
            round(col("mean_byte"), 6).as("mean_byte"),
            col("frames_sampled"), col("thumb_w"), col("thumb_h"))
          .orderBy("media_id"),
      None) // stub codec -> no SQL oracle; MultimodalSpec pins outputs
  )
}

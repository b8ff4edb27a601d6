package graft.multimodal

import graft.Q
import org.apache.spark.sql.functions._

/** Harness queries for the multimodal surface. q40 checks the binary
  * column + metadata plumbing against DuckDB; q41 runs the batched
  * feature-extraction pipeline over a MIXED table — image rows are
  * real binary PPMs routed through the validating decoder (pixel
  * entropy / mean / decoded-dimension thumbnails), audio/video rows
  * ride the stub byte-stats leg — and both legs are oracle-checked
  * because the synthesized pixels and the stub statistics are each
  * reconstructible in SQL over the ASCII corpus.
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

    // q41 feeds the extractor a MIXED table — image rows carry real
    // binary PPMs (the q159 synthesis), audio/video rows raw payloads —
    // so the kind+magic dispatch runs BOTH legs: the oracle
    // reconstructs the image rows' pixel histogram from the cycled-
    // text-byte geometry (position i of an L-char text occurs
    // N//L + (i <= N%L) times in an N-byte pixel payload) and checks
    // entropy/mean over DECODED PIXELS, n_bytes = header + payload,
    // thumbnail geometry from the DECODED dims; the stub legs check as
    // before. A decode or dispatch bug hash-mismatches.
    Q("q41_media_features",
      (s, d) =>
        Multimodal.extractFeatures(Multimodal.mediaWithPpm(s, d)).toDF()
          .select(col("media_id"), col("kind"), col("n_bytes"),
            round(col("entropy"), 6).as("entropy"),
            round(col("mean_byte"), 6).as("mean_byte"),
            col("frames_sampled"), col("thumb_w"), col("thumb_h"))
          .orderBy("media_id"),
      Some("""WITH m AS (SELECT doc_id AS media_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
               text, len(text) AS L,
               CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS raw_bytes,
               length(text) > 0 AND
                 octet_length(CAST(text AS BLOB)) = length(text) AS ascii_ok,
               doc_id % 640 + 16 AS raw_w, doc_id % 480 + 16 AS raw_h,
               doc_id % 9 + 8 AS pw, doc_id % 7 + 6 AS ph,
               doc_id % 120 + 1 AS n_frames
               FROM documents),
             mm AS (SELECT media_id, kind, text, L, n_frames,
               kind = 'image' AND ascii_ok AS is_ppm,
               CASE WHEN kind = 'image' AND ascii_ok THEN pw
                    ELSE raw_w END AS width,
               CASE WHEN kind = 'image' AND ascii_ok THEN ph
                    ELSE raw_h END AS height,
               CASE WHEN kind = 'image' AND ascii_ok
                 THEN 9 + len(CAST(pw AS VARCHAR)) + len(CAST(ph AS VARCHAR))
                      + pw * ph * 3
                 ELSE raw_bytes END AS n_bytes,
               CASE WHEN kind = 'image' AND ascii_ok THEN pw * ph * 3
                    ELSE raw_bytes END AS n_eff
               FROM m),
             pos AS (SELECT media_id,
                       ord(substr(text, CAST(i AS INT), 1)) AS byte,
                       CASE WHEN is_ppm
                         THEN n_eff // L +
                              CASE WHEN i <= n_eff % L THEN 1 ELSE 0 END
                         ELSE 1 END AS cnt
                     FROM (SELECT media_id, text, L, is_ppm, n_eff,
                             unnest(range(1, CAST(L AS BIGINT) + 1)) AS i
                           FROM mm) x),
             ch AS (SELECT media_id, byte, CAST(sum(cnt) AS BIGINT) AS c
                    FROM pos GROUP BY 1, 2 HAVING sum(cnt) > 0),
             tot AS (SELECT media_id, sum(c) AS n FROM ch GROUP BY 1),
             st AS (SELECT ch.media_id,
                      sum(-(CAST(c AS DOUBLE)/n) * log2(CAST(c AS DOUBLE)/n)) AS entropy,
                      CAST(sum(byte*c) AS DOUBLE)/any_value(n) AS mean_byte
                    FROM ch JOIN tot ON ch.media_id = tot.media_id
                    GROUP BY ch.media_id)
             SELECT mm.media_id, mm.kind, mm.n_bytes,
               round(coalesce(st.entropy, 0), 6) AS entropy,
               round(coalesce(st.mean_byte, 0), 6) AS mean_byte,
               CAST(CASE WHEN mm.kind = 'video'
                    THEN least(8, greatest(1, mm.n_frames // 8))
                    ELSE 1 END AS INT) AS frames_sampled,
               CAST(greatest(1, round(mm.width * (64.0/greatest(mm.width, mm.height)))) AS INT) AS thumb_w,
               CAST(greatest(1, round(mm.height * (64.0/greatest(mm.width, mm.height)))) AS INT) AS thumb_h
             FROM mm LEFT JOIN st ON mm.media_id = st.media_id
             ORDER BY mm.media_id"""))
  ,

    // ---- q62: video frame sampling — every (n_frames/k)-th frame of
    // each video, k = min(8, max(1, n_frames/8)), each frame a byte
    // slice of the encoded payload (frame boundaries are the stub
    // codec's equal-split; q162 is the REAL demuxer at the same seam —
    // a validating Y4M parse with O(1) frame seek).
    // explode(sequence) keeps the fan-out distributed and the slicing
    // is pure column work on the binary — no driver loop, no UDF.
    Q("q62_frame_sample",
      (s, d) => {
        val m = Multimodal.mediaFromDocuments(s, d).toDF()
          .filter(col("kind") === "video")
          .withColumn("n_bytes", octet_length(col("bytes")).cast("long"))
          .withColumn("k", least(lit(8),
            greatest(lit(1), (col("n_frames") / 8).cast("int"))))
        m.withColumn("j", explode(sequence(lit(0), col("k") - 1)))
          .withColumn("frame_idx",
            (col("j") * (col("n_frames") / col("k")).cast("int")).cast("long"))
          .withColumn("off",
            (col("frame_idx") * col("n_bytes") / col("n_frames")).cast("long"))
          .withColumn("flen",
            greatest(lit(1L), (col("n_bytes") / col("n_frames")).cast("long")))
          .withColumn("fb", ascii(
            expr("decode(substring(bytes, cast(off + 1 as int), 1), 'UTF-8')"))
            .cast("long"))
          .select("media_id", "frame_idx", "off", "flen", "fb")
          .orderBy("media_id", "frame_idx")
      },
      Some("""WITH m AS (SELECT doc_id AS media_id, text,
               CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
               doc_id % 120 + 1 AS n_frames
               FROM documents WHERE doc_id % 3 = 2),
             k AS (SELECT *, least(8, greatest(1, n_frames // 8)) AS k FROM m),
             f AS (SELECT media_id, text, n_bytes, n_frames, k,
                     unnest(range(0, k)) AS j FROM k)
             SELECT media_id,
               CAST(j * (n_frames // k) AS BIGINT) AS frame_idx,
               CAST((j * (n_frames // k)) * n_bytes // n_frames AS BIGINT) AS off,
               CAST(greatest(1, n_bytes // n_frames) AS BIGINT) AS flen,
               CAST(ord(substr(text,
                 CAST((j * (n_frames // k)) * n_bytes // n_frames AS INT) + 1, 1))
                 AS BIGINT) AS fb
             FROM f ORDER BY media_id, frame_idx""")),

    // ---- q82: image downsample / thumbnail stub — the "resize" leg of
    // the decode/resize/frame-sample trio. Under the stub codec a 4x
    // downsample keeps every 4th payload byte (q159/q160 run the REAL
    // codec resample on decoded pixels); metadata scales with it. Pure per-row work —
    // distributes with the scan, no shuffle until the final sort. Both
    // engines fingerprint the identical downsampled payload.
    Q("q82_image_downsample",
      (s, d) =>
        Multimodal.mediaFromDocuments(s, d).toDF()
          .filter(col("kind") === "image")
          .withColumn("txt", expr("decode(bytes, 'UTF-8')"))
          .withColumn("small", expr(
            "array_join(transform(sequence(1, length(txt), 4)," +
              " i -> substring(txt, i, 1)), '')"))
          .select(col("media_id"),
            octet_length(col("small").cast("binary")).cast("long")
              .as("small_bytes"),
            md5(col("small")).as("fp"),
            greatest(lit(1L), floor(col("width") / 4)).as("thumb_w"),
            greatest(lit(1L), floor(col("height") / 4)).as("thumb_h"))
          .orderBy("media_id"),
      Some("""WITH img AS (SELECT doc_id AS media_id, text,
               doc_id % 640 + 16 AS w, doc_id % 480 + 16 AS h
               FROM documents WHERE doc_id % 3 = 0),
             sm AS (SELECT media_id,
                      string_agg(substr(text, CAST(i AS INT), 1), '' ORDER BY i)
                        AS small,
                      any_value(w) AS w, any_value(h) AS h
                    FROM (SELECT media_id, text, w, h,
                            unnest(range(1, len(text) + 1, 4)) AS i
                          FROM img) x
                    GROUP BY media_id)
             SELECT media_id,
                    CAST(octet_length(CAST(small AS BLOB)) AS BIGINT)
                      AS small_bytes,
                    md5(small) AS fp,
                    CAST(greatest(1, w // 4) AS BIGINT) AS thumb_w,
                    CAST(greatest(1, h // 4) AS BIGINT) AS thumb_h
             FROM sm ORDER BY media_id""")),

    // ---- q159: the first REAL codec leg — valid binary PPMs decoded
    // by a validating parser and resampled with real nearest-neighbor
    // pixel math, batched per partition. The synthesized payload bytes
    // are reconstructible in SQL (pixel j = text byte j mod len), so
    // the oracle computes the expected 4x3 thumbnail's channel means
    // INDEPENDENTLY — any header-parse, payload-offset, or resample
    // bug hash-mismatches.
    Q("q159_ppm_thumbnail",
      (s, d) => Multimodal.ppmThumbStats(s, d).toDF()
        .select(col("media_id"), col("width"), col("height"),
          round(col("r_mean"), 4).as("r_mean"),
          round(col("g_mean"), 4).as("g_mean"),
          round(col("b_mean"), 4).as("b_mean"))
        .orderBy("media_id"),
      Some(s"""WITH img AS (SELECT doc_id AS media_id, text,
               len(text) AS L,
               doc_id % 9 + 8 AS w, doc_id % 7 + 6 AS h
               FROM documents WHERE doc_id % 3 = 0 AND length(text) > 0
                 AND octet_length(CAST(text AS BLOB)) = length(text)),
             px AS (SELECT media_id, w, h, L, text,
                      unnest(range(0, ${Multimodal.ThumbW *
                        Multimodal.ThumbH})) AS k
                    FROM img),
             src AS (SELECT media_id, w, h, L, text,
                       ((k // ${Multimodal.ThumbW}) * h
                          // ${Multimodal.ThumbH} * w
                        + (k % ${Multimodal.ThumbW}) * w
                          // ${Multimodal.ThumbW}) * 3 AS p0
                     FROM px),
             ch AS (SELECT media_id, w, h,
                      ord(substr(text, CAST(p0 % L AS INT) + 1, 1)) AS r,
                      ord(substr(text, CAST((p0 + 1) % L AS INT) + 1, 1)) AS g,
                      ord(substr(text, CAST((p0 + 2) % L AS INT) + 1, 1)) AS b
                    FROM src)
             SELECT media_id,
               CAST(any_value(w) AS INT) AS width,
               CAST(any_value(h) AS INT) AS height,
               round(avg(r), 4) AS r_mean,
               round(avg(g), 4) AS g_mean,
               round(avg(b), 4) AS b_mean
             FROM ch GROUP BY media_id ORDER BY media_id"""))
  )
}

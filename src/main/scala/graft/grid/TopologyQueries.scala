package graft.grid

import graft.Q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import GridQueries.{grid, gridCte, NZ, NX}

/** Topology operators (SURVEY §2A rows 22f-22k) over the events-derived
  * grid, each mirrored by a DuckDB oracle built from the same conventions
  * (corner signs, crossing order [top,left,right,bottom], saddle pairing
  * (top,left)+(right,bottom), min-label components).
  */
object TopologyQueries {
  private val L1 = 150.0 // b1 contour level (b1 in [0, ~328])
  private val L2 = 50.0  // b2 contour level (b2 in [0, 100])

  /** SQL: corner + crossing CTEs for contour segments of `f` at `lvl`;
    * names suffixed with `sfx`. Produces CTE `segs_[sfx]`.
    */
  private def segsSql(f: String, lvl: Double, sfx: String): String =
    s"""corners_$sfx AS MATERIALIZED (
       SELECT a.it, a.iz, a.ix, a.$f - $lvl AS c00, b.$f - $lvl AS c01,
              c.$f - $lvl AS c10, d.$f - $lvl AS c11
       FROM grid a
       JOIN grid b ON b.it = a.it AND b.iz = a.iz   AND b.ix = a.ix + 1
       JOIN grid c ON c.it = a.it AND c.iz = a.iz+1 AND c.ix = a.ix
       JOIN grid d ON d.it = a.it AND d.iz = a.iz+1 AND d.ix = a.ix + 1),
       cr_$sfx AS MATERIALIZED (
       SELECT it, iz, ix,
         (c00 >= 0) <> (c01 >= 0) AS ct, (c00 >= 0) <> (c10 >= 0) AS cl,
         (c01 >= 0) <> (c11 >= 0) AS cx, (c10 >= 0) <> (c11 >= 0) AS cb,
         CAST(iz AS DOUBLE) AS yt, ix + c00/(c00-c01) AS xt,
         iz + c00/(c00-c10) AS yl, CAST(ix AS DOUBLE) AS xl,
         iz + c01/(c01-c11) AS yr, CAST(ix + 1 AS DOUBLE) AS xr,
         CAST(iz + 1 AS DOUBLE) AS yb, ix + c10/(c10-c11) AS xb
       FROM corners_$sfx
       WHERE (CASE WHEN (c00 >= 0) <> (c01 >= 0) THEN 1 ELSE 0 END +
              CASE WHEN (c00 >= 0) <> (c10 >= 0) THEN 1 ELSE 0 END +
              CASE WHEN (c01 >= 0) <> (c11 >= 0) THEN 1 ELSE 0 END +
              CASE WHEN (c10 >= 0) <> (c11 >= 0) THEN 1 ELSE 0 END) >= 2),
       segs_$sfx AS MATERIALIZED (
       SELECT it, iz, ix,
         CASE WHEN ct THEN yt WHEN cl THEN yl ELSE yr END AS y1,
         CASE WHEN ct THEN xt WHEN cl THEN xl ELSE xr END AS x1,
         CASE WHEN ct AND cl THEN yl WHEN cx AND (ct OR cl) THEN yr ELSE yb END AS y2,
         CASE WHEN ct AND cl THEN xl WHEN cx AND (ct OR cl) THEN xr ELSE xb END AS x2
       FROM cr_$sfx
       UNION ALL
       SELECT it, iz, ix, yr AS y1, xr AS x1, yb AS y2, xb AS x2
       FROM cr_$sfx WHERE ct AND cl AND cx AND cb)"""

  /** SQL: null points CTE `nulls` from segs_a x segs_b. */
  private val nullsSql: String =
    s"""${segsSql("b1", L1, "a")},
       ${segsSql("b2", L2, "b")},
       pairs AS MATERIALIZED (
       SELECT a.it, a.y1 AS ay, a.x1 AS ax, a.y2 AS yy, a.x2 AS bx,
              b.y1 AS cy, b.x1 AS cx2, b.y2 AS dy, b.x2 AS dx
       FROM segs_a a JOIN segs_b b
         ON a.it = b.it AND a.iz = b.iz AND a.ix = b.ix),
       inter AS MATERIALIZED (
       SELECT * FROM pairs
       WHERE (((dx - ax) * (cy - ay) > (cx2 - ax) * (dy - ay)) <>
              ((dx - bx) * (cy - yy) > (cx2 - bx) * (dy - yy)))
         AND (((cx2 - ax) * (yy - ay) > (bx - ax) * (cy - ay)) <>
              ((dx - ax) * (yy - ay) > (bx - ax) * (dy - ay)))
         AND ((ay - yy) * (cx2 - dx) - (ax - bx) * (cy - dy)) <> 0),
       nulls AS MATERIALIZED (
       SELECT it,
         ((ay*bx - ax*yy) * (cy - dy) - (ay - yy) * (cy*dx - cx2*dy)) /
           ((ay - yy) * (cx2 - dx) - (ax - bx) * (cy - dy)) AS py,
         ((ay*bx - ax*yy) * (cx2 - dx) - (ax - bx) * (cy*dx - cx2*dy)) /
           ((ay - yy) * (cx2 - dx) - (ax - bx) * (cy - dy)) AS px
       FROM inter)"""

  /** Spark side of the null-point computation, memoized per
    * (session, dir) like the grid itself: g11 and g12 share one
    * persisted result (contour extraction + the segment-pair join are
    * the expensive half of both queries). The null set is tiny —
    * O(contour crossings), not O(cells).
    */
  private val nullsCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private val nullsListener =
    java.util.concurrent.ConcurrentHashMap.newKeySet[org.apache.spark.SparkContext]()

  /** Unpersist and drop every cached null set for `s` — called by
    * [[GridQueries.clearCache]] so the derived layer can never outlive
    * (and go stale against) the grid it was computed from.
    */
  def clearNullsCache(s: SparkSession): Unit =
    nullsCache.keys.filter(_._1 == s).foreach { k =>
      nullsCache.remove(k).foreach(_.unpersist(blocking = false))
    }
  private def nulls(s: SparkSession, d: String): DataFrame =
    nullsCache.getOrElseUpdate((s, d), {
      val sc = s.sparkContext
      if (nullsListener.add(sc)) {
        sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
            nullsCache.keys.filter(_._1.sparkContext eq sc)
              .foreach(nullsCache.remove)
            nullsListener.remove(sc)
          }
        })
      }
      val g = grid(s, d)
      val n = Topology.segmentIntersections(
        Topology.contourSegments(g, "b1", L1),
        Topology.contourSegments(g, "b2", L2)).persist()
      n.count()
      n
    })

  def defs: Seq[Q] = Seq(
    // ---- g10: marching-squares contour segments (reference 22f).
    Q("g10_contour_segments",
      (s, d) =>
        Topology.contourSegments(grid(s, d), "b1", L1)
          .select(col("it"), col("iz"), col("ix"),
            round(col("y1"), 6).as("y1"), round(col("x1"), 6).as("x1"),
            round(col("y2"), 6).as("y2"), round(col("x2"), 6).as("x2"))
          .orderBy("it", "iz", "ix", "y1", "x1", "y2", "x2"),
      Some(s"""WITH $gridCte,
              ${segsSql("b1", L1, "a")}
              SELECT it, iz, ix, round(y1,6) AS y1, round(x1,6) AS x1,
                     round(y2,6) AS y2, round(x2,6) AS x2
              FROM segs_a ORDER BY it, iz, ix, y1, x1, y2, x2""")),

    // ---- g11: null finding — intersections of the two contour families
    // (reference 22g). Cell-equi-join replaces the all-pairs scan.
    Q("g11_nulls",
      (s, d) =>
        nulls(s, d)
          .select(col("it"), round(col("py"), 6).as("py"), round(col("px"), 6).as("px"))
          .orderBy("it", "py", "px"),
      Some(s"""WITH $gridCte,
              $nullsSql
              SELECT it, round(py,6) AS py, round(px,6) AS px
              FROM nulls ORDER BY it, py, px""")),

    // ---- g12: X/O classification (reference 22h/22i): sign of the
    // bilinearly interpolated flux-function Hessian determinant at each
    // null. Gradients via lag/lead windows; det from raw fields here
    // (the smoothed composition is exercised in ScalaTest).
    Q("g12_xo_classify",
      (s, d) => {
        val g = grid(s, d)
        // iz-gradients adjacent, then ix-gradients: Catalyst's
        // CollapseWindow merges same-spec neighbors -> 2 window passes.
        val g1 = GridOps.gradient(g, "b1", "iz", 1.0, "db1_dz") // index-space h=1
        val g2 = GridOps.gradient(g1, "b2", "iz", 1.0, "db2_dz")
        val g3 = GridOps.gradient(g2, "b1", "ix", 1.0, "db1_dx")
        val g4 = GridOps.gradient(g3, "b2", "ix", 1.0, "db2_dx")
        val hd = g4.withColumn("hd",
          col("db1_dx") * (-col("db2_dz")) - (-col("db2_dx")) * col("db1_dz"))
        val pts = nulls(s, d)
          .select(col("it"), col("py"), col("px"))
        val sampled = Topology.bilinearSample(hd, "hd", pts, "hdi")
        sampled.select(col("it"), round(col("py"), 6).as("py"),
            round(col("px"), 6).as("px"),
            when(col("hdi") > 0, "O").when(col("hdi") < 0, "X").otherwise("D").as("cls"))
          .orderBy("it", "py", "px", "cls")
      },
      Some(s"""WITH $gridCte,
              $nullsSql,
              gz AS MATERIALIZED (SELECT it, iz, ix, b1, b2,
                lead(b1) OVER wz AS b1p, lag(b1) OVER wz AS b1m,
                lead(b2) OVER wz AS b2p, lag(b2) OVER wz AS b2m
                FROM grid WINDOW wz AS (PARTITION BY it, ix ORDER BY iz)),
              gd1 AS MATERIALIZED (SELECT it, iz, ix, b1, b2,
                CASE WHEN b1m IS NULL THEN b1p - b1 WHEN b1p IS NULL THEN b1 - b1m
                     ELSE (b1p - b1m) / 2 END AS db1_dz,
                CASE WHEN b2m IS NULL THEN b2p - b2 WHEN b2p IS NULL THEN b2 - b2m
                     ELSE (b2p - b2m) / 2 END AS db2_dz
                FROM gz),
              gx AS MATERIALIZED (SELECT it, iz, ix, db1_dz, db2_dz, b1, b2,
                lead(b1) OVER wx AS b1p, lag(b1) OVER wx AS b1m,
                lead(b2) OVER wx AS b2p, lag(b2) OVER wx AS b2m
                FROM gd1 WINDOW wx AS (PARTITION BY it, iz ORDER BY ix)),
              hd AS MATERIALIZED (SELECT it, iz, ix,
                (CASE WHEN b1m IS NULL THEN b1p - b1 WHEN b1p IS NULL THEN b1 - b1m
                      ELSE (b1p - b1m) / 2 END) * (-db2_dz)
                - (-(CASE WHEN b2m IS NULL THEN b2p - b2 WHEN b2p IS NULL THEN b2 - b2m
                         ELSE (b2p - b2m) / 2 END)) * db1_dz AS hd
                FROM gx),
              corners(di, dj) AS (VALUES (0,0), (0,1), (1,0), (1,1)),
              w AS MATERIALIZED (SELECT n.it, n.py, n.px,
                CAST(floor(n.py) AS BIGINT) + di AS ci,
                CAST(floor(n.px) AS BIGINT) + dj AS cj,
                (CASE WHEN di = 0 THEN 1 - (py - floor(py)) ELSE py - floor(py) END) *
                (CASE WHEN dj = 0 THEN 1 - (px - floor(px)) ELSE px - floor(px) END) AS w
                FROM nulls n CROSS JOIN corners),
              sampled AS MATERIALIZED (SELECT w.it, w.py, w.px, sum(w.w * h.hd) AS hdi
                FROM w JOIN hd h ON h.it = w.it AND h.iz = w.ci AND h.ix = w.cj
                GROUP BY w.it, w.py, w.px)
              SELECT it, round(py,6) AS py, round(px,6) AS px,
                CASE WHEN hdi > 0 THEN 'O' WHEN hdi < 0 THEN 'X' ELSE 'D' END AS cls
              FROM sampled ORDER BY it, py, px, cls""")),

    // ---- g13: connected components, 4-adjacency, per time step
    // (reference nd.label / flood, 22j/22k). Label = min linear cell id,
    // deterministic in both engines.
    Q("g13_connected_components",
      (s, d) => {
        val cells = grid(s, d).filter(col("b1") > 200).select("it", "iz", "ix")
        Topology.connectedComponents(cells, NX)
          .orderBy("it", "iz", "ix")
      },
      Some(s"""WITH RECURSIVE $gridCte,
              m AS MATERIALIZED (SELECT it, iz, ix, CAST(iz * $NX + ix AS BIGINT) AS id
                    FROM grid WHERE b1 > 200),
              e AS MATERIALIZED (SELECT a.it, a.id AS s, b.id AS t FROM m a JOIN m b
                    ON a.it = b.it AND ((abs(a.iz-b.iz) = 1 AND a.ix = b.ix)
                                     OR (a.iz = b.iz AND abs(a.ix-b.ix) = 1))),
              r AS (SELECT it, id, id AS comp FROM m
                    UNION
                    SELECT e.it, e.s AS id, r.comp FROM e
                    JOIN r ON e.it = r.it AND e.t = r.id)
              SELECT m.it, m.iz, m.ix, min(r.comp) AS comp
              FROM m JOIN r ON m.it = r.it AND m.id = r.id
              GROUP BY m.it, m.iz, m.ix ORDER BY m.it, m.iz, m.ix""")),

    // ---- g14: current-sheet region extrema (reference 22k up to the
    // region-grow): 10x10 max filter -> mean+3*sigma_pop threshold ->
    // connected regions -> per-region peak + argmax position (first in
    // row-major order among exact ties, like nd.maximum_position).
    Q("g14_region_extrema",
      (s, d) => {
        val g = grid(s, d)
        // scoped persist: feeds the threshold aggregate AND the probe
        // join. An unframed Window.partitionBy("it") would avoid the
        // reuse but forces a whole time step through one task — at the
        // 100 TB design point an `it` plane is billions of cells.
        // CacheScope bounds the block lifetime to the query scope.
        val mx = graft.CacheScope.retain(
          GridOps.extremumFilter(g, "b1", NZ, NX, isMax = true, "fmax"))
        val thr = mx.groupBy("it")
          .agg((avg("fmax") + lit(1) * stddev_pop("fmax")).as("thr"))
        val hot = mx.join(broadcast(thr), Seq("it"))
          .filter(col("fmax") > col("thr")).select("it", "iz", "ix")
        val comp = Topology.connectedComponents(hot, NX)
        val withV = comp.join(g.select("it", "iz", "ix", "b1"), Seq("it", "iz", "ix"))
        // ONE aggregation: max of (value, -pos) struct orders by value
        // first, then by highest -pos = lowest row-major position among
        // exact ties — nd.maximum_position semantics without the
        // peak-join + filter + re-aggregate round trip (3 shuffles -> 1).
        withV.groupBy("it", "comp")
          .agg(max(struct(col("b1"),
            (-(col("iz").cast("long") * NX + col("ix"))).as("negpos"))).as("m"))
          .select(col("it"), col("comp"), round(col("m.b1"), 6).as("peak"),
            ((-col("m.negpos")) / NX).cast("int").as("eiz"),
            ((-col("m.negpos")) % NX).cast("int").as("eix"))
          .orderBy("it", "comp")
      },
      Some(s"""WITH RECURSIVE $gridCte,
              zmax_offs(k, w) AS (VALUES ${(-5 to 4).map(k => s"($k, 1.0)").mkString(", ")}),
              zmax AS MATERIALIZED (SELECT g.it, g.iz, g.ix, max(s.b1) AS zmax
                FROM grid g CROSS JOIN zmax_offs o JOIN grid s
                  ON s.it = g.it AND s.ix = g.ix
                 AND s.iz = CASE WHEN g.iz + o.k < 0 THEN -(g.iz + o.k) - 1
                            WHEN g.iz + o.k >= $NZ THEN ${2 * NZ - 1} - (g.iz + o.k)
                            ELSE g.iz + o.k END
                GROUP BY g.it, g.iz, g.ix),
              xmax AS MATERIALIZED (SELECT g.it, g.iz, g.ix, max(s.zmax) AS fmax
                FROM zmax g CROSS JOIN zmax_offs o JOIN zmax s
                  ON s.it = g.it AND s.iz = g.iz
                 AND s.ix = CASE WHEN g.ix + o.k < 0 THEN -(g.ix + o.k) - 1
                            WHEN g.ix + o.k >= $NX THEN ${2 * NX - 1} - (g.ix + o.k)
                            ELSE g.ix + o.k END
                GROUP BY g.it, g.iz, g.ix),
              thr AS MATERIALIZED (SELECT it, avg(fmax) + 1 * stddev_pop(fmax) AS thr
                      FROM xmax GROUP BY it),
              m AS MATERIALIZED (SELECT x.it, x.iz, x.ix, CAST(x.iz * $NX + x.ix AS BIGINT) AS id
                    FROM xmax x JOIN thr USING (it) WHERE x.fmax > thr.thr),
              e AS MATERIALIZED (SELECT a.it, a.id AS s, b.id AS t FROM m a JOIN m b
                    ON a.it = b.it AND ((abs(a.iz-b.iz) = 1 AND a.ix = b.ix)
                                     OR (a.iz = b.iz AND abs(a.ix-b.ix) = 1))),
              r AS (SELECT it, id, id AS comp FROM m
                    UNION
                    SELECT e.it, e.s AS id, r.comp FROM e
                    JOIN r ON e.it = r.it AND e.t = r.id),
              lab AS MATERIALIZED (SELECT m.it, m.iz, m.ix, min(r.comp) AS comp
                      FROM m JOIN r ON m.it = r.it AND m.id = r.id
                      GROUP BY m.it, m.iz, m.ix),
              withv AS MATERIALIZED (SELECT l.it, l.comp, l.iz, l.ix, g.b1
                        FROM lab l JOIN grid g
                        ON g.it = l.it AND g.iz = l.iz AND g.ix = l.ix),
              pk AS MATERIALIZED (SELECT it, comp, max(b1) AS peak FROM withv GROUP BY it, comp)
              SELECT w.it, w.comp, round(p.peak, 6) AS peak,
                CAST(min(w.iz * $NX + w.ix) // $NX AS INT) AS eiz,
                CAST(min(w.iz * $NX + w.ix) % $NX AS INT) AS eix
              FROM withv w JOIN pk p ON w.it = p.it AND w.comp = p.comp AND w.b1 = p.peak
              GROUP BY w.it, w.comp, p.peak ORDER BY w.it, w.comp"""))
  )
}

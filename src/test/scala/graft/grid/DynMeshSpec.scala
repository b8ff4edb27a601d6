package graft.grid

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Moving-mesh (spacecraft-path) variables — the surface the reference
  * DECLARES but never implements (`DynMeshVar`: constructor raises,
  * /root/reference/src/variables/dynmeshvar.py:26; slice methods are
  * `pass`, dynmeshvar.py:28-35). In long format the feature is free
  * (SURVEY §1.3): coordinates are ordinary columns, so a variable whose
  * measuring point moves over time is just rows whose (z, x) vary with
  * `it` — and the SAME timeslice/zoom operators apply unchanged, since
  * they filter on coordinate columns, not on a static mesh table.
  */
class DynMeshSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  // a probe moving diagonally: at time it, position (z, x) = (it*0.5, it*1.0)
  private lazy val probe = (0 until 20)
    .map(it => (it, it.toDouble, it * 0.5, it * 1.0, math.sin(it * 0.3)))
    .toDF("it", "t", "z", "x", "value")

  test("timeslice applies unchanged to a time-dependent mesh") {
    val sliced = GridOps.timeslice(probe, "t", 3.0, 7.0)
    assert(sliced.select("it").as[Int].collect().sorted.toSeq == Seq(3, 4, 5, 6, 7))
  }

  test("zoom filters by the moving coordinate, not a static grid") {
    // z in [1.0, 2.5] picks times 2..5 because z = it*0.5 moves with time
    val zoomed = GridOps.zoom(probe, Seq(("z", 1.0, 2.5)))
    assert(zoomed.select("it").as[Int].collect().sorted.toSeq == Seq(2, 3, 4, 5))
  }

  test("time and space slices compose on the moving mesh") {
    val out = GridOps.zoom(GridOps.timeslice(probe, "t", 2.0, 10.0),
      Seq(("x", 4.0, 8.0)))
    assert(out.select("it").as[Int].collect().sorted.toSeq == Seq(4, 5, 6, 7, 8))
  }
}

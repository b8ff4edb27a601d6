package graft.functions

import graft.{QueryRegistry, SharedSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorOpsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("DotProduct: exact value through both interpreted and codegen paths") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 0.5f, -2.0f)))
      .toDF("a", "b")
    val got = df.select(VectorOps.dot(col("a"), col("b"))).as[Double].head()
    assert(got == 1.0 * 4.0 + 2.0 * 0.5 + 3.0 * -2.0) // = -1.0
    // SQL registration path
    VectorOps.register(spark)
    df.createOrReplaceTempView("vecs")
    val viaSql = spark.sql("SELECT dot_product(a, b) FROM vecs").as[Double].head()
    assert(viaSql == got)
  }

  test("DotProduct propagates nulls") {
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    assert(df.select(VectorOps.dot(col("a"), col("b"))).head().isNullAt(0))
  }

  test("q45 (native expression) returns the same top-k as q31 (join shape)") {
    val sf = "/root/testdata/sf0.001"
    val native = QueryRegistry.queries("q45_cosine_topk_native")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val joined = QueryRegistry.queries("q31_cosine_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(native == joined)
  }
}

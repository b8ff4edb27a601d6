package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Generic table export/load across the formats a pipeline actually
  * meets (parquet, orc, csv, json). The reference declares but never
  * implements file round-trips (dataset.py:66-70 `_init_file`,
  * dataset.py:183-193 `export` — both stubs); SimDataset defines the
  * parquet+sidecar dataset format, and this module supplies the
  * plain-table counterpart. CSV/JSON load takes the explicit schema:
  * at 100 TB, schema inference means reading the data twice.
  */
object Formats {
  val Supported: Set[String] = Set("parquet", "orc", "csv", "json")

  def export(df: DataFrame, path: String, format: String): Unit = {
    require(Supported(format), s"unsupported format $format")
    val w = df.write.mode("overwrite").format(format)
    (if (format == "csv") w.option("header", "true") else w).save(path)
  }

  def load(spark: SparkSession, path: String, format: String,
      schema: Option[StructType] = None): DataFrame = {
    require(Supported(format), s"unsupported format $format")
    var r = spark.read.format(format)
    if (format == "csv") r = r.option("header", "true")
    schema.foreach(sc => r = r.schema(sc))
    r.load(path)
  }
}

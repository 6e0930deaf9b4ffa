package graft.input

import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Parallel multi-file vector ingest (reference S6:
  * `read_vector_files(path, pattern, suffix, schema, coerce_to_schema)`
  * reads a directory of vector files as parallel chunked GDAL reads
  * into one Spark DataFrame, `dataframe.py:196-197` /
  * `_vector.py:404-437`). This is the SCALE path for the round-5
  * format codecs: a crawl-scale corpus is many small vector files, so
  * the driver touches only the file LIST plus one file for the schema,
  * and every file parses on an executor — one task per file up to the
  * cluster's parallelism, no driver materialization, no shuffle (the
  * union is a narrow concatenation of per-file partitions).
  *
  * Schema handling mirrors the reference's `coerce_to_schema` kwarg:
  * the first file (sorted order) defines the schema; later files align
  * by column NAME — missing columns null, extra columns dropped,
  * integral->double widening — or, with `coerceToSchema = false`, must
  * match exactly (analysis error otherwise, like GDAL's strict mode).
  */
object VectorFiles {

  /** Suffix dispatch shared with [[graft.core.LayerWrapper.fromFiles]];
    * session-free so it runs inside executor tasks.
    */
  private[graft] def parseFile(path: String): (StructType, Seq[Row]) = {
    path.split('.').lastOption.map(_.toLowerCase) match {
      case Some("gpkg") => Gpkg.parseRows(path)
      case Some("shp") => Shapefile.parseRows(path)
      case Some("geojson") => GeoJson.parseRows(path)
      case other =>
        throw new IllegalArgumentException(
          s"$path: unsupported vector suffix $other (gpkg/shp/geojson)")
    }
  }

  private def align(target: StructType, fileSchema: StructType,
      rows: Seq[Row], path: String, coerce: Boolean): Seq[Row] = {
    if (fileSchema == target) return rows
    require(coerce,
      s"$path: schema ${fileSchema.simpleString} != ${target.simpleString} " +
        "and coerceToSchema = false")
    val srcIdx = fileSchema.fieldNames.zipWithIndex.toMap
    val mapping = target.fields.map { tf =>
      (srcIdx.get(tf.name), tf.dataType,
        srcIdx.get(tf.name).map(fileSchema(_).dataType))
    }
    rows.map { r =>
      Row.fromSeq(mapping.toSeq.map {
        case (None, _, _) => null
        case (Some(i), tt, Some(ft)) =>
          val v = r.get(i)
          if (v == null || ft == tt) v
          else (v, tt) match {
            case (x: Long, DoubleType) => x.toDouble
            case (x: Long, StringType) => x.toString
            case (x: Double, StringType) => x.toString
            case _ => null // un-coercible (reference: GDAL null-fills)
          }
        case (Some(i), _, None) => r.get(i)
      })
    }
  }

  /** Read every matching vector file under `dir` into one DataFrame.
    * `suffix` filters by extension (e.g. ".shp"); `pattern` is an
    * optional filename regex (the reference's `pattern` kwarg).
    */
  def read(spark: SparkSession, dir: String, suffix: String = "",
      pattern: String = "", coerceToSchema: Boolean = true): DataFrame = {
    import scala.jdk.CollectionConverters._
    val known = Set("gpkg", "shp", "geojson")
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .iterator().asScala
      .map(_.toString)
      // no suffix filter -> every KNOWN vector suffix (a shapefile's
      // .dbf/.shx sidecars are read via their .shp, never directly)
      .filter(p => p.split('.').lastOption.map(_.toLowerCase)
        .exists(known.contains))
      .filter(p => suffix.isEmpty || p.toLowerCase.endsWith(suffix.toLowerCase))
      .filter(p => pattern.isEmpty ||
        p.split('/').last.matches(pattern))
      .toSeq.sorted
    require(files.nonEmpty, s"no vector files under $dir (suffix=$suffix)")
    // driver parses ONE file for the schema; all pixels/features parse
    // on executors
    val (schema, _) = parseFile(files.head)
    val rdd = spark.sparkContext
      .parallelize(files,
        math.max(1, math.min(files.size, spark.sparkContext.defaultParallelism)))
      .flatMap { p =>
        val (fs, rows) = parseFile(p)
        align(schema, fs, rows, p, coerceToSchema)
      }
    spark.createDataFrame(rdd, schema)
  }
}

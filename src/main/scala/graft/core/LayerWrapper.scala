package graft.core

import graft.ops.Categorize
import org.apache.spark.sql.{Column, DataFrame}

/** The reference's `DataFrameWrapper` (`dataframe.py:72-108`) rebuilt
  * immutably: a named DataFrame + optional GEMINI metadata + categorize
  * lookups + lineage DAG.
  *
  * The reference's reflective `call_method` (`dataframe.py:214-284`) is
  * deliberately NOT ported (SURVEY.md §2.2 P5): `transform(label)(f)`
  * gives the same capability — any Spark op with lineage capture —
  * type-safe and without reflection. Named helpers cover the operations
  * the reference's tests exercise.
  */
case class LayerWrapper(
    name: String,
    data: DataFrame,
    metadata: Option[Metadata] = None,
    lookup: Map[String, Map[String, Double]] = Map.empty,
    lineage: LineageDag = LineageDag()) {

  /** Arbitrary transformation with lineage capture. Logs the call in the
    * reference's `@log` decorator shape ("Calling <method>(<args>)",
    * `logger.py:163-229`).
    */
  def transform(label: String)(f: DataFrame => DataFrame): LayerWrapper = {
    LayerWrapper.log.info(s"Calling $label on layer '$name'")
    copy(data = f(data), lineage = lineage.withStep(label, s"$name: $label"))
  }

  def select(cols: Column*): LayerWrapper =
    transform(s"select(${cols.mkString(", ")})")(_.select(cols: _*))

  def filter(condition: String): LayerWrapper =
    transform(s"filter($condition)")(_.filter(condition))

  def limit(n: Int): LayerWrapper = transform(s"limit($n)")(_.limit(n))

  def join(other: DataFrame, on: Seq[String], how: String = "inner"): LayerWrapper =
    transform(s"join(on=${on.mkString(",")}, how=$how)")(_.join(other, on, how))

  def groupAgg(groupCols: Seq[String], aggs: Seq[Column]): LayerWrapper =
    transform(s"groupBy(${groupCols.mkString(",")}).agg(...)")(
      _.groupBy(groupCols.map(org.apache.spark.sql.functions.col): _*)
        .agg(aggs.head, aggs.tail: _*))

  /** Categorize (reference `dataframe.py:286-335`) — immutable: returns a
    * NEW wrapper with updated lookup (the reference documents that calling
    * it twice corrupts state; here it's safe).
    */
  def categorize(columns: Seq[String],
      lookups: Map[String, Map[String, Double]] = Map.empty): LayerWrapper = {
    val (coded, newLookups) = Categorize.categorize(data, columns, lookups)
    copy(data = coded, lookup = lookup ++ newLookups,
      lineage = lineage.withStep(s"categorize(${columns.mkString(",")})",
        s"$name: categorized"))
  }

  /** BNG cell index + explode + bounds — the reference's `index()`
    * (`dataframe.py:337-413`).
    */
  def index(resolution: Long = 100000L, how: String = "intersects",
      geometryCol: String = "geometry", indexCol: String = "bng_index",
      boundsCol: String = "bounds"): LayerWrapper = {
    import graft.index.IndexExpressions._
    import org.apache.spark.sql.functions.{col, explode}
    this.transform(s"index(resolution=$resolution, how=$how)") { df =>
      df.withColumn(indexCol,
          explode(bng_index(col(geometryCol), resolution, how)))
        .withColumn(boundsCol, bng_to_bounds(col(indexCol)))
    }
  }

  /** Tile materialization (reference `to_zarr`) with lineage + lookup
    * attrs carried into the store header.
    */
  def toTileStore(path: String, columns: Seq[String],
      cellSize: Double = Constants.CellSize.toDouble,
      tileSize: Double = Constants.TileSize10k.toDouble,
      overwrite: Boolean = false): DataFrame = {
    val lookupAttrs = lookup.map { case (c, m) =>
      c -> m.toSeq.sortBy(_._2).map { case (k, v) =>
        s"'$k': ${v.toLong}"
      }.mkString("{", ", ", "}")
    }
    graft.raster.RasterPipeline.toTileStore(
      data, "geometry", columns, path, lookupAttrs, cellSize, tileSize,
      overwrite = overwrite)
  }
}

object LayerWrapper {
  private[core] val log = org.slf4j.LoggerFactory.getLogger(classOf[LayerWrapper])

  /** Suffix-dispatch reader (reference `from_files`, `dataframe.py:110-212`):
    * csv/json/parquet via Spark readers; xlsx/ods via the zipped-XML
    * spreadsheet parser (driver-side like the reference's pandas path);
    * metadata from GEMINI XML or sidecar JSON when given.
    */
  def fromFiles(spark: org.apache.spark.sql.SparkSession, dataPath: String,
      name: Option[String] = None, metadataPath: Option[String] = None,
      readOptions: Map[String, String] = Map.empty): LayerWrapper = {
    val reader = spark.read.options(readOptions)
    val df = dataPath.split('.').lastOption.map(_.toLowerCase) match {
      case Some("csv") => reader.option("header", "true").csv(dataPath)
      case Some("json") => reader.json(dataPath)
      case Some("xlsx") | Some("xlsm") | Some("ods") =>
        graft.input.Xlsx.read(spark, dataPath)
      case Some("xls") =>
        graft.input.Xls.read(spark, dataPath)
      case Some("gpkg") =>
        graft.input.Gpkg.read(spark, dataPath)
      case Some("shp") =>
        graft.input.Shapefile.read(spark, dataPath)
      case Some("geojson") =>
        graft.input.GeoJson.read(spark, dataPath)
      case _ => reader.parquet(dataPath)
    }
    val meta = metadataPath.map { p =>
      if (p.endsWith(".json")) Metadata.fromJsonFile(p) else Metadata.fromXmlFile(p)
    }
    val layerName = name.getOrElse(
      dataPath.split('/').last.split('.').head)
    LayerWrapper(layerName, df, meta,
      lineage = LineageDag().withInput(s"read $dataPath"))
  }
}

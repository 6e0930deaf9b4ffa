package graft.run

import graft.geo.GeoExpressions._
import graft.index.IndexExpressions._
import graft.ops.{Categorize, KnnJoin, SpatialJoin}
import graft.raster.{Rasterize, TileGrid}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The driver-facing query catalogue: every operator from SURVEY.md §2
  * exposed over the shared parquet tables, paired (in SparkEntry.oracleSql)
  * with DuckDB-executable oracle SQL.
  *
  * Spatial queries need geometry the TPC-H-ish tables don't carry, so
  * points/polygons are derived with pure integer arithmetic on the keys —
  * the SAME arithmetic the oracle SQL runs — while the Spark side goes
  * through the real engine path (Catalyst cell-encoder expressions, JTS
  * refinement, scanline rasterization, ring-expansion kNN). Constants are
  * small primes; products stay far below 2^63 (DuckDB errors on overflow).
  *
  * ORACLE DTYPE CONVENTION (pinned after the q57/q71 round-5 hash-reds):
  * DuckDB's SUM over any integer type returns HUGEINT, which the driver's
  * pandas-based hasher renders as float64 ("35000.0" != Spark's "35000").
  * Therefore every integer SUM that reaches an OUTPUT column must be
  * wrapped in CAST(... AS BIGINT) in the oracle SQL. SUMs that are only
  * consumed by downstream CTEs (e.g. q32's session-id window SUM, which is
  * grouped by and never emitted) are exempt — the cast convention applies
  * to the SELECT list the driver hashes. COUNT(*) is already BIGINT in
  * DuckDB and needs no cast.
  */
object GraftQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")


  /** Per-(session, query) scratch store root: fixed path, wiped before
    * reuse — repeated Verify/Bench runs in one JVM don\'t accumulate a
    * temp dir per invocation, and the query stays re-runnable.
    */
  private def scratchStore(spark: SparkSession, tag: String): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      s"graft-$tag-store-${spark.sparkContext.applicationId}")
    def wipe(x: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.isDirectory(x))
        java.nio.file.Files.list(x).iterator().asScala.toSeq.foreach(wipe)
      java.nio.file.Files.deleteIfExists(x)
    }
    wipe(p)
    p.toString
  }

  /** Deterministic point geocode of documents (shared with oracle SQL). */
  def docPoints(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents").select(
      col("doc_id"),
      ((col("doc_id") * 104729L + 12345L) % 700000L).as("x"),
      ((col("doc_id") * 130363L + 54321L) % 1300000L).as("y"),
      col("lang"))

  private val docPointsSql =
    """SELECT doc_id,
      |       (doc_id * 104729 + 12345) % 700000 AS x,
      |       (doc_id * 130363 + 54321) % 1300000 AS y,
      |       lang
      |FROM documents""".stripMargin

  /** Deterministic 50 km boxes per nation (shared with oracle SQL). */
  def nationBoxes(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "nation").select(
      col("n_nationkey").cast("long").as("nation_key"),
      ((col("n_nationkey").cast("long") * 99991L + 7L) % 650000L).as("px0"),
      ((col("n_nationkey").cast("long") * 299993L + 11L) % 1250000L).as("py0"))

  private val nationBoxesSql =
    """SELECT CAST(n_nationkey AS BIGINT) AS nation_key,
      |       (CAST(n_nationkey AS BIGINT) * 99991 + 7) % 650000 AS px0,
      |       (CAST(n_nationkey AS BIGINT) * 299993 + 11) % 1250000 AS py0
      |FROM nation""".stripMargin

  // ------------------------------------------------------------------
  // Relational core (reference §2.2/§2.3/§2.4 — the call_method surface)
  // ------------------------------------------------------------------

  /** P1/P2/A1: TPC-H Q1-style pricing summary. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("n_rows"))

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |       ROUND(SUM(l_quantity), 2) AS sum_qty,
      |       ROUND(SUM(l_extendedprice), 2) AS sum_price,
      |       ROUND(AVG(l_discount), 6) AS avg_disc,
      |       COUNT(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** J1: three-way equi-join with explicit broadcast of the dims. */
  def q2Join(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    val cust = t(spark, dir, "customer")
    val nation = t(spark, dir, "nation")
    orders
      .join(broadcast(cust), orders("o_custkey") === cust("c_custkey"))
      .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
  }

  val q2Sql: String =
    """SELECT n_name, ROUND(SUM(o_totalprice), 2) AS revenue, COUNT(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin

  /** P2/A3: TPC-H Q6-style selective filter + single agg (predicate must
    * push to the parquet scan).
    */
  def q3Filter(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_rows"))

  val q3Sql: String =
    """SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
      |       COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin

  /** Window top-k: 3 priciest orders per customer. */
  def q4Window(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(spark, dir, "orders")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("rnk").cast("long").as("rnk"))
  }

  val q4Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      |  FROM orders) WHERE rnk <= 3""".stripMargin

  /** Sort + limit (deterministic tie-break on the key). */
  def q5SortLimit(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
      .select(col("o_orderkey"), col("o_totalprice"))

  val q5Sql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  // ------------------------------------------------------------------
  // Categorize / lookup join (reference §2.6: A2 + J2)
  // ------------------------------------------------------------------

  /** A2: dense code assignment, deterministic sorted order — distributed
    * two-phase rank (no single-partition window at any cardinality).
    */
  def q6Categorize(spark: SparkSession, dir: String): DataFrame =
    Categorize.denseCodes(t(spark, dir, "documents"), "lang", "code")

  val q6Sql: String =
    """SELECT lang, CAST(ROW_NUMBER() OVER (ORDER BY lang) - 1 AS BIGINT) AS code
      |FROM (SELECT DISTINCT lang FROM documents)""".stripMargin

  /** J2: broadcast lookup join applying the codes. */
  def q7LookupJoin(spark: SparkSession, dir: String): DataFrame =
    Categorize.categorizeColumnPlan(t(spark, dir, "documents"), "lang", "lang_code")
      .select(col("doc_id"), col("lang"), col("lang_code"))

  val q7Sql: String =
    """SELECT doc_id, lang,
      |       CAST(DENSE_RANK() OVER (ORDER BY lang) - 1 AS BIGINT) AS lang_code
      |FROM documents""".stripMargin

  // ------------------------------------------------------------------
  // Dedup / text analysis (training-data pipeline ops)
  // ------------------------------------------------------------------

  /** Exact dedup via content hash (hash-groupBy; map-side combine). */
  def q8DedupExact(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy(md5(col("text").cast("binary")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_count"))

  val q8Sql: String =
    """SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id,
      |       COUNT(*) AS dup_count
      |FROM documents GROUP BY md5(text)""".stripMargin

  /** Streaming-shaped hourly aggregation (batch equivalent of the
    * Structured Streaming windowed agg in graft.streaming).
    */
  def q9Hourly(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))

  val q9Sql: String =
    """SELECT date_trunc('hour', ts) AS hour, event_type,
      |       COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Text quality metrics: length / token / punctuation counts (pure
    * integer string math so the oracle matches bit-for-bit).
    */
  def q10TextQuality(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents").select(
      col("doc_id"),
      length(col("text")).cast("long").as("len"),
      (length(col("text")) - length(regexp_replace(col("text"), lit(" "), lit("")))
        + 1).cast("long").as("n_tokens"),
      (length(col("text")) - length(regexp_replace(col("text"), lit("\\."), lit(""))))
        .cast("long").as("n_periods"))

  val q10Sql: String =
    """SELECT doc_id,
      |       CAST(LENGTH(text) AS BIGINT) AS len,
      |       CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
      |       CAST(LENGTH(text) - LENGTH(REPLACE(text, '.', '')) AS BIGINT) AS n_periods
      |FROM documents""".stripMargin

  /** Document fingerprint: normalized-content hash prefix. */
  def q11Fingerprint(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents").select(
      col("doc_id"),
      substring(md5(lower(trim(col("text"))).cast("binary")), 1, 16).as("fp"))

  val q11Sql: String =
    """SELECT doc_id, substr(md5(lower(trim(text))), 1, 16) AS fp
      |FROM documents""".stripMargin

  // ------------------------------------------------------------------
  // Spatial: cell index / tiles / joins / kNN / rasterize
  // ------------------------------------------------------------------

  /** U1/U2: BNG 10 km cell assignment + cell bounds via the Catalyst
    * cell-encoder expressions; oracle recomputes the OSGB letter math in
    * SQL.
    */
  def q12BngCell(spark: SparkSession, dir: String): DataFrame =
    docPoints(spark, dir)
      .withColumn("bng10",
        bng_index_point(col("x").cast("double"), col("y").cast("double"), 10000L))
      .withColumn("b", bng_to_bounds(col("bng10")))
      .select(col("doc_id"), col("bng10"),
        element_at(col("b"), 1).as("minx"),
        element_at(col("b"), 2).as("miny"))

  val q12Sql: String =
    s"""WITH pts AS ($docPointsSql),
      |c AS (
      |  SELECT doc_id, x, y,
      |         CAST(FLOOR(x / 100000) AS BIGINT) AS e1,
      |         CAST(FLOOR(y / 100000) AS BIGINT) AS n1
      |  FROM pts)
      |SELECT doc_id,
      |       substr('ABCDEFGHJKLMNOPQRSTUVWXYZ',
      |         CAST((19 - n1) - ((19 - n1) % 5) + FLOOR((e1 + 10) / 5) AS INT) + 1, 1)
      |       || substr('ABCDEFGHJKLMNOPQRSTUVWXYZ',
      |         CAST(((19 - n1) * 5) % 25 + (e1 % 5) AS INT) + 1, 1)
      |       || CAST(CAST(FLOOR((x % 100000) / 10000) AS INT) AS VARCHAR)
      |       || CAST(CAST(FLOOR((y % 100000) / 10000) AS INT) AS VARCHAR) AS bng10,
      |       CAST(FLOOR(x / 10000) AS DOUBLE) * 10000 AS minx,
      |       CAST(FLOOR(y / 10000) AS DOUBLE) * 10000 AS miny
      |FROM c""".stripMargin

  /** Tile-assignment counts per 10 km cell (the north-rule throughput
    * kernel).
    */
  def q13TileCounts(spark: SparkSession, dir: String): DataFrame =
    docPoints(spark, dir)
      .withColumn("bng10",
        bng_index_point(col("x").cast("double"), col("y").cast("double"), 10000L))
      .groupBy(col("bng10"))
      .agg(count(lit(1)).as("n"))

  val q13Sql: String =
    s"""WITH pts AS ($docPointsSql),
      |c AS (
      |  SELECT CAST(FLOOR(x / 100000) AS BIGINT) AS e1,
      |         CAST(FLOOR(y / 100000) AS BIGINT) AS n1, x, y
      |  FROM pts)
      |SELECT substr('ABCDEFGHJKLMNOPQRSTUVWXYZ',
      |         CAST((19 - n1) - ((19 - n1) % 5) + FLOOR((e1 + 10) / 5) AS INT) + 1, 1)
      |       || substr('ABCDEFGHJKLMNOPQRSTUVWXYZ',
      |         CAST(((19 - n1) * 5) % 25 + (e1 % 5) AS INT) + 1, 1)
      |       || CAST(CAST(FLOOR((x % 100000) / 10000) AS INT) AS VARCHAR)
      |       || CAST(CAST(FLOOR((y % 100000) / 10000) AS INT) AS VARCHAR) AS bng10,
      |       COUNT(*) AS n
      |FROM c GROUP BY 1""".stripMargin

  /** J5: cell-indexed point-in-polygon spatial join through the real
    * filter-refine engine path (BNG cell equi-join + JTS covers).
    */
  def q14SpatialJoin(spark: SparkSession, dir: String): DataFrame = {
    val pts = docPoints(spark, dir)
      .select(col("doc_id"), col("x").cast("double").as("x"),
        col("y").cast("double").as("y"))
    val polys = nationBoxes(spark, dir)
      .withColumn("geometry", st_box(
        col("px0").cast("double"), col("py0").cast("double"),
        (col("px0") + 50000L).cast("double"), (col("py0") + 50000L).cast("double")))
      .select(col("nation_key"), col("geometry"))
    SpatialJoin.pointInPolygon(pts, "x", "y", polys, "geometry",
      resolution = 10000L, broadcastPolys = true, predicate = "covers")
      .select(col("doc_id"), col("nation_key"))
  }

  val q14Sql: String =
    s"""WITH pts AS ($docPointsSql),
      |polys AS ($nationBoxesSql)
      |SELECT p.doc_id, q.nation_key
      |FROM pts p, polys q
      |WHERE p.x >= q.px0 AND p.x <= q.px0 + 50000
      |  AND p.y >= q.py0 AND p.y <= q.py0 + 50000""".stripMargin

  /** J6: kNN via BNG cell-ring expansion (k=5, 100 km cells). */
  def q15Knn(spark: SparkSession, dir: String): DataFrame = {
    val queries = nationBoxes(spark, dir).select(
      col("nation_key"),
      ((col("nation_key") * 37199L + 101L) % 700000L).cast("double").as("qx"),
      ((col("nation_key") * 54011L + 303L) % 1300000L).cast("double").as("qy"))
    val data = docPoints(spark, dir).select(
      col("doc_id"), col("x").cast("double").as("x"), col("y").cast("double").as("y"))
    KnnJoin.knnAdaptive(queries, "nation_key", "qx", "qy",
        data, "doc_id", "x", "y", k = 5, resolution = 100000L)
      .select(col("nation_key"), col("doc_id"),
        col("dist2").cast("long").as("dist2"),
        col("rank").cast("long").as("rnk"))
  }

  val q15Sql: String =
    s"""WITH pts AS ($docPointsSql),
      |nb AS ($nationBoxesSql),
      |q AS (
      |  SELECT nation_key,
      |         (nation_key * 37199 + 101) % 700000 AS qx,
      |         (nation_key * 54011 + 303) % 1300000 AS qy
      |  FROM nb),
      |d AS (
      |  SELECT q.nation_key, p.doc_id,
      |         (p.x - q.qx) * (p.x - q.qx) + (p.y - q.qy) * (p.y - q.qy) AS dist2
      |  FROM q, pts p),
      |r AS (
      |  SELECT nation_key, doc_id, dist2,
      |         ROW_NUMBER() OVER (PARTITION BY nation_key
      |                            ORDER BY dist2, doc_id) AS rnk
      |  FROM d)
      |SELECT nation_key, doc_id, CAST(dist2 AS BIGINT) AS dist2, rnk
      |FROM r WHERE rnk <= 5""".stripMargin

  /** U4/R1: tile materialization through the real scanline/burn kernel —
    * points burn into per-10km-tile rasters at 100 m cells (last write
    * wins in doc_id order), then each tile array is summarized so the
    * oracle can recompute it relationally.
    */
  def q16RasterBurn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pts = Categorize.categorizeColumnPlan(
        docPoints(spark, dir), "lang", "lang_code")
      .select(col("doc_id"), col("x"), col("y"), col("lang_code"))
      .as[(Long, Long, Long, Long)]
    // hash-partition by tile, sort by (tile, doc_id) so last-write-wins
    // order is the doc order WITHOUT buffering the group (streaming
    // burn). Hash, not range (round 7): range sampling re-evaluated the
    // categorize-joined projection a second time; the burn only needs
    // tile-locality + intra-partition order.
    pts.toDF("doc_id", "x", "y", "lang_code")
      .withColumn("__te__", org.apache.spark.sql.functions.expr("x div 10000"))
      .withColumn("__tn__", org.apache.spark.sql.functions.expr("y div 10000"))
      .repartition(col("__te__"), col("__tn__"))
      .sortWithinPartitions(col("__te__"), col("__tn__"), col("doc_id"))
      .as[(Long, Long, Long, Long, Long, Long)]
      .mapPartitions { rows =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
        var curTe = Long.MinValue
        var curTn = Long.MinValue
        var grid: TileGrid = null
        def flush(): Unit = if (grid != null) {
          var burned = 0L
          var sum = 0L
          grid.data.foreach { v => if (v >= 0) { burned += 1; sum += v.toLong } }
          out += ((curTe, curTn, burned, sum))
        }
        rows.foreach { case (_, x, y, code, te, tn) =>
          if (te != curTe || tn != curTn) {
            flush()
            curTe = te; curTn = tn
            grid = Rasterize.empty(minx = te * 10000d, miny = tn * 10000d,
              cellSize = 100d, cells = 100, fill = -1d)
          }
          Rasterize.burnPoint(grid, x.toDouble, y.toDouble, code.toDouble)
        }
        flush()
        out.iterator
      }
      .toDF("tile_e", "tile_n", "burned_cells", "value_sum")
  }

  val q16Sql: String =
    s"""WITH pts AS ($docPointsSql),
      |coded AS (
      |  SELECT doc_id, x, y,
      |         CAST(DENSE_RANK() OVER (ORDER BY lang) - 1 AS BIGINT) AS code
      |  FROM pts),
      |cells AS (
      |  SELECT CAST(FLOOR(x / 10000) AS BIGINT) AS tile_e,
      |         CAST(FLOOR(y / 10000) AS BIGINT) AS tile_n,
      |         CAST(FLOOR(x / 100) AS BIGINT) AS ce,
      |         CAST(FLOOR(y / 100) AS BIGINT) AS cn,
      |         code,
      |         ROW_NUMBER() OVER (PARTITION BY CAST(FLOOR(x / 100) AS BIGINT),
      |                                         CAST(FLOOR(y / 100) AS BIGINT)
      |                            ORDER BY doc_id DESC) AS rn
      |  FROM coded)
      |SELECT tile_e, tile_n, COUNT(*) AS burned_cells,
      |       CAST(SUM(code) AS BIGINT) AS value_sum
      |FROM cells WHERE rn = 1 GROUP BY tile_e, tile_n""".stripMargin

  /** ANN top-k by exact quantized dot product (integer math end to end so
    * the oracle is bit-exact; the float cosine variant is exposed
    * separately as a rows-only query).
    */
  def q17AnnDot(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val dot = aggregate(
      zip_with(col("qe"), col("embedding"), (a, b) =>
        (floor(a.cast("double") * 1000) * floor(b.cast("double") * 1000)).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val w = Window.partitionBy(col("qid")).orderBy(col("dot").desc, col("vec_id"))
    emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("dot", dot)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select(col("qid"), col("vec_id"), col("dot"), col("rnk").cast("long").as("rnk"))
  }

  val q17Sql: String =
    """WITH q AS (
      |  SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
      |pos AS (SELECT UNNEST(range(1, 65)) AS i),
      |dots AS (
      |  SELECT q.qid, e.vec_id,
      |         CAST(SUM(CAST(FLOOR(CAST(q.qe[i] AS DOUBLE) * 1000) AS BIGINT)
      |                * CAST(FLOOR(CAST(e.embedding[i] AS DOUBLE) * 1000) AS BIGINT))
      |              AS BIGINT) AS dot
      |  FROM q, embeddings e, pos
      |  WHERE e.vec_id <> q.qid
      |  GROUP BY q.qid, e.vec_id),
      |r AS (
      |  SELECT qid, vec_id, dot,
      |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id) AS rnk
      |  FROM dots)
      |SELECT qid, vec_id, dot, rnk FROM r WHERE rnk <= 10""".stripMargin

  // ------------------------------------------------------------------
  // Semi/anti joins, set ops (SURVEY.md §2.3/§2.8 extensions)
  // ------------------------------------------------------------------

  /** Semi/anti join: per market segment, customers with vs without
    * orders (left_semi / left_anti — EXISTS / NOT EXISTS).
    */
  def q18SemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer")
    val orders = t(spark, dir, "orders").select(col("o_custkey"))
    val withO = cust.join(orders, cust("c_custkey") === orders("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_with"))
    val withoutO = cust.join(orders, cust("c_custkey") === orders("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_without"))
    withO.join(withoutO, Seq("c_mktsegment"), "full_outer")
      .na.fill(0, Seq("n_with", "n_without"))
  }

  val q18Sql: String =
    """SELECT c_mktsegment,
      |  CAST(COALESCE(SUM(CASE WHEN has_o THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_with,
      |  CAST(COALESCE(SUM(CASE WHEN has_o THEN 0 ELSE 1 END), 0) AS BIGINT) AS n_without
      |FROM (
      |  SELECT c_mktsegment,
      |         EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS has_o
      |  FROM customer)
      |GROUP BY c_mktsegment""".stripMargin

  /** Set operations: intersect / except of big-spender custkeys. */
  def q19SetOps(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = t(spark, dir, "orders").filter(col("o_totalprice") > 150000)
      .select(col("o_custkey").as("k")).distinct()
    val richCust = t(spark, dir, "customer").filter(col("c_acctbal") > 5000)
      .select(col("c_custkey").as("k")).distinct()
    bigOrders.intersect(richCust).withColumn("tag", lit("both"))
      .unionByName(bigOrders.except(richCust).withColumn("tag", lit("only_orders")))
      .unionByName(richCust.except(bigOrders).withColumn("tag", lit("only_rich")))
  }

  val q19Sql: String =
    """WITH bo AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 150000),
      |rc AS (SELECT DISTINCT c_custkey AS k FROM customer WHERE c_acctbal > 5000)
      |SELECT k, 'both' AS tag FROM (SELECT k FROM bo INTERSECT SELECT k FROM rc)
      |UNION ALL
      |SELECT k, 'only_orders' AS tag FROM (SELECT k FROM bo EXCEPT SELECT k FROM rc)
      |UNION ALL
      |SELECT k, 'only_rich' AS tag FROM (SELECT k FROM rc EXCEPT SELECT k FROM bo)""".stripMargin

  // ------------------------------------------------------------------
  // Near-dup dedup family
  // ------------------------------------------------------------------

  /** MinHash LSH candidates, oracle-EXACT since round 5 via the md5
    * integer twin ([[graft.ops.Dedup.minhashCandidatesMd5]] — the
    * q21/q25/q54 playbook): md5-derived 28-bit shingle hashes, affine
    * integer hash family, exact band-slice bucket keys, integer-ppm
    * estimates. The oracle replays the complete LSH semantics — 64-hash
    * signature, 16-band collision, agreement count — relationally. The
    * xxhash production path stays the bench kernel (q39 exercises it
    * with skew caps).
    */
  def q20Minhash(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.minhashCandidatesMd5(t(spark, dir, "documents"),
      "doc_id", "text", numHashes = 64, bands = 16)
      .filter(col("est_jaccard_ppm") >= 500000L)

  val q20Sql: String =
    """WITH ws AS (
      |  SELECT doc_id, regexp_extract_all(lower(text),
      |           '[a-z]+|[0-9]+|[^a-z0-9 \t\n\r]') AS w
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |         list_distinct([CAST(('0x' || substr(
      |             md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]), 1, 7)) AS BIGINT)
      |           for i in range(1, len(w) - 1)]) AS hs
      |  FROM ws WHERE len(w) >= 3),
      |sigc AS (
      |  SELECT doc_id, k,
      |         list_min([((2*k + 1) * h + k*k + 1) % 2147483647 for h in hs]) AS mh
      |  FROM sh, (SELECT unnest(range(64)) AS k)),
      |sig AS (SELECT doc_id, list(mh ORDER BY k) AS s FROM sigc GROUP BY doc_id),
      |pairs AS (
      |  SELECT x.doc_id AS a, y.doc_id AS b, x.s AS sa, y.s AS sb
      |  FROM sig x JOIN sig y ON x.doc_id < y.doc_id),
      |scored AS (
      |  SELECT a, b,
      |         list_sum([CASE WHEN sa[4*bnd+1] = sb[4*bnd+1]
      |                         AND sa[4*bnd+2] = sb[4*bnd+2]
      |                         AND sa[4*bnd+3] = sb[4*bnd+3]
      |                         AND sa[4*bnd+4] = sb[4*bnd+4]
      |                        THEN 1 ELSE 0 END for bnd in range(0, 16)]) AS nb,
      |         list_sum([CASE WHEN sa[i] = sb[i] THEN 1 ELSE 0 END
      |                   for i in range(1, 65)]) AS agree
      |  FROM pairs)
      |SELECT a, b, CAST(agree * 15625 AS BIGINT) AS est_jaccard_ppm
      |FROM scored WHERE nb > 0 AND agree * 15625 >= 500000""".stripMargin

  /** SimHash near-dup pairs, end-to-end oracle-checked: the 60-bit
    * md5-token simhash is recomputable in SQL, and the 4x15-bit banding is
    * EXACT for Hamming <= 3 (pigeonhole), so the LSH output equals the
    * all-pairs Hamming join the oracle computes.
    */
  def q21Simhash(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    graft.ops.Dedup.simhashPairsSig(docs, "doc_id",
        graft.ops.Dedup.simhash_md5_60(col("text")),
        bits = 60, chunks = 4, maxHamming = 3)
      .select(col("a"), col("b"), col("sha"), col("shb"),
        col("hamming").cast("long").as("hamming"))
  }

  val q21Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |         unnest(regexp_extract_all(lower(text),
      |                '[a-z]+|[0-9]+|[^a-z0-9 \t\n\r]')) AS tok
      |  FROM documents),
      |th AS (
      |  SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
      |  FROM toks),
      |bits AS (
      |  SELECT doc_id, b,
      |         SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS acc
      |  FROM th, (SELECT unnest(range(60)) AS b) GROUP BY 1, 2),
      |sh AS (
      |  SELECT doc_id,
      |         CAST(SUM(CASE WHEN acc > 0 THEN (1::BIGINT << b) ELSE 0 END)
      |              AS BIGINT) AS s
      |  FROM bits GROUP BY 1)
      |SELECT x.doc_id AS a, y.doc_id AS b, x.s AS sha, y.s AS shb,
      |       CAST(bit_count(xor(x.s, y.s)) AS BIGINT) AS hamming
      |FROM sh x JOIN sh y ON x.doc_id < y.doc_id
      |WHERE bit_count(xor(x.s, y.s)) <= 3""".stripMargin

  /** Exact word-3-shingle Jaccard near-dups (LSH-accelerated; the oracle
    * recomputes all pairs relationally with DuckDB list ops).
    *
    * Recall caveat (inherent to LSH, stated rather than hidden): the
    * 16-band x 4-row banding misses a true J>=0.8 pair with probability
    * (1 - J^4)^16 (~2e-4 at J=0.8, falling fast toward 0 as J -> 1),
    * while the oracle is exhaustive — so oracle equality is
    * overwhelmingly likely but not guaranteed by construction on
    * arbitrary data. The sf fixtures' true pairs are all J >= 0.9
    * (measured), where the miss probability is < 4e-8 per pair. jaccard
    * is
    * emitted in integer ppm — identical IEEE division then identical
    * floor in both engines.
    */
  def q22NgramJaccard(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.minhashDedup(t(spark, dir, "documents"),
        "doc_id", "text", threshold = 0.8)
      .select(col("a"), col("b"),
        floor(col("jaccard") * lit(1000000.0) + lit(0.5)).cast("long")
          .as("jaccard_ppm"))

  val q22Sql: String =
    """WITH sh AS (
      |  SELECT doc_id,
      |         list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
      |                        for i in range(1, len(ws) - 1)]) AS s
      |  FROM (SELECT doc_id,
      |               regexp_extract_all(lower(text),
      |                 '[a-z]+|[0-9]+|[^a-z0-9 \t\n\r]') AS ws
      |        FROM documents)),
      |pairs AS (
      |  SELECT x.doc_id AS a, y.doc_id AS b,
      |         CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) AS inter,
      |         CAST(len(x.s) + len(y.s) AS DOUBLE) AS tot
      |  FROM sh x JOIN sh y ON x.doc_id < y.doc_id)
      |SELECT a, b,
      |       CAST(FLOOR(1000000.0 * (inter / (tot - inter)) + 0.5) AS BIGINT)
      |         AS jaccard_ppm
      |FROM pairs WHERE inter / (tot - inter) >= 0.8""".stripMargin

  /** Embedding near-dup: the shared embeddings table has no natural
    * high-cosine pairs (max ~0.48), so plant perturbed copies of the
    * first 20 vectors (deterministic) and find them via
    * hyperplane LSH + cosine refine. Oracle-EXACT since round 5 via the
    * integer twin ([[graft.ops.Dedup.embeddingNearDupIntMd5]]): quantized
    * long vectors, md5-parity +/-1 hyperplanes, all-integer threshold
    * predicate — the oracle replays bucketing, candidate generation and
    * accept/reject relationally. The float-cosine RHP path stays the
    * production default (DedupSpec + Bench rhp kernel).
    */
  def q23EmbedNearDup(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val planted = emb.filter(col("vec_id") < 20)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(i === 0, (x.cast("double") * 1.01).cast("float")).otherwise(x))
          .as("embedding"))
    graft.ops.Dedup.embeddingNearDupIntMd5(emb.unionByName(planted),
      "vec_id", "embedding", thrNum = 19, thrDen = 20)
  }

  /** DuckDB replay of the COMPLETE integer LSH pipeline: same md5-parity
    * hyperplanes (w = +1 iff first-7-hex md5 integer is odd), same
    * floor(x*1000) quantization, same 4x16-bit sign keys, same
    * all-integer 0.95-cosine predicate. HUGEINT absorbs the squared
    * products on the DuckDB side; the Spark side's Long bound is audited
    * in IntVecSpec.
    */
  val q23Sql: String =
    """WITH emb0 AS (SELECT vec_id, embedding FROM embeddings),
      |allv AS (
      |  SELECT vec_id, embedding FROM emb0
      |  UNION ALL
      |  SELECT vec_id + 100000 AS vec_id,
      |         [CASE WHEN i = 1
      |             THEN CAST(CAST(embedding[i] AS DOUBLE) * 1.01::DOUBLE AS REAL)
      |             ELSE embedding[i] END for i in range(1, len(embedding) + 1)]
      |           AS embedding
      |  FROM emb0 WHERE vec_id < 20),
      |q AS (
      |  SELECT vec_id, i - 1 AS d,
      |         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS qv
      |  FROM allv, (SELECT unnest(range(1, 65)) AS i)),
      |w AS (
      |  SELECT t.t, b.b, d.d,
      |         CASE WHEN CAST(('0x' || substr(
      |             md5('rhp:' || t.t || ':' || b.b || ':' || d.d), 1, 7))
      |             AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END AS w
      |  FROM range(0, 4) t(t), range(0, 16) b(b), range(0, 64) d(d)),
      |sb AS (
      |  SELECT q.vec_id, w.t, w.b,
      |         CASE WHEN SUM(w.w * q.qv) >= 0 THEN 1 ELSE 0 END AS bit
      |  FROM q JOIN w ON q.d = w.d GROUP BY q.vec_id, w.t, w.b),
      |keys AS (
      |  SELECT vec_id, t,
      |         CAST(SUM(CAST(bit AS BIGINT) << b) AS BIGINT) AS key
      |  FROM sb GROUP BY vec_id, t),
      |cand AS (
      |  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
      |  FROM keys x JOIN keys y ON x.t = y.t AND x.key = y.key
      |   AND x.vec_id < y.vec_id),
      |n2 AS (SELECT vec_id, SUM(qv * qv) AS n2 FROM q GROUP BY vec_id),
      |nums AS (
      |  SELECT c.a, c.b, SUM(qa.qv * qb.qv) AS num
      |  FROM cand c
      |  JOIN q qa ON qa.vec_id = c.a
      |  JOIN q qb ON qb.vec_id = c.b AND qb.d = qa.d
      |  GROUP BY c.a, c.b)
      |SELECT n.a, n.b,
      |       CAST(floor(CAST(n.num AS DOUBLE) * 1000000 /
      |         sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)))
      |         AS BIGINT) AS cos_ppm
      |FROM nums n JOIN n2 na ON na.vec_id = n.a JOIN n2 nb ON nb.vec_id = n.b
      |WHERE n.num >= 0 AND n.num * n.num * 400 >= 361 * na.n2 * nb.n2""".stripMargin

  /** ANN float-cosine top-k (exact baseline). Oracle-EXACT since round 5:
    * [[graft.ops.Dedup.cosineData]] accumulates dot/na/nb as SEQUENTIAL
    * double adds over float32 inputs (one IEEE rounding per op, fixed
    * order), and DuckDB's `list_sum` over a DOUBLE list comprehension is
    * the same plain sequential sum (verified empirically: a
    * cancellation-crafted case where compensated summation would differ
    * matches the sequential result bit-for-bit) — so the cosine DOUBLE is
    * bit-identical across both engines, no quantization needed.
    */
  def q24AnnCosine(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val qs = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    graft.ops.Similarity.bruteForceTopK(qs, "qid", "qvec",
        emb.filter(col("vec_id") >= 10), "vec_id", "embedding", k = 10)
      .withColumn("rank", col("rank").cast("long"))
      .orderBy(col("qid"), col("rank"))
  }

  val q24Sql: String =
    """WITH c AS (SELECT vec_id, embedding AS v FROM embeddings WHERE vec_id >= 10),
      |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10),
      |pairs AS (SELECT q.qid, c.vec_id,
      |  list_sum([CAST(q.qv[d] AS DOUBLE) * CAST(c.v[d] AS DOUBLE) for d in range(1, 65)]) AS dot,
      |  list_sum([CAST(q.qv[d] AS DOUBLE) * CAST(q.qv[d] AS DOUBLE) for d in range(1, 65)]) AS na,
      |  list_sum([CAST(c.v[d] AS DOUBLE) * CAST(c.v[d] AS DOUBLE) for d in range(1, 65)]) AS nb
      |  FROM q CROSS JOIN c),
      |ranked AS (SELECT qid, vec_id, dot / (sqrt(na) * sqrt(nb)) AS cosine,
      |  CAST(row_number() OVER (PARTITION BY qid
      |    ORDER BY dot / (sqrt(na) * sqrt(nb)) DESC, vec_id) AS BIGINT) AS rank
      |  FROM pairs)
      |SELECT qid, vec_id, cosine, rank FROM ranked WHERE rank <= 10
      |ORDER BY qid, rank""".stripMargin

  /** IVF-bucketed ANN (the 100TB scale path) under an EXACT driver
    * oracle (round 4): integer-valued vectors + the integer-Lloyd
    * distributed trainer ([[graft.ops.Similarity
    * .trainCentroidsDistributedInt]] — one aggregation per iteration,
    * driver traffic = the nlist x dim centroid matrix; integer sums are
    * associative, so training is order-independent and SQL-replicable),
    * integer squared-L2 assignment/probe/ranking. The float-cosine IVF
    * path with the float distributed trainer stays the production
    * default, exercised by Bench.annThroughput + SimilaritySpec recall
    * gates.
    */
  def q25IvfAnn(spark: SparkSession, dir: String): DataFrame = {
    val dim = 64
    val vecs = t(spark, dir, "embeddings").select(col("vec_id"))
      .withColumn("vec", transform(sequence(lit(0), lit(dim - 1)),
        d => (pmod(col("vec_id") * lit(2654435761L) + d.cast("long") * lit(40503L),
          lit(1009L)) - lit(504L)).cast("float")))
    val corpus = vecs.filter(col("vec_id") >= 10)
    val qs = vecs.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("vec").as("qvec"))
    graft.ops.Similarity.ivfTopKL2(qs, "qid", "qvec",
        corpus, "vec_id", "vec", k = 10, nlist = 16, nprobe = 8, iters = 1)
      .select(col("qid"), col("vec_id"),
        col("dist2").cast("long").as("dist2"), col("rank").cast("long").as("rank"))
      // materialize the (k x |queries|)-bounded result before the
      // canonical sort: orderBy's range-sampling pass otherwise re-runs
      // the whole probe join + window a second time (guide §1.2)
      .localCheckpoint(true)
      .orderBy(col("qid"), col("rank"))
  }

  val q25Sql: String =
    """WITH vecs AS (
      |  SELECT vec_id,
      |         [ CAST((vec_id * 2654435761 + d * 40503) % 1009 - 504 AS BIGINT)
      |           for d in range(0, 64) ] AS vec
      |  FROM embeddings),
      |corpus AS (SELECT * FROM vecs WHERE vec_id >= 10),
      |q AS (SELECT vec_id AS qid, vec AS qvec FROM vecs WHERE vec_id < 10),
      |init AS (
      |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code, vec AS c
      |  FROM corpus ORDER BY vec_id LIMIT 16),
      |a0 AS (
      |  SELECT vec_id, code FROM (
      |    SELECT s.vec_id, i.code,
      |           row_number() OVER (PARTITION BY s.vec_id
      |             ORDER BY list_sum([ (s.vec[d] - i.c[d]) * (s.vec[d] - i.c[d])
      |                                 for d in range(1, 65) ]), i.code) AS rn
      |    FROM corpus s CROSS JOIN init i)
      |  WHERE rn = 1),
      |elems AS (
      |  SELECT a.code, UNNEST(s.vec) AS x, UNNEST(range(1, 65)) AS i
      |  FROM a0 a JOIN corpus s USING (vec_id)),
      |csum AS (
      |  SELECT code, i, CAST(SUM(x) AS BIGINT) AS sx,
      |         CAST(COUNT(*) AS BIGINT) AS n
      |  FROM elems GROUP BY code, i),
      |cnew AS (
      |  SELECT code,
      |         list(CAST(FLOOR(CAST(sx AS DOUBLE) / n) AS BIGINT) ORDER BY i) AS c
      |  FROM csum GROUP BY code),
      |cents AS (
      |  SELECT i.code, COALESCE(cn.c, i.c) AS c
      |  FROM init i LEFT JOIN cnew cn ON i.code = cn.code),
      |assign AS (
      |  SELECT vec_id, code FROM (
      |    SELECT s.vec_id, ct.code,
      |           row_number() OVER (PARTITION BY s.vec_id
      |             ORDER BY list_sum([ (s.vec[d] - ct.c[d]) * (s.vec[d] - ct.c[d])
      |                                 for d in range(1, 65) ]), ct.code) AS rn
      |    FROM corpus s CROSS JOIN cents ct)
      |  WHERE rn = 1),
      |probe AS (
      |  SELECT qid, code FROM (
      |    SELECT q.qid, ct.code,
      |           row_number() OVER (PARTITION BY q.qid
      |             ORDER BY list_sum([ (q.qvec[d] - ct.c[d]) * (q.qvec[d] - ct.c[d])
      |                                 for d in range(1, 65) ]), ct.code) AS rn
      |    FROM q CROSS JOIN cents ct)
      |  WHERE rn <= 8),
      |scored AS (
      |  SELECT p.qid, a.vec_id,
      |         CAST(list_sum([ (q.qvec[d] - s.vec[d]) * (q.qvec[d] - s.vec[d])
      |                         for d in range(1, 65) ]) AS BIGINT) AS d2
      |  FROM probe p JOIN assign a ON a.code = p.code
      |  JOIN q ON q.qid = p.qid JOIN corpus s ON s.vec_id = a.vec_id)
      |SELECT qid, vec_id, dist2, rank FROM (
      |  SELECT qid, vec_id, d2 AS dist2,
      |         CAST(row_number() OVER (PARTITION BY qid ORDER BY d2, vec_id) AS BIGINT) AS rank
      |  FROM scored) WHERE rank <= 10""".stripMargin

  /** Language id + quality + fingerprint. Oracle-EXACT since round 5: the
    * three kernels are replicated relationally in DuckDB —
    *  - lang_id: bigram extraction (adjacent letter pairs of the
    *    lowercased text) joined against a VALUES table generated from
    *    [[graft.text.TextAnalysis.LangProfiles]] (same constant, no
    *    drift), strict-majority scoring with the kernel's sorted-lang
    *    tie-break = `ORDER BY s DESC, lang`;
    *  - quality: every term is a single IEEE double op on exact integer
    *    counts, written in the kernel's exact evaluation order, so the
    *    double is bit-identical and its floor-ppm matches exactly;
    *  - fingerprint64: the FNV-1a fold runs in a recursive CTE with
    *    HUGEINT mod-2^64 arithmetic (DuckDB BIGINT errors on the wrapping
    *    multiply); the xor over the low 7 bits is exact because the
    *    normalized text is ASCII (q27's byte-level oracle pins that).
    * The raw double `quality` remains spec-pinned (TextAnalysisSpec).
    */
  def q26LangId(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents").select(col("doc_id"),
      graft.text.TextAnalysis.lang_id(col("text")).as("lang_pred"),
      floor(graft.text.TextAnalysis.quality_score(col("text")) *
        lit(1000000.0)).cast("long").as("quality_ppm"),
      graft.text.TextAnalysis.fingerprint(col("text")).as("fp64"))

  val q26Sql: String = {
    val profRows = graft.text.TextAnalysis.LangProfiles.toSeq.sortBy(_._1)
      .flatMap { case (lang, bgs) => bgs.map(bg => s"('$lang','$bg')") }
      .mkString(", ")
    val stopList = graft.text.TextAnalysis.StopWords.toSeq.sorted
      .map(w => s"'$w'").mkString(",")
    s"""WITH prof(lang, bg) AS (VALUES $profRows),
      |low AS (SELECT doc_id, lower(text) AS s FROM documents),
      |bg AS (
      |  SELECT doc_id, substr(s, CAST(i AS INT), 2) AS bg
      |  FROM (SELECT doc_id, s, UNNEST(range(1, len(s))) AS i FROM low)
      |  WHERE substr(s, CAST(i AS INT), 1) BETWEEN 'a' AND 'z'
      |    AND substr(s, CAST(i AS INT) + 1, 1) BETWEEN 'a' AND 'z'),
      |sc AS (SELECT b.doc_id, p.lang, COUNT(*) AS s
      |       FROM bg b JOIN prof p ON p.bg = b.bg GROUP BY 1, 2),
      |best AS (SELECT doc_id, lang FROM (
      |  SELECT doc_id, lang,
      |         row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, lang) AS rn
      |  FROM sc) WHERE rn = 1),
      |stats AS (SELECT doc_id, len(text) AS ln,
      |  len(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
      |  len(regexp_replace(text, '[^0-9]', '', 'g')) AS digits,
      |  len(text) - len(replace(text, ' ', '')) AS spaces,
      |  regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r]') AS toks
      |  FROM documents),
      |qual AS (SELECT doc_id,
      |  CASE WHEN ln = 0 OR len(toks) = 0 THEN 0
      |  ELSE CAST(floor((
      |      CAST(0.3 AS DOUBLE) * LEAST(CAST(1.0 AS DOUBLE), CAST(len(toks) AS DOUBLE) / CAST(20.0 AS DOUBLE))
      |    + CAST(0.25 AS DOUBLE) * (CAST(alpha AS DOUBLE) / ln)
      |    + CAST(0.2 AS DOUBLE) * GREATEST(CAST(0.0 AS DOUBLE), CAST(1.0 AS DOUBLE) - (CAST(4.0 AS DOUBLE) * (ln - alpha - digits - spaces)) / ln)
      |    + CAST(0.15 AS DOUBLE) * LEAST(CAST(1.0 AS DOUBLE), (CAST(4.0 AS DOUBLE) * len(list_filter(toks, x -> lower(x) IN ($stopList)))) / len(toks))
      |    + CAST(0.1 AS DOUBLE) * (CASE WHEN CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks) >= CAST(2.5 AS DOUBLE)
      |                               AND CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks) <= CAST(9.0 AS DOUBLE)
      |                              THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.4 AS DOUBLE) END)
      |    ) * CAST(1000000.0 AS DOUBLE)) AS BIGINT) END AS quality_ppm
      |  FROM stats),
      |norm AS (SELECT doc_id, regexp_replace(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13)), '[ ' || chr(9) || chr(10) || chr(13) || ']+', ' ', 'g') AS s FROM documents),
      |fnv AS (
      |  WITH RECURSIVE r AS (
      |    SELECT doc_id, s, 1 AS i, CAST(1469598103934665603 AS HUGEINT) AS h FROM norm
      |    UNION ALL
      |    SELECT doc_id, s, i + 1,
      |      (((h - (h % 128)) + xor(CAST(h % 128 AS BIGINT), ord(substr(s, i, 1)))) * 1099511628211) % CAST(18446744073709551616 AS HUGEINT)
      |    FROM r WHERE i <= len(s))
      |  SELECT doc_id, CAST(CASE WHEN h >= CAST(9223372036854775808 AS HUGEINT)
      |    THEN h - CAST(18446744073709551616 AS HUGEINT) ELSE h END AS BIGINT) AS fp64
      |  FROM r WHERE i = len(s) + 1)
      |SELECT d.doc_id, COALESCE(b.lang, 'und') AS lang_pred, q.quality_ppm, f.fp64
      |FROM documents d
      |LEFT JOIN best b ON b.doc_id = d.doc_id
      |JOIN qual q ON q.doc_id = d.doc_id
      |JOIN fnv f ON f.doc_id = d.doc_id""".stripMargin
  }

  /** BPE-ish tokenizer count — oracle via regexp in both engines. */
  def q27Tokens(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents").select(col("doc_id"),
      graft.text.TextAnalysis.token_count(col("text")).as("n_tokens"))

  val q27Sql: String =
    """SELECT doc_id,
      |       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r]')) AS BIGINT) AS n_tokens
      |FROM documents""".stripMargin

  /** Multimodal plumbing: batched binary decode (stub codec) — the
    * byte-length-derived metadata is oracle-checkable.
    */
  def q28Multimodal(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.decodeMeta(
        t(spark, dir, "documents").select(col("doc_id"),
          col("text").cast("binary").as("payload")),
        "doc_id", "payload")
      .toDF()
      .select(col("id").as("doc_id"), col("n_bytes"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("channels").cast("long").as("channels"))

  val q28Sql: String =
    """SELECT doc_id,
      |       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
      |       1 + CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) % 64 AS width,
      |       1 + CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) % 37 AS height,
      |       1 + CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) % 3 AS channels
      |FROM documents""".stripMargin

  /** REAL Structured Streaming run (AvailableNow over the events parquet,
    * memory sink) — result equals the batch hourly aggregation oracle.
    */
  def q29StreamHourly(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStream.runHourlyAvailableNow(spark,
      s"$dir/events.parquet", s"graft_stream_${System.nanoTime()}")

  val q29Sql: String =
    """SELECT date_trunc('hour', ts) AS hour, event_type,
      |       COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Batched spherical cell encoders (north rule): H3-style res 7-12 and
    * S2 levels over the doc points (rows-only — the inverse-TM + Helmert
    * + hex/Hilbert chain is not SQL-expressible; pinned by H3S2Spec).
    */
  def q30CellEncoders(spark: SparkSession, dir: String): DataFrame =
    docPoints(spark, dir)
      .withColumn("h3_7", h3_index_point(col("x").cast("double"), col("y").cast("double"), 7))
      .withColumn("h3_9", h3_index_point(col("x").cast("double"), col("y").cast("double"), 9))
      .withColumn("h3_12", h3_index_point(col("x").cast("double"), col("y").cast("double"), 12))
      .withColumn("s2_10", s2_index_point(col("x").cast("double"), col("y").cast("double"), 10))
      .withColumn("s2_16", s2_index_point(col("x").cast("double"), col("y").cast("double"), 16))
      .select("doc_id", "h3_7", "h3_9", "h3_12", "s2_10", "s2_16")

  /** Full tile-materialization sink: doc points -> WKB geometry -> tile
    * shuffle -> scanline burn -> TileStore region writes; returns the
    * per-tile metrics. burned_cells (distinct 10 km cells per 100 km
    * tile) and n_rows are order-independent, so the oracle can recompute
    * them relationally.
    */
  def q31RasterStore(spark: SparkSession, dir: String): DataFrame = {
    val pts = Categorize.categorizeColumnPlan(docPoints(spark, dir), "lang", "lang_code")
      .withColumn("geometry",
        st_point(col("x").cast("double"), col("y").cast("double")))
    val path = scratchStore(spark, "q31")
    graft.raster.RasterPipeline.toTileStore(
        pts, "geometry", Seq("lang_code"), path,
        cellSize = 10000, tileSize = 100000, overwrite = true)
      .select(col("tile"), col("burned_cells"), col("n_rows"))
  }

  val q31Sql: String =
    s"""WITH pts AS ($docPointsSql),
      |c AS (
      |  SELECT doc_id,
      |         CAST(FLOOR(x / 100000) AS BIGINT) AS e1,
      |         CAST(FLOOR(y / 100000) AS BIGINT) AS n1,
      |         CAST(FLOOR(x / 10000) AS BIGINT) AS ce,
      |         CAST(FLOOR(y / 10000) AS BIGINT) AS cn
      |  FROM pts)
      |SELECT substr('ABCDEFGHJKLMNOPQRSTUVWXYZ',
      |         CAST((19 - n1) - ((19 - n1) % 5) + FLOOR((e1 + 10) / 5) AS INT) + 1, 1)
      |       || substr('ABCDEFGHJKLMNOPQRSTUVWXYZ',
      |         CAST(((19 - n1) * 5) % 25 + (e1 % 5) AS INT) + 1, 1) AS tile,
      |       COUNT(DISTINCT ce * 1000 + cn) AS burned_cells,
      |       COUNT(*) AS n_rows
      |FROM c GROUP BY 1""".stripMargin

  /** Gap-based sessionization (30 min) — the stateful-operator surface;
    * batch path here (single shuffle on user + window), streaming
    * flatMapGroupsWithState equivalence pinned in MultimodalStreamSpec.
    */
  def q32Sessionize(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.Sessionize.sessionizeBatch(t(spark, dir, "events"), 30)

  /** Salted two-phase aggregation through the skew machinery (hot-cell
    * pre-pass + salt fan-out + re-merge) — result must equal a plain
    * GROUP BY, which is exactly what the oracle runs.
    */
  def q33SaltedAgg(spark: SparkSession, dir: String): DataFrame = {
    val pts = docPoints(spark, dir)
      .withColumn("bng10",
        bng_index_point(col("x").cast("double"), col("y").cast("double"), 10000L))
    graft.ops.Salting.saltedCount(pts, "bng10", "doc_id", targetRowsPerTask = 50)
  }

  val q33Sql: String =
    s"""WITH pts AS ($docPointsSql),
      |c AS (
      |  SELECT CAST(FLOOR(x / 100000) AS BIGINT) AS e1,
      |         CAST(FLOOR(y / 100000) AS BIGINT) AS n1, x, y
      |  FROM pts)
      |SELECT substr('ABCDEFGHJKLMNOPQRSTUVWXYZ',
      |         CAST((19 - n1) - ((19 - n1) % 5) + FLOOR((e1 + 10) / 5) AS INT) + 1, 1)
      |       || substr('ABCDEFGHJKLMNOPQRSTUVWXYZ',
      |         CAST(((19 - n1) * 5) % 25 + (e1 % 5) AS INT) + 1, 1)
      |       || CAST(CAST(FLOOR((x % 100000) / 10000) AS INT) AS VARCHAR)
      |       || CAST(CAST(FLOOR((y % 100000) / 10000) AS INT) AS VARCHAR) AS bng10,
      |       CAST(COUNT(*) AS BIGINT) AS n
      |FROM c GROUP BY 1""".stripMargin

  /** Dtype minimization applied through the engine (reference pandas
    * downcast, `_table.py:33-66`) — oracle recomputes the same casts.
    */
  def q34Downcast(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Downcast.minimize(t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_discount")))

  val q34Sql: String =
    """SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
      |       CAST(l_linenumber AS TINYINT) AS l_linenumber,
      |       CAST(l_quantity AS TINYINT) AS l_quantity,
      |       CAST(l_discount AS FLOAT) AS l_discount
      |FROM lineitem""".stripMargin

  /** Raster -> vector round trip: burn the doc points as a presence mask
    * at 10 km cells, then vectorize the store back to one row per burned
    * cell — the oracle recomputes the distinct-cell set relationally.
    */
  def q35Vectorize(spark: SparkSession, dir: String): DataFrame = {
    val pts = docPoints(spark, dir).withColumn("geometry",
      st_point(col("x").cast("double"), col("y").cast("double")))
    val path = scratchStore(spark, "q35")
    graft.raster.RasterPipeline.toTileStore(pts, "geometry", Seq.empty, path,
      cellSize = 10000, tileSize = 100000, overwrite = true)
    graft.raster.RasterPipeline.fromTileStore(spark, path, "mask")
      .select(col("cell_e"), col("cell_n"),
        col("value").cast("long").as("value"))
  }

  val q35Sql: String =
    s"""WITH pts AS ($docPointsSql)
      |SELECT DISTINCT CAST(FLOOR(x / 10000) AS BIGINT) AS cell_e,
      |       CAST(FLOOR(y / 10000) AS BIGINT) AS cell_n,
      |       CAST(1 AS BIGINT) AS value
      |FROM pts""".stripMargin

  /** Radius (range) join: docs within 40 km of each nation point, through
    * the cell-ring candidate path + exact refine.
    */
  def q36RadiusJoin(spark: SparkSession, dir: String): DataFrame = {
    val qs = nationBoxes(spark, dir).select(
      col("nation_key"),
      ((col("nation_key") * 37199L + 101L) % 700000L).cast("double").as("qx"),
      ((col("nation_key") * 54011L + 303L) % 1300000L).cast("double").as("qy"))
    val pts = docPoints(spark, dir).select(col("doc_id"),
      col("x").cast("double").as("x"), col("y").cast("double").as("y"))
    SpatialJoin.radiusJoin(qs, "nation_key", "qx", "qy",
        pts, "doc_id", "x", "y", radius = 40000.0, resolution = 10000L)
      .select(col("nation_key"), col("doc_id"), col("dist2").cast("long").as("dist2"))
  }

  val q36Sql: String =
    s"""WITH pts AS ($docPointsSql),
      |nb AS ($nationBoxesSql),
      |q AS (
      |  SELECT nation_key,
      |         (nation_key * 37199 + 101) % 700000 AS qx,
      |         (nation_key * 54011 + 303) % 1300000 AS qy
      |  FROM nb)
      |SELECT q.nation_key, p.doc_id,
      |       CAST((p.x - q.qx) * (p.x - q.qx) + (p.y - q.qy) * (p.y - q.qy) AS BIGINT) AS dist2
      |FROM q, pts p
      |WHERE (p.x - q.qx) * (p.x - q.qx) + (p.y - q.qy) * (p.y - q.qy)
      |      <= 40000 * 40000""".stripMargin

  /** As-of join: each event matched to the user's most recent order at
    * the event time (orders pre-deduped to one per (custkey, date) so
    * both engines tie-break identically). Oracle uses DuckDB's native
    * ASOF JOIN.
    */
  def q37AsOfJoin(spark: SparkSession, dir: String): DataFrame = {
    val events = t(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    val orders = t(spark, dir, "orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    graft.ops.AsOfJoin.asOf(events, "user_id", "ts",
        orders.withColumnRenamed("o_custkey", "user_id"), "user_id",
        "o_orderdate", "o_orderkey")
      .select(col("event_id"), col("user_id"), col("o_orderkey").as("last_order"))
  }

  val q37Sql: String =
    """WITH o AS (
      |  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
      |  FROM orders GROUP BY o_custkey, o_orderdate)
      |SELECT e.event_id, e.user_id, o.o_orderkey AS last_order
      |FROM events e
      |ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate""".stripMargin

  val q32Sql: String =
    """WITH d AS (
      |  SELECT user_id, ts, value,
      |         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |              OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800
      |              THEN 1 ELSE 0 END AS is_new
      |  FROM events),
      |s AS (
      |  SELECT user_id, ts, value,
      |         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
      |                           ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM d)
      |SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
      |       COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
      |FROM s GROUP BY user_id, sid""".stripMargin

  // ------------------------------------------------------------------
  // Round 2: high-cardinality categorize + skew-safe near-dup
  // ------------------------------------------------------------------

  /** High-cardinality categorize: dense codes over `documents.text`
    * (unique per row — the worst case for the old single-partition
    * window). Runs the distributed two-phase rank; the code dictionary
    * joins back WITHOUT a broadcast hint (at 10^12 distinct keys the
    * dictionary must shuffle-join — AQE picks the strategy).
    */
  def q38HighCardCodes(spark: SparkSession, dir: String): DataFrame =
    Categorize.categorizeColumnPlan(t(spark, dir, "documents"), "text",
        "text_code", hintBroadcast = false)
      .select(col("doc_id"), col("text_code"))

  val q38Sql: String =
    """SELECT doc_id,
      |       CAST(DENSE_RANK() OVER (ORDER BY text) - 1 AS BIGINT) AS text_code
      |FROM documents""".stripMargin

  /** Spreadsheet ingest round-trip (S4): write the nation table to a
    * real .xlsx in the per-session scratch dir, read it back through the
    * OOXML parser + from_files dispatch, and return the typed rows — the
    * oracle reads the same rows straight from parquet, so the whole
    * zip/XML/shared-strings/type-inference path is driver-oracle-checked.
    */
  def q40XlsxRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val nation = t(spark, dir, "nation").select(
      col("n_nationkey").cast("long").as("nation_key"),
      col("n_name").as("name"),
      col("n_regionkey").cast("long").as("region_key"))
    val root = scratchStore(spark, "q40")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    val path = s"$root/nation.xlsx"
    graft.input.Xlsx.write(nation, path)
    graft.core.LayerWrapper.fromFiles(spark, path).data
  }

  val q40Sql: String =
    """SELECT CAST(n_nationkey AS BIGINT) AS nation_key, n_name AS name,
      |       CAST(n_regionkey AS BIGINT) AS region_key
      |FROM nation""".stripMargin

  /** Streaming exact dedup (REAL multi-batch streaming run, AvailableNow,
    * 3 event-time-ordered micro-batches): first-seen (user_id, event_type)
    * pairs via watermarked `dropDuplicatesWithinWatermark` — bounded
    * state, keys evicted once the watermark passes their horizon. Only
    * the key columns are emitted, so the result is order-independent;
    * with the horizon covering the fixture's full event-time span (30
    * days of events; 35-day horizon) the stream output equals the
    * relational DISTINCT the oracle computes BY CONSTRUCTION, not by the
    * accident of a single micro-batch.
    */
  def q41StreamDedup(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStream.runDedupAvailableNow(spark,
        s"$dir/events.parquet", Seq("user_id", "event_type"), "ts",
        horizon = "35 days", queryName = s"graft_dedup_${System.nanoTime()}",
        nFiles = 3)
      .select(col("user_id"), col("event_type"))

  val q41Sql: String =
    "SELECT DISTINCT user_id, event_type FROM events"

  /** Boilerplate-skew near-dup: plant a 200-copy boilerplate cluster on
    * top of the documents table, then run the skew-safe pipeline — exact
    * pre-pass collapses the cluster to one representative, the bucket cap
    * bounds residual hot buckets. The oracle recomputes representatives +
    * all-pairs exact Jaccard relationally.
    *
    * Recall caveats (stated, same spirit as q22): (a) LSH banding miss
    * probability (1-J^4)^16, negligible at the fixture's J >= 0.9; (b)
    * bucketCap=64 can deterministically drop a true pair whose BOTH
    * members rank past the cap in EVERY shared bucket — possible only
    * when > 64 distinct-text representatives collide per band, i.e.
    * after the exact pre-pass has already collapsed identical text; the
    * fixture's post-pre-pass buckets are far below the cap (verified by
    * the green oracle row; DedupSpec pins the planted-skew case).
    */
  def q39NearDupSkew(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents").select(col("doc_id"), col("text"))
    val boiler = docs.orderBy(col("doc_id")).limit(1).select(col("text"))
    val planted = boiler.crossJoin(
        spark.range(200).select((col("id") + 1000000L).as("doc_id")))
      .select(col("doc_id"), col("text"))
    graft.ops.Dedup.minhashDedupSkewSafe(docs.unionByName(planted),
        "doc_id", "text", threshold = 0.8, bucketCap = 64)
      .select(col("a"), col("b"),
        floor(col("jaccard") * lit(1000000.0) + lit(0.5)).cast("long")
          .as("jaccard_ppm"))
  }

  val q39Sql: String =
    """WITH boiler AS (SELECT text FROM documents ORDER BY doc_id LIMIT 1),
      |planted AS (
      |  SELECT 1000000 + CAST(i AS BIGINT) AS doc_id,
      |         (SELECT text FROM boiler) AS text
      |  FROM (SELECT unnest(range(200)) AS i)),
      |alldocs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id, text FROM planted),
      |reps AS (SELECT MIN(doc_id) AS doc_id, text FROM alldocs GROUP BY text),
      |sh AS (
      |  SELECT doc_id,
      |         list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
      |                        for i in range(1, len(ws) - 1)]) AS s
      |  FROM (SELECT doc_id,
      |               regexp_extract_all(lower(text),
      |                 '[a-z]+|[0-9]+|[^a-z0-9 \t\n\r]') AS ws
      |        FROM reps)),
      |pairs AS (
      |  SELECT x.doc_id AS a, y.doc_id AS b,
      |         CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) AS inter,
      |         CAST(len(x.s) + len(y.s) AS DOUBLE) AS tot
      |  FROM sh x JOIN sh y ON x.doc_id < y.doc_id)
      |SELECT a, b,
      |       CAST(FLOOR(1000000.0 * (inter / (tot - inter)) + 0.5) AS BIGINT)
      |         AS jaccard_ppm
      |FROM pairs WHERE inter / (tot - inter) >= 0.8""".stripMargin

  // ------------------------------------------------------------------
  // Round 3: driver-oracled resample (R4) + byte-identity text invariant
  // ------------------------------------------------------------------

  /** R4 resample, driver-oracle-checked end to end: burn the doc points
    * as a 10 km presence mask, resample every tile store-level to 20 km
    * (nearest neighbour — the categorical kernel, `_raster.py:87-138`
    * semantics), vectorize the result back. Nearest at an integer factor
    * is pure floor math — dst cell (r,c) samples src cell (2r+1, 2c+1)
    * inside each 100 km tile — so the oracle recomputes the whole
    * burn->resample->vectorize chain relationally from the distinct
    * source-cell set.
    */
  def q42Resample(spark: SparkSession, dir: String): DataFrame = {
    val pts = docPoints(spark, dir).withColumn("geometry",
      st_point(col("x").cast("double"), col("y").cast("double")))
    val srcPath = scratchStore(spark, "q42src")
    val dstPath = scratchStore(spark, "q42dst")
    graft.raster.RasterPipeline.toTileStore(pts, "geometry", Seq.empty, srcPath,
      cellSize = 10000, tileSize = 100000, overwrite = true)
    graft.raster.RasterPipeline.resampleStore(spark, srcPath, dstPath,
      dstCellSize = 20000, categorical = true, overwrite = true)
    graft.raster.RasterPipeline.fromTileStore(spark, dstPath, "mask")
      .select(col("cell_e"), col("cell_n"),
        col("value").cast("long").as("value"))
  }

  val q42Sql: String =
    s"""WITH pts AS ($docPointsSql),
      |src AS (
      |  SELECT DISTINCT CAST(FLOOR(x / 10000) AS BIGINT) AS ce,
      |         CAST(FLOOR(y / 10000) AS BIGINT) AS cn
      |  FROM pts)
      |SELECT (ce // 10) * 5 + (ce % 10 - 1) // 2 AS cell_e,
      |       (cn // 10) * 5 + (cn % 10) // 2 AS cell_n,
      |       CAST(1 AS BIGINT) AS value
      |FROM src
      |WHERE (ce % 10) % 2 = 1 AND (cn % 10) % 2 = 0""".stripMargin

  /** U6 byte-identity invariant as a driver-gated row (north rule:
    * "extract per-url text byte-identically"): synthesize the canonical
    * web-page table, round-trip it through parquet (the storage-path
    * schema), re-extract text from the html bytes DISTRIBUTED via the
    * Catalyst expression, and count mismatches. The oracle pins the
    * constants — any drift in the extractor (or a silently empty
    * synthesis) turns the row red.
    */
  def q43TextIdentity(spark: SparkSession, dir: String): DataFrame = {
    val root = scratchStore(spark, "q43")
    val path = s"$root/pages"
    graft.input.WebTable.synthesize(spark, 5000L).toDF()
      .write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
      .agg(
        sum(when(graft.text.TextExtract.extract_text(col("html")) === col("text"),
          0L).otherwise(1L)).as("mismatches"),
        count(lit(1)).as("n_pages"))
  }

  val q43Sql: String =
    "SELECT CAST(0 AS BIGINT) AS mismatches, CAST(5000 AS BIGINT) AS n_pages"

  /** SEAM-SAFE spherical radius join, driver-oracle-checked: documents
    * geocoded onto the full globe (antimeridian and high latitudes
    * included), nation queries likewise, all pairs within 2,000 km great
    * circle via the S2 cap-cover join ([[SpatialJoin.sphericalRadiusJoin]]).
    * Emits pairs only — the haversine value itself is engine-float —
    * and the fixture's closest pair sits 523 m from the threshold
    * (measured), so both engines make identical keep/drop decisions.
    */
  def q44SphericalRadius(spark: SparkSession, dir: String): DataFrame = {
    val pts = t(spark, dir, "documents").select(
      col("doc_id"),
      (((col("doc_id") * 7393L) % 17000L).cast("double") / 100.0 - 85.0).as("lat"),
      (((col("doc_id") * 9811L) % 36000L).cast("double") / 100.0 - 180.0).as("lng"))
    val qs = t(spark, dir, "nation").select(
      col("n_nationkey").cast("long").as("qid"),
      (((col("n_nationkey").cast("long") * 1201L) % 16000L).cast("double") / 100.0 - 80.0).as("qlat"),
      (((col("n_nationkey").cast("long") * 3307L) % 36000L).cast("double") / 100.0 - 180.0).as("qlng"))
    SpatialJoin.sphericalRadiusJoin(qs, "qid", "qlat", "qlng",
        pts, "doc_id", "lat", "lng", radiusMetres = 2000000.0, level = 5)
      .select(col("qid"), col("doc_id"))
  }

  val q44Sql: String =
    """WITH pts AS (
      |  SELECT doc_id,
      |         ((doc_id * 7393) % 17000) / 100.0 - 85.0 AS lat,
      |         ((doc_id * 9811) % 36000) / 100.0 - 180.0 AS lng
      |  FROM documents),
      |qs AS (
      |  SELECT CAST(n_nationkey AS BIGINT) AS qid,
      |         ((CAST(n_nationkey AS BIGINT) * 1201) % 16000) / 100.0 - 80.0 AS qlat,
      |         ((CAST(n_nationkey AS BIGINT) * 3307) % 36000) / 100.0 - 180.0 AS qlng
      |  FROM nation)
      |SELECT qid, doc_id
      |FROM qs, pts
      |WHERE 2 * 6371000.0 * asin(sqrt(
      |        pow(sin(radians(lat - qlat)/2), 2) +
      |        cos(radians(qlat)) * cos(radians(lat)) *
      |        pow(sin(radians(lng - qlng)/2), 2))) <= 2000000""".stripMargin

  /** S9 incremental (CDC) scan, driver-oracle-checked: commit the orders
    * table as three append snapshots of an Iceberg-style versioned table
    * (thirds by o_orderkey % 3), then read the DELTA after snapshot 0 —
    * the file-level manifest diff scans ONLY the two appended thirds (the
    * already-processed prefix is pruned at the source; SnapshotLogSpec
    * pins the file-pruning property, this row pins the delta VALUES).
    */
  def q45Incremental(spark: SparkSession, dir: String): DataFrame = {
    val root = scratchStore(spark, "q45")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    val vt = new graft.input.VersionedTable(root)
    val orders = t(spark, dir, "orders").select(col("o_orderkey"))
    (0 to 2).foreach { m =>
      vt.commit(orders.filter(col("o_orderkey") % 3 === m), "append")
    }
    vt.readIncremental(spark, fromExclusive = 0L)
  }

  val q45Sql: String =
    "SELECT o_orderkey FROM orders WHERE o_orderkey % 3 IN (1, 2)"

  /** S8 GEMINI metadata through the driver contract: write a
    * deterministic ISO 19139/GEMINI XML record, parse it with the
    * 12-field reader (reference `metadata.py:270-315` semantics), and
    * emit the scalars + list cardinalities as one row the oracle pins as
    * constants — any drift in the path traversal turns this red.
    */
  def q46Metadata(spark: SparkSession, dir: String): DataFrame = {
    val xml =
      """<MD_Metadata>
        |<fileIdentifier><CharacterString>graft-ds-001</CharacterString></fileIdentifier>
        |<language><LanguageCode codeListValue="eng">English</LanguageCode></language>
        |<hierarchyLevel><MD_ScopeCode codeListValue="dataset"/></hierarchyLevel>
        |<dateStamp><Date>2024-05-01</Date></dateStamp>
        |<identificationInfo><MD_DataIdentification>
        |<citation><CI_Citation><title><CharacterString>Graft sample layer</CharacterString></title></CI_Citation></citation>
        |<abstract><CharacterString>Synthetic GEMINI record for q46.</CharacterString></abstract>
        |<language><LanguageCode codeListValue="eng">English</LanguageCode></language>
        |<topicCategory><MD_TopicCategoryCode>environment</MD_TopicCategoryCode></topicCategory>
        |<topicCategory><MD_TopicCategoryCode>farming</MD_TopicCategoryCode></topicCategory>
        |<descriptiveKeywords><MD_Keywords>
        |<keyword><CharacterString>web</CharacterString></keyword>
        |<keyword><CharacterString>tiles</CharacterString></keyword>
        |<keyword><CharacterString>bng</CharacterString></keyword>
        |</MD_Keywords></descriptiveKeywords>
        |<spatialRepresentationType><MD_SpatialRepresentationTypeCode codeListValue="vector"/></spatialRepresentationType>
        |</MD_DataIdentification></identificationInfo>
        |<dataQualityInfo><DQ_DataQuality>
        |<scope><DQ_Scope><level><MD_ScopeCode codeListValue="dataset"/></level></DQ_Scope></scope>
        |<lineage><LI_Lineage><statement><CharacterString>Synthesized for q46.</CharacterString></statement></LI_Lineage></lineage>
        |</DQ_DataQuality></dataQualityInfo>
        |</MD_Metadata>""".stripMargin
    val root = scratchStore(spark, "q46")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    val p = s"$root/record.xml"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p), xml)
    val m = graft.core.Metadata.fromXmlFile(p)
    import spark.implicits._
    Seq((
      m.title.orNull, m.abstract_.orNull, m.lineage.orNull,
      m.file_identifier.orNull, m.metadata_date.orNull,
      m.metadata_language.orNull, m.resource_type.headOption.orNull,
      m.topic_category.mkString(","), m.keyword.length.toLong,
      m.quality_scope.headOption.orNull,
      m.spatial_representation_type.headOption.orNull
    )).toDF("title", "abstract", "lineage", "file_identifier",
      "metadata_date", "metadata_language", "resource_type",
      "topic_categories", "n_keywords", "quality_scope",
      "spatial_representation_type")
  }

  /** SEAM-SAFE spherical kNN, driver-oracle-checked: the 8 nearest
    * globally-geocoded documents per nation query by great-circle
    * distance, via the cap-doubling loop over the S2 radius join. Emits
    * (qid, doc_id, rank) — rank order is engine-stable because the
    * fixture's smallest consecutive-rank distance gap is 861 m
    * (measured), dwarfing any libm ulp divergence.
    */
  def q47SphericalKnn(spark: SparkSession, dir: String): DataFrame = {
    val pts = t(spark, dir, "documents").select(
      col("doc_id"),
      (((col("doc_id") * 7393L) % 17000L).cast("double") / 100.0 - 85.0).as("lat"),
      (((col("doc_id") * 9811L) % 36000L).cast("double") / 100.0 - 180.0).as("lng"))
    val qs = t(spark, dir, "nation").select(
      col("n_nationkey").cast("long").as("qid"),
      (((col("n_nationkey").cast("long") * 1201L) % 16000L).cast("double") / 100.0 - 80.0).as("qlat"),
      (((col("n_nationkey").cast("long") * 3307L) % 36000L).cast("double") / 100.0 - 180.0).as("qlng"))
    SpatialJoin.sphericalKnn(qs, "qid", "qlat", "qlng",
        pts, "doc_id", "lat", "lng", k = 8, initRadiusMetres = 200000.0)
      .select(col("qid"), col("doc_id"), col("rank").cast("long").as("rank"))
  }

  val q47Sql: String =
    """WITH pts AS (
      |  SELECT doc_id,
      |         ((doc_id * 7393) % 17000) / 100.0 - 85.0 AS lat,
      |         ((doc_id * 9811) % 36000) / 100.0 - 180.0 AS lng
      |  FROM documents),
      |qs AS (
      |  SELECT CAST(n_nationkey AS BIGINT) AS qid,
      |         ((CAST(n_nationkey AS BIGINT) * 1201) % 16000) / 100.0 - 80.0 AS qlat,
      |         ((CAST(n_nationkey AS BIGINT) * 3307) % 36000) / 100.0 - 180.0 AS qlng
      |  FROM nation),
      |d AS (
      |  SELECT qid, doc_id,
      |         2 * 6371000.0 * asin(sqrt(
      |           pow(sin(radians(lat - qlat)/2), 2) +
      |           cos(radians(qlat)) * cos(radians(lat)) *
      |           pow(sin(radians(lng - qlng)/2), 2))) AS dm
      |  FROM qs, pts)
      |SELECT qid, doc_id, rank FROM (
      |  SELECT qid, doc_id,
      |         CAST(row_number() OVER (PARTITION BY qid ORDER BY dm, doc_id) AS BIGINT) AS rank
      |  FROM d)
      |WHERE rank <= 8""".stripMargin

  val q46Sql: String =
    """SELECT 'Graft sample layer' AS title,
      |'Synthetic GEMINI record for q46.' AS abstract,
      |'Synthesized for q46.' AS lineage,
      |'graft-ds-001' AS file_identifier,
      |'2024-05-01' AS metadata_date,
      |'English' AS metadata_language,
      |'dataset' AS resource_type,
      |'environment,farming' AS topic_categories,
      |CAST(3 AS BIGINT) AS n_keywords,
      |'dataset' AS quality_scope,
      |'vector' AS spatial_representation_type""".stripMargin

  // ------------------------------------------------------------------
  // Training-data cleaning passes (beyond the reference surface)
  // ------------------------------------------------------------------

  /** CCNet-style corpus-level line dedup, driver-oracle-checked end to
    * end. Documents carry no newlines, so "lines" are derived row-local
    * as consecutive 2-word chunks (30-word vocabulary => heavy genuine
    * cross-document duplication, exercising the drop path hard); the
    * dedup itself is [[graft.ops.LineDedup]]'s narrow-shuffle exact
    * pass. Emits per doc: total lines, surviving lines, and the
    * reassembled surviving text.
    */
  def q48LineDedup(spark: SparkSession, dir: String): DataFrame = {
    val words = t(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("words"))
    val lines = words.select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0L), ceil(size(col("words")) / lit(2.0)).cast("long") - 1),
          i => array_join(slice(col("words"), (i * 2 + 1).cast("int"), lit(2)), " ")))
          .as(Seq("line_no", "line")))
      .withColumn("line_no", col("line_no").cast("long"))
    val kept = graft.ops.LineDedup.dedupLines(lines, "doc_id", "line_no", "line")
    // lines_total is a row-local closed form of the same derivation that
    // generates the lines (ceil(|words| / 2) chunks per doc) — no need
    // to re-explode and aggregate 125k line rows to count them (round
    // 7). Null-text docs produce no line rows and must stay absent from
    // the left side, exactly as the aggregate behaved.
    val totals = words.filter(col("words").isNotNull)
      .select(col("doc_id"),
        ceil(size(col("words")) / lit(2.0)).cast("long").as("lines_total"))
    val keptAgg = kept.groupBy("doc_id").agg(
      count(lit(1)).as("lines_kept"),
      array_join(
        transform(array_sort(collect_list(struct(col("line_no"), col("line")))),
          s => s.getField("line")), " ").as("text_kept"))
    totals.join(keptAgg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lines_total"),
        coalesce(col("lines_kept"), lit(0L)).as("lines_kept"),
        coalesce(col("text_kept"), lit("")).as("text_kept"))
  }

  val q48Sql: String =
    """WITH docs AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
      |idx AS (SELECT doc_id, words,
      |        UNNEST(range(CAST(ceil(len(words) / 2.0) AS BIGINT))) AS line_no
      |        FROM docs),
      |lines AS (SELECT doc_id, line_no,
      |          array_to_string(list_slice(words, line_no*2 + 1, line_no*2 + 2), ' ') AS line
      |          FROM idx),
      |rk AS (SELECT doc_id, line_no, line,
      |       row_number() OVER (PARTITION BY line ORDER BY doc_id, line_no) AS r
      |       FROM lines)
      |SELECT doc_id,
      |       CAST(count(*) AS BIGINT) AS lines_total,
      |       CAST(coalesce(sum(CASE WHEN r = 1 THEN 1 END), 0) AS BIGINT) AS lines_kept,
      |       coalesce(string_agg(CASE WHEN r = 1 THEN line END, ' ' ORDER BY line_no), '') AS text_kept
      |FROM rk GROUP BY doc_id""".stripMargin

  /** Gopher-style repetition quality signals as INTEGER counts (total
    * words, top-word multiplicity, duplicate consecutive 2-/3-grams), so
    * the oracle compares exactly — the published fractional signals are
    * these counts over their denominators. Row-local kernel, no shuffle.
    */
  def q49Repetition(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      // null text yields no token rows in the oracle's UNNEST; drop it
      // here too so both engines skip such docs identically
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        graft.text.WebClean.repetition_signals(col("text")).as("r"))
      .select(col("doc_id"), col("r.n_words").as("n_words"),
        col("r.top_word_n").as("top_word_n"),
        col("r.dup_2gram_n").as("dup_2gram_n"),
        col("r.dup_3gram_n").as("dup_3gram_n"))

  val q49Sql: String =
    """WITH tok AS (
      |  SELECT doc_id,
      |         UNNEST(string_split(text, ' ')) AS w,
      |         UNNEST(range(1, len(string_split(text, ' ')) + 1)) AS i
      |  FROM documents),
      |base AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words FROM tok GROUP BY doc_id),
      |topw AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_word_n FROM (
      |         SELECT doc_id, w, count(*) AS c FROM tok GROUP BY doc_id, w) GROUP BY doc_id),
      |g2 AS (SELECT a.doc_id, a.w || ' ' || b.w AS g
      |       FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
      |d2 AS (SELECT doc_id, CAST(count(*) - count(DISTINCT g) AS BIGINT) AS dup_2gram_n
      |       FROM g2 GROUP BY doc_id),
      |g3 AS (SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS g
      |       FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
      |                  JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
      |d3 AS (SELECT doc_id, CAST(count(*) - count(DISTINCT g) AS BIGINT) AS dup_3gram_n
      |       FROM g3 GROUP BY doc_id)
      |SELECT b.doc_id, b.n_words, t.top_word_n,
      |       COALESCE(d2.dup_2gram_n, 0) AS dup_2gram_n,
      |       COALESCE(d3.dup_3gram_n, 0) AS dup_3gram_n
      |FROM base b JOIN topw t USING (doc_id)
      |LEFT JOIN d2 USING (doc_id) LEFT JOIN d3 USING (doc_id)""".stripMargin

  /** URL canonicalization + crawl dedup: messy synthesized URLs (mixed
    * case, www, default port, unsorted query, fragment) run through the
    * real parser ([[graft.text.WebClean.canonicalizeUrl]]); the oracle
    * recomputes the canonical form from the id arithmetic directly.
    * doc_id%50 in the path (vs 500 docs) forces genuine URL collisions,
    * exercising the dedup aggregation.
    */
  def q50UrlCanon(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        concat(lit("HTTPS://WWW.Site"), col("doc_id") % 25,
          lit(".COM:443/Path/"), col("doc_id") % 50,
          lit("/?b="), col("doc_id") % 7, lit("&a="), col("doc_id") % 5,
          lit("#s"), col("doc_id") % 3).as("url"))
      .select(col("doc_id"), graft.text.WebClean.canonicalize_url(col("url")).as("url_canon"))
      .groupBy("url_canon")
      .agg(min("doc_id").as("keep_doc"), count(lit(1)).as("n_dups"))

  val q50Sql: String =
    """WITH c AS (SELECT doc_id,
      |  'https://site' || (doc_id % 25) || '.com/Path/' || (doc_id % 50) ||
      |  '?a=' || (doc_id % 5) || '&b=' || (doc_id % 7) AS url_canon
      |  FROM documents)
      |SELECT url_canon, min(doc_id) AS keep_doc,
      |       CAST(count(*) AS BIGINT) AS n_dups
      |FROM c GROUP BY url_canon""".stripMargin

  /** PII scrubbing: emails / IPv4s / phone numbers planted via id
    * arithmetic, scrubbed by the Java-regex kernel, reproduced by the
    * oracle with RE2 regexp_replace — the patterns are chosen to have
    * identical semantics in both dialects.
    */
  def q51PiiScrub(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        concat(col("text"),
          lit(" reach user."), col("doc_id"), lit("+tag@Mail"),
          col("doc_id") % 9, lit(".Example.COM"),
          when(col("doc_id") % 3 === 0,
            concat(lit(" alt e"), col("doc_id"), lit("@x.org"))).otherwise(lit("")),
          lit(" from 10.0."), col("doc_id") % 200, lit("."), col("doc_id") % 250,
          lit(" call 555-867-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("pii_text"))
      .select(col("doc_id"), graft.text.WebClean.scrub_pii(col("pii_text")).as("p"))
      .select(col("doc_id"), col("p.scrubbed").as("scrubbed"),
        col("p.n_email").as("n_email"), col("p.n_ip").as("n_ip"),
        col("p.n_phone").as("n_phone"))

  val q51Sql: String =
    """WITH p AS (SELECT doc_id,
      |  text || ' reach user.' || doc_id || '+tag@Mail' || (doc_id % 9) || '.Example.COM' ||
      |  CASE WHEN doc_id % 3 = 0 THEN ' alt e' || doc_id || '@x.org' ELSE '' END ||
      |  ' from 10.0.' || (doc_id % 200) || '.' || (doc_id % 250) ||
      |  ' call 555-867-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS pii_text
      |  FROM documents),
      |-- counts follow the kernel's staged semantics exactly: each kind
      |-- is counted on the text AFTER the prior kinds were replaced (an
      |-- IP-shaped email domain must not double-count as an IP)
      |s1 AS (SELECT doc_id, pii_text,
      |  regexp_replace(pii_text,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
      |  FROM p),
      |s2 AS (SELECT doc_id, pii_text, t1,
      |  regexp_replace(t1,
      |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t2
      |  FROM s1)
      |SELECT doc_id,
      |  regexp_replace(t2, '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS scrubbed,
      |  CAST(len(regexp_extract_all(pii_text,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
      |  CAST(len(regexp_extract_all(t1,
      |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip,
      |  CAST(len(regexp_extract_all(t2,
      |    '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phone
      |FROM s2""".stripMargin

  /** Incremental crawl dedup vs a history corpus through the Bloom
    * prefilter + exact anti-join ([[graft.ops.BloomDedup]]): even docs
    * are "history", odd docs are "today's batch", and every doc_id%10==1
    * batch row is planted with its predecessor's (historical) text, so
    * the bloom-positive path sees real hits. Result is exact (the bloom
    * only prunes), so the oracle is plain NOT EXISTS.
    */
  def q52BloomIncremental(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
    val hist = d.filter(col("doc_id") % 2 === 0).select(col("text"))
    val prev = d.select(col("doc_id").as("p_id"), col("text").as("p_text"))
    val newBatch = d.filter(col("doc_id") % 2 === 1)
      .join(prev, col("p_id") === col("doc_id") - 1)
      .select(col("doc_id"),
        when(col("doc_id") % 10 === 1, col("p_text")).otherwise(col("text")).as("text"))
    // filter sized to the fixture (250 history docs): keeps the bloom
    // literal in the plan/codegen proportional to the data, exactly as a
    // real deployment sizes it to its history cardinality
    graft.ops.BloomDedup.newDocs(newBatch, hist, "text",
      expectedItems = 4096L, numBits = 65536L).select(col("doc_id"))
  }

  val q52Sql: String =
    """WITH hist AS (SELECT text FROM documents WHERE doc_id % 2 = 0),
      |newd AS (SELECT n.doc_id,
      |         CASE WHEN n.doc_id % 10 = 1 THEN p.text ELSE n.text END AS text
      |         FROM documents n JOIN documents p ON p.doc_id = n.doc_id - 1
      |         WHERE n.doc_id % 2 = 1)
      |SELECT doc_id FROM newd
      |WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.text = newd.text)""".stripMargin

  /** Corpus TF-IDF top-3 terms per document ([[graft.text.TfIdf]]):
    * row-local TF expression, one word-keyed DF shuffle, integer-exact
    * scaled-idf scoring so the oracle ranks identically.
    */
  def q53Tfidf(spark: SparkSession, dir: String): DataFrame =
    graft.text.TfIdf.topTerms(
      t(spark, dir, "documents").select(col("doc_id"), col("text")),
      "doc_id", "text", k = 3)

  /** Product-quantization ANN (rows-only driver check; the ADC identity
    * and recall are pinned in SimilaritySpec): per-subspace codebooks
    * trained DISTRIBUTED (driver traffic = codebook matrix only), corpus
    * encoded to M=8 bytes/vector, 5 queries scanned via ADC lookup
    * tables. Float internals are not SQL-expressible (same no_oracle
    * class as q24/q25).
    */
  /** PQ-ANN under an EXACT driver oracle (round-4): integer-valued
    * vectors (id arithmetic both engines compute), the integer-Lloyd
    * distributed trainer ([[graft.ops.ProductQuant
    * .trainCodebooksDistributedInt]] — integer sums are associative, so
    * distributed training is order-independent and SQL-replicable),
    * byte-code encode, integer ADC shortlist, exact integer re-rank.
    * The float production path stays ([[graft.ops.ProductQuant
    * .trainCodebooksDistributed]]), pinned by SimilaritySpec's ADC
    * identity + recall gates.
    */
  def q54PqAnn(spark: SparkSession, dir: String): DataFrame = {
    val dim = 64
    val vecs = t(spark, dir, "embeddings").select(col("vec_id"))
      .withColumn("vec", transform(sequence(lit(0), lit(dim - 1)),
        d => (pmod(col("vec_id") * lit(2654435761L) + d.cast("long") * lit(40503L),
          lit(1009L)) - lit(504L)).cast("float")))
    val corpus = vecs.filter(col("vec_id") >= 10)
    val queries = vecs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("vec").as("qvec"))
    val cb = graft.ops.ProductQuant.trainCodebooksDistributedInt(
      corpus, "vec_id", "vec", m = 8, k = 16, iters = 1)
    graft.ops.ProductQuant.adcTopKReranked(queries, "qid", "qvec",
        corpus, "vec_id", "vec", cb, k = 10, shortlist = 50, intDist = true)
      .select(col("qid"), col("vec_id"),
        col("dist2").cast("long").as("dist2"), col("rank").cast("long").as("rank"))
      // k x |queries|-bounded materialization before the canonical sort
      // (see q25) — the ADC shortlist + exact re-rank run once, not twice
      .localCheckpoint(true)
      .orderBy(col("qid"), col("rank"))
  }

  val q54Sql: String =
    """WITH dims AS (SELECT UNNEST(range(0, 8)) AS m),
      |vecs AS (
      |  SELECT vec_id,
      |         [ CAST((vec_id * 2654435761 + d * 40503) % 1009 - 504 AS BIGINT)
      |           for d in range(0, 64) ] AS vec
      |  FROM embeddings),
      |corpus AS (SELECT * FROM vecs WHERE vec_id >= 10),
      |q AS (SELECT vec_id AS qid, vec AS qvec FROM vecs WHERE vec_id < 5),
      |init AS (
      |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code, vec
      |  FROM corpus ORDER BY vec_id LIMIT 16),
      |cents0 AS (
      |  SELECT m.m, i.code, list_slice(i.vec, m.m * 8 + 1, m.m * 8 + 8) AS c
      |  FROM init i CROSS JOIN dims m),
      |subs AS (
      |  SELECT s.vec_id, m.m, list_slice(s.vec, m.m * 8 + 1, m.m * 8 + 8) AS sub
      |  FROM corpus s CROSS JOIN dims m),
      |assign0 AS (
      |  SELECT vec_id, m, code FROM (
      |    SELECT s.vec_id, s.m, c.code,
      |           row_number() OVER (PARTITION BY s.vec_id, s.m
      |             ORDER BY list_sum([ (s.sub[i] - c.c[i]) * (s.sub[i] - c.c[i])
      |                                 for i in range(1, 9) ]), c.code) AS rn
      |    FROM subs s JOIN cents0 c ON s.m = c.m)
      |  WHERE rn = 1),
      |sub_elems AS (
      |  SELECT a.m, a.code, UNNEST(s.sub) AS x, UNNEST(range(1, 9)) AS i
      |  FROM assign0 a JOIN subs s ON a.vec_id = s.vec_id AND a.m = s.m),
      |csum AS (
      |  SELECT m, code, i, CAST(SUM(x) AS BIGINT) AS sx,
      |         CAST(COUNT(*) AS BIGINT) AS n
      |  FROM sub_elems GROUP BY m, code, i),
      |cents1new AS (
      |  SELECT m, code,
      |         list(CAST(FLOOR(CAST(sx AS DOUBLE) / n) AS BIGINT) ORDER BY i) AS c
      |  FROM csum GROUP BY m, code),
      |cents1 AS (
      |  SELECT c0.m, c0.code, COALESCE(cn.c, c0.c) AS c
      |  FROM cents0 c0 LEFT JOIN cents1new cn
      |    ON c0.m = cn.m AND c0.code = cn.code),
      |enc AS (
      |  SELECT vec_id, m, code FROM (
      |    SELECT s.vec_id, s.m, c.code,
      |           row_number() OVER (PARTITION BY s.vec_id, s.m
      |             ORDER BY list_sum([ (s.sub[i] - c.c[i]) * (s.sub[i] - c.c[i])
      |                                 for i in range(1, 9) ]), c.code) AS rn
      |    FROM subs s JOIN cents1 c ON s.m = c.m)
      |  WHERE rn = 1),
      |qsubs AS (
      |  SELECT q.qid, m.m, list_slice(q.qvec, m.m * 8 + 1, m.m * 8 + 8) AS sub
      |  FROM q CROSS JOIN dims m),
      |lut AS (
      |  SELECT qs.qid, c.m, c.code,
      |         CAST(list_sum([ (qs.sub[i] - c.c[i]) * (qs.sub[i] - c.c[i])
      |                         for i in range(1, 9) ]) AS BIGINT) AS d2
      |  FROM qsubs qs JOIN cents1 c ON qs.m = c.m),
      |adc AS (
      |  SELECT l.qid, e.vec_id, CAST(SUM(l.d2) AS BIGINT) AS adc_dist
      |  FROM enc e JOIN lut l ON e.m = l.m AND e.code = l.code
      |  GROUP BY l.qid, e.vec_id),
      |short AS (
      |  SELECT qid, vec_id FROM (
      |    SELECT qid, vec_id,
      |           row_number() OVER (PARTITION BY qid ORDER BY adc_dist, vec_id) AS rn
      |    FROM adc) WHERE rn <= 50),
      |rer AS (
      |  SELECT s.qid, s.vec_id,
      |         CAST(list_sum([ (q.qvec[i] - c.vec[i]) * (q.qvec[i] - c.vec[i])
      |                         for i in range(1, 65) ]) AS BIGINT) AS dist2
      |  FROM short s JOIN q ON q.qid = s.qid JOIN corpus c ON c.vec_id = s.vec_id)
      |SELECT qid, vec_id, dist2, CAST(rank AS BIGINT) AS rank FROM (
      |  SELECT qid, vec_id, dist2,
      |         row_number() OVER (PARTITION BY qid ORDER BY dist2, vec_id) AS rank
      |  FROM rer) WHERE rank <= 10""".stripMargin

  /** Distributed connected components ([[graft.ops.ConnectedComponents]]):
    * the pairs->clusters step of production dedup, driver-oracle-checked
    * against a DuckDB RECURSIVE-CTE transitive closure. The graph is
    * deterministic id arithmetic over documents: 5-chains (i -> i+1
    * unless i%5==4) plus long-range merge edges (i -> i+250 when
    * i%50==3) so components span multiple chains.
    */
  def q55Components(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents").select(col("doc_id"))
    val chain = d.filter(col("doc_id") % 5 =!= 4)
      .select(col("doc_id").as("a"), (col("doc_id") + 1).as("b"))
    val merge = d.filter(col("doc_id") % 50 === 3)
      .select(col("doc_id").as("a"), (col("doc_id") + 250).as("b"))
    val edges = chain.unionByName(merge)
      .join(d.select(col("doc_id").as("b")), Seq("b"), "left_semi")
    graft.ops.ConnectedComponents.clusterRepresentatives(edges, "a", "b")
      .select(col("node"), col("component"), col("keep"))
      .orderBy(col("node")) // canonical output order for the driver's hasher
  }

  val q55Sql: String =
    """WITH RECURSIVE nodes AS (SELECT doc_id FROM documents),
      |e0 AS (
      |  SELECT doc_id AS a, doc_id + 1 AS b FROM nodes WHERE doc_id % 5 != 4
      |  UNION ALL
      |  SELECT doc_id AS a, doc_id + 250 AS b FROM nodes WHERE doc_id % 50 = 3),
      |edges AS (SELECT a, b FROM e0 WHERE b IN (SELECT doc_id FROM nodes)),
      |sym AS (SELECT a AS u, b AS v FROM edges UNION SELECT b, a FROM edges),
      |reach(node, r) AS (
      |  SELECT u, u FROM sym
      |  UNION
      |  SELECT s.u, reach.r FROM sym s JOIN reach ON reach.node = s.v)
      |SELECT node, min(r) AS component, (node = min(r)) AS keep
      |FROM reach GROUP BY node""".stripMargin

  /** Deterministic mixture sampling + train/val/test split
    * ([[graft.ops.Pack.sampleAndSplit]]): per-source rates (the domain
    * mixture weights) joined broadcast, kept rows dealt into splits by
    * the rescaled uniform. The uniform is id arithmetic so the oracle
    * reproduces it exactly.
    */
  def q56SampleSplit(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents").select(col("doc_id"), col("source"))
    val rates = d.select(col("source")).distinct()
      .withColumn("rate",
        ((substring(col("source"), 4, 10).cast("int") % 4 + 1) / lit(5.0)))
    val uniform = ((col("doc_id") * 2654435761L) % 1000000L) / lit(1000000.0)
    graft.ops.Pack.sampleAndSplit(d, uniform, "source", rates, "rate")
      .select(col("doc_id"), col("source"), col("split"))
  }

  /** Streaming cleaning ingest — the north rule's continuous-crawl shape
    * END TO END: documents stream in 3 micro-batches (AvailableNow,
    * maxFilesPerTrigger=1), each batch is quality-filtered INSIDE the
    * stream (language allowlist + minimum token count), and each cleaned
    * batch commits as one Iceberg-style snapshot; the query reads the
    * final table and pins the snapshot count. Oracle: the same filter
    * relationally, snapshot count as a constant.
    */
  def q58StreamClean(spark: SparkSession, dir: String): DataFrame = {
    val root = scratchStore(spark, "q58")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    val vt = graft.streaming.EventStream.streamToVersionedTable(
      spark, s"$dir/documents.parquet", "doc_id", root, nFiles = 3,
      queryName = s"graft_clean_${System.nanoTime()}",
      transform = b => b
        .filter(col("lang").isin("en", "de") &&
          size(split(col("text"), " ")) >= 35)
        .select(col("doc_id"), col("lang"), col("n_chars")))
    val n = vt.snapshots().size.toLong
    vt.read(spark).withColumn("n_snapshots", lit(n))
  }

  val q58Sql: String =
    """SELECT doc_id, lang, n_chars, CAST(3 AS BIGINT) AS n_snapshots
      |FROM documents
      |WHERE lang IN ('en', 'de') AND len(string_split(text, ' ')) >= 35""".stripMargin

  /** Benchmark-contamination check ([[graft.ops.Dedup.crossCorpusNearDup]]):
    * docs split train/test by id arithmetic; every 20th doc's TEST text
    * is planted from a TRAIN doc (the leak), and the bipartite LSH +
    * exact-Jaccard pass must find exactly the cross-split >=0.8 pairs
    * the oracle computes relationally. Planted copies have J=1, so
    * banding recall is exact on them by construction.
    */
  def q59Contamination(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents").select(col("doc_id"), col("text"))
    val train = d.filter(col("doc_id") % 4 =!= 0)
    val prev = d.select(col("doc_id").as("p_id"), col("text").as("p_text"))
    val test = d.filter(col("doc_id") % 4 === 0)
      .join(prev, col("p_id") === col("doc_id") + 1)
      .select(col("doc_id"),
        when(col("doc_id") % 20 === 0, col("p_text")).otherwise(col("text"))
          .as("text"))
    graft.ops.Dedup.crossCorpusNearDup(train, "doc_id", test, "doc_id",
        "text", threshold = 0.8)
      .select(col("a"), col("b"),
        floor(col("jaccard") * lit(1000000.0) + lit(0.5)).cast("long")
          .as("jaccard_ppm"))
      // contamination hits are a vanishing fraction of the corpus —
      // materialize them before the canonical sort so the bipartite LSH +
      // exact verify pipeline runs once, not twice (orderBy sampling)
      .localCheckpoint(true)
      .orderBy(col("a"), col("b")) // canonical output order for the driver's hasher
  }

  val q59Sql: String =
    """WITH test0 AS (
      |  SELECT n.doc_id,
      |         CASE WHEN n.doc_id % 20 = 0 THEN p.text ELSE n.text END AS text
      |  FROM documents n JOIN documents p ON p.doc_id = n.doc_id + 1
      |  WHERE n.doc_id % 4 = 0),
      |train0 AS (SELECT doc_id, text FROM documents WHERE doc_id % 4 != 0),
      |shl AS (
      |  SELECT doc_id,
      |         list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
      |                        for i in range(1, len(ws) - 1)]) AS s
      |  FROM (SELECT doc_id,
      |               regexp_extract_all(lower(text),
      |                 '[a-z]+|[0-9]+|[^a-z0-9 \t\n\r]') AS ws
      |        FROM train0)),
      |shr AS (
      |  SELECT doc_id,
      |         list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
      |                        for i in range(1, len(ws) - 1)]) AS s
      |  FROM (SELECT doc_id,
      |               regexp_extract_all(lower(text),
      |                 '[a-z]+|[0-9]+|[^a-z0-9 \t\n\r]') AS ws
      |        FROM test0)),
      |pairs AS (
      |  SELECT x.doc_id AS a, y.doc_id AS b,
      |         CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) AS inter,
      |         CAST(len(x.s) + len(y.s) AS DOUBLE) AS tot
      |  FROM shl x JOIN shr y ON true)
      |SELECT a, b,
      |       CAST(FLOOR(1000000.0 * (inter / (tot - inter)) + 0.5) AS BIGINT)
      |         AS jaccard_ppm
      |FROM pairs WHERE inter / (tot - inter) >= 0.8""".stripMargin

  val q56Sql: String =
    """WITH u AS (SELECT doc_id, source,
      |  ((doc_id * 2654435761) % 1000000) / 1000000.0 AS u,
      |  ((CAST(substr(source, 4) AS INT) % 4) + 1) / 5.0 AS rate
      |  FROM documents)
      |SELECT doc_id, source,
      |  CASE WHEN u/rate < 0.05 THEN 'test'
      |       WHEN u/rate < 0.10 THEN 'val'
      |       ELSE 'train' END AS split
      |FROM u WHERE u < rate""".stripMargin

  /** GPT-style concat-then-chunk sequence packing
    * ([[graft.ops.Pack.packSequences]]): whitespace token counts,
    * 512-token blocks, two-phase distributed prefix sum (no
    * single-partition exchange — gated in WebCleanSpec). Oracle is the
    * equivalent SQL running sum.
    */
  def q57Packing(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents").select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    graft.ops.Pack.packSequences(d, "doc_id", "n_tokens", budget = 512L)
      .select(col("doc_id"), col("n_tokens"), col("start_offset"), col("pack_id"))
      .orderBy(col("doc_id")) // canonical output order for the driver's hasher
      .coalesce(1)            // one output file so physical order == sort order
  }

  val q57Sql: String =
    """WITH tok AS (SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
      |s AS (SELECT doc_id, n_tokens,
      |  CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
      |  FROM tok)
      |SELECT doc_id, n_tokens, start_offset,
      |       CAST(FLOOR(start_offset / 512.0) AS BIGINT) AS pack_id
      |FROM s ORDER BY doc_id""".stripMargin

  val q53Sql: String =
    """WITH tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents),
      |tf AS (SELECT doc_id, w AS word, CAST(count(*) AS BIGINT) AS tf
      |       FROM tok GROUP BY doc_id, w),
      |df AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY word),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
      |scored AS (SELECT tf.doc_id, tf.word, tf.tf, df.df,
      |           tf.tf * CAST(FLOOR(1000000.0 * n.n / df.df) AS BIGINT) AS score
      |           FROM tf JOIN df USING (word) CROSS JOIN n)
      |SELECT doc_id, word, tf, df, rank FROM (
      |  SELECT doc_id, word, tf, df,
      |         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, word) AS BIGINT) AS rank
      |  FROM scored)
      |WHERE rank <= 3""".stripMargin

  /** REAL image decode through the multimodal plumbing (round 4): each
    * document id becomes a deterministic 24-bit BMP (bottom-up rows,
    * 4-byte padding — [[graft.multimodal.Bmp.synth]]), the from-scratch
    * decoder parses it back, and the position-weighted pixel checksum is
    * oracle-checked against the generation formula computed relationally
    * — a decoder bug in padding, row order, or BGR/RGB order breaks the
    * match. Widths 8..16 exercise all three padding widths.
    */
  def q60BmpDecode(spark: SparkSession, dir: String): DataFrame = {
    val synth = udf { (id: Long) =>
      graft.multimodal.Bmp.synth(id, (8 + id % 9).toInt, (6 + id % 7).toInt)
    }
    // Canonical order comes FIRST, on the bare key (round 7, guide §1.2):
    // a trailing global orderBy re-runs its whole child subtree in the
    // range-boundary sampling pass, so synth + decode executed TWICE and
    // the exchange carried the payload bytes. Sorting doc_id up front
    // makes the sampling pass a bare-key scan and runs the codec exactly
    // once; projections/mapPartitions preserve the sorted order.
    val imgs = t(spark, dir, "documents").select(col("doc_id"))
      .orderBy(col("doc_id"))
      .withColumn("payload", synth(col("doc_id")))
    graft.multimodal.Multimodal.decodeBmpMeta(imgs, "doc_id", "payload")
      .toDF()
      .select(col("id").as("doc_id"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"), col("n_px"),
        col("px_checksum"))
  }

  val q60Sql: String =
    """WITH d AS (
      |  SELECT doc_id, 8 + doc_id % 9 AS w, 6 + doc_id % 7 AS h
      |  FROM documents)
      |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      |       CAST(w * h AS BIGINT) AS n_px,
      |       CAST(list_sum([ ((doc_id + 3*p) % 256
      |                        + 2 * ((doc_id + 3*p + 1) % 256)
      |                        + 3 * ((doc_id + 3*p + 2) % 256)) * (p + 1)
      |                       for p in range(0, w * h) ]) AS BIGINT) AS px_checksum
      |FROM d""".stripMargin

  /** REAL audio decode through the multimodal plumbing (round 4,
    * companion to [[q60BmpDecode]]): each document id becomes a
    * deterministic PCM16 WAV with a planted LIST chunk before the data
    * chunk ([[graft.multimodal.Wav.synth]] — a decoder that does not
    * walk RIFF chunks reads garbage and fails loudly), decoded by the
    * from-scratch codec, position-weighted sample checksum
    * oracle-checked against the generation formula.
    */
  def q62WavDecode(spark: SparkSession, dir: String): DataFrame = {
    val synth = udf { (id: Long) =>
      graft.multimodal.Wav.synth(id, (100 + id % 50).toInt, (1 + id % 2).toInt)
    }
    // sort-first on the bare key — see q60's rationale
    val clips = t(spark, dir, "documents").select(col("doc_id"))
      .orderBy(col("doc_id"))
      .withColumn("payload", synth(col("doc_id")))
    graft.multimodal.Multimodal.decodeWavMeta(clips, "doc_id", "payload")
      .toDF()
      .select(col("id").as("doc_id"),
        col("sample_rate").cast("long").as("sample_rate"),
        col("channels").cast("long").as("channels"),
        col("n_samples"), col("pcm_checksum"))
  }

  val q62Sql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |         (100 + doc_id % 50) * (1 + doc_id % 2) AS n
      |  FROM documents)
      |SELECT doc_id, CAST(16000 AS BIGINT) AS sample_rate,
      |       CAST(1 + doc_id % 2 AS BIGINT) AS channels,
      |       CAST(n AS BIGINT) AS n_samples,
      |       CAST(list_sum([ ((doc_id + i * 2654435761) % 65536 - 32768) * (i + 1)
      |                       for i in range(0, n) ]) AS BIGINT) AS pcm_checksum
      |FROM d""".stripMargin

  /** REAL video decode through the multimodal plumbing (round 4,
    * completing the image/audio/video triple): each document id becomes
    * a deterministic Y4M clip (ASCII stream header, FRAME markers,
    * planar 4:2:0 YUV — [[graft.multimodal.Y4m.synth]]), parsed by the
    * from-scratch codec, position-weighted plane-byte checksum
    * oracle-checked against the generation formula.
    */
  def q63Y4mDecode(spark: SparkSession, dir: String): DataFrame = {
    val synth = udf { (id: Long) =>
      graft.multimodal.Y4m.synth(id,
        (8 + 2 * (id % 5)).toInt, (6 + 2 * (id % 4)).toInt, (3 + id % 4).toInt)
    }
    // sort-first on the bare key — see q60's rationale
    val clips = t(spark, dir, "documents").select(col("doc_id"))
      .orderBy(col("doc_id"))
      .withColumn("payload", synth(col("doc_id")))
    graft.multimodal.Multimodal.decodeY4mMeta(clips, "doc_id", "payload")
      .toDF()
      .select(col("id").as("doc_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("n_frames"), col("yuv_checksum"))
  }

  val q63Sql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |         8 + 2 * (doc_id % 5) AS w,
      |         6 + 2 * (doc_id % 4) AS h,
      |         3 + doc_id % 4 AS nf
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, w, h, nf,
      |         CAST(w * h * 3 / 2 AS BIGINT) AS fb
      |  FROM d)
      |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      |       CAST(nf AS BIGINT) AS n_frames,
      |       CAST(list_sum([
      |         ((doc_id + CAST(FLOOR(p / fb) AS BIGINT) * 131 + p % fb) % 256)
      |           * (p + 1)
      |         for p in range(0, nf * fb) ]) AS BIGINT) AS yuv_checksum
      |FROM f""".stripMargin

  /** REAL PNG decode through the multimodal plumbing (round 5): each
    * document id becomes a deterministic 8-bit PNG
    * ([[graft.multimodal.Png.synth]]) whose row filters CYCLE through
    * all five PNG filter types (heights >= 5 guarantee every filter
    * appears in every image), alternating RGB / RGBA per doc, zlib
    * stream split across two IDAT chunks. The from-scratch decoder
    * (chunk walk + hand-rolled CRC-32, Inflater, filter reconstruction)
    * parses it back; the position-weighted pixel checksum is
    * oracle-checked against the generation formula — a bug in any filter
    * path, row order, channel order, or IDAT concatenation breaks the
    * match.
    */
  def q64PngDecode(spark: SparkSession, dir: String): DataFrame = {
    val synth = udf { (id: Long) =>
      graft.multimodal.Png.synth(id, (5 + id % 8).toInt, (5 + id % 6).toInt,
        (3 + id % 2).toInt)
    }
    // sort-first on the bare key — see q60's rationale
    val imgs = t(spark, dir, "documents").select(col("doc_id"))
      .orderBy(col("doc_id"))
      .withColumn("payload", synth(col("doc_id")))
    graft.multimodal.Multimodal.decodePngMeta(imgs, "doc_id", "payload")
      .toDF()
      .select(col("id").as("doc_id"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("channels").cast("long").as("channels"), col("n_px"),
        col("px_checksum"))
  }

  val q64Sql: String =
    """WITH d AS (
      |  SELECT doc_id, 5 + doc_id % 8 AS w, 5 + doc_id % 6 AS h,
      |         3 + doc_id % 2 AS ch
      |  FROM documents)
      |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      |       CAST(ch AS BIGINT) AS channels, CAST(w * h AS BIGINT) AS n_px,
      |       CAST(list_sum([ (p + 1) * (
      |           (doc_id + ch*p) % 256
      |           + 2 * ((doc_id + ch*p + 1) % 256)
      |           + 3 * ((doc_id + ch*p + 2) % 256)
      |           + (ch - 3) * 4 * ((doc_id + ch*p + 3) % 256))
      |         for p in range(0, w * h) ]) AS BIGINT) AS px_checksum
      |FROM d""".stripMargin

  /** Kill-and-resume through the driver surface (round 5; the north
    * rule's resumability, previously spec-only): build a full tile
    * store, simulate a killed run by deleting HALF the region files
    * (every other tile, plus one whole tile directory), then re-run
    * `toTileStore(resume = true)` — the resume path must skip complete
    * tiles and re-burn exactly the missing ones (region writes are
    * atomic + idempotent, [[graft.raster.TileStore.writeRegion]]). The
    * emitted rows read the RESUMED store back cell by cell; the oracle
    * recomputes what an uninterrupted build produces, so any
    * resume defect (skipped re-burn, double burn, stale region) is a
    * value mismatch.
    */
  def q65Resume(spark: SparkSession, dir: String): DataFrame = {
    val pts = docPoints(spark, dir).withColumn("geometry",
      st_point(col("x").cast("double"), col("y").cast("double")))
    val path = scratchStore(spark, "q65")
    graft.raster.RasterPipeline.toTileStore(pts, "geometry", Seq.empty, path,
      cellSize = 10000, tileSize = 100000, overwrite = true)
    // Simulate the kill: wipe every other tile's region file and one
    // whole tile directory (deterministic subset — sorted tile refs).
    val store = new graft.raster.TileStore(path)
    val tiles = store.tiles()
    tiles.zipWithIndex.foreach { case (ref, i) =>
      val tileDir = java.nio.file.Paths.get(path, s"tile=$ref")
      if (i == 0) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.list(tileDir).iterator().asScala.toSeq
          .foreach(java.nio.file.Files.delete)
        java.nio.file.Files.delete(tileDir)
      } else if (i % 2 == 0) {
        java.nio.file.Files.delete(tileDir.resolve("mask.bin"))
      }
    }
    val survivors = store.completeTiles(Seq("mask")).size
    require(survivors < tiles.size,
      s"kill simulation deleted nothing ($survivors of ${tiles.size} complete)")
    graft.raster.RasterPipeline.toTileStore(pts, "geometry", Seq.empty, path,
      cellSize = 10000, tileSize = 100000, resume = true)
    graft.raster.RasterPipeline.fromTileStore(spark, path, "mask")
      .select(col("cell_e"), col("cell_n"),
        col("value").cast("long").as("value"))
  }

  /** Same oracle as q35: the resumed store must be indistinguishable
    * from an uninterrupted build.
    */
  val q65Sql: String = q35Sql

  /** Lineage DAG through the driver surface (round 4; reference
    * `graph.py:124-257` semantics): a 3-op LayerWrapper pipeline
    * (select -> filter -> limit) over the documents table, emitting the
    * DAG's node/edge/shape counts, the last-node id, and an md5 digest
    * of the deterministic DOT rendering. Labels are path-independent so
    * the digest is a constant the oracle can pin.
    *
    * What each column proves: the node/edge/SHAPE counts and last-node id
    * are the reference-semantics check (graph.py builds exactly this DAG
    * topology for a 3-op pipeline: 1 oval input, one box + parallelogram
    * pair per op). The dot_md5 column is weaker — it pins OUR dot
    * rendering against itself (regression freeze, not reference
    * semantics), since the reference's pydot byte output is not
    * reproducible offline.
    */
  def q61Lineage(spark: SparkSession, dir: String): DataFrame = {
    val layer = graft.core.LayerWrapper("docs", t(spark, dir, "documents"),
        lineage = graft.core.LineageDag().withInput("read documents.parquet"))
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .filter("lang = 'en'")
      .limit(100)
    val dag = layer.lineage
    val dot = dag.toDot
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(dot.getBytes("UTF-8")).map("%02x".format(_)).mkString
    import spark.implicits._
    Seq((
      dag.nodes.size.toLong, dag.edges.size.toLong,
      dag.nodes.count(_.shape == "oval").toLong,
      dag.nodes.count(_.shape == "box").toLong,
      dag.nodes.count(_.shape == "parallelogram").toLong,
      dag.lastNode.orNull: String,
      dot.linesIterator.size.toLong,
      digest,
      layer.data.count()
    )).toDF("n_nodes", "n_edges", "n_oval", "n_box", "n_parallelogram",
      "last_node", "dot_lines", "dot_md5", "n_rows")
  }

  val q61Sql: String =
    """SELECT CAST(7 AS BIGINT) AS n_nodes, CAST(6 AS BIGINT) AS n_edges,
      |CAST(1 AS BIGINT) AS n_oval, CAST(3 AS BIGINT) AS n_box,
      |CAST(3 AS BIGINT) AS n_parallelogram, 'n6' AS last_node,
      |CAST(15 AS BIGINT) AS dot_lines,
      |'079ce84dad9029a21abd242688b0644e' AS dot_md5,
      |(SELECT CAST(LEAST(count(*), 100) AS BIGINT)
      |   FROM documents WHERE lang = 'en') AS n_rows""".stripMargin

  /** REAL baseline JPEG decode through the multimodal plumbing (round
    * 5, closing the real-web image pair with q64's PNG): each document
    * id becomes a REAL entropy-coded baseline JPEG
    * ([[graft.multimodal.Jpeg.synth]]) cycling grayscale / YCbCr 4:4:4
    * / YCbCr 4:2:0 by doc id, with DC-diff chains through the standard
    * Annex K Huffman tables and a 2-MCU restart interval. Blocks carry
    * DC-only coefficients — the one family the double IDCT reproduces
    * EXACTLY — so the decoded pixels (after 4:2:0 upsampling and the
    * floor(x+0.5) JFIF YCbCr->RGB) equal a closed form the oracle
    * recomputes; a bug in the marker walk, Huffman/restart layer,
    * dequant, MCU interleave, upsampling or color conversion breaks the
    * position-weighted checksum. The AC/zigzag/IDCT path is pinned in
    * JpegSpec against an independent reference.
    */
  def q66JpegDecode(spark: SparkSession, dir: String): DataFrame = {
    val synth = udf { (id: Long) =>
      val mode = (id % 3).toInt
      val bx = if (mode == 2) (2 * (1 + id % 2)).toInt else (1 + id % 3).toInt
      val by = if (mode == 2) 2 else (1 + id % 2).toInt
      graft.multimodal.Jpeg.synth(id, mode, bx, by)
    }
    // sort-first on the bare key — see q60's rationale (the JPEG codec
    // pair is the family's most expensive; halving its executions is the
    // whole win)
    val imgs = t(spark, dir, "documents").select(col("doc_id"))
      .orderBy(col("doc_id"))
      .withColumn("payload", synth(col("doc_id")))
    graft.multimodal.Multimodal.decodeJpegMeta(imgs, "doc_id", "payload")
      .toDF()
      .select(col("id").as("doc_id"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("channels").cast("long").as("channels"), col("n_px"),
        col("px_checksum"))
  }

  /** Closed-form replay: per-block constant planes (the synthValue
    * formula), nearest upsampling (4:2:0 chroma block = pixel//16), JFIF
    * conversion with FLOOR(x+0.5) and LEAST/GREATEST clamp — identical
    * double arithmetic to the decoder's.
    */
  val q66Sql: String =
    """WITH d AS (
      |  SELECT doc_id, CAST(doc_id % 3 AS BIGINT) AS mode,
      |         CASE WHEN doc_id % 3 = 2 THEN 2 * (1 + doc_id % 2)
      |              ELSE 1 + doc_id % 3 END AS bxn,
      |         CASE WHEN doc_id % 3 = 2 THEN 2
      |              ELSE 1 + doc_id % 2 END AS byn
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, mode, 8 * bxn AS w, 8 * byn AS h,
      |         CASE WHEN mode = 0 THEN 1 ELSE 3 END AS ch,
      |         CASE WHEN mode = 2 THEN 16 ELSE 8 END AS cs
      |  FROM d)
      |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      |       CAST(ch AS BIGINT) AS channels, CAST(w * h AS BIGINT) AS n_px,
      |       CAST(list_sum([ (p + 1) * (
      |         CASE WHEN ch = 1 THEN
      |           28 + ((doc_id * 31
      |             + (CAST(FLOOR(CAST(FLOOR(p / ch) AS BIGINT) / w / 8) AS BIGINT)) * 17
      |             + (CAST(FLOOR((CAST(FLOOR(p / ch) AS BIGINT) % w) / 8) AS BIGINT)) * 7) % 200)
      |         ELSE
      |           LEAST(255, GREATEST(0, CAST(FLOOR(0.5 +
      |             (28 + ((doc_id * 31
      |               + CAST(FLOOR(CAST(FLOOR(p / ch) AS BIGINT) / w / 8) AS BIGINT) * 17
      |               + CAST(FLOOR((CAST(FLOOR(p / ch) AS BIGINT) % w) / 8) AS BIGINT) * 7) % 200))
      |             + CASE p % ch
      |                 WHEN 0 THEN 1.402 * ((28 + ((doc_id * 31 + 2 * 59
      |                   + CAST(FLOOR(CAST(FLOOR(p / ch) AS BIGINT) / w / cs) AS BIGINT) * 17
      |                   + CAST(FLOOR((CAST(FLOOR(p / ch) AS BIGINT) % w) / cs) AS BIGINT) * 7) % 200)) - 128)
      |                 WHEN 1 THEN
      |                   - 0.344136 * ((28 + ((doc_id * 31 + 1 * 59
      |                     + CAST(FLOOR(CAST(FLOOR(p / ch) AS BIGINT) / w / cs) AS BIGINT) * 17
      |                     + CAST(FLOOR((CAST(FLOOR(p / ch) AS BIGINT) % w) / cs) AS BIGINT) * 7) % 200)) - 128)
      |                   - 0.714136 * ((28 + ((doc_id * 31 + 2 * 59
      |                     + CAST(FLOOR(CAST(FLOOR(p / ch) AS BIGINT) / w / cs) AS BIGINT) * 17
      |                     + CAST(FLOOR((CAST(FLOOR(p / ch) AS BIGINT) % w) / cs) AS BIGINT) * 7) % 200)) - 128)
      |                 ELSE 1.772 * ((28 + ((doc_id * 31 + 1 * 59
      |                   + CAST(FLOOR(CAST(FLOOR(p / ch) AS BIGINT) / w / cs) AS BIGINT) * 17
      |                   + CAST(FLOOR((CAST(FLOOR(p / ch) AS BIGINT) % w) / cs) AS BIGINT) * 7) % 200)) - 128)
      |               END) AS BIGINT)))
      |         END)
      |         for p in range(0, w * h * ch) ]) AS BIGINT) AS px_checksum
      |FROM g""".stripMargin

  /** Legacy BIFF8 .xls round-trip (S4 completeness: the reference's
    * pandas read_excel path also accepts pre-OOXML workbooks,
    * `dataframe.py:161-190`): write 200 orders rows to a REAL .xls — a
    * CFB container with FAT-chained workbook stream, RK/MULRK integer
    * cells, SST+LABELSST strings, NUMBER doubles, date serials under a
    * custom date FORMAT+XF, BOOLERR booleans — read it back through the
    * from-scratch CFB+BIFF8 parser and the from_files dispatch, and
    * return the typed rows. The oracle reads the same rows straight from
    * parquet, so the whole container/record/SST/date-serial/type-
    * inference path is driver-oracle-checked end to end.
    */
  def q67XlsRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
      .filter(col("o_orderkey") < 200)
      .select(
        col("o_orderkey").cast("long").as("order_key"),
        col("o_custkey").cast("long").as("cust_key"), // MULRK run with order_key
        col("o_orderstatus").as("status"), // SST + LABELSST
        col("o_totalprice").as("total_price"), // NUMBER (exact IEEE bits)
        col("o_orderdate").cast("date").as("order_date"), // date serial + XF
        (col("o_totalprice") > lit(200000.0)).as("big")) // BOOLERR
      .orderBy(col("order_key"))
    val root = scratchStore(spark, "q67")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    val path = s"$root/orders.xls"
    graft.input.Xls.write(orders, path)
    graft.core.LayerWrapper.fromFiles(spark, path).data
  }

  val q67Sql: String =
    """SELECT CAST(o_orderkey AS BIGINT) AS order_key,
      |       CAST(o_custkey AS BIGINT) AS cust_key,
      |       o_orderstatus AS status,
      |       o_totalprice AS total_price,
      |       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
      |       o_totalprice > 200000.0 AS big
      |FROM orders WHERE o_orderkey < 200""".stripMargin

  /** GeoPackage round-trip (S5: the reference's `.gpkg` dispatch goes
    * through read_gpkg, `dataframe.py:194-195`): write 150 orders-derived
    * point features to a REAL GeoPackage — a SQLite container built by
    * the fixture writer (sqlite_master catalog, gpkg_contents /
    * gpkg_geometry_columns / gpkg_spatial_ref_sys, table b-tree leaves,
    * GPKG geometry blobs wrapping WKB) — read it back through the
    * from-scratch SQLite walker via the from_files dispatch, and emit
    * each feature's attributes plus its geometry as WKT. Closed-form
    * integer coordinates make the WKT exactly reconstructible in SQL, so
    * the whole container/b-tree/record/geometry-blob path is
    * driver-oracle-checked end to end. (The reader is additionally
    * pinned against bytes written by the GENUINE SQLite library in
    * GpkgSpec — real page layout, interior pages, overflow chains.)
    */
  def q68GpkgRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val feats = t(spark, dir, "orders")
      .filter(col("o_orderkey") < 150)
      .select(
        col("o_orderkey").cast("long").as("order_key"),
        col("o_orderstatus").as("status"),
        (col("o_orderkey") * lit(37L) % lit(700000L)).cast("double").as("x"),
        (col("o_orderkey") * lit(91L) % lit(1200000L)).cast("double").as("y"))
      .orderBy(col("order_key"))
    val root = scratchStore(spark, "q68")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    val path = s"$root/orders.gpkg"
    graft.input.Gpkg.write(feats, path)
    graft.core.LayerWrapper.fromFiles(spark, path).data
      .select(col("fid"), col("order_key"), col("status"),
        graft.geo.GeoExpressions.st_astext(col("geom")).as("wkt"))
  }

  val q68Sql: String =
    """SELECT CAST(row_number() OVER (ORDER BY o_orderkey) AS BIGINT) AS fid,
      |       CAST(o_orderkey AS BIGINT) AS order_key,
      |       o_orderstatus AS status,
      |       'POINT (' || CAST(o_orderkey * 37 % 700000 AS BIGINT)
      |         || ' ' || CAST(o_orderkey * 91 % 1200000 AS BIGINT) || ')' AS wkt
      |FROM orders WHERE o_orderkey < 150""".stripMargin

  /** ESRI Shapefile round-trip (S6: the reference's generic vector path,
    * whose E2E matrix includes `.shp` — `tests/test_dataframe/
    * test_pipeline.py:38+`): write 150 orders-derived point features
    * through the from-scratch `.shp`/`.shx`/`.dbf` writer, read them
    * back via the from_files dispatch, and emit every dbf-typed
    * attribute (N-integer -> long, N-decimal -> double, L -> boolean,
    * C -> string) plus the geometry as WKT. Quarter-valued doubles are
    * exact in both the dbf's fixed-decimal ASCII cells and SQL, so the
    * whole mixed-endian record path is driver-oracled end to end.
    */
  def q69ShpRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val feats = t(spark, dir, "orders")
      .filter(col("o_orderkey") < 150)
      .select(
        col("o_orderkey").cast("long").as("order_key"),
        col("o_orderstatus").as("status"),
        ((col("o_orderkey") * lit(13L) % lit(1000L)).cast("double") / lit(4.0)).as("score"),
        (col("o_orderkey") % lit(3L) === lit(0L)).as("flag"),
        (col("o_orderkey") * lit(37L) % lit(700000L)).cast("double").as("x"),
        (col("o_orderkey") * lit(91L) % lit(1200000L)).cast("double").as("y"))
      .orderBy(col("order_key"))
    val root = scratchStore(spark, "q69")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    val path = s"$root/orders.shp"
    graft.input.Shapefile.write(feats, path)
    graft.core.LayerWrapper.fromFiles(spark, path).data
      .select(col("fid"), col("order_key"), col("status"), col("score"),
        col("flag"),
        graft.geo.GeoExpressions.st_astext(col("geom")).as("wkt"))
  }

  val q69Sql: String =
    """SELECT CAST(row_number() OVER (ORDER BY o_orderkey) AS BIGINT) AS fid,
      |       CAST(o_orderkey AS BIGINT) AS order_key,
      |       o_orderstatus AS status,
      |       CAST(o_orderkey * 13 % 1000 AS DOUBLE) / 4.0 AS score,
      |       (o_orderkey % 3 = 0) AS flag,
      |       'POINT (' || CAST(o_orderkey * 37 % 700000 AS BIGINT)
      |         || ' ' || CAST(o_orderkey * 91 % 1200000 AS BIGINT) || ')' AS wkt
      |FROM orders WHERE o_orderkey < 150""".stripMargin

  /** GeoJSON round-trip (S6: `.geojson` in the reference's E2E vector
    * matrix): write 150 orders-derived point Features through the
    * fixture writer, read them back through the from-scratch RFC 7946
    * parser via the from_files dispatch, and emit the typed properties
    * (integral JSON number -> long, fractional -> double, boolean,
    * string) plus the geometry as WKT.
    */
  def q70GeoJsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val feats = t(spark, dir, "orders")
      .filter(col("o_orderkey") < 150)
      .select(
        col("o_orderkey").cast("long").as("order_key"),
        col("o_orderstatus").as("status"),
        ((col("o_orderkey") * lit(13L) % lit(1000L)).cast("double") / lit(4.0)).as("score"),
        (col("o_orderkey") % lit(3L) === lit(0L)).as("flag"),
        (col("o_orderkey") * lit(37L) % lit(700000L)).cast("double").as("x"),
        (col("o_orderkey") * lit(91L) % lit(1200000L)).cast("double").as("y"))
      .orderBy(col("order_key"))
    val root = scratchStore(spark, "q70")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    val path = s"$root/orders.geojson"
    graft.input.GeoJson.write(feats, path)
    graft.core.LayerWrapper.fromFiles(spark, path).data
      .select(col("fid"), col("order_key"), col("status"), col("score"),
        col("flag"),
        graft.geo.GeoExpressions.st_astext(col("geom")).as("wkt"))
  }

  val q70Sql: String = q69Sql

  /** GeoTIFF raster scan (S7: the reference's rasterio `.tif` dispatch,
    * `_raster.py:444-453`, exercised on its "tiny tif" goldens): write a
    * deterministic DEFLATE-compressed uint8 GeoTIFF (v = (31r + 7c) mod
    * 251, nodata 0), decode it through the from-scratch TIFF reader
    * distributed one-task-per-strip, and aggregate per raster row —
    * count, sum and column extent of the non-nodata cells. The closed
    * form replicates exactly in SQL, so strip layout, DEFLATE decode and
    * nodata masking are driver-oracled end to end.
    */
  def q71TiffRaster(spark: SparkSession, dir: String): DataFrame = {
    val (w, h) = (200, 120)
    val data = Array.tabulate(h * w)(i =>
      (((i / w) * 31 + (i % w) * 7) % 251).toDouble)
    val root = scratchStore(spark, "q71")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    val path = s"$root/grid.tif"
    graft.raster.Tiff.write(path, w, h, data, "uint8",
      cellSize = 10.0, deflate = true, rowsPerStrip = 16)
    graft.raster.Tiff.cells(spark, path, nodata = 0.0)
      .groupBy(col("row"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("long")).as("sum_v"),
        min(col("col")).as("min_c"),
        max(col("col")).as("max_c"))
      .orderBy(col("row"))
  }

  val q71Sql: String =
    """SELECT r AS row, COUNT(*) AS cnt, CAST(SUM(v) AS BIGINT) AS sum_v,
      |       MIN(c) AS min_c, MAX(c) AS max_c
      |FROM (SELECT rr.range AS r, cc.range AS c,
      |             (rr.range * 31 + cc.range * 7) % 251 AS v
      |      FROM range(120) rr, range(200) cc)
      |WHERE v <> 0 GROUP BY r ORDER BY r""".stripMargin

  /** Parallel multi-file vector ingest (S6: the reference's
    * `read_vector_files` reads a DIRECTORY of vector files as parallel
    * chunked reads into one DataFrame, `dataframe.py:196-197`): shard
    * 300 orders-derived point features across THREE files in three
    * different from-scratch formats (.shp, .geojson, .gpkg — one shard
    * each), read the directory back through [[graft.input.VectorFiles]]
    * (driver touches the file list + one schema file; every container
    * parses on an executor, one task per file), and emit the schema-
    * aligned union. Per-file record numbering (fid), typed attributes,
    * and WKT replicate exactly in SQL, so the distributed union of all
    * three format codecs is driver-oracled in one row set.
    */
  def q72VectorFiles(spark: SparkSession, dir: String): DataFrame = {
    val feats = t(spark, dir, "orders")
      .filter(col("o_orderkey") < 300)
      .select(
        col("o_orderkey").cast("long").as("order_key"),
        col("o_orderstatus").as("status"),
        ((col("o_orderkey") * lit(13L) % lit(1000L)).cast("double") / lit(4.0)).as("score"),
        (col("o_orderkey") * lit(37L) % lit(700000L)).cast("double").as("x"),
        (col("o_orderkey") * lit(91L) % lit(1200000L)).cast("double").as("y"))
    val root = scratchStore(spark, "q72")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    def shard(i: Int) =
      feats.filter(col("order_key") % lit(3L) === lit(i.toLong))
        .orderBy(col("order_key"))
    graft.input.Shapefile.write(shard(0), s"$root/orders-a.shp")
    graft.input.GeoJson.write(shard(1), s"$root/orders-b.geojson")
    graft.input.Gpkg.write(shard(2), s"$root/orders-c.gpkg")
    graft.input.VectorFiles.read(spark, root)
      .select(col("fid"), col("order_key"), col("status"), col("score"),
        graft.geo.GeoExpressions.st_astext(col("geom")).as("wkt"))
  }

  val q72Sql: String =
    """SELECT CAST(row_number() OVER (PARTITION BY o_orderkey % 3
      |                               ORDER BY o_orderkey) AS BIGINT) AS fid,
      |       CAST(o_orderkey AS BIGINT) AS order_key,
      |       o_orderstatus AS status,
      |       CAST(o_orderkey * 13 % 1000 AS DOUBLE) / 4.0 AS score,
      |       'POINT (' || CAST(o_orderkey * 37 % 700000 AS BIGINT)
      |         || ' ' || CAST(o_orderkey * 91 % 1200000 AS BIGINT) || ')' AS wkt
      |FROM orders WHERE o_orderkey < 300""".stripMargin

  /** Zarr v2 bit-format export + read-back (the reference's actual sink
    * format, `_dataframe.py:489-673` `to_zarr`): doc points burn a
    * deterministic per-cell value (a function of the 10 km cell only, so
    * last-write-wins collisions are idempotent) into a TileStore, the
    * store exports as a spec-level zarr v2 group (`.zarray` JSON + zlib
    * chunks, one executor task per tile), and the result is read back
    * through the distributed zarr chunk scan into global (row, col,
    * value) cells. The whole write -> export -> read chain is oracled by
    * the closed form over the distinct burned cells; chunk naming,
    * C-order layout, zlib codec and fill-value masking all have to be
    * right for the values to land on the right (row, col).
    */
  def q73ZarrExport(spark: SparkSession, dir: String): DataFrame = {
    val pts = docPoints(spark, dir)
      .withColumn("v",
        ((floor(col("x") / 10000L) * 7L + floor(col("y") / 10000L) * 13L)
          % 250L + 1L).cast("int"))
      .withColumn("geometry",
        st_point(col("x").cast("double"), col("y").cast("double")))
    val storePath = scratchStore(spark, "q73s")
    val zarrPath = scratchStore(spark, "q73z")
    graft.raster.RasterPipeline.toTileStore(
      pts, "geometry", Seq("v"), storePath,
      cellSize = 10000, tileSize = 100000, overwrite = true)
    graft.raster.Zarr.export(spark, storePath, zarrPath)
    graft.raster.Zarr.cells(spark, s"$zarrPath/v")
      // materialize the non-fill cells before the canonical sort: the
      // orderBy sampling pass otherwise re-reads + re-inflates every
      // zarr chunk a second time
      .localCheckpoint(true)
      .orderBy(col("row"), col("col"))
  }

  val q73Sql: String =
    s"""WITH pts AS ($docPointsSql),
      |c AS (SELECT DISTINCT CAST(FLOOR(x / 10000) AS BIGINT) AS ce,
      |                      CAST(FLOOR(y / 10000) AS BIGINT) AS cn
      |      FROM pts)
      |SELECT CAST(129 - cn AS INT) AS row, CAST(ce AS INT) AS col,
      |       CAST((ce * 7 + cn * 13) % 250 + 1 AS DOUBLE) AS value
      |FROM c ORDER BY row, col""".stripMargin
}

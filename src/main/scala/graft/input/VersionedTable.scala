package graft.input

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg-style versioned table over plain parquet: immutable data
  * files + per-snapshot FILE-LIST manifests + a HEAD pointer, giving
  * append/overwrite commits, snapshot isolation, and time travel —
  * the storage contract the north rule's "Iceberg table of web pages"
  * requires, without the (absent) Iceberg jar.
  *
  * Layout:
  *   table/data/<snapshotId>-<n>.parquet     immutable data files
  *   table/_manifests/snap-<id>.json         {id, parent, op, files[]}
  *   table/_manifests/HEAD                   current snapshot id
  *
  * Commits are atomic (temp + rename of the manifest, HEAD last); a
  * crashed writer leaves orphan data files that no manifest references —
  * invisible to readers, exactly like Iceberg.
  */
case class Manifest(id: Long, parent: Long, op: String, files: Seq[String])

class VersionedTable(val root: String) {
  private val manifestDir = Paths.get(root, "_manifests")
  private val dataDir = Paths.get(root, "data")
  implicit private val fmts: org.json4s.Formats = org.json4s.DefaultFormats

  def headId: Option[Long] = {
    val h = manifestDir.resolve("HEAD")
    if (Files.exists(h)) Some(new String(Files.readAllBytes(h), UTF_8).trim.toLong)
    else None
  }

  def manifest(id: Long): Manifest =
    org.json4s.jackson.Serialization.read[Manifest](new String(
      Files.readAllBytes(manifestDir.resolve(s"snap-$id.json")), UTF_8))

  def snapshots(): Seq[Long] = {
    import scala.jdk.CollectionConverters._
    if (!Files.exists(manifestDir)) Seq.empty
    else Files.list(manifestDir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.startsWith("snap-"))
      .map(_.stripPrefix("snap-").stripSuffix(".json").toLong)
      .toSeq.sorted
  }

  /** Commit `df` as a new snapshot. op = "append" keeps the parent's
    * files; "overwrite" starts fresh.
    */
  def commit(df: DataFrame, op: String = "append"): Long = synchronized {
    Files.createDirectories(manifestDir)
    Files.createDirectories(dataDir)
    val id = headId.map(_ + 1).getOrElse(0L)
    // write new data files through a staging dir, then move into data/
    val staging = Files.createTempDirectory(Paths.get(root), "stage")
    df.write.mode("overwrite").parquet(staging.toString)
    import scala.jdk.CollectionConverters._
    val newFiles = Files.list(staging).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .zipWithIndex.map { case (f, i) =>
        val name = s"$id-$i.parquet"
        Files.move(f, dataDir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
        name
      }.toSeq
    deleteRecursively(staging)
    val parentFiles =
      if (op == "append") headId.map(h => manifest(h).files).getOrElse(Seq.empty)
      else Seq.empty
    val m = Manifest(id, headId.getOrElse(-1L), op, parentFiles ++ newFiles)
    atomicWrite(manifestDir.resolve(s"snap-$id.json"),
      org.json4s.jackson.Serialization.write(m))
    atomicWrite(manifestDir.resolve("HEAD"), id.toString)
    id
  }

  /** Read a snapshot (default: HEAD) — time travel via `asOf`. */
  def read(spark: SparkSession, asOf: Option[Long] = None): DataFrame = {
    val id = asOf.orElse(headId).getOrElse(
      throw new IllegalStateException(s"empty table at $root"))
    val files = manifest(id).files.map(f => s"$root/data/$f")
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(files: _*)
  }

  /** Incremental scan: ONLY the files added after snapshot
    * `fromExclusive`, up to `toInclusive` (default HEAD) — the delta a
    * resumed/continuous pipeline processes instead of re-reading 10^12
    * rows. File-level diff of the two manifests, so the scan is pruned at
    * the source (no data read for the already-processed prefix). If an
    * "overwrite" snapshot broke lineage inside the range, the delta is
    * the full target file set (everything is logically new).
    */
  def readIncremental(spark: SparkSession, fromExclusive: Long,
      toInclusive: Option[Long] = None): DataFrame = {
    val to = toInclusive.orElse(headId).getOrElse(
      throw new IllegalStateException(s"empty table at $root"))
    require(to >= fromExclusive, s"to=$to before from=$fromExclusive")
    val toFiles = manifest(to).files
    val overwrote =
      (fromExclusive + 1 to to).exists(i => manifest(i).op == "overwrite")
    val fromFiles = if (overwrote) Set.empty[String]
      else manifest(fromExclusive).files.toSet
    val delta = toFiles.filterNot(fromFiles)
    if (delta.isEmpty) {
      if (toFiles.isEmpty) spark.emptyDataFrame
      else spark.read.parquet(toFiles.map(f => s"$root/data/$f"): _*).limit(0)
    } else spark.read.parquet(delta.map(f => s"$root/data/$f"): _*)
  }

  private def atomicWrite(target: java.nio.file.Path, content: String): Unit = {
    val tmp = Files.createTempFile(manifestDir, "tmp", ".json")
    Files.write(tmp, content.getBytes(UTF_8))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}

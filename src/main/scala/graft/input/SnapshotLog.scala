package graft.input

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Per-partition lineage + metrics record carried by every snapshot
  * (north-rule: "resumable from checkpoint with per-partition lineage and
  * row-count/byte metrics").
  */
case class PartitionMetric(
    partitionId: Int,
    rows: Long,
    bytes: Long,
    cellMin: String = "",
    cellMax: String = "")

/** One committed snapshot in the table's commit log. */
case class Snapshot(
    snapshotId: Long,
    parentId: Long, // -1 for root
    stage: String,
    inputSnapshot: Long,
    wallClockMs: Long,
    rowCount: Long,
    dataPath: String,
    partitionMetrics: Seq[PartitionMetric])

/** Iceberg-style snapshot/manifest commit log over a plain directory.
  *
  * No Iceberg jar ships in this image (verified, SURVEY.md §7.0), so the
  * snapshot model is implemented directly: a `_snapshots/` directory of
  * immutable `snap-<id>.json` manifests plus a `HEAD` pointer, committed
  * atomically via temp-file + rename — the same snapshot/parent chain and
  * resume semantics Iceberg's metadata tree provides. Resume = read HEAD,
  * skip stages whose snapshot is already committed (tile/region writes are
  * idempotent, so replaying an uncommitted stage is safe).
  */
class SnapshotLog(root: String) {
  private val dir: Path = Paths.get(root, "_snapshots")
  Files.createDirectories(dir)

  implicit private val fmts: org.json4s.Formats = org.json4s.DefaultFormats

  def head: Option[Snapshot] = {
    val h = dir.resolve("HEAD")
    if (!Files.exists(h)) None
    else {
      val id = new String(Files.readAllBytes(h), UTF_8).trim.toLong
      read(id)
    }
  }

  def read(id: Long): Option[Snapshot] = {
    val f = dir.resolve(s"snap-$id.json")
    if (!Files.exists(f)) None
    else Some(org.json4s.jackson.Serialization.read[Snapshot](
      new String(Files.readAllBytes(f), UTF_8)))
  }

  def snapshots(): Seq[Snapshot] = {
    import scala.jdk.CollectionConverters._
    Files.list(dir).iterator().asScala.toSeq
      .filter(_.getFileName.toString.startsWith("snap-"))
      .flatMap { p =>
        val name = p.getFileName.toString.stripPrefix("snap-").stripSuffix(".json")
        read(name.toLong)
      }.sortBy(_.snapshotId)
  }

  /** Latest committed snapshot for a stage, if any (resume check). */
  def committed(stage: String): Option[Snapshot] =
    snapshots().filter(_.stage == stage).sortBy(_.snapshotId).lastOption

  /** Atomically commit a new snapshot and advance HEAD. */
  def commit(stage: String, rowCount: Long, dataPath: String,
      metrics: Seq[PartitionMetric], wallClockMs: Long): Snapshot = synchronized {
    val parent = head.map(_.snapshotId).getOrElse(-1L)
    val id = parent + 1
    val snap = Snapshot(id, parent, stage, parent, wallClockMs, rowCount,
      dataPath, metrics)
    val json = org.json4s.jackson.Serialization.write(snap)
    atomicWrite(dir.resolve(s"snap-$id.json"), json)
    atomicWrite(dir.resolve("HEAD"), id.toString)
    snap
  }

  private def atomicWrite(target: Path, content: String): Unit = {
    val tmp = Files.createTempFile(dir, "tmp-", ".json")
    Files.write(tmp, content.getBytes(UTF_8))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}

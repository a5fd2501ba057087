package graft.web

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Snapshot-manifest checkpointing emulating the Iceberg snapshot contract with plain
  * Parquet (no Iceberg jars in this sandbox — SURVEY.md §7.4): data lands under
  * `dir/data/<partitionCol>=<v>/`, and a JSON-lines manifest under `dir/manifest/`
  * records which partition values are committed, with one atomically-renamed snapshot
  * file per commit (`snapshot-N.json`).
  *
  * Resume contract (north rule): a killed run leaves data files but no snapshot entry
  * for uncommitted partitions; `resumeWrite` recomputes ONLY uncommitted partitions and
  * never touches committed ones. Per-partition lineage (rows, wall time) is recorded in
  * the manifest entries.
  */
object Checkpoint {

  final case class PartitionCommit(value: String, rows: Long, wallMillis: Long)
  final case class WriteReport(written: Seq[PartitionCommit], skipped: Seq[String], snapshotId: Long)

  private def manifestDir(dir: String) = Paths.get(dir, "manifest")

  /** Files.list holds a directory handle until closed — materialize and close, or a
    * long-lived driver committing in a loop leaks one fd per call.
    */
  private def listDir(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toVector finally s.close()
  }

  /** Committed partition values = union of all snapshot files (optionally only up to
    * `asOfSnapshot`, giving Iceberg-style time travel over the commit history).
    */
  def committed(dir: String, asOfSnapshot: Long = Long.MaxValue): Map[String, PartitionCommit] = {
    val md = manifestDir(dir)
    if (!Files.exists(md)) return Map.empty
    listDir(md).iterator
      .filter { p =>
        val n = p.getFileName.toString
        n.startsWith("snapshot-") &&
          n.stripPrefix("snapshot-").stripSuffix(".json").toLong <= asOfSnapshot
      }
      .flatMap { p =>
        Files.readAllLines(p).asScala.filter(_.nonEmpty).map(parseLine)
      }
      .map(c => c.value -> c).toMap
  }

  /** Time-travel read: the table as of a given snapshot id — only partitions committed
    * by snapshots ≤ `snapshotId` are visible, regardless of what later runs added.
    */
  def readSnapshot(spark: SparkSession, dir: String, snapshotId: Long,
      partitionCol: String): DataFrame = {
    val visible = committed(dir, snapshotId).keys.toSeq
    val df = spark.read.parquet(s"$dir/data")
    if (visible.isEmpty) df.where(lit(false))
    else df.where(col(partitionCol).cast("string").isin(visible: _*))
  }

  def latestSnapshotId(dir: String): Long = {
    val md = manifestDir(dir)
    if (!Files.exists(md)) return -1L
    listDir(md).iterator
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("snapshot-") => s.stripPrefix("snapshot-").stripSuffix(".json").toLong }
      .foldLeft(-1L)(math.max)
  }

  /** Write `df` partitioned by `partitionCol`, skipping committed partitions, then
    * commit a new snapshot atomically. Each partition directory is written via
    * dynamic partition overwrite so a re-run replaces partial output.
    */
  def resumeWrite(spark: SparkSession, df: DataFrame, partitionCol: String, dir: String): WriteReport = {
    val done = committed(dir)
    val todoDf =
      if (done.isEmpty) df
      else df.where(!col(partitionCol).cast("string").isin(done.keys.toSeq: _*))
    val t0 = System.nanoTime()
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    todoDf.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(s"$dir/data")
    val wall = (System.nanoTime() - t0) / 1000000L

    // per-partition lineage from ONLY the newly written partition directories — the
    // committed table is never re-scanned on commit (at 100 TB a full-table recount
    // per checkpoint would dominate the job)
    val doneDirs = done.keySet.map(v =>
      org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(v))
    val prefix = s"$partitionCol="
    val newDirs = listDir(Paths.get(dir, "data")).iterator
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith(prefix))
      .map(_.getFileName.toString.stripPrefix(prefix))
      .filterNot(doneDirs.contains)
      .toSeq
    val counts =
      if (newDirs.isEmpty) Map.empty[String, Long]
      else spark.read.option("basePath", s"$dir/data")
        .parquet(newDirs.map(v => s"$dir/data/$prefix$v"): _*)
        .groupBy(col(partitionCol).cast("string").as("v")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val commits = counts.keySet.toSeq.sorted.map(v => PartitionCommit(v, counts(v), wall))

    val snapId = latestSnapshotId(dir) + 1
    val md = manifestDir(dir)
    Files.createDirectories(md)
    val tmp = md.resolve(s".snapshot-$snapId.json.tmp")
    Files.write(tmp, commits.map(renderLine).mkString("\n").getBytes("UTF-8"))
    Files.move(tmp, md.resolve(s"snapshot-$snapId.json"), StandardCopyOption.ATOMIC_MOVE)
    WriteReport(commits, done.keys.toSeq.sorted, snapId)
  }

  private def renderLine(c: PartitionCommit): String =
    s"""{"value":"${c.value}","rows":${c.rows},"wallMillis":${c.wallMillis}}"""

  private def parseLine(s: String): PartitionCommit = {
    def field(name: String): String = {
      val m = ("\"" + name + "\":\"?([^\",}]*)\"?").r.findFirstMatchIn(s)
      m.map(_.group(1)).getOrElse(throw new IllegalArgumentException(s"bad manifest line: $s"))
    }
    PartitionCommit(field("value"), field("rows").toLong, field("wallMillis").toLong)
  }
}

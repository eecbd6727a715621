package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths}
import java.nio.file.StandardCopyOption.ATOMIC_MOVE
import scala.jdk.CollectionConverters._

/** Minimal snapshot-commit protocol for table maintenance — the atomic
  * half of the OPTIMIZE story ([[graft.operators.WarehouseOps]]).
  *
  * `layout_compact` / `sink_parquet_zordered` rewrite a table directory
  * with `mode("overwrite")`; at 100 TB with concurrent readers, a reader
  * that lists files mid-rewrite sees partial state. The fix (the
  * Delta/Iceberg answer) is a versioned-manifest commit: write new files
  * BESIDE the old ones, publish them with one atomic metadata operation,
  * and let readers pin a snapshot.
  *
  * Layout under a table root:
  * {{{
  *   root/v00000001/part-*.parquet      immutable once committed
  *   root/v00000002/part-*.parquet
  *   root/_commits/00000001.manifest    one line per committed data file
  *   root/_commits/00000002.manifest
  * }}}
  *
  * The COMMIT POINT is the exclusive-create (`ATOMIC_MOVE` without
  * replace) of `_commits/%08d.manifest`: data files are fully written and
  * fsync-closed before the manifest appears, are never mutated after, and
  * the resolved head is simply the highest committed manifest — so the
  * head "pointer" advances atomically with the rename. Two writers racing
  * the same version collide on the exclusive create; the loser discards
  * its staged files and retries at the next version (optimistic
  * concurrency, exactly Delta's `_delta_log/N.json` protocol). A reader
  * concurrently resolving sees the old head or the new head, never a mix,
  * and because it reads the manifest's explicit file list — never a
  * directory glob — a half-written staging dir is invisible to it.
  *
  * Scale note: on HDFS the same exclusive-create rename is atomic at the
  * namenode; on S3 the rename becomes a conditional PUT (If-None-Match)
  * of the manifest object. The protocol needs exactly one primitive —
  * atomic create-if-absent of a small metadata file — which every
  * production store offers; the 100 TB of data files move zero times at
  * commit. Local java.nio is the test-scale binding of that primitive.
  */
object Snapshots {

  /** A resolved table version: the immutable file set of one commit. */
  final case class Snapshot(version: Long, files: Seq[String])

  private def commitsDir(root: String): Path = Paths.get(root, "_commits")

  private def manifestPath(root: String, v: Long): Path =
    commitsDir(root).resolve(f"$v%08d.manifest")

  private[graft] def versionDir(root: String, v: Long): String =
    f"$root/v$v%08d"

  /** Highest committed version (0 = nothing committed yet). Scans the
    * manifest names only — a few hundred bytes of listing even after
    * thousands of commits, independent of data size. */
  def maxCommitted(root: String): Long = {
    val cd = commitsDir(root)
    if (!Files.isDirectory(cd)) 0L
    else {
      val ls = Files.list(cd)
      try ls.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.endsWith(".manifest") =>
          s.stripSuffix(".manifest").toLong }
        .foldLeft(0L)(math.max)
      finally ls.close()
    }
  }

  /** Resolve the current head to its pinned file list, or None if no
    * commit has ever succeeded. The returned snapshot stays readable
    * even if later commits land (files are immutable; only [[vacuum]]
    * reclaims them). */
  def resolve(root: String): Option[Snapshot] = {
    val v = maxCommitted(root)
    if (v == 0L) None
    else Some(Snapshot(v, Files.readAllLines(manifestPath(root, v), UTF_8)
      .asScala.toSeq.filter(_.nonEmpty)))
  }

  /** Read the current head through its manifest. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val snap = resolve(root).getOrElse(throw new IllegalStateException(
      s"no committed snapshot under $root"))
    spark.read.parquet(snap.files: _*)
  }

  /** Commit one new table version: `write(stagingDir)` materializes the
    * full new file set (any number of Spark writes into that dir), then
    * the manifest publish makes it visible atomically. Returns the
    * committed version. On a writer race, the staged files are discarded
    * and the write re-runs against the next version (bounded retries). */
  def commit(root: String)(write: String => Unit): Long = {
    Files.createDirectories(commitsDir(root))
    var attempt = 0
    while (true) {
      val v = maxCommitted(root) + 1
      val dataDir = versionDir(root, v)
      // an existing dir at an UNcommitted version is a crashed/raced
      // writer's orphan (no manifest references it) — reclaim it
      deleteRecursively(Paths.get(dataDir))
      write(dataDir)
      val files = listParquet(dataDir)
      require(files.nonEmpty, s"commit produced no data files in $dataDir")
      val tmp = commitsDir(root).resolve(
        s".tmp_${ProcessHandle.current().pid()}_$v")
      Files.write(tmp, files.mkString("\n").getBytes(UTF_8))
      try {
        Files.move(tmp, manifestPath(root, v), ATOMIC_MOVE) // commit point
        return v
      } catch {
        case _: FileAlreadyExistsException =>
          Files.deleteIfExists(tmp)
          deleteRecursively(Paths.get(dataDir))
          attempt += 1
          if (attempt > 5) throw new IllegalStateException(
            s"lost the commit race $attempt times under $root")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Retention: drop all but the newest `keepLast` committed versions —
    * data dirs AND manifests — never touching the head. Readers pinned
    * to a vacuumed snapshot fail on next access, the documented
    * time-travel retention contract (same as Delta's VACUUM). */
  def vacuum(root: String, keepLast: Int): Unit = {
    require(keepLast >= 1, "must keep at least the head")
    val head = maxCommitted(root)
    (1L until math.max(1L, head - keepLast + 1)).foreach { v =>
      val m = manifestPath(root, v)
      if (Files.exists(m)) {
        deleteRecursively(Paths.get(versionDir(root, v)))
        Files.delete(m)
      }
    }
  }

  private def listParquet(dir: String): Seq[String] = {
    val d = Paths.get(dir)
    val ls = Files.list(d)
    try ls.iterator().asScala
      .map(_.toAbsolutePath.toString)
      .filter(p => p.endsWith(".parquet") &&
        !Paths.get(p).getFileName.toString.startsWith("_"))
      .toSeq.sorted
    finally ls.close()
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      finally walk.close()
    }
}

package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** An in-place compaction raced a concurrent append (or vice versa) on
  * the same directory — the write that would otherwise have been
  * SILENTLY LOST fails loudly instead. */
class ConcurrentCompactionException(msg: String)
  extends IllegalStateException(msg)

/** The repo-wide in-place compaction protocol: ONE implementation of
  * the bounded-slice rewrite idiom (read a slice → materialize →
  * dynamic-partition-overwrite only that slice) and ONE fail-fast
  * concurrency guard shared by every compactable store — the text
  * index, the IVF index, the points store, the z-order layout, and the
  * SCD changelog. Before this existed each path re-implemented the
  * loop with its own crash/concurrency caveats, and a concurrent
  * append during compaction was a SCALADOC CONTRACT ONLY: the
  * compactor reads then overwrites a slice, so a batch committed
  * between the two vanished without an error.
  *
  * == The guard (two-flag protocol) ==
  *
  * Appenders and compactors each raise a marker file in the store's
  * root before touching data, then check for the other side's marker:
  *
  *  - an appender creates `_APPENDING.<uuid>`, THEN checks for
  *    `_COMPACTING` — present → delete its own marker and throw;
  *  - a compactor creates `_COMPACTING` (failing if one already
  *    exists), THEN checks for any `_APPENDING.*` — present → release
  *    and throw.
  *
  * If the two overlap at all, both markers exist at the moment the
  * LATER creation's check runs, so at least one side always throws —
  * the Dekker-flag argument, needing only create/exists/delete on one
  * filesystem (no atomic rename, no lock server). Underscore-prefixed
  * names are invisible to Spark's file index, so markers never pollute
  * reads. Cost per append: three filesystem metadata operations,
  * nothing data-sized.
  *
  * A CRASHED holder leaves its marker behind, which fails subsequent
  * compactions (and, for `_COMPACTING`, appends) by design — the
  * operator inspects and runs [[Compaction.clearMarkers]] once the dead
  * job is confirmed gone. Fail-stale-and-loud beats heuristic marker
  * expiry: a marker that auto-expired under a merely-slow compactor
  * would re-open the silent-loss window the guard exists to close.
  *
  * == The bounded-slice rewrite ==
  *
  * [[Compaction.rewriteSlices]] stages one slice at a time
  * (localCheckpoint — the files being read are about to be
  * overwritten), rewrites it under dynamic partition overwrite, and
  * unpersists before the next slice, so peak staged state is one slice
  * and a killed run loses at most the in-flight slice (earlier slices
  * compacted, later ones untouched — every slice readable throughout).
  * Callers list the slice keys ONCE from one base DataFrame and filter
  * it per slice: the old per-slice `spark.read.parquet(dir)` re-ran
  * file listing every iteration, which at 100 TB is itself a
  * metadata-service hammer. The stale file index stays valid because a
  * slice's overwrite only replaces that slice's partition directories,
  * which no later slice reads. */
object Compaction {

  val CompactingMarker = "_COMPACTING"
  val AppendingPrefix = "_APPENDING."

  private def fileSystem(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val root = new Path(dir)
    (root.getFileSystem(spark.sessionState.newHadoopConf()), root)
  }

  /** Hadoop configuration for callers with no SparkSession parameter:
    * the ACTIVE session's conf when one exists (it carries the
    * deployment's `spark.hadoop.*` overrides — object-store credentials,
    * per-bucket endpoints), else a plain default. Resolving markers
    * through a bare `new Configuration()` while the data writers resolve
    * through the session conf would land the two sides' markers on
    * DIFFERENT filesystems and silently void the mutual exclusion. */
  private[sources] def resolvedConf(
      conf: org.apache.hadoop.conf.Configuration)
      : org.apache.hadoop.conf.Configuration =
    Option(conf)
      .orElse(SparkSession.getActiveSession.map(_.sessionState.newHadoopConf()))
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  /** [[guardedAppend]] without a SparkSession parameter — same appender
    * flag, resolved through [[resolvedConf]] (the active session's
    * Hadoop conf when present, or the explicit `conf`). For driver-side
    * store MUTATIONS that never run a Spark job but still race a
    * compaction's read-then-overwrite, e.g. the points store's TTL
    * bucket delete: unguarded, a TTL sweep landing between a compaction
    * slice's stage and its overwrite would have its deleted buckets
    * silently RESURRECTED by the rewrite (or yank files out from under
    * the stage). */
  def guardedMutation[T](dir: String,
      conf: org.apache.hadoop.conf.Configuration = null)(write: => T): T = {
    val root = new Path(dir)
    guardedAppendOn(root.getFileSystem(resolvedConf(conf)), root, dir)(write)
  }

  /** Provenance body written into every guard marker: who raised it and
    * when, so an operator facing a stale marker can check the holder is
    * actually dead before [[clearMarkers]] (an empty marker gives the
    * "confirm the dead job is gone" step nothing to go on). */
  private def markerBody(): Array[Byte] = {
    val host = try java.net.InetAddress.getLocalHost.getHostName
      catch { case _: Throwable => "unknown" }
    (s"host=$host\npid=${ProcessHandle.current().pid()}\n" +
      s"started_ms=${System.currentTimeMillis()}\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Create the marker and write its provenance body. If the CREATE
    * itself fails (exists — the guard's refusal signal) nothing was
    * raised and the exception propagates as-is; if the create succeeded
    * but the BODY write fails (quota, transient IO), the half-written
    * marker is deleted before rethrowing — otherwise it would leak and
    * block every future compaction until a manual clearMarkers, and
    * [[guardedCompaction]]'s exists-check would misreport the write
    * failure as a concurrent compaction.
    *
    * The create is always EXCLUSIVE (every guard marker is a claim).
    * On a LOCAL filesystem it goes through java.nio
    * (`Files.createFile` = O_EXCL, atomic on POSIX): Hadoop's
    * RawLocalFileSystem implements `create(overwrite = false)` as
    * check-then-create, which let two same-host compactors
    * theoretically both pass the arbiter. HDFS and object stores
    * create-exclusively inside `fs.create` already; a FileSystem that
    * does not implement `getScheme` (the base class throws) takes the
    * `fs.create` arm, the pre-round-15 behavior. */
  private def createMarker(fs: FileSystem, marker: Path): Unit = {
    val isLocalFs =
      try fs.getScheme == "file"
      catch { case _: UnsupportedOperationException => false }
    if (isLocalFs) {
      val local =
        java.nio.file.Paths.get(fs.makeQualified(marker).toUri.getPath)
      // fs.create made parents implicitly; java.nio does not
      java.nio.file.Files.createDirectories(local.getParent)
      // throws java.nio.file.FileAlreadyExistsException — the typed
      // refusal signal guardedCompaction's catch already matches
      java.nio.file.Files.createFile(local)
      try java.nio.file.Files.write(local, markerBody())
      catch { case e: Throwable =>
        try java.nio.file.Files.deleteIfExists(local)
        catch { case _: Throwable => () }
        throw e
      }
    } else {
      val out = fs.create(marker, false)
      try { try out.write(markerBody()) finally out.close() }
      catch { case e: Throwable =>
        try fs.delete(marker, false) catch { case _: Throwable => () }
        throw e
      }
    }
  }

  /** One guard marker's provenance, parsed from its body. Empty/legacy
    * markers (or ones a crashed writer never finished) report
    * `host = "unknown"`, `pid = -1`, `startedMs = -1`. */
  final case class MarkerInfo(path: String, kind: String, host: String,
      pid: Long, startedMs: Long)

  /** Report every guard marker under `dir` with its provenance — the
    * inspection step before [[clearMarkers]]: check the reported
    * (host, pid) is dead, THEN clear. Read-only. */
  def inspectMarkers(spark: SparkSession, dir: String): Seq[MarkerInfo] = {
    val (fs, root) = fileSystem(spark, dir)
    listMarkers(fs, root).map { p =>
      val fields: Map[String, String] = try {
        val in = fs.open(p)
        val body = try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8) finally in.close()
        body.linesIterator.flatMap { l =>
          l.split("=", 2) match {
            case Array(k, v) => Some(k -> v)
            case _ => None
          }
        }.toMap
      } catch { case _: Throwable => Map.empty }
      val kind = if (p.getName == CompactingMarker) CompactingMarker
                 else AppendingPrefix.dropRight(1)
      MarkerInfo(p.toString, kind,
        fields.getOrElse("host", "unknown"),
        fields.get("pid").flatMap(_.toLongOption).getOrElse(-1L),
        fields.get("started_ms").flatMap(_.toLongOption).getOrElse(-1L))
    }
  }

  private def listMarkers(fs: FileSystem, root: Path): Seq[Path] =
    (Option(fs.globStatus(new Path(root, AppendingPrefix + "*")))
      .getOrElse(Array.empty).map(_.getPath) ++
      (if (fs.exists(new Path(root, CompactingMarker)))
        Seq(new Path(root, CompactingMarker)) else Nil)).toSeq

  /** Run `write` (an append job against `dir`) under the appender side
    * of the two-flag guard: raise `_APPENDING.<uuid>`, fail fast if a
    * compaction holds `_COMPACTING`, always drop the marker. */
  def guardedAppend[T](spark: SparkSession, dir: String)(write: => T): T = {
    val (fs, root) = fileSystem(spark, dir)
    guardedAppendOn(fs, root, dir)(write)
  }

  private def guardedAppendOn[T](fs: FileSystem, root: Path, dir: String)(
      write: => T): T = {
    fs.mkdirs(root) // the very first append may precede the directory
    val mine = new Path(root, AppendingPrefix + java.util.UUID.randomUUID())
    createMarker(fs, mine)
    try {
      if (fs.exists(new Path(root, CompactingMarker)))
        throw new ConcurrentCompactionException(
          s"append to $dir refused: a compaction holds $CompactingMarker " +
            "(or a crashed one left it — clear with Compaction.clearMarkers " +
            "after confirming no compactor is alive)")
      write
    } finally fs.delete(mine, false)
  }

  /** Run `body` (a compaction of `dir`) under the compactor side of the
    * two-flag guard: raise `_COMPACTING` (refusing if one exists), fail
    * fast if any append is in flight, always drop the marker. */
  def guardedCompaction[T](spark: SparkSession, dir: String)(body: => T): T = {
    val (fs, root) = fileSystem(spark, dir)
    val marker = new Path(root, CompactingMarker)
    // create-exclusive is the compactor-vs-compactor arbiter: atomic on
    // HDFS / object stores inside fs.create, and atomic on local disks
    // too via createMarker's O_EXCL java.nio path (RawLocalFileSystem's
    // own create(overwrite = false) is check-then-create); the
    // appender/compactor direction, the data-loss one, is sound
    // everywhere by the two-flag argument

    try createMarker(fs, marker)
    catch {
      // the create-exclusive failure ITSELF is the refusal signal —
      // match the typed already-exists exceptions directly, so a
      // competing compactor that finishes (dropping its marker) between
      // our failed create and any after-the-fact exists() check still
      // reports as the concurrent compaction it was
      case _: org.apache.hadoop.fs.FileAlreadyExistsException |
           _: java.nio.file.FileAlreadyExistsException =>
        throw new ConcurrentCompactionException(
          s"compaction of $dir refused: $CompactingMarker already present — " +
            "another compaction is running, or a crashed one left it (clear " +
            "with Compaction.clearMarkers after confirming it is gone)")
      // filesystems that signal exists with a bare IOException: only an
      // EXISTING marker is the refusal signal; a body-write failure
      // deleted its half-raised marker (createMarker) and is a real IO
      // error, not a concurrent compaction — rethrow it
      case _: java.io.IOException if fs.exists(marker) =>
        throw new ConcurrentCompactionException(
          s"compaction of $dir refused: $CompactingMarker already present — " +
            "another compaction is running, or a crashed one left it (clear " +
            "with Compaction.clearMarkers after confirming it is gone)")
    }
    try {
      val appending = Option(
        fs.globStatus(new Path(root, AppendingPrefix + "*")))
        .getOrElse(Array.empty)
      if (appending.nonEmpty)
        throw new ConcurrentCompactionException(
          s"compaction of $dir refused: append in flight " +
            s"(${appending.map(_.getPath.getName).mkString(", ")}) — " +
            "stop or drain writers first; a crashed appender's stale " +
            "marker clears with Compaction.clearMarkers")
      body
    } finally fs.delete(marker, false)
  }

  /** Stale-marker recovery after a confirmed-dead holder (see
    * [[inspectMarkers]] for the confirming step): delete every guard
    * marker under `dir` and return the paths removed. */
  def clearMarkers(spark: SparkSession, dir: String): Seq[String] = {
    val (fs, root) = fileSystem(spark, dir)
    val stale = listMarkers(fs, root)
    stale.foreach(fs.delete(_, false))
    stale.map(_.toString)
  }

  /** The bounded-slice rewrite loop — NO guard (callers hold
    * [[guardedCompaction]], possibly around extra per-store work such
    * as the text index's marker fold). `loadSlice` prunes the caller's
    * ONCE-LISTED base relation to one slice's keys; `writeSlice`
    * dynamic-overwrites exactly those partitions. Each slice is
    * checkpointed before its own directories are overwritten and
    * unpersisted before the next slice is staged.
    *
    * ORDERING CONTRACT: the base relation (and anything derived from
    * its eager file listing, including `sliceKeys`) must be built
    * INSIDE the caller's [[guardedCompaction]] body — a listing taken
    * before the flag is raised can miss an append that completed
    * entirely in the gap, and the slice overwrite would then drop its
    * files with no marker left to catch it. */
  def rewriteSlices[K](sliceKeys: Seq[K], perSlice: Int)(
      loadSlice: Seq[K] => DataFrame)(
      writeSlice: (DataFrame, Seq[K]) => Unit): Unit = {
    require(perSlice > 0, s"perSlice must be positive, got $perSlice")
    sliceKeys.grouped(perSlice).foreach { keys =>
      val staged = loadSlice(keys).localCheckpoint(true)
      try writeSlice(staged, keys)
      finally staged.unpersist(false)
    }
  }
}

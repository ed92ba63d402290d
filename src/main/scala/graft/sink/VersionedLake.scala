package graft.sink

import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** [EXT] Versioned lake with time travel — the Delta/Iceberg commit
  * contract in library form: every write is an atomic COMMIT that
  * produces a new immutable table VERSION; readers pick any version;
  * concurrent committers lose cleanly instead of corrupting. No
  * reference equivalent (the reference overwrites MySQL rows in
  * place; a 100 TB lake cannot — reproducing last week's training
  * corpus requires the version that built it).
  *
  * Layout:
  * {{{
  *   path/_graft_log/v00000001.json   one manifest per commit:
  *                                    ordered list of data dirs
  *   path/data/<uuid>/                immutable parquet per commit
  * }}}
  *
  * Commit protocol (the Delta-log shape):
  *  1. write the new data dir (invisible to readers — nothing
  *     references it yet);
  *  2. read the latest manifest, build the next (append: old dirs +
  *     new; overwrite: just new);
  *  3. publish the next `v{N+1}.json` as temp-write + LINK: the
  *     manifest bytes are fully written to a temp name first, then
  *     hard-linked to the version name — link(2) fails atomically
  *     with EEXIST if the target exists, so of two racing committers
  *     exactly one wins and the loser gets
  *     [[CommitConflictException]] to retry from the new snapshot
  *     (optimistic concurrency), AND the winning manifest appears
  *     with its full content in one atomic step — no reader (or
  *     crash) can ever observe an existing-but-partial newest
  *     manifest. (A plain create-then-write has that torn window; a
  *     rename silently replaces an existing target on POSIX and
  *     loses the single-winner race.)
  *
  * Scale shape: manifests are one line per data dir (bounded driver
  * state, the Delta-log contract); data files are never rewritten or
  * moved by commits, so a commit costs one directory write + one
  * small file regardless of table size. [[vacuum]] is the only
  * destructive operation and only unreferences dirs no kept version
  * can see. Local-filesystem `java.nio` here (the repo's sink
  * convention); a cluster deployment swaps in the Hadoop FileSystem
  * API — the protocol only needs atomic create-exclusive + rename.
  */
object VersionedLake {

  final class CommitConflictException(v: Long)
    extends RuntimeException(
      s"version $v was committed concurrently; re-read and retry")

  private val LogDir = "_graft_log"

  private def logPath(path: String) = Paths.get(path, LogDir)

  private def versionFile(path: String, v: Long) =
    logPath(path).resolve(f"v$v%08d.json")

  /** Committed versions, ascending (empty for a fresh path). The
    * directory stream is closed eagerly — a long-running streaming
    * sink calls this every micro-batch, and an unclosed Files.list
    * leaks one fd per call.
    */
  def versions(path: String): Seq[Long] = {
    val lp = logPath(path)
    if (!Files.isDirectory(lp)) Seq.empty
    else {
      val ds = Files.list(lp)
      try ds.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.matches("v\\d{8}\\.json") =>
          s.substring(1, 9).toLong
        }.toSeq.sorted
      finally ds.close()
    }
  }

  /** The data dirs a committed version references (public: the
    * streaming sink reads batch markers out of dir names).
    */
  def manifest(path: String, v: Long): Seq[String] = readManifest(path, v)

  private def readManifest(path: String, v: Long): Seq[String] = {
    val raw = Files.readString(versionFile(path, v)).trim
    if (raw.isEmpty) Seq.empty else raw.split("\n").toSeq
  }

  /** Atomically commit `df` as the next version. `overwrite = false`
    * appends to the latest snapshot. Returns the committed version.
    *
    * Optimistic concurrency, two guards: pass `expectedBase` (the
    * version your transaction READ — the Delta txn-version check) and
    * the commit fails if anyone committed since; and independently the
    * create-exclusive manifest write makes the version-number race
    * itself single-winner even without a pinned base. Either loss
    * throws [[CommitConflictException]] — re-read and retry; the
    * orphaned data dir is unreferenced and swept by a later
    * [[vacuum]].
    */
  def commit(
      df: DataFrame, path: String, overwrite: Boolean,
      expectedBase: Option[Long] = None,
      dataDirPrefix: String = ""): Long = {
    val dataDir =
      s"data/$dataDirPrefix${java.util.UUID.randomUUID().toString}"
    df.write.mode("errorifexists").parquet(s"$path/$dataDir")
    Files.createDirectories(logPath(path))
    val prior = versions(path)
    val next = prior.lastOption.getOrElse(0L) + 1L
    expectedBase.foreach { base =>
      if (prior.lastOption.getOrElse(0L) != base)
        throw new CommitConflictException(next)
    }
    val dirs =
      if (overwrite || prior.isEmpty) Seq(dataDir)
      else readManifest(path, prior.last) :+ dataDir
    // Temp-write + atomic LINK to the version name: the commit point.
    // link(2) is create-exclusive (EEXIST loses the race atomically)
    // and the target appears with its complete content — a concurrent
    // reader or a crash can never observe a partial newest manifest.
    val tmp = logPath(path).resolve(
      s".tmp-$next-${java.util.UUID.randomUUID().toString}")
    Files.write(tmp, dirs.mkString("\n").getBytes("UTF-8"),
      StandardOpenOption.CREATE_NEW)
    try {
      Files.createLink(versionFile(path, next), tmp)
      next
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new CommitConflictException(next)
    } finally Files.deleteIfExists(tmp)
  }

  /** Read a specific version (default: latest). Fails on an empty or
    * vacuumed-away version.
    */
  def read(
      spark: SparkSession, path: String,
      version: Option[Long] = None,
      mergeSchema: Boolean = false): DataFrame = {
    val vs = versions(path)
    require(vs.nonEmpty, s"no committed versions at $path")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not in $vs")
    val dirs = readManifest(path, v).map(d => s"$path/$d")
    dirs.foreach { d =>
      require(Files.isDirectory(Paths.get(d.stripPrefix("file:"))),
        s"data dir vacuumed away: $d (time travel past the vacuum horizon)")
    }
    // mergeSchema = schema EVOLUTION on read: a version whose commits
    // added columns reads as the union schema, older rows null-filled
    // (the Delta/Iceberg add-column contract). Off by default — the
    // merge pays one footer read per data dir.
    spark.read.option("mergeSchema", mergeSchema.toString)
      .parquet(dirs: _*)
  }

  /** Drop all but the newest `keepVersions` manifests and delete every
    * data dir no SURVIVING manifest references — both dirs referenced
    * only by dropped manifests and true orphans no manifest ever
    * referenced (conflict losers, crashes between data write and
    * commit point). Orphan deletion is age-gated by `orphanGraceMs`
    * (last-modified older than the grace window) so a commit currently
    * between step 1 and its commit point is never swept out from under
    * the committer. Bounded driver work: the log and the data-dir
    * listing are both one-entry-per-commit.
    */
  def vacuum(
      path: String, keepVersions: Int,
      orphanGraceMs: Long = 24L * 3600 * 1000): Unit = {
    require(keepVersions >= 1, s"keepVersions must be >= 1: $keepVersions")
    val vs = versions(path)
    val (drop, keep) = vs.splitAt(math.max(0, vs.length - keepVersions))
    val live = keep.flatMap(readManifest(path, _)).toSet
    def deleteDir(dir: java.nio.file.Path): Unit =
      if (Files.isDirectory(dir)) {
        val walk = Files.walk(dir)
        try walk.iterator().asScala.toSeq.reverse
          .foreach(Files.deleteIfExists(_))
        finally walk.close()
      }
    drop.foreach { v =>
      readManifest(path, v).filterNot(live)
        .foreach(d => deleteDir(Paths.get(path, d)))
      Files.deleteIfExists(versionFile(path, v))
    }
    // Orphans: data dirs referenced by NO surviving manifest. Without
    // this sweep, conflict losers and crashed commits accumulate
    // forever — their dirs were never in any manifest, so the
    // dropped-manifest pass above can never find them.
    val dataRoot = Paths.get(path, "data")
    val cutoff = System.currentTimeMillis() - orphanGraceMs
    if (Files.isDirectory(dataRoot)) {
      val ds = Files.list(dataRoot)
      try ds.iterator().asScala.toSeq
        .filter(d => !live(s"data/${d.getFileName}"))
        .filter(d => Files.getLastModifiedTime(d).toMillis < cutoff)
        .foreach(deleteDir)
      finally ds.close()
    }
    // Torn temp manifests: a committer that dies between the temp
    // write and the link/delete leaves `.tmp-*` in the log forever
    // (the commit path's finally can't run). Same age gate — a LIVE
    // committer's temp file is milliseconds old and never touched.
    val logDir = logPath(path)
    if (Files.isDirectory(logDir)) {
      val ls = Files.list(logDir)
      try ls.iterator().asScala.toSeq
        .filter(_.getFileName.toString.startsWith(".tmp-"))
        .filter(f => Files.getLastModifiedTime(f).toMillis < cutoff)
        .foreach(Files.deleteIfExists(_))
      finally ls.close()
    }
  }
}

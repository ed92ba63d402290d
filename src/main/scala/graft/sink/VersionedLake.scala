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
  *  3. CREATE_NEW the next `v{N+1}.json` — on a correct filesystem
  *     create-exclusive is atomic, so of two racing committers
  *     exactly one wins and the loser gets
  *     [[CommitConflictException]] to retry from the new snapshot
  *     (optimistic concurrency). Readers never see a partial commit:
  *     a manifest is written to a temp name and MOVEd into place
  *     only after its data dir is complete.
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

  /** Committed versions, ascending (empty for a fresh path). */
  def versions(path: String): Seq[Long] = {
    val lp = logPath(path)
    if (!Files.isDirectory(lp)) Seq.empty
    else Files.list(lp).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.matches("v\\d{8}\\.json") =>
        s.substring(1, 9).toLong
      }.toSeq.sorted
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
    try {
      // CREATE_NEW = atomic create-exclusive: the commit point.
      Files.write(versionFile(path, next),
        dirs.mkString("\n").getBytes("UTF-8"),
        StandardOpenOption.CREATE_NEW)
      next
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new CommitConflictException(next)
    }
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
    * data dir no kept manifest references. Bounded driver work: the
    * log and the data-dir listing are both one-entry-per-commit.
    */
  def vacuum(path: String, keepVersions: Int): Unit = {
    require(keepVersions >= 1, s"keepVersions must be >= 1: $keepVersions")
    val vs = versions(path)
    val (drop, keep) = vs.splitAt(math.max(0, vs.length - keepVersions))
    val live = keep.flatMap(readManifest(path, _)).toSet
    drop.foreach { v =>
      readManifest(path, v)
        .filterNot(live)
        .foreach { d =>
          val dir = Paths.get(path, d)
          if (Files.isDirectory(dir)) {
            Files.walk(dir).iterator().asScala.toSeq.reverse
              .foreach(Files.deleteIfExists(_))
          }
        }
      Files.deleteIfExists(versionFile(path, v))
    }
  }
}

package graft.sink

import graft.SparkSpec

class VersionedLakeSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft_vlake").toString

  test("commit/append/overwrite produce readable immutable versions; " +
    "time travel returns each version exactly") {
    val path = fresh()
    val v1 = VersionedLake.commit(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), path, overwrite = true)
    val v2 = VersionedLake.commit(
      Seq((3L, "c")).toDF("id", "v"), path, overwrite = false)
    val v3 = VersionedLake.commit(
      Seq((9L, "z")).toDF("id", "v"), path, overwrite = true)
    assert((v1, v2, v3) === ((1L, 2L, 3L)))
    assert(VersionedLake.versions(path) === Seq(1L, 2L, 3L))
    def rows(v: Long) = VersionedLake.read(spark, path, Some(v))
      .as[(Long, String)].collect().toSet
    assert(rows(1L) === Set((1L, "a"), (2L, "b")))
    assert(rows(2L) === Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(rows(3L) === Set((9L, "z")))
    // latest by default
    assert(VersionedLake.read(spark, path)
      .as[(Long, String)].collect().toSet === Set((9L, "z")))
    // a later commit never mutates an earlier version's data
    assert(rows(2L) === Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("concurrent committers: a pinned-base transaction loses cleanly " +
    "once anyone commits under it") {
    val path = fresh()
    val base = VersionedLake.commit(Seq((1L, "a")).toDF("id", "v"), path,
      overwrite = true)
    // A racing committer lands v2 after our transaction read `base`.
    VersionedLake.commit(Seq((7L, "r")).toDF("id", "v"), path,
      overwrite = false)
    intercept[VersionedLake.CommitConflictException] {
      VersionedLake.commit(Seq((2L, "b")).toDF("id", "v"), path,
        overwrite = false, expectedBase = Some(base))
    }
    // Retry from the fresh snapshot succeeds and sees the racer's row.
    val v3 = VersionedLake.commit(Seq((2L, "b")).toDF("id", "v"), path,
      overwrite = false,
      expectedBase = Some(VersionedLake.versions(path).last))
    assert(v3 === 3L)
    assert(VersionedLake.read(spark, path).as[(Long, String)]
      .collect().toSet === Set((1L, "a"), (7L, "r"), (2L, "b")))
  }

  test("vacuum removes only data no kept version references; kept " +
    "versions stay exact, vacuumed reads fail loudly") {
    val path = fresh()
    VersionedLake.commit(Seq((1L, "a")).toDF("id", "v"), path,
      overwrite = true)
    VersionedLake.commit(Seq((2L, "b")).toDF("id", "v"), path,
      overwrite = false) // v2 references v1's data dir too
    VersionedLake.commit(Seq((9L, "z")).toDF("id", "v"), path,
      overwrite = true)
    VersionedLake.vacuum(path, keepVersions = 2)
    assert(VersionedLake.versions(path) === Seq(2L, 3L))
    // v2 kept: its manifest includes v1's dir, which therefore survives
    assert(VersionedLake.read(spark, path, Some(2L))
      .as[(Long, String)].collect().toSet === Set((1L, "a"), (2L, "b")))
    assert(VersionedLake.read(spark, path, Some(3L))
      .as[(Long, String)].collect().toSet === Set((9L, "z")))
    intercept[IllegalArgumentException] {
      VersionedLake.read(spark, path, Some(1L))
    }
    // vacuum to 1: v2 goes; its EXCLUSIVE dirs (v1's + v2's) die, v3
    // remains whole
    VersionedLake.vacuum(path, keepVersions = 1)
    assert(VersionedLake.versions(path) === Seq(3L))
    assert(VersionedLake.read(spark, path)
      .as[(Long, String)].collect().toSet === Set((9L, "z")))
  }

  test("vacuum sweeps never-referenced orphan data dirs (conflict " +
    "losers / lost commits) past the grace window, not fresh ones") {
    import java.nio.file.{Files, Paths}
    val path = fresh()
    VersionedLake.commit(Seq((1L, "a")).toDF("id", "v"), path,
      overwrite = true)
    // simulate a commit that died between data write and commit point:
    // a data dir no manifest has ever referenced
    val orphan = Paths.get(path, "data", "orphan-lost-commit")
    Files.createDirectories(orphan)
    Files.writeString(orphan.resolve("part-0.parquet"), "junk")
    // within the grace window: an in-flight commit must not be swept
    VersionedLake.vacuum(path, keepVersions = 1)
    assert(Files.isDirectory(orphan))
    // past the grace window (negative grace puts the cutoff in the
    // future — avoids same-millisecond flake): swept, live untouched
    VersionedLake.vacuum(path, keepVersions = 1, orphanGraceMs = -1000L)
    assert(!Files.exists(orphan))
    assert(VersionedLake.read(spark, path)
      .as[(Long, String)].collect().toSet === Set((1L, "a")))
  }

  test("the manifest commit point is atomic-content: no temp files " +
    "linger and a reader never sees a torn newest manifest") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val path = fresh()
    VersionedLake.commit(Seq((1L, "a")).toDF("id", "v"), path,
      overwrite = true)
    VersionedLake.commit(Seq((2L, "b")).toDF("id", "v"), path,
      overwrite = false)
    // every published manifest is complete the instant it exists; the
    // temp staging names are cleaned up win or lose
    val log = Files.list(Paths.get(path, "_graft_log"))
    val names = try log.iterator().asScala
      .map(_.getFileName.toString).toSeq finally log.close()
    assert(names.sorted === Seq("v00000001.json", "v00000002.json"))
    assert(VersionedLake.manifest(path, 2L).size === 2)
  }

  test("schema evolution: an added column reads as the union schema " +
    "with older rows null-filled; time travel keeps the old schema") {
    val path = fresh()
    VersionedLake.commit(Seq((1L, "a")).toDF("id", "v"), path,
      overwrite = true)
    VersionedLake.commit(
      Seq((2L, "b", 99L)).toDF("id", "v", "w"), path, overwrite = false)
    val latest = VersionedLake.read(spark, path, mergeSchema = true)
    assert(latest.columns.sorted.toSeq === Seq("id", "v", "w"))
    assert(latest.select("id", "v", "w").as[(Long, String, Option[Long])]
      .collect().toSet === Set((1L, "a", None), (2L, "b", Some(99L))))
    // v1 time travel: the old two-column schema, untouched
    assert(VersionedLake.read(spark, path, Some(1L))
      .columns.sorted.toSeq === Seq("id", "v"))
  }
}

package graft.sink

import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import java.time.LocalDateTime

/** K4/K5: per-file routing — success moves to `processed/`, failures to
  * `quarantine/` plus a reason line appended to `quarantine_log.txt` in
  * the reference's exact format
  * (`pipeline.py:264-271,313,324`; evidence `quarantine_log.txt:1-5`):
  *
  *   `{ISO-8601 timestamp} - File: {name}, Reason: {reason}`
  */
object FsRouting {

  /** Move a data file into `processed/` (overwrites a same-named
    * earlier archive, matching shutil.move semantics).
    */
  def markProcessed(file: Path, processedDir: Path): Unit = {
    Files.createDirectories(processedDir)
    Files.move(file, processedDir.resolve(file.getFileName),
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Move a data file into `quarantine/` and append the reason line. */
  def quarantine(file: Path, quarantineDir: Path, reason: String): Unit = {
    Files.createDirectories(quarantineDir)
    if (Files.exists(file))
      Files.move(file, quarantineDir.resolve(file.getFileName),
        StandardCopyOption.REPLACE_EXISTING)
    appendReason(quarantineDir, file.getFileName.toString, reason)
  }

  /** `quarantine_log.txt` line, reference format (`pipeline.py:268`). */
  def appendReason(quarantineDir: Path, fileName: String, reason: String): Unit = {
    Files.createDirectories(quarantineDir)
    val line = s"${LocalDateTime.now()} - File: $fileName, Reason: $reason\n"
    Files.writeString(quarantineDir.resolve("quarantine_log.txt"), line,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** The reference's empty-file reason (`pipeline.py:291`). */
  val EmptyFileReason = "File is empty or contains only headers after NA filtering."

  /** Strip a Spark `input_file_name()` URI to a local path. */
  def toLocalPath(uri: String): Path = {
    val raw = if (uri.startsWith("file:")) new java.net.URI(uri).getPath else uri
    Paths.get(raw)
  }
}

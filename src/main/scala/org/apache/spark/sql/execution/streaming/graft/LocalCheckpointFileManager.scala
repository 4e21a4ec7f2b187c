package org.apache.spark.sql.execution.streaming.graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.checkpointing.{CheckpointFileManager, FileSystemBasedCheckpointFileManager}
import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager.CancellableFSDataOutputStream

/** Local-filesystem checkpoint manager whose ATOMIC WRITE is plain
  * java.nio (temp file + atomic rename) instead of the Hadoop local-FS
  * create path.
  *
  * Why: without the native hadoop library (this harness has none), the
  * Hadoop local create path costs ~33 ms PER FILE on tmpfs where the
  * identical NIO write+atomic-move costs ~0.1 ms (measured,
  * graft.CkptIoProbe op01..20 vs nio1..5) — and a micro-batch commits
  * several such files (offset WAL, commit log, one state-store delta
  * per store). Across the thirteen stream≡batch gates that fixed tax
  * was the dominant share of the measured addBatch floor. Reads,
  * listings and deletes were already sub-millisecond, so everything
  * except `createAtomic` delegates to the stock
  * [[FileSystemBasedCheckpointFileManager]] unchanged.
  *
  * Scope: LOCAL checkpoint paths only (the harness keeps every stream's
  * checkpoint in the session tmpdir). The stream sessions opt in via
  * `spark.sql.streaming.checkpointFileManagerClass`; an HDFS/S3
  * deployment simply does not set the conf and keeps the stock manager.
  * The write is atomic-visibility-equivalent to the stock rename-based
  * stream: writers produce a hidden temp sibling, close() renames it
  * into place, and a no-overwrite close onto an existing target throws
  * Hadoop's FileAlreadyExistsException exactly like the stock manager
  * (the metadata logs' concurrent-writer protocol relies on it).
  */
class GraftLocalCheckpointFileManager(path: Path, conf: Configuration)
  extends FileSystemBasedCheckpointFileManager(path, conf) {

  require(Option(path.toUri.getScheme).forall(_ == "file"),
    s"GraftLocalCheckpointFileManager is local-only, got $path")

  override def createAtomic(p: Path,
      overwriteIfPossible: Boolean): CancellableFSDataOutputStream = {
    val target = Paths.get(p.toUri.getPath)
    val dir = target.getParent
    if (!Files.isDirectory(dir)) Files.createDirectories(dir)
    val tmp = dir.resolve(s".${target.getFileName}.${java.util.UUID.randomUUID}.tmp")
    val out = Files.newOutputStream(tmp)
    new CancellableFSDataOutputStream(out) {
      private var done = false
      override def close(): Unit = synchronized {
        if (!done) {
          done = true
          out.close()
          // POSIX rename replaces silently, so the no-overwrite protocol
          // needs the explicit existence check — the same check-then-
          // rename the stock local manager performs (single-driver
          // metadata logs; the protocol guards query restarts, not true
          // cross-process races)
          if (!overwriteIfPossible && Files.exists(target)) {
            Files.deleteIfExists(tmp)
            throw new org.apache.hadoop.fs.FileAlreadyExistsException(
              s"failed to rename $tmp to existing $target")
          }
          Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
            StandardCopyOption.REPLACE_EXISTING)
        }
      }
      override def cancel(): Unit = synchronized {
        if (!done) {
          done = true
          out.close()
          Files.deleteIfExists(tmp)
        }
      }
    }
  }
}

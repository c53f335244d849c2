package graft.core

import java.nio.file.{Files, Path, Paths}

/** Scratch-space placement for ephemeral engine state (streaming
  * checkpoints, staging work dirs). On this harness's local mode the
  * write path of a streaming micro-batch is dominated by small-file
  * WAL/commit/state fsyncs, so scratch goes to tmpfs (`/dev/shm`)
  * when present instead of a disk-backed `/tmp` — checkpoint
  * durability across JVM restarts is NOT the local bench's contract.
  * On a real cluster this knob is the opposite decision: point
  * `-Dgraft.scratch.dir` (or the sink's explicit checkpointLocation)
  * at durable shared storage (HDFS/S3), because the checkpoint IS the
  * exactly-once restart contract there. The placement is a deployment
  * choice, not engine semantics — nothing reads scratch back except
  * the stream's own restart path.
  */
object ScratchDirs {

  private lazy val root: Path = {
    val base = sys.props.get("graft.scratch.dir").map(Paths.get(_))
      .orElse(Some(Paths.get("/dev/shm")).filter(Files.isWritable(_)))
      .getOrElse(Paths.get(sys.props("java.io.tmpdir")))
    Files.createTempDirectory(base, "graft_scratch_")
  }

  /** A fresh directory under the fast scratch root. */
  def fresh(prefix: String): Path =
    Files.createTempDirectory(root, prefix)

  /** Recursively delete a scratch dir (best-effort; scratch is
    * ephemeral by contract so failures are non-fatal).
    */
  def delete(p: Path): Unit =
    try {
      if (Files.exists(p)) {
        Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .forEach(f => try Files.delete(f) catch { case _: Exception => () })
      }
    } catch { case _: Exception => () }
}

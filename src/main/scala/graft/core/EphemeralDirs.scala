package graft.core

import java.nio.file.{Files, Path, Paths}

/** Root for verification-ephemeral scratch DIRECTORIES (temp feature
  * stores, ANN index builds, format-roundtrip staging): tmpfs when the
  * host has one (/dev/shm), else java.io.tmpdir — the same policy the
  * streaming checkpoints adopted in round 10 for the same reason. These
  * directories live for one query invocation (or one session for the
  * session-shared stores) and are pure scratch: under the driver's
  * back-to-back Verify + DuckDB-writeback + Bench sequence, the
  * dirty-page writeback queue turns disk-backed temp-store
  * rewrite-commit renames and reads into multi-second stalls on exactly
  * the store-building queries (BENCH_r09's mechanism, store edition).
  * A production deployment's stores point at durable storage by
  * explicit path — every OnlineStore caller passes a root, so nothing
  * here changes the store contract.
  *
  * The per-process root is deleted on JVM exit (best-effort recursive
  * sweep; tmpfs is RAM, so leaked bytes would otherwise outlive the
  * process until reboot).
  */
object EphemeralDirs {

  private lazy val root: Path = {
    val shm = Paths.get("/dev/shm")
    val base =
      if (Files.isDirectory(shm) && Files.isWritable(shm)) shm
      else Paths.get(System.getProperty("java.io.tmpdir"))
    val d = base.resolve(
      s"graft_eph_p${ProcessHandle.current().pid()}")
    Files.createDirectories(d)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try deleteRecursively(d) catch { case _: Throwable => () }))
    d
  }

  /** A fresh scratch directory under the tmpfs-backed per-process root. */
  def tempDir(prefix: String): Path =
    Files.createTempDirectory(root, prefix)

  def deleteRecursively(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.deleteIfExists _)
      finally walk.close()
    }
  }
}

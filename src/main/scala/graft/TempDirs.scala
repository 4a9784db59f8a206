package graft

import java.nio.file.{Files, Path}
import scala.collection.mutable.ArrayBuffer

/** Per-run scratch directories that actually get cleaned up: every dir
  * minted here is registered once and recursively deleted by a single
  * JVM shutdown hook, so repeated Verify/Bench runs stop accreting
  * `/tmp/graft_*` litter (each pre-fix run leaked its parquet scratch
  * forever). Paths still embed a fresh random suffix per call, so
  * concurrent runs never collide.
  */
object TempDirs {
  private val created = ArrayBuffer.empty[Path]
  private lazy val hook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      created.synchronized { created.foreach(deleteRecursively) }))
  }

  /** A fresh scratch dir (absolute path), deleted on JVM exit. */
  def scratch(prefix: String): String = {
    hook
    val p = Files.createTempDirectory(s"graft_${prefix}_")
    created.synchronized { created += p }
    p.toString
  }

  private def deleteRecursively(p: Path): Unit = {
    val f = p.toFile
    if (f.isDirectory) {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(k => deleteRecursively(k.toPath))
    }
    f.delete(): Unit
  }
}

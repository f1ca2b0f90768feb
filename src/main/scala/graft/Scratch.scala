package graft

import java.nio.file.{Files, Path}

/** Scratch-directory lifecycle shared by the catalog's file-boundary
  * queries and the dev probes: ONE recursive-delete implementation
  * (walk closed, children before parents) so the pattern's past bug
  * class — an unclosed `Files.walk` handle, fixed once in round 12's
  * review — cannot re-diverge across copies. */
object Scratch {
  def deleteRecursively(d: Path): Unit = {
    val walk = Files.walk(d)
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
    } finally walk.close()
  }
}

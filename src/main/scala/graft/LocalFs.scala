package graft

/** Tiny local-filesystem helpers for fixture/probe writers. */
object LocalFs {
  /** The single parquet part file of a just-written single-partition output
    * directory. Closes the directory stream — a bare `Files.list(...)` never
    * closes and leaks one directory handle per chunk, which adds up over a
    * long session writing many stream fixtures.
    */
  def onlyParquet(dir: String): java.nio.file.Path = {
    val s = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
    try s.filter(_.toString.endsWith(".parquet")).findFirst.get
    finally s.close()
  }

  /** Directory entries, name-sorted, with the stream closed — the loopable
    * form of the same leak-avoidance contract as [[onlyParquet]].
    */
  def entriesSorted(dir: java.nio.file.Path): Vector[java.nio.file.Path] = {
    val s = java.nio.file.Files.list(dir)
    try {
      val b = Vector.newBuilder[java.nio.file.Path]
      val it = s.iterator(); while (it.hasNext) b += it.next()
      b.result().sortBy(_.toString)
    } finally s.close()
  }
}

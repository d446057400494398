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
}

package graft.sources

import java.io.File

/** Staging-cache keying. Derived fixtures (bronze CDC feed, replay
  * input) are staged once per source dir; keying the staged path by a
  * content fingerprint of the source files means a regenerated testdata
  * dir invalidates the cache instead of silently reusing stale fixtures
  * (the `_SUCCESS`-only check could not tell the difference).
  */
object Staging {

  /** Cheap content fingerprint: murmur3 over (name, size, mtime) of
    * every file under the given paths (one level deep — parquet files
    * live directly under the table path). Not a data hash — stat-level
    * change detection is the right cost for a cache key.
    */
  def fingerprint(paths: Seq[String]): String = {
    val parts = paths.flatMap { p =>
      val f = new File(p)
      val files =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty[File]).sortBy(_.getName)
        else Array(f)
      files.map(x => s"${x.getName}:${x.length}:${x.lastModified}")
    }
    val h = scala.util.hashing.MurmurHash3.stringHash(parts.mkString("|"))
    java.lang.Integer.toHexString(h)
  }
}

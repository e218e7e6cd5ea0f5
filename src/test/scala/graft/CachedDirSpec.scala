package graft

import java.nio.file.Files

/** The /tmp derived-input caches must invalidate when the SOURCE
  * parquet changes — the driver regenerates testdata between rounds,
  * and an empty done-marker would keep serving stale bytes to keys
  * whose oracle reads the fresh parquet. */
class CachedDirSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("cachedDir rebuilds on source size/mtime change, reuses otherwise") {
    val src = Files.createTempDirectory("graft-cd-src")
    val dst = Files.createTempDirectory("graft-cd-dst").resolve("cache")
    val table = src.resolve("events.parquet")
    Files.write(table, "v1-bytes".getBytes("UTF-8"))
    var builds = 0
    def run(): String =
      SparkEntry.cachedDir(dst.toString, src.toString, Seq("events")) { out =>
        builds += 1
        Files.createDirectories(java.nio.file.Paths.get(out))
      }
    run()
    assert(builds == 1)
    run() // unchanged source → reuse
    assert(builds == 1)
    // regeneration: different size AND a bumped mtime
    Files.write(table, "v2-bytes-longer".getBytes("UTF-8"))
    table.toFile.setLastModified(table.toFile.lastModified + 5000)
    run()
    assert(builds == 2, "source change must invalidate the cache")
    run()
    assert(builds == 2)
    // same size, same mtime → token identical → reuse (documents the
    // limits of the size:mtime token deliberately)
    // cleanup
    import scala.jdk.CollectionConverters._
    for (d <- Seq(src, dst.getParent))
      scala.util.Using.resource(Files.walk(d)) { st =>
        st.iterator().asScala.toSeq.reverseIterator
          .foreach(p => Files.deleteIfExists(p))
      }
  }
}

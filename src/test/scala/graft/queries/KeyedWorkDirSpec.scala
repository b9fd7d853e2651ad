package graft.queries

import java.io.File
import graft.SparkSpec

/** The content-keyed working dirs (q86/q147/q151/.../q173) rekey whenever
  * the corpus is regenerated or a layout tag is bumped, which orphans the
  * previous key — [[KeyedWorkDir]] must bound that accumulation (LRU keep-6
  * per tag) without ever touching dirs it didn't create. */
class KeyedWorkDirSpec extends SparkSpec {

  private val tmp = System.getProperty("java.io.tmpdir")

  private def keyedDirs(tag: String): Set[String] =
    Option(new File(tmp).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches(s"graft-$tag-[0-9a-f]{12}"))
      .map(_.getName).toSet

  test("same (dir, corpus, layout) is a stable reusable key") {
    val tag = s"kwdstable${System.nanoTime()}"
    val a = KeyedWorkDir.keyed(spark, tag, "/no/such/dir", "t", "v1")
    new File(a, "marker").createNewFile()
    val b = KeyedWorkDir.keyed(spark, tag, "/no/such/dir", "t", "v1")
    assert(a == b && new File(b, "marker").exists())
    // a different layout tag is a DIFFERENT dir (orphaning, not mixing)
    assert(KeyedWorkDir.keyed(spark, tag, "/no/such/dir", "t", "v2") != a)
  }

  test("stale keys beyond the per-tag LRU cap are pruned, oldest first") {
    val tag = s"kwdprune${System.nanoTime()}"
    val dirs = (1 to 8).map { i =>
      val d = KeyedWorkDir.keyed(spark, tag, "/no/such/dir", "t", s"v$i")
      new File(d, "payload").createNewFile()
      Thread.sleep(25) // distinct mtimes: the LRU order under test
      d
    }
    val live = keyedDirs(tag)
    assert(live.size == 6, s"expected 6 kept, got $live")
    // the two oldest keys are gone, payload and all; the newest survive
    assert(!new File(dirs(0)).exists() && !new File(dirs(1)).exists())
    assert(dirs.drop(2).forall(d => new File(d, "payload").exists()))
    // re-USING an old surviving key refreshes it: v3 is now newest, so
    // creating one more key evicts v4 (the least recently used), not v3
    KeyedWorkDir.keyed(spark, tag, "/no/such/dir", "t", "v3")
    Thread.sleep(25)
    KeyedWorkDir.keyed(spark, tag, "/no/such/dir", "t", "v9")
    assert(new File(dirs(2)).exists() && !new File(dirs(3)).exists())
  }

  test("dirs that don't match this tag's exact keyed shape are never touched") {
    val tag = s"kwdshape${System.nanoTime()}"
    val foreignNoDash = new File(tmp, s"graft-${tag}0123456789ab")
    val foreignBadKey = new File(tmp, s"graft-$tag-NOTHEX")
    val foreignOtherTag = new File(tmp, s"graft-${tag}x-0123456789ab")
    Seq(foreignNoDash, foreignBadKey, foreignOtherTag).foreach(_.mkdirs())
    try {
      (1 to 8).foreach { i =>
        KeyedWorkDir.keyed(spark, tag, "/no/such/dir", "t", s"v$i")
        Thread.sleep(5)
      }
      assert(foreignNoDash.exists() && foreignBadKey.exists()
        && foreignOtherTag.exists())
    } finally Seq(foreignNoDash, foreignBadKey, foreignOtherTag)
      .foreach(_.delete())
  }
}

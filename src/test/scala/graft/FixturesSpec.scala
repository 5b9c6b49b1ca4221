package graft

import org.scalatest.funsuite.AnyFunSuite

/** Crash semantics of the atomic multi-phase fixture builder: a body
  * that fails mid-build must leave NO visible fixture (the partial
  * stays in the `.build` sibling), and a retry must rebuild from
  * scratch and publish atomically. The bug class this pins: `_SUCCESS`
  * is written by the FIRST append job of a multi-job build, so a
  * naive exists-check calls a 1-of-3-phase partial complete. */
class FixturesSpec extends AnyFunSuite {
  import graft.core.Fixtures

  private val sfDir = "/tmp/graft_fixtures_spec_sf"

  private def file(name: String, parts: String*) =
    java.nio.file.Paths.get(Fixtures.path(sfDir, name), parts: _*).toFile

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
    f.delete()
  }

  test("a body that crashes mid-build publishes nothing; retry rebuilds cleanly") {
    val name = s"atomic_crash_${System.nanoTime()}"
    rm(file(name).getParentFile)
    // phase 1 writes _SUCCESS (as Spark's first append job would),
    // phase 2 crashes
    val boom = intercept[RuntimeException] {
      Fixtures.buildAtomic(sfDir, name) { tmp =>
        val d = new java.io.File(tmp)
        d.mkdirs()
        new java.io.File(d, "_SUCCESS").createNewFile()
        new java.io.File(d, "part-0001").createNewFile()
        throw new RuntimeException("crash between phases")
      }
    }
    assert(boom.getMessage.contains("crash"))
    assert(!Fixtures.exists(sfDir, name),
      "a crashed build must not be visible as complete")
    assert(!file(name).exists(), "no final directory may appear")

    // retry: completes and publishes atomically, stale partial cleared
    Fixtures.buildAtomic(sfDir, name) { tmp =>
      val d = new java.io.File(tmp)
      d.mkdirs()
      new java.io.File(d, "_SUCCESS").createNewFile()
      new java.io.File(d, "part-0001").createNewFile()
      new java.io.File(d, "part-0002").createNewFile()
    }
    assert(Fixtures.exists(sfDir, name))
    assert(file(name, "part-0002").exists(), "full build published")
    assert(!new java.io.File(file(name).getParent, s"$name.build").exists(),
      "build staging dir renamed away")

    // idempotence: a complete fixture is never rebuilt
    Fixtures.buildAtomic(sfDir, name) { _ =>
      fail("body must not run when the fixture is complete")
    }
  }
}

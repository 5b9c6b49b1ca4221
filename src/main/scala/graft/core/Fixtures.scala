package graft.core

/** Per-scale-factor scratch dirs for fixture round-trips (CSV/JSON/ORC
  * rewrites, streaming sources, partitioned layouts) — the sandbox's
  * only in-repo write target. One definition so the location/derivation
  * can never drift between call sites. */
object Fixtures {
  def path(sfDir: String, name: String): String = {
    val sf = new java.io.File(sfDir).getName
    s"/root/repo/target/fixtures/$sf/$name"
  }

  /** True if the fixture was already written by a successful job. */
  def exists(sfDir: String, name: String): Boolean =
    new java.io.File(path(sfDir, name), "_SUCCESS").exists()
}

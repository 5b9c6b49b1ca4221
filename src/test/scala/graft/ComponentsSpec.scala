package graft

import org.scalatest.funsuite.AnyFunSuite

/** Connected-components propagation on synthetic graphs — exercises the
  * multi-round convergence paths the test corpus (mostly 2-doc pairs)
  * never reaches. */
class ComponentsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def run(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    llm.Dedup.components(pairs.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain propagates the min label across many hops") {
    // 10-9-8-...-1: diameter 9 → multiple propagation rounds
    val chain = (1L until 10L).map(i => (i, i + 1))
    val got = run(chain)
    assert(got.size === 10)
    assert(got.values.toSet === Set(1L), s"all labels must reach 1: $got")
  }

  test("triangle plus isolated pair form two components") {
    val got = run(Seq((5L, 7L), (7L, 9L), (5L, 9L), (20L, 30L)))
    assert(got(5L) === 5L && got(7L) === 5L && got(9L) === 5L)
    assert(got(20L) === 20L && got(30L) === 20L)
  }

  test("empty edge set yields an empty result, not an NPE") {
    val got = run(Seq.empty)
    assert(got.isEmpty)
  }

  test("star graph converges in one round regardless of size") {
    val star = (2L to 40L).map(i => (1L, i))
    val got = run(star)
    assert(got.values.toSet === Set(1L))
  }

  test("50-hop chain converges (pointer jumping beats the old diameter bound)") {
    // plain per-round propagation needs 50 rounds here and the old
    // 20-round cap aborted; hook+jump needs ~log2(50) ≈ 6.
    val chain = (1L until 51L).map(i => (i, i + 1))
    val got = run(chain)
    assert(got.size === 51)
    assert(got.values.toSet === Set(1L), "all 51 labels must reach 1")
  }

  test("two long chains keep separate labels under pointer jumping") {
    val a = (100L until 130L).map(i => (i, i + 1))
    val b = (200L until 230L).map(i => (i, i + 1))
    val got = run(a ++ b)
    assert(got.filter(_._1 <= 130L).values.toSet === Set(100L))
    assert(got.filter(_._1 >= 200L).values.toSet === Set(200L))
  }

  test("degree-ordered triangles: same count, far fewer wedges on a hub graph") {
    // adversarial skew: hub 0 touches every spoke 1..60 AND has the
    // LOWEST id, so canonical-id orientation points every hub edge
    // outward and enumerates all C(60,2)=1770 hub wedges; a clique on
    // 1..5 plants real triangles (hub-i-j plus intra-clique)
    val spokes = (1L to 60L).map(i => (0L, i))
    val clique = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    val edges = (spokes ++ clique).toDF("a", "b")
    val (triById, wedgesById) =
      llm.Dedup.orientedTriangleCounts(edges, byDegree = false)
    val (triByDeg, wedgesByDeg) =
      llm.Dedup.orientedTriangleCounts(edges, byDegree = true)
    // count is orientation-invariant: C(5,2)=10 hub triangles + C(5,3)=10
    assert(triById === 20L, s"canonical count wrong: $triById")
    assert(triByDeg === triById, "ordering must never change the count")
    // the lever itself: hub out-degree drops to 0 under degree order,
    // so the wedge set collapses from Θ(hub²) to the spoke wedges
    assert(wedgesById >= 1770L, s"hub wedges missing: $wedgesById")
    assert(wedgesByDeg * 10 < wedgesById,
      s"degree ordering should cut wedges >10x: $wedgesByDeg vs $wedgesById")
  }
}

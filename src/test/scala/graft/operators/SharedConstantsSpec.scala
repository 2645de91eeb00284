package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Regression pins for the seeded constants shared between operators
  * and their DuckDB oracle generators. The sharing design means both
  * sides move together on an intentional change — these pins exist to
  * catch UNintentional drift (a dependency upgrade changing murmur3, a
  * refactor changing seed threading), which would silently change
  * results at the driver gate instead of failing a test here.
  */
class SharedConstantsSpec extends AnyFunSuite {

  test("srpSigns: first direction of each table is stable") {
    val signs = Similarity.srpSigns(tables = 6, dim = 64, seed = 42)
    assert(signs.length == 6 && signs.forall(_.length == 64))
    assert(signs.forall(_.forall(s => s == 1f || s == -1f)))
    // fingerprint: +1-count per table (any hash drift moves these)
    val profile = signs.map(_.count(_ > 0)).toSeq
    assert(profile == Seq(27, 27, 30, 27, 33, 37), s"signs drifted: $profile")
  }

  test("minhashSeeds: seeded sequence is stable") {
    val seeds = Dedup.minhashSeeds(numHashes = 16, seed = 42L)
    assert(seeds.length == 16 && seeds.distinct.length == 16)
    assert(seeds.take(3) == Seq(-1170105035, 234785527, -1360544799),
      s"seed sequence drifted: ${seeds.take(3)}")
  }

  test("HLL numerator literal is stable") {
    // the exact double both engines embed; any change breaks hash
    // equality silently, so pin the bits
    assert(java.lang.Double.doubleToLongBits(Sketches.hllNumerator(Sketches.HllP)) ==
      java.lang.Double.doubleToLongBits(1.5794981363813938E12),
      s"hllNumerator drifted: ${Sketches.hllNumerator(Sketches.HllP)}")
  }
}

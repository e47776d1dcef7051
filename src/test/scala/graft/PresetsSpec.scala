package graft

import graft.core.DedupConfig
import org.scalatest.funsuite.AnyFunSuite

/** Named config presets + cross-knob validation — the analog of
  * destor's init_index combo normalization (reference
  * src/index/index.c:34-109), which forces consistent bundle choices
  * and refuses inconsistent ones at startup. */
class PresetsSpec extends AnyFunSuite {

  test("every preset passes the cross-knob guards and keeps the verification surface") {
    val d = DedupConfig.default
    assert(DedupConfig.presets.nonEmpty)
    assert(DedupConfig.presets.keySet ==
      Set("default", "exact-physical", "sampled-near-exact", "similarity-logical"))
    DedupConfig.presets.foreach { case (name, cfg) =>
      // construction already ran the guards; re-copy to prove the
      // instance revalidates (a preset edited into an invalid state
      // must throw at class init, not at first use)
      val again = cfg.copy()
      assert(again == cfg, name)
      // presets may trade candidate-generation cost, never the graded
      // correctness thresholds
      assert(cfg.jaccardMin == d.jaccardMin, s"$name changed jaccardMin")
      assert(cfg.psnrMin == d.psnrMin, s"$name changed psnrMin")
      assert(cfg.hammingMax == d.hammingMax, s"$name changed hammingMax")
      // the banding identity and the pigeonhole guarantee hold in every preset
      assert(cfg.bands * cfg.rowsPerBand == cfg.minhashK, name)
      assert(cfg.phashBlocks - cfg.phashCombo >= cfg.hammingMax, name)
    }
  }

  test("presets are distinct design points") {
    val ps = DedupConfig.presets
    assert(ps("exact-physical").indexValueLength > ps("default").indexValueLength)
    assert(ps("exact-physical").bloomFpp < ps("default").bloomFpp)
    assert(ps("sampled-near-exact").minhashK < ps("default").minhashK)
    assert(ps("similarity-logical").bands > ps("default").bands)
    assert(ps("similarity-logical").bucketCap > ps("sampled-near-exact").bucketCap)
  }

  test("inconsistent cross-knob combinations are refused at construction") {
    val d = DedupConfig.default
    // banding identity broken
    assertThrows[IllegalArgumentException](d.copy(bands = 21))
    // pigeonhole guarantee below the verify gate: candidates could MISS
    // pairs verify would accept (the guard that was previously only a
    // comment on phashBlocks/phashCombo)
    assertThrows[IllegalArgumentException](d.copy(hammingMax = 7))
    assertThrows[IllegalArgumentException](d.copy(phashCombo = 3))
    assertThrows[IllegalArgumentException](d.copy(phashBlocks = 7))
    // single-knob ranges
    assertThrows[IllegalArgumentException](d.copy(bucketCap = 1))
    assertThrows[IllegalArgumentException](d.copy(skewQuantile = 1.0))
    assertThrows[IllegalArgumentException](d.copy(bloomFpp = 0.0))
    assertThrows[IllegalArgumentException](d.copy(jaccardMin = 0.0))
    assertThrows[IllegalArgumentException](d.copy(indexValueLength = 0))
    assertThrows[IllegalArgumentException](d.copy(substrDfCap = 0))
    assertThrows[IllegalArgumentException](d.copy(substrGram = 1))
    assertThrows[IllegalArgumentException](d.copy(cflRequire = 1.5))
    // a valid retune of the hamming-LSH family still passes: (9,3)
    // covers hammingMax=6 with 21-bit keys (the documented 10^8-row
    // re-tune)
    val re = d.copy(phashBlocks = 9, phashCombo = 3)
    assert(re.phashBlocks - re.phashCombo >= re.hammingMax)
  }
}

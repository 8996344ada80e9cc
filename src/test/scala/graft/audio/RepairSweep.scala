package graft.audio

import graft.io.ClipsGenerator
import graft.validate.GainCheck
import org.scalatest.funsuite.AnyFunSuite

/** Measurement harness (`sbt "Test/runMain graft.audio.RepairSweep"`): the
  * repair ACTION per (codec, injection class) across the full id space —
  * the map the q77/q78 oracles predict by id arithmetic. Sections:
  *
  *   1. id-space sweep, errors on, i ∈ [0, 400k) — twice the sf0.1 table,
  *      every (codec, residue, freq, sr) cell the oracle tables can
  *      contain;
  *   2. the five q77 plant classes over the same id space (pcm container,
  *      as planted);
  *   3. a dense corrupt-residue sweep — every id ≡ 17 (mod 5000) up to
  *      2M, so each codec's corrupt cell gets hundreds of samples instead
  *      of the handful the natural codec mix leaves in [0, 400k).
  *
  * Measured 2026-08-18 (cap 25 ms, target −20 dBFS, 16 kHz):
  *   clean rows, all five codecs, all 400k ids → repaired (uniform)
  *   corrupt (m=17): flac → drop_undecodable; pcm_mulaw → drop_clipped;
  *     pcm_alaw → drop_dc_bias; pcm_s16le → repaired;
  *     adpcm_ima → BISTABLE (drop_dc_bias AND repaired both observed —
  *     the zeroed back half decodes to a DC-ish tail whose ratio
  *     straddles the census threshold depending on the id-derived tone).
  *     q77/q78 therefore EXCLUDE the (m=17, adpcm_ima) cell; every other
  *     cell is uniform and oracle-predictable.
  *   plants: padded → repaired (trimmed), silent → drop_all_silence,
  *     impulse → drop_would_clip, quiet → repaired (gained),
  *     clipped → drop_clipped — uniform across the id space.
  * AudioRepairSpec asserts the corners. `ignore`d out of CI.
  */
class RepairSweep extends AnyFunSuite {
  ignore("sweep") { RepairSweep.run() }
}

object RepairSweep {

  def main(args: Array[String]): Unit = run()

  def run(): Unit = {
    val cap = 25
    val target = GainCheck.DefaultTargetDbfs
    val sr = AudioRepair.DefaultTargetSr
    val agg = scala.collection.mutable.Map.empty[(String, String), Map[String, Long]]
    def record(codec: String, cls: String, action: String): Unit = {
      val m = agg.getOrElseUpdate((codec, cls), Map.empty)
      agg((codec, cls)) = m.updated(action, m.getOrElse(action, 0L) + 1L)
    }

    for (i <- 0L until 400000L) {
      val c = ClipsGenerator.injectErrors(ClipsGenerator.clip(i, cap), i)
      val cls = if (i % 5000 == 17) "corrupt" else "clean"
      record(c.codec, cls, AudioRepair.repairSamples(c.bytes, c.codec, target, sr)._1)
      if (i % 20 == 0) {
        def plant(name: String, bytes: Array[Byte]): Unit =
          record("pcm_s16le", name,
            AudioRepair.repairSamples(bytes, "pcm_s16le", target, sr)._1)
        plant("plant_padded", ClipsGenerator.paddedBytes(i, cap, 15, 20))
        plant("plant_silent", ClipsGenerator.silentBytes(i, cap))
        plant("plant_impulse", ClipsGenerator.impulseBytes(i, cap))
        plant("plant_quiet", ClipsGenerator.quietBytes(i, cap))
        plant("plant_clipped", ClipsGenerator.clippedBytes(i, cap))
      }
    }

    var k = 17L
    while (k < 2000000L) {
      val c = ClipsGenerator.injectErrors(ClipsGenerator.clip(k, cap), k)
      record(c.codec, "corrupt_dense",
        AudioRepair.repairSamples(c.bytes, c.codec, target, sr)._1)
      k += 5000L
    }

    println(f"${"codec"}%-10s ${"class"}%-15s actions")
    for (((codec, cls), actions) <- agg.toSeq.sortBy(_._1))
      println(f"$codec%-10s $cls%-15s " +
        actions.toSeq.sorted.map { case (a, n) => s"$a=$n" }.mkString(" "))
  }
}

package graft

import graft.ops.SketchOps
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Pure-function properties of the sketch kernels: the streaming KMV
  * fold must be batching-independent (cef43's correctness rests on it),
  * and the integer HLL/Bloom arithmetic must stay in the ranges the
  * DuckDB oracles assume (no 64-bit wrap — DuckDB errors where Spark
  * silently wraps).
  */
class SketchSpec extends AnyFlatSpec with Matchers {

  "mergeKMins" should "equal the global k-min for arbitrary stream splits" in {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 200) {
      val k = 1 + rnd.nextInt(20)
      val n = rnd.nextInt(400)
      // duplicates on purpose: distinct-ness is part of the contract
      val stream = Seq.fill(n)(rnd.nextInt(120).toLong)
      val expected = stream.distinct.sorted.take(k)
      // random batch split
      var rest = stream
      var acc: Seq[Long] = Nil
      while (rest.nonEmpty) {
        val take = 1 + rnd.nextInt(rest.size)
        acc = SketchOps.mergeKMins(acc, rest.take(take), k)
        rest = rest.drop(take)
      }
      withClue(s"trial $trial k=$k n=$n: ") { acc shouldBe expected }
    }
  }

  it should "never grow past k and stay sorted distinct" in {
    val rnd = new scala.util.Random(7)
    var acc: Seq[Long] = Nil
    for (_ <- 1 to 50) {
      acc = SketchOps.mergeKMins(acc, Seq.fill(40)(rnd.nextInt(1000).toLong), 16)
      acc.size should be <= 16
      acc shouldBe acc.distinct.sorted
    }
  }

  "the Bloom position arithmetic" should "stay far below 2^63 for the full hash range" in {
    val maxH = graft.ops.TextOps.HashMod - 1
    for ((a, b) <- SketchOps.BloomSeeds) {
      val worst = BigInt(maxH) * a + b
      worst should be < BigInt(Long.MaxValue)
    }
  }

  "the HLL scaled sum" should "bound within BIGINT for every register state" in {
    // worst case: all m registers at rho = 0-hit weight 2^26
    val worstSum = BigInt(SketchOps.HllM) * (BigInt(1) << SketchOps.HllRhoMax)
    val num = BigInt(SketchOps.HllAlphaNum) * SketchOps.HllM * SketchOps.HllM *
      (BigInt(1) << SketchOps.HllRhoMax)
    (num / SketchOps.HllAlphaDen) should be < BigInt(Long.MaxValue)
    (worstSum * SketchOps.HllAlphaDen) should be < BigInt(Long.MaxValue)
  }

  "hll rho bounds" should "map the hash space into [1, 26]" in {
    // endpoints of the value space w = h div 32
    def rhoOf(w: Long): Int =
      if (w == 0) SketchOps.HllRhoMax
      else SketchOps.HllRhoMax - java.lang.Long.toBinaryString(w).length
    rhoOf(0L) shouldBe 26
    rhoOf(1L) shouldBe 25
    rhoOf((graft.ops.TextOps.HashMod - 1) / SketchOps.HllM) shouldBe 1
    for (w <- Seq(2L, 3L, 31L, 32L, 1000000L)) {
      rhoOf(w) should be >= 1
      rhoOf(w) should be <= 26
    }
  }

  "foldMinHash" should "equal the one-batch signature for arbitrary stream splits" in {
    val mod = graft.ops.TextOps.HashMod
    val lanes = 16
    val as = graft.ops.DedupOps.MinHashA.take(lanes).toArray
    val bs = graft.ops.DedupOps.MinHashB.take(lanes).toArray
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 100) {
      val n = rnd.nextInt(300)
      val stream = Seq.fill(n)(rnd.nextInt(100000).toLong)
      // brute-force per-lane minimum over the whole (multiset) stream
      val expected = (0 until lanes).map { i =>
        if (stream.isEmpty) mod else stream.map(h => (as(i) * h + bs(i)) % mod).min
      }
      var rest = stream
      val acc = Array.fill(lanes)(mod)
      var total = 0L
      while (rest.nonEmpty) {
        val take = 1 + rnd.nextInt(rest.size)
        total += SketchOps.foldMinHash(acc, rest.take(take).iterator, as, bs, mod)
        rest = rest.drop(take)
      }
      withClue(s"trial $trial n=$n: ") {
        acc.toSeq shouldBe expected
        total shouldBe n.toLong
      }
    }
  }

  "foldHll" should "equal the one-batch registers for arbitrary stream splits" in {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 100) {
      val n = rnd.nextInt(300)
      val stream = Seq.fill(n)(rnd.nextLong(graft.ops.TextOps.HashMod))
      val expected = Array.fill(SketchOps.HllM)(0L)
      stream.foreach { h =>
        // independent formulation: bin-length via leading zeros
        val reg = (h % SketchOps.HllM).toInt
        val w = h / SketchOps.HllM
        val rho = if (w == 0L) SketchOps.HllRhoMax.toLong
          else (SketchOps.HllRhoMax - (64 - java.lang.Long.numberOfLeadingZeros(w))).toLong
        if (rho > expected(reg)) expected(reg) = rho
      }
      var rest = stream
      val acc = Array.fill(SketchOps.HllM)(0L)
      while (rest.nonEmpty) {
        val take = 1 + rnd.nextInt(rest.size)
        SketchOps.foldHll(acc, rest.take(take).iterator)
        rest = rest.drop(take)
      }
      withClue(s"trial $trial n=$n: ") { acc.toSeq shouldBe expected.toSeq }
    }
  }

  "hllSummary" should "replay the p38 formulas from any register state" in {
    val rnd = new scala.util.Random(17)
    val twoPow = 1L << SketchOps.HllRhoMax
    for (_ <- 1 to 50) {
      val regs = Array.fill(SketchOps.HllM)(
        if (rnd.nextBoolean()) 0L else 1L + rnd.nextInt(SketchOps.HllRhoMax))
      val snap = SketchOps.hllSummary(1L, 42L, regs)
      val hit = regs.count(_ > 0L)
      val sHit = regs.filter(_ > 0L).map(r => 1L << (SketchOps.HllRhoMax - r.toInt)).sum
      val sScaled = sHit + (SketchOps.HllM - hit) * twoPow
      snap.n_regs_hit shouldBe hit.toLong
      snap.s_scaled shouldBe sScaled
      val num = BigInt(SketchOps.HllAlphaNum) * SketchOps.HllM * SketchOps.HllM * twoPow
      snap.est_hll shouldBe (num / (BigInt(SketchOps.HllAlphaDen) * sScaled)).toLong
    }
  }

  "foldBloom" should "equal the one-batch bit-set for arbitrary stream splits" in {
    val rnd = new scala.util.Random(19)
    for (trial <- 1 to 100) {
      val n = rnd.nextInt(300)
      val stream = Seq.fill(n)(rnd.nextLong(graft.ops.TextOps.HashMod))
      val expected = Array.fill(SketchOps.BloomBits / 64)(0L)
      stream.foreach { h =>
        SketchOps.bloomPositionsJvm(h).foreach(p => expected(p >> 6) |= (1L << (p & 63)))
      }
      var rest = stream
      val acc = Array.fill(SketchOps.BloomBits / 64)(0L)
      var total = 0L
      while (rest.nonEmpty) {
        val take = 1 + rnd.nextInt(rest.size)
        total += SketchOps.foldBloom(acc, rest.take(take).iterator)
        rest = rest.drop(take)
      }
      withClue(s"trial $trial n=$n: ") {
        acc.toSeq shouldBe expected.toSeq
        total shouldBe n.toLong
      }
    }
  }

  "bloomPositionsJvm" should "match the Column formula's arithmetic for boundary hashes" in {
    val maxH = graft.ops.TextOps.HashMod - 1
    for (h <- Seq(0L, 1L, 31L, maxH / 2, maxH)) {
      val pos = SketchOps.bloomPositionsJvm(h)
      pos should have size SketchOps.BloomSeeds.size.toLong
      pos.foreach { p => p should be >= 0; p should be < SketchOps.BloomBits }
      pos shouldBe SketchOps.BloomSeeds.map { case (a, b) =>
        ((h * a + b) % graft.ops.TextOps.HashMod % SketchOps.BloomBits).toInt
      }
    }
  }

  "the new sketch folds" should "sustain multi-M items/s in-JVM (engine cost, not scaffold)" in {
    // the cef51/52/53 gates' bench seconds are scaffold-dominated
    // (forced state-store commits); this pins what the FOLDS cost.
    // Floors are ~10x under quiet-machine rates (ThroughputSpec's
    // rationale): they catch O(lanes*log)-style regressions, not
    // machine weather.
    val n = 2000000
    val rnd = new scala.util.Random(23)
    val hs = Array.fill(n)(rnd.nextLong(graft.ops.TextOps.HashMod))
    // best of 3 timed reps: this box shows multi-second contention
    // stalls (SCALE.md r15/r16) that can eat a single rep whole — the
    // r16 full-suite run measured foldBloom at 1.0 M/s in-suite vs
    // 4.5 M/s solo seconds later. The MAX over reps is the engine
    // cost; any one rep can be weather.
    def rate(body: => Unit): Double = {
      body // warm-up (JIT)
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body
        n / ((System.nanoTime() - t0) / 1e9)
      }.max
    }
    val lanes = 16
    val as = graft.ops.DedupOps.MinHashA.take(lanes).toArray
    val bs = graft.ops.DedupOps.MinHashB.take(lanes).toArray
    val mh = rate {
      val acc = Array.fill(lanes)(graft.ops.TextOps.HashMod)
      SketchOps.foldMinHash(acc, hs.iterator, as, bs, graft.ops.TextOps.HashMod)
    }
    val hll = rate {
      val acc = Array.fill(SketchOps.HllM)(0L)
      SketchOps.foldHll(acc, hs.iterator)
    }
    val bloom = rate {
      val acc = Array.fill(SketchOps.BloomBits / 64)(0L)
      SketchOps.foldBloom(acc, hs.iterator)
    }
    info(f"foldMinHash ${mh / 1e6}%.1f M items/s, foldHll ${hll / 1e6}%.1f M items/s, " +
      f"foldBloom ${bloom / 1e6}%.1f M items/s")
    mh should be > 1e6    // 16 multiplies per item
    hll should be > 4e6
    bloom should be > 2e6
  }
}

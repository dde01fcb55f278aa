package graft.cef

import org.apache.spark.unsafe.types.UTF8String
import scala.util.Random

/** Kernel micro-probe for the p119 Levenshtein swap (VERDICT r14
  * follow-up): times LevKernel.exact (blocked Myers + flank strip)
  * against UTF8String.levenshteinDistance (the functions.levenshtein
  * scalar DP) on pairs shaped like p119's real candidates — ~300-600
  * chars, median distance ≈ 0.7·len — and asserts value equality on
  * every pair. Numbers land in SCALE.md's round-14 addendum.
  *
  * Usage: sbt "Test/runMain graft.cef.LevKernelProbeMain [nPairs]"
  */
object LevKernelProbeMain {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    val r = new Random(1213)
    val words = Array.tabulate(500)(i => s"w${i}${"abcdefgh".substring(0, 1 + i % 7)}")
    // p119-shaped: two docs drawing from a shared vocabulary — token-set
    // similar, character-wise far apart (the measured sf0.01 regime)
    def doc(): String =
      Seq.fill(40 + r.nextInt(40))(words(r.nextInt(120))).mkString(" ")
    val pairs = Array.fill(n)((UTF8String.fromString(doc()), UTF8String.fromString(doc())))

    def time(label: String)(f: (UTF8String, UTF8String) => Int): Array[Int] = {
      val out = new Array[Int](n)
      var i = 0 // warm-up pass
      while (i < math.min(n, 2000)) { f(pairs(i)._1, pairs(i)._2); i += 1 }
      val t0 = System.nanoTime()
      i = 0
      while (i < n) { out(i) = f(pairs(i)._1, pairs(i)._2); i += 1 }
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"LEVPROBE $label%-28s ${n / secs / 1000}%8.1f k pairs/s  (${secs}%6.2f s)")
      out
    }

    val builtin = time("UTF8String scalar DP")((a, b) => a.levenshteinDistance(b))
    val myers = time("LevKernel blocked Myers")(
      (a, b) => org.apache.spark.sql.graftexpr.LevKernel.exact(a, b))
    require(java.util.Arrays.equals(builtin, myers), "kernel disagrees with builtin")
    println(s"LEVPROBE agreement: all $n pairs exact")
  }
}

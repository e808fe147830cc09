package graft.tools

import graft.sources.Zstd

/** Ad-hoc decode/encode throughput probe for the zstd codec (run via
  * `sbt "Test/runMain graft.tools.ZstdThroughput"`). Not a benchmark
  * artifact — a sizing aid for the poller-ceiling notes.
  */
object ZstdThroughput {
  def main(args: Array[String]): Unit = {
    def res(name: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/zstd/$name")
      try in.readAllBytes() finally in.close()
    }
    for (f <- Seq("text300k_l3.zst", "text300k_l19.zst", "events_l1.zst")) {
      val z = res(f)
      val out = Zstd.decode(z, 0, z.length)
      var n = 0L
      val t0 = System.nanoTime()
      var reps = 0
      while (System.nanoTime() - t0 < 2e9) { // ~2s
        Zstd.decode(z, 0, z.length); n += out.length; reps += 1
      }
      val mbps = n / 1e6 / ((System.nanoTime() - t0) / 1e9)
      println(f"$f%-22s decode ${mbps}%8.1f MB/s out (reps $reps)")
    }
    val raw = res("events.bin")
    var n = 0L
    val t0 = System.nanoTime()
    while (System.nanoTime() - t0 < 2e9) {
      Zstd.compressFrame(raw); n += raw.length
    }
    println(f"events.bin encode ${n / 1e6 / ((System.nanoTime() - t0) / 1e9)}%8.1f MB/s in")
  }
}

package graft

import graft.exts.Multimodal

/** Throwaway micro-probe (not part of the engine): isolates the JDK
  * ImageIO GIF writer/reader per-frame constant outside Spark — the
  * r15 verdict flagged the GIF trio (mm_video_decode/fp/dups) at
  * 2.2–2.4× of their r13 bands on untouched code. Decomposes the cost
  * the way the r9 WAVE-SPI lesson prescribes: SPI lookup, encoder
  * reuse (the engine's per-partition path), decode with one reader
  * reused, all single-threaded min-of-3, per-frame figures printed. */
object GifProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 500
    val ids = (0L until n).toArray
    def minOf3(f: => Double): Double = Seq(f, f, f).min
    def timeS(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    println(s"jdk=${sys.props("java.version")} n=$n")

    // SPI writer lookup (the WAVE-SPI failure shape): per-call cost
    val spi = minOf3(timeS((0 until 1000).foreach { _ =>
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    }))
    println(f"spi_writer_lookup_us=${spi * 1e3}%.1f (per call)")

    // encode, ONE reused encoder (the engine's mapPartitions path)
    val frames = ids.map(Multimodal.gifFrameCount(_).toLong).sum
    val enc = new Multimodal.GifEncoder()
    ids.take(50).foreach(enc.encode(_)) // warm codec + JIT
    val encS = minOf3(timeS(ids.foreach(enc.encode(_))))
    println(f"encode_total_s=$encS%.3f per_gif_us=${encS * 1e6 / n}%.0f " +
      f"per_frame_us=${encS * 1e6 / frames}%.0f (frames=$frames)")

    // decode, ONE reused reader (decodeGifStats' path): count frames +
    // touch every pixel row buffer so nothing dead-code-eliminates
    val payloads = ids.map(enc.encode(_))
    val reader =
      javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    var sink = 0L
    def decodeAll(): Unit = payloads.foreach { bytes =>
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      reader.setInput(iis, false, true)
      val k = reader.getNumImages(true)
      var f = 0
      while (f < k) {
        val img = reader.read(f)
        sink += img.getRaster.getSample(0, 0, 0)
        f += 1
      }
      reader.reset(); iis.close()
    }
    decodeAll() // warm
    val decS = minOf3(timeS(decodeAll()))
    println(f"decode_total_s=$decS%.3f per_gif_us=${decS * 1e6 / n}%.0f " +
      f"per_frame_us=${decS * 1e6 / frames}%.0f sink=$sink")

    // CONTENTION probe: the keys run 32 codec threads (one encoder /
    // reader per partition). If a JVM-global lock hides in the GIF
    // path, aggregate throughput per frame collapses vs single-thread.
    for (threads <- Seq(8, 32)) {
      val perThread = ids.grouped(math.max(1, n / threads)).toArray
      def parEncode(): Unit = {
        val ts = perThread.map { chunk =>
          val t = new Thread(() => {
            val e = new Multimodal.GifEncoder()
            chunk.foreach(e.encode(_))
          })
          t.start(); t
        }
        ts.foreach(_.join())
      }
      parEncode() // warm
      val parS = minOf3(timeS(parEncode()))
      println(f"encode_par${threads}_total_s=$parS%.3f " +
        f"agg_per_frame_us=${parS * 1e6 / frames}%.0f " +
        f"speedup_vs_1t=${encS / parS}%.1f")
    }
  }
}

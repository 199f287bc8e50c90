package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{AlphanumScramble, Determinism, ShingleHashSet, SortedIntersectCount}

/** ScalaCheck properties for the pure-JVM kernels behind the custom
  * Expressions — the contracts the oracle gate relies on, checked over
  * arbitrary inputs rather than fixtures. */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"$name: $res")
  }

  private val asciiStr = Gen.listOf(Gen.choose(' ', '~')).map(_.mkString)

  test("AlphanumScramble preserves length and per-char class; deterministic") {
    check("alphanum", Prop.forAll(asciiStr, Gen.alphaNumStr) { (v, pepper) =>
      val out = AlphanumScramble.scramble(
        UTF8String.fromString(v), UTF8String.fromString(pepper)).toString
      val again = AlphanumScramble.scramble(
        UTF8String.fromString(v), UTF8String.fromString(pepper)).toString
      out.length == v.length &&
        out == again &&
        v.zip(out).forall { case (a, b) =>
          if (a.isDigit) b.isDigit
          else if (a.isLower) b.isLower
          else if (a.isUpper) b.isUpper
          else a == b // non-alphanumeric passes through unchanged
        }
    })
  }

  test("SortedIntersectCount equals set-intersection size on sorted distinct arrays") {
    val sortedArr = Gen.listOf(Gen.choose(0L, 50L)).map(_.distinct.sorted)
    check("sortedInter", Prop.forAll(sortedArr, sortedArr) { (a, b) =>
      val n = SortedIntersectCount.count(
        new GenericArrayData(a.toArray), new GenericArrayData(b.toArray))
      n == a.toSet.intersect(b.toSet).size
    })
  }

  test("ShingleHashSet matches a naive shingle+md5 reference on arbitrary words") {
    val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val wordsGen = Gen.nonEmptyListOf(word)
    check("shingles", Prop.forAll(wordsGen) { words =>
      val got = ShingleHashSet.eval(
        new GenericArrayData(words.map(UTF8String.fromString).toArray), 3, 12)
      val m = math.max(words.size - 3, 0) + 1
      val expect = (0 until m)
        .map(i => words.slice(i, i + 3).mkString(" "))
        .distinct
        .map(sh => Determinism.jvmMd5Idx(sh, 12))
        .distinct.sorted
      (0 until got.numElements()).map(got.getLong).toSeq == expect
    })
  }

  test("ShingleHashes keeps every window in position order, no dedup") {
    val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val wordsGen = Gen.nonEmptyListOf(word)
    check("shingleHashes", Prop.forAll(wordsGen) { words =>
      val got = graft.functions.ShingleHashes.eval(
        new GenericArrayData(words.map(UTF8String.fromString).toArray), 3, 12)
      val m = math.max(words.size - 3, 0) + 1
      val expect = (0 until m)
        .map(i => Determinism.jvmMd5Idx(words.slice(i, i + 3).mkString(" "), 12))
      (0 until got.numElements()).map(got.getLong).toSeq == expect
    })
  }

  test("WordWindows(W=S, coverAll) matches the naive seg-word grouping reference") {
    val word = Gen.listOf(Gen.alphaNumChar).map(_.mkString)
    val wordsGen = Gen.nonEmptyListOf(word)
    val segGen = Gen.choose(1, 6)
    check("wordWindowsLines", Prop.forAll(wordsGen, segGen) { (words, seg) =>
      val got = graft.functions.WordWindows.eval(
        new GenericArrayData(words.map(UTF8String.fromString).toArray),
        seg, seg, coverAll = true)
      val expect = words.grouped(seg).map(_.mkString(" ")).toSeq
      (0 until got.numElements()).map(got.getUTF8String(_).toString) == expect
    })
  }

  test("WordWindows(coverAll) matches the naive strided-chunk reference") {
    val word = Gen.listOf(Gen.alphaNumChar).map(_.mkString)
    val wordsGen = Gen.nonEmptyListOf(word)
    val winGen = Gen.choose(1, 8)
    val strideGen = Gen.choose(1, 8)
    check("wordWindowsChunks", Prop.forAll(wordsGen, winGen, strideGen) {
      (words, win, stride) =>
        val got = graft.functions.WordWindows.eval(
          new GenericArrayData(words.map(UTF8String.fromString).toArray),
          win, stride, coverAll = true)
        val m = math.max(words.size - 1, 0) / stride + 1
        val expect = (0 until m)
          .map(i => words.slice(i * stride, i * stride + win).mkString(" "))
        (0 until got.numElements()).map(got.getUTF8String(_).toString) == expect
    })
  }

  test("WordWindows(shingle mode) matches the naive k-shingle reference") {
    val word = Gen.listOf(Gen.alphaNumChar).map(_.mkString)
    val wordsGen = Gen.nonEmptyListOf(word)
    val kGen = Gen.choose(1, 6)
    check("wordWindowsShingles", Prop.forAll(wordsGen, kGen) { (words, k) =>
      val got = graft.functions.WordWindows.eval(
        new GenericArrayData(words.map(UTF8String.fromString).toArray),
        k, 1, coverAll = false)
      val m = math.max(words.size - k, 0) + 1
      val expect = (0 until m).map(i => words.slice(i, i + k).mkString(" "))
      (0 until got.numElements()).map(got.getUTF8String(_).toString) == expect
    })
  }

  test("SimHash matches the naive distinct-word vote reference") {
    val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val wordsGen = Gen.nonEmptyListOf(word)
    check("simhash", Prop.forAll(wordsGen) { words =>
      val got = graft.functions.SimHash.eval(
        new GenericArrayData(words.map(UTF8String.fromString).toArray), 60, 15)
      val distinct = words.distinct
      val hs = distinct.map(w => Determinism.jvmMd5Idx(w, 15))
      val expect = (0 until 60).map { b =>
        val votes = hs.count(h => ((h >> b) & 1L) == 1L)
        if (votes * 2 > distinct.size) 1L << b else 0L
      }.sum
      got == expect
    })
  }

  test("DotProduct equals the naive left-to-right IEEE accumulation bit-for-bit") {
    val vec = Gen.listOfN(16, Gen.choose(-1.0, 1.0))
    check("dot", Prop.forAll(vec, vec) { (a, b) =>
      val got = graft.functions.DotProduct.dot(
        new GenericArrayData(a.toArray), new GenericArrayData(b.toArray))
      var acc = 0.0
      a.zip(b).foreach { case (x, y) => acc += x * y }
      java.lang.Double.doubleToLongBits(got) == java.lang.Double.doubleToLongBits(acc)
    })
  }

  test("Int8Quantize matches the naive floor(x*127/maxabs) reference bit-for-bit") {
    val vecGen = Gen.nonEmptyListOf(Gen.choose(-10.0, 10.0))
    check("int8quantize", Prop.forAll(vecGen) { v =>
      val got = graft.functions.Int8Quantize
        .eval(new GenericArrayData(v.toArray)).toDoubleArray().toSeq
      val mx = v.map(math.abs).max
      val want = v.map(x => math.floor(x * 127.0 / mx))
      got.length == want.length &&
        got.zip(want).forall { case (a, b) =>
          java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b)
        }
    })
    // NaN poisons the max in the reference formulas (array_max /
    // list max order NaN above everything) → all-NaN output; the tight
    // loop must agree, not quantize the finite components
    val got = graft.functions.Int8Quantize
      .eval(new GenericArrayData(Array(1.0, Double.NaN, -3.0))).toDoubleArray()
    assert(got.forall(_.isNaN), got.toSeq.toString)
  }

  test("jvmMd5Idx stays within [0, 16^k)") {
    check("md5idx", Prop.forAll(asciiStr, Gen.choose(1, 14)) { (s, k) =>
      val v = Determinism.jvmMd5Idx(s, k)
      v >= 0 && v < math.pow(16, k).toLong
    })
  }
}

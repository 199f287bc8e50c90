package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.AlphanumFpe

/** The unique-mode contract (text.py:45-60): format preservation and
  * INJECTIVITY per (length, alphabet) class — distinct inputs inside
  * their category alphabet never collide, which is what lets the
  * transform scrub key columns. */
class AlphanumFpeSpec extends AnyFunSuite {

  private def enc(s: String, pepper: String = "graft"): String =
    AlphanumFpe.encrypt(UTF8String.fromString(s), UTF8String.fromString(pepper)).toString

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"$name: $res")
  }

  private def pairOf(alpha: String): Gen[(String, String)] = for {
    n <- Gen.choose(1, 12)
    a <- Gen.listOfN(n, Gen.oneOf(alpha.toSeq)).map(_.mkString)
    b <- Gen.listOfN(n, Gen.oneOf(alpha.toSeq)).map(_.mkString)
  } yield (a, b)

  test("injective per (length, alphabet) class: lowercase and digits") {
    check("lower", Prop.forAll(pairOf("abcdefghijklmnopqrstuvwxyz")) {
      case (a, b) => (a == b) == (enc(a) == enc(b))
    })
    check("digits", Prop.forAll(pairOf("0123456789")) {
      case (a, b) => (a == b) == (enc(a) == enc(b))
    })
  }

  test("exhaustive: 3-digit strings permute (1000 in, 1000 distinct out)") {
    val outs = (0 until 1000).map(i => enc(f"$i%03d"))
    assert(outs.distinct.size == 1000)
    assert(outs.forall(o => o.length == 3 && o.forall(c => c >= '0' && c <= '9')),
      "format preserved: digit alphabet, same length")
  }

  test("non-alphabet chars fold into the detected alphabet") {
    val out = enc("ab-cd")
    assert(out.length == 5 && out.forall(c => c >= 'a' && c <= 'z'),
      s"'-' must fold into the lowercase alphabet, got '$out'")
  }

  test("deterministic per pepper; pepper changes output") {
    assert(enc("Customer42") == enc("Customer42"))
    assert(enc("Customer42", "other") != enc("Customer42"))
  }

  test("decrypt inverts encrypt for in-alphabet inputs (property)") {
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val digits = "0123456789"
    def roundTrips(alpha: String): Prop = Prop.forAll(
      Gen.choose(1, 16).flatMap(n => Gen.listOfN(n, Gen.oneOf(alpha.toSeq)).map(_.mkString))) {
      v => AlphanumFpe.decrypt(enc(v), "graft", alpha) == v
    }
    check("lower-roundtrip", roundTrips(lower))
    check("digit-roundtrip", roundTrips(digits))
    // mixed-category input: decrypt with the full category alphabet
    val v = "Cust42x"
    val alpha = AlphanumFpe.alphabetOf(v)
    assert(AlphanumFpe.decrypt(enc(v), "graft", alpha) == v)
    // wrong pepper does NOT round-trip
    assert(AlphanumFpe.decrypt(enc("secret7"), "other",
      AlphanumFpe.alphabetOf("secret7")) != "secret7")
  }

  test("PINNED non-ASCII contract: category detection is ASCII-only, " +
      "non-ASCII folds by code point") {
    // The reference detects categories by UNICODE class
    // (text.py:73-80: Lu/Ll/Lo...); graft detects over ASCII ranges
    // only (AlphanumFpe.alphabetOf) and folds every non-ASCII char in
    // by code point. This test PINS that divergence as the contract —
    // outputs stay deterministic and oracle-replayable on any input,
    // but category SELECTION differs from the reference when the only
    // members of a category are non-ASCII:
    val full = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
    // all-Cyrillic: reference would pick the UPPER alphabet (Lu); graft
    // sees no ASCII category and uses the full 62-char alphabet
    assert(AlphanumFpe.alphabetOf("МОСКВА") == full)
    // mixed: the ASCII chars alone already select UPPER+lower, same
    // selection as the reference (the ü changes nothing)
    assert(AlphanumFpe.alphabetOf("Müller") ==
      full.substring(0, 52))
    // fold-in formula is alphabet[codePoint % n] — pinned end-to-end:
    // the folded input and the original encrypt IDENTICALLY, and
    // decrypt returns the folded form
    val alpha = AlphanumFpe.alphabetOf("Müller")
    val folded = "M" + alpha.charAt('ü'.toInt % alpha.length) + "ller"
    assert(enc("Müller") == enc(folded))
    assert(AlphanumFpe.decrypt(enc("Müller"), "graft", alpha) == folded)
  }

  test("PINNED supplementary chars: one code point = one position " +
      "(no surrogate splitting)") {
    // U+1D518 is outside the BMP (2 UTF-16 units, 1 code point); it
    // must fold as ONE position — lower[0x1D518 % 26] = 'u' — matching
    // the oracle's per-character ord()/length() semantics
    assert(enc("a𝔘b") == enc("aub"))
    assert(AlphanumFpe.decrypt(enc("a𝔘b"), "graft",
      "abcdefghijklmnopqrstuvwxyz") == "aub")
  }

  test("length 1 and length 2 degenerate halves stay bijective") {
    assert(('a' to 'z').map(c => enc(c.toString)).distinct.size == 26)
    val twos = for (a <- 'a' to 'c'; b <- 'a' to 'c') yield enc(s"$a$b")
    assert(twos.distinct.size == 9)
  }
}

package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the fused one-pass PII scanner ([[PiiAlgos.scrub]])
  * byte-identical to the Java-regex composition it replaced in
  * qPiiRedact:
  *
  *   red_text = replace(replace(t, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")
  *   n_emails = matches(t, EmailRe); n_phones = matches(t, PhoneRe)
  *
  * Directed cases cover the adversarial boundaries (local part
  * swallowing a phone, adjacent-match boundary reuse, greedy domain
  * backtracking, 5-digit runs); the property sweep drives arbitrary
  * strings over a PII-biased alphabet plus multi-byte UTF-8.
  */
class PiiScrubSpec extends AnyFunSuite {

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "(\\+1-)?555-[0-9]{4}"
  private val emailP = java.util.regex.Pattern.compile(EmailRe)
  private val phoneP = java.util.regex.Pattern.compile(PhoneRe)

  private def countMatches(p: java.util.regex.Pattern, s: String): Long = {
    val m = p.matcher(s); var n = 0L; while (m.find()) n += 1; n
  }

  private def oracle(s: String): (String, Long, Long) = {
    val red = phoneP.matcher(
      emailP.matcher(s).replaceAll("<EMAIL>")).replaceAll("<PHONE>")
    (red, countMatches(emailP, s), countMatches(phoneP, s))
  }

  private def fused(s: String): (String, Long, Long) = {
    val r = PiiAlgos.scrub(UTF8String.fromString(s))
    (r.getUTF8String(0).toString, r.getLong(1), r.getLong(2))
  }

  private def agree(s: String): Unit =
    assert(fused(s) == oracle(s), s"input: ${s.take(200)}")

  test("directed: plain email and phone forms") {
    agree("contact bob@example.org or call +1-555-1234 now")
    agree("bare phone 555-0000 and email a.b_c%d+e-f@sub.domain.co")
    agree("no pii here at all")
    agree("")
    agree("@missing.local and trailing@nodot")
    agree("x@y.ab")       // minimal 2-letter TLD
    agree("x@y.a")        // 1-letter TLD: no match
  }

  test("directed: email local part swallows a phone-shaped string") {
    // the digits+dash are LOCAL-class chars: the email match covers
    // them, so red_text has no <PHONE> but n_phones counts 1
    agree("call 555-1234x@ex.org today")
    agree("+1-555-1234@ex.org")
  }

  test("directed: greedy domain backtracking picks the rightmost dot") {
    agree("a@bb.cc.dd")        // match ends at .dd
    agree("a@bb.cc.d5")        // .d5 fails, backtrack to .cc
    agree("a@bb.cc.ddd-ee")    // letters end before '-'
    agree("a@b-.-.xy")         // dots/dashes everywhere
    agree("a@.org")            // domain run starts with '.': A empty for that dot
  }

  test("directed: adjacent and overlapping match boundaries") {
    agree("a@bb.cc@dd.ee")     // second '@' has no unconsumed local part
    agree("555-12345")         // 4-digit match, 5th digit survives
    agree("5555-1234")         // match starts at second '5'
    agree("+1-555-123")        // too short with prefix: no match at all
    agree("+2-555-1234")       // wrong prefix: bare match only
    agree("+1-555-1234555-0000") // back-to-back
  }

  test("directed: the corpus augmentation shape") {
    agree("lorem ipsum contact u42@ex0.org or call +1-555-1554 alt 555-3822")
  }

  private val piiAlphabet: Gen[Char] = Gen.frequency(
    (8, Gen.alphaNumChar),
    (3, Gen.oneOf('@', '.', '-', '+', '_', '%', ' ')),
    (2, Gen.oneOf('5', '1')),
    (1, Gen.oneOf('é', '中', 'ß')))  // multi-byte UTF-8

  private val fragment: Gen[String] = Gen.frequency(
    (3, Gen.listOf(piiAlphabet).map(_.mkString)),
    (1, Gen.const("555-")), (1, Gen.const("+1-555-")),
    (1, Gen.const("1234")), (1, Gen.const("@ex.org")),
    (1, Gen.const("a@b")), (1, Gen.const(".org")))

  test("property: fused == regex composition on arbitrary strings") {
    val gen = Gen.listOf(fragment).map(_.mkString)
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500),
      Prop.forAll(gen) { s => fused(s) == oracle(s) })
    assert(res.passed, res.status.toString)
  }
}

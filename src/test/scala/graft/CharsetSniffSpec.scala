package graft

import org.apache.spark.unsafe.types.UTF8String
import graft.functions.expr.CharsetSniff

/** The charset-detection cascade (BOM → meta declaration → UTF-8
  * validity → windows-1252) and the deterministic decode. */
class CharsetSniffSpec extends SparkSpec {

  private def sniff(b: Array[Byte]): String = CharsetSniff.sniff(b).toString
  private def dec(b: Array[Byte], cs: String): String =
    CharsetSniff.decode(b, UTF8String.fromString(cs)).toString
  private def utf8(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("BOMs win and are stripped on decode") {
    val bom8 = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ utf8("hi é")
    assert(sniff(bom8) == "utf-8")
    assert(dec(bom8, "utf-8") == "hi é")
    val le = Array[Byte](0xFF.toByte, 0xFE.toByte) ++ "ab".getBytes("UTF-16LE")
    assert(sniff(le) == "utf-16le")
    assert(dec(le, "utf-16le") == "ab")
    val be = Array[Byte](0xFE.toByte, 0xFF.toByte) ++ "ab".getBytes("UTF-16BE")
    assert(sniff(be) == "utf-16be")
    assert(dec(be, "utf-16be") == "ab")
  }

  test("a meta declaration beats the validity heuristic; unknown labels fall through") {
    val declared = "<meta charset='ISO-8859-1'>pure ascii".getBytes("ISO-8859-1")
    assert(sniff(declared) == "iso-8859-1", "UTF-8-valid bytes, but the label wins")
    val httpEquiv = ("<meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=utf-8\">x").getBytes("ISO-8859-1")
    assert(sniff(httpEquiv) == "utf-8")
    val unknown = "<meta charset=\"klingon-9\">plain".getBytes("ISO-8859-1")
    assert(sniff(unknown) == "utf-8", "unknown label falls through to validity")
  }

  test("the UTF-8 validator rejects stray continuation bytes, overlongs, surrogates, and > U+10FFFF") {
    assert(CharsetSniff.isValidUtf8(utf8("plain and é and 😀")))
    assert(!CharsetSniff.isValidUtf8(Array('a'.toByte, 0xE9.toByte, 'b'.toByte)),
      "a bare Latin-1 0xE9 is not UTF-8")
    assert(!CharsetSniff.isValidUtf8(Array(0xC0.toByte, 0xAF.toByte)), "overlong /")
    assert(!CharsetSniff.isValidUtf8(Array(0xED.toByte, 0xA0.toByte, 0x80.toByte)),
      "encoded surrogate U+D800")
    assert(!CharsetSniff.isValidUtf8(Array(0xF4.toByte, 0x90.toByte, 0x80.toByte, 0x80.toByte)),
      "above U+10FFFF")
    assert(!CharsetSniff.isValidUtf8(utf8("trunc") :+ 0xE2.toByte), "torn tail")
  }

  test("no BOM, no meta, invalid UTF-8 falls back to windows-1252; decode maps 0xE9 to é") {
    val latin = "caf".getBytes("ISO-8859-1") :+ 0xE9.toByte
    assert(sniff(latin) == "windows-1252")
    assert(dec(latin, "windows-1252") == "café")
  }

  test("a meta-declared UTF-16 label is refuted by its own ASCII readability (WHATWG)") {
    // the declaration is readable as ASCII, so the payload is NOT UTF-16 —
    // honoring it would decode pairs of ASCII bytes into garbage codepoints
    val declared = "<meta charset=utf-16le>plain ascii".getBytes("US-ASCII")
    assert(sniff(declared) == "utf-8", "falls through to the validity scan")
    val be = "<meta charset='UTF-16BE'>plain".getBytes("US-ASCII")
    assert(sniff(be) == "utf-8")
    // UTF-16 stays reachable via its BOM (the only trustworthy signal)
    val le = Array[Byte](0xFF.toByte, 0xFE.toByte) ++ "ab".getBytes("UTF-16LE")
    assert(sniff(le) == "utf-16le")
  }

  test("the top web multibyte families sniff by declaration and decode their planted sequences") {
    // each planted tail is INVALID UTF-8 (a lead-less continuation byte or
    // out-of-range lead), so only the declared label recovers the expected
    // codepoint — the heuristically-undetectable case the label exists for
    val families = Seq(
      ("shift_jis", Array(0x93, 0xFA), "日"), // 日
      ("euc-jp", Array(0xC6, 0xFC), "日"),
      ("gbk", Array(0xD6, 0xD0), "中"), // 中
      ("gb18030", Array(0xD6, 0xD0), "中"),
      ("big5", Array(0xA4, 0xA4), "中"),
      ("euc-kr", Array(0xB0, 0xA1), "가"), // 가
      ("koi8-r", Array(0xF0), "П"), // П
      ("windows-1251", Array(0xC0), "А"), // А
      ("windows-1256", Array(0xC7), "ا"), // ا
      ("iso-8859-2", Array(0xB1), "ą"), // ą
      ("iso-8859-15", Array(0xA4), "€")) // €
    for ((label, tail, expected) <- families) {
      val page = s"<meta charset=$label>ascii body".getBytes("US-ASCII") ++
        tail.map(_.toByte)
      assert(sniff(page) == label, s"declared $label must win")
      assert(dec(page, label) == s"<meta charset=$label>ascii body$expected",
        s"decode under $label must recover the planted codepoint")
    }
    // label aliases map to the same charset
    assert(sniff("<meta charset=sjis>x".getBytes("US-ASCII") :+ 0x93.toByte) == "shift_jis")
    assert(sniff("<meta charset=gb2312>x".getBytes("US-ASCII")) == "gbk")
    assert(sniff("<meta charset=cp1251>x".getBytes("US-ASCII")) == "windows-1251")
    assert(sniff("<meta charset=latin2>x".getBytes("US-ASCII")) == "iso-8859-2")
  }

  test("decode is loud on unknown labels and deterministic on malformed bytes") {
    val e = intercept[IllegalArgumentException] {
      dec(utf8("x"), "ebcdic-037")
    }
    assert(e.getMessage.contains("unknown charset label"), e.getMessage)
    assert(dec(Array('a'.toByte, 0xE9.toByte, 'b'.toByte), "utf-8") == "a�b",
      "malformed input becomes U+FFFD, never a silent drop")
  }
}

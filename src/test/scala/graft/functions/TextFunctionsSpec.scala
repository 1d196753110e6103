package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("text").select(c.as("v")).head().get(0)

  test("tokenCount: whitespace runs, blank -> 0") {
    assert(one(TextFunctions.tokenCount($"text"), "a b  c") == 3L)
    assert(one(TextFunctions.tokenCount($"text"), "   ") == 0L)
    assert(one(TextFunctions.tokenCount($"text"), "single") == 1L)
  }

  test("bpeTokenCount: letter/digit/symbol runs each count once; blank -> 0") {
    // "Hello, world2!" -> [Hello][,][world][2][!] = 5
    assert(one(TextFunctions.bpeTokenCount($"text"), "Hello, world2!") == 5L)
    assert(one(TextFunctions.bpeTokenCount($"text"), "abc def") == 2L)
    assert(one(TextFunctions.bpeTokenCount($"text"), "2024-01-01") == 5L)
    assert(one(TextFunctions.bpeTokenCount($"text"), "") == 0L)
    assert(one(TextFunctions.bpeTokenCount($"text"), "   ") == 0L)
    // lower-bounds the whitespace count never by more than punctuation adds
    assert(one(TextFunctions.bpeTokenCount($"text"), "a b c") == 3L)
  }

  test("alphaRatio and avgWordLen known values") {
    assert(one(TextFunctions.alphaRatio($"text"), "ab1") == 0.666667) // round(2/3, 6)
    assert(one(TextFunctions.avgWordLen($"text"), "ab cdef") == 3.0)
  }

  test("qualityScore saturates at 20 tokens") {
    val short = one(TextFunctions.qualityScore($"text"), "pure words here").asInstanceOf[Double]
    val long = one(TextFunctions.qualityScore($"text"),
      Seq.fill(25)("word").mkString(" ")).asInstanceOf[Double]
    assert(short < 1.0 && short > 0)
    assert(long > 0.75) // all-alpha + spaces, full length credit
  }

  test("langId picks the marker-dominant language; und for no hits") {
    assert(one(TextFunctions.langId($"text"), "der hund und die katze ist nicht da") == "de")
    assert(one(TextFunctions.langId($"text"), "the cat and the dog of the house") == "en")
    assert(one(TextFunctions.langId($"text"), "el perro y la casa de los gatos") == "es")
    assert(one(TextFunctions.langId($"text"), "le chat et les chiens dans une maison") == "fr")
    assert(one(TextFunctions.langId($"text"), "qwzx bnmp vcxz") == "und")
  }

  test("fingerprint normalizes case and whitespace") {
    val a = one(TextFunctions.fingerprint($"text"), "Hello   World")
    val b = one(TextFunctions.fingerprint($"text"), "hello world ")
    val c = one(TextFunctions.fingerprint($"text"), "hello earth")
    assert(a == b && a != c)
  }

  test("rolling hash matches the reference recurrence and is codegen-stable") {
    val s = "spark"
    var expect = 0L
    s.getBytes("UTF-8").foreach(b => expect = expect * RollingHashExpr.Base + (b & 0xff))
    assert(one(RollingHashExpr.rolling_hash($"text"), s) == expect)
    // null-safe
    val withNull = Seq(Some("x"), None).toDF("text")
      .select(RollingHashExpr.rolling_hash($"text").as("h")).collect()
    assert(withNull.count(_.isNullAt(0)) == 1)
  }

  test("redactPii: typed placeholders, email before ip, clean text untouched") {
    def red(s: String) = one(TextFunctions.redactPii($"text"), s)
    assert(red("mail me at jo.doe+x@sub.example.org today") ==
      "mail me at <EMAIL> today")
    assert(red("server 192.168.0.1 responded") == "server <IP> responded")
    assert(red("call +1-555-0123-4567 now") == "call <PHONE> now")
    // an email whose local part is digits-and-dots must NOT be bitten by
    // the IP pattern first (ordering contract)
    assert(red("from 10.0.0.1@example.com sent") == "from <EMAIL> sent")
    // all three in one string
    assert(red("a@b.co 1.2.3.4 +49-030-1234") == "<EMAIL> <IP> <PHONE>")
    // no PII -> byte-identical passthrough
    val clean = "the quick brown fox, 42 words."
    assert(red(clean) == clean)
  }

  test("symbolRatio: counts non-alphanumeric non-space chars only") {
    assert(one(TextFunctions.symbolRatio($"text"), "abc def1") == 0.0)
    assert(one(TextFunctions.symbolRatio($"text"), "a!b@") == 0.5)
    assert(one(TextFunctions.symbolRatio($"text"), "") == 0.0)
  }

  test("rolling window hashes: each equals the direct hash of its window") {
    val s = "abcdefgh"
    val w = 3
    def direct(sub: String): Long = {
      var h = 0L
      sub.getBytes("UTF-8").foreach(b => h = h * RollingHashExpr.Base + (b & 0xff))
      h
    }
    val got = Seq(s).toDF("text")
      .select(RollingWindowHashExpr.rolling_hash_windows($"text", w).as("hs"))
      .head().getSeq[Long](0)
    val expect = (0 to s.length - w).map(i => direct(s.substring(i, i + w)))
    assert(got == expect, "rolling recurrence must match per-window recompute")
    // shorter than the window -> empty, never partial windows
    val short = Seq("ab").toDF("text")
      .select(RollingWindowHashExpr.rolling_hash_windows($"text", w).as("hs"))
      .head().getSeq[Long](0)
    assert(short.isEmpty)
  }

  test("hashed substring dedup groups the same spans as the literal form") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over"),
      (2L, "a quick brown fox jumps high"),
      (3L, "completely unrelated content."),
      (4L, "the quick brown fox jumps over") // exact dup of 1
    ).toDF("doc_id", "text")
    import graft.operators.Dedup
    val literal = Dedup.substringDupSpans(docs, width = 10)
      .collect().map(r => r.getLong(1)).sorted.toSeq
    val hashed = Dedup.substringDupSpansHashed(docs, width = 10)
      .collect().map(r => r.getLong(1)).sorted.toSeq
    assert(literal.nonEmpty, "fixture must actually share spans")
    assert(hashed == literal,
      "hash-keyed span groups must match literal substring groups")
  }

  test("rolling_hash registers as a SQL function") {
    RollingHashExpr.register(spark)
    Seq("abc").toDF("text").createOrReplaceTempView("rh_t")
    val viaSql = spark.sql("SELECT rolling_hash(text) AS h FROM rh_t").head().getLong(0)
    val viaCol = Seq("abc").toDF("text")
      .select(RollingHashExpr.rolling_hash($"text")).head().getLong(0)
    assert(viaSql == viaCol)
  }
}

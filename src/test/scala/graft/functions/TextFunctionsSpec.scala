package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String) =
    Seq(text).toDF("t").select(c.as("v")).collect().head

  test("normalize / tokens / counts") {
    assert(one(normalizeText(col("t")), "  Héllo   WORLD \t x ")
      .getString(0) == "héllo world x")
    assert(one(tokenCount(col("t")), "a b  c").getInt(0) == 3)
    assert(one(tokenCount(col("t")), "").getInt(0) == 0)
    // BPE-ish: letter runs, digit runs, single symbols
    assert(one(bpeTokenCount(col("t")), "hello42world!?").getInt(0) == 5)
  }

  test("shingles: word n-grams with short-text fallback") {
    val sh = one(wordShingles(col("t"), 3), "a b c d").getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
    assert(one(wordShingles(col("t"), 3), "a b").getSeq[String](0) ==
      Seq("a b"))
    val ch = one(charShingles(col("t"), 2), "abc").getSeq[String](0)
    assert(ch == Seq("ab", "bc"))
    // shinglesFromTokens agrees with wordShingles (same semantics, bound form)
    val both = Seq("the quick brown fox jumps").toDF("t")
      .select(tokens(normalizeText(col("t"))).as("toks"), col("t"))
      .select(shinglesFromTokens(col("toks"), 2).as("a"),
        wordShingles(col("t"), 2).as("b")).collect().head
    assert(both.getSeq[String](0) == both.getSeq[String](1))
  }

  test("fingerprint is normalization-invariant; rollingHash stable") {
    val fp = Seq(("A  B c", "a b C")).toDF("x", "y")
      .select(fingerprint(col("x")).as("fx"), fingerprint(col("y")).as("fy"))
      .collect().head
    assert(fp.getString(0) == fp.getString(1))
    val rh1 = one(rollingHash(col("t")), "a b c").getLong(0)
    val rh2 = one(rollingHash(col("t")), "a b c").getLong(0)
    val rh3 = one(rollingHash(col("t")), "c b a").getLong(0)
    assert(rh1 == rh2 && rh1 != rh3) // order-sensitive, deterministic
    assert(rh1 >= 0 && rh1 < 1000000007L)
  }

  test("langId picks the stopword-dominant language, und when none") {
    assert(one(langId(col("t")),
      "the cat sat of the mat and it was good").getString(0) == "en")
    assert(one(langId(col("t")),
      "la casa de los gatos en el jardín").getString(0) == "es")
    assert(one(langId(col("t")), "zzz qqq xxx").getString(0) == "und")
    val en = one(langScore(col("t"), "en"), "the dog of war").getDouble(0)
    assert(en == 0.5) // 'the', 'of' out of 4 tokens
  }

  test("quality features and score behave directionally") {
    val good = one(qualityScore(col("t")),
      "the quick brown fox jumps over the lazy dog near the river bank")
      .getDouble(0)
    val symbolSoup = one(qualityScore(col("t")),
      "@@ ## $$ %% ^^ && ** (( )) !!").getDouble(0)
    val tiny = one(qualityScore(col("t")), "ok").getDouble(0)
    assert(good > symbolSoup && good > tiny)
    val f = Seq("ab cd 12").toDF("t")
      .select(qualityFeatures(col("t")).as("f")).select("f.*").collect().head
    assert(f.getAs[Long]("n_tokens") == 3)
    assert(math.abs(f.getAs[Double]("digit_ratio") - 2.0 / 8) < 1e-9)
  }

  test("langId CJK script route: Han-dominant text is zh, mixed is not") {
    // (the testdata `lang` column is a random label on English word-soup —
    // verified by inspection — so script/stopword routing is tested on
    // constructed inputs instead)
    assert(one(langId(col("t")), "機械学習は人工知能の分野です").getString(0) == "zh")
    assert(one(cjkRatio(col("t")), "機械学習は人工知能の分野です").getDouble(0) > 0.9)
    assert(one(langId(col("t")),
      "the quick brown fox of the day 機械").getString(0) == "en")
    assert(one(cjkRatio(col("t")), "no cjk here at all").getDouble(0) == 0.0)
  }

  test("hamming64") {
    val h = Seq((0L, -1L)).toDF("a", "b")
      .select(hamming64(col("a"), col("b")).as("h")).collect().head
    assert(h.getInt(0) == 64) // bit_count returns int
  }
}

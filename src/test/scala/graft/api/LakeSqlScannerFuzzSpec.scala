package graft.api

import org.scalatest.funsuite.AnyFunSuite

/** Fuzzes the SQL scanner ([[LakeSql.literalSpans]]) and the txn-block
  * statement splitter ([[LakeSql.splitTopSemis]]) the way
  * QueryEngineFuzzSpec pins the predicate parser: statements are
  * ASSEMBLED from typed fragments (code / single- and double-quoted
  * literals / line comments / bracketed comments, nesting included), so
  * every character's inside-a-span truth is known BY CONSTRUCTION — no
  * re-implemented reference scanner to agree-by-accident with. Seeded
  * generators keep every run deterministic.
  */
class LakeSqlScannerFuzzSpec extends AnyFunSuite {

  /** One generated fragment: its text plus the constructed truth of
    * which positions are inside a literal/comment span. */
  private final case class Frag(text: String, inside: Seq[Boolean])

  private val codeChars = "abcXYZ019 ()=,.<>".toCharArray
  // literal/comment bodies carry exactly the characters that would break
  // a naive scanner: statement separators, comment openers, the OTHER
  // quote kind
  private val spicyChars = "ab; -/*'\"=9".toCharArray

  private def run(rnd: scala.util.Random, chars: Array[Char], n: Int) =
    String.valueOf(Array.fill(n)(chars(rnd.nextInt(chars.length))))

  /** Plain code: no quotes, no `-`/`/` (so no comment opener can form
    * across fragment boundaries), optionally without `;`. */
  private def codeFrag(rnd: scala.util.Random, allowSemi: Boolean): Frag = {
    val extra = if (allowSemi) ";" else ""
    val s = run(rnd, (String.valueOf(codeChars) + extra).toCharArray,
      1 + rnd.nextInt(8))
    Frag(s, Seq.fill(s.length)(false))
  }

  /** Quoted literal (single or double) with doubled-quote AND backslash
    * escapes; body never contains the delimiter or a backslash except as
    * an explicit escape pair (a backslash always travels with its escaped
    * char, so the constructed span truth is exact). */
  private def literalFrag(rnd: scala.util.Random): Frag = {
    val q = if (rnd.nextBoolean()) '\'' else '"'
    val body = new StringBuilder
    (0 until rnd.nextInt(4)).foreach { _ =>
      rnd.nextInt(5) match {
        case 0 => body.append(q).append(q) // doubled-quote escape
        case 1 => // backslash escape: \' \" \\ \; \n-the-letter …
          val escapable = "'\"\\;n staxb"
          body.append('\\')
            .append(escapable.charAt(rnd.nextInt(escapable.length)))
        case _ => body.append(run(rnd, spicyChars, 1 + rnd.nextInt(5))
          .replace(q.toString, ""))
      }
    }
    val s = s"$q$body$q"
    Frag(s, Seq.fill(s.length)(true))
  }

  /** `-- …\n` — body has no newline; the `\n` terminator itself is NOT
    * part of the span (the scanner leaves it outside, so a following
    * fragment starts clean). */
  private def lineCommentFrag(rnd: scala.util.Random): Frag = {
    val body = run(rnd, spicyChars, rnd.nextInt(8)).replace("\n", "")
    Frag(s"--$body\n", Seq.fill(2 + body.length)(true) :+ false)
  }

  /** Bracketed comment; body is delimiter-free runs plus (recursively)
    * whole nested bracketed comments — balanced by construction. */
  private def blockCommentFrag(rnd: scala.util.Random, depth: Int = 0)
      : Frag = {
    val body = new StringBuilder
    (0 until rnd.nextInt(4)).foreach { _ =>
      if (depth < 2 && rnd.nextInt(4) == 0)
        body.append(blockCommentFrag(rnd, depth + 1).text)
      else // no '*' or '/' in plain runs: no accidental delimiters
        body.append(run(rnd, "ab; -'\"=9".toCharArray, 1 + rnd.nextInt(5)))
    }
    val s = s"/*$body*/"
    Frag(s, Seq.fill(s.length)(true))
  }

  private def statement(rnd: scala.util.Random, allowSemi: Boolean): Frag = {
    // open with plain code so a statement never begins inside a span and
    // never trims to empty (split-stability for the splitter property)
    val opener = "s" + run(rnd, "abcXYZ019".toCharArray, 2)
    val frags = Frag(opener, Seq.fill(opener.length)(false)) +:
      Seq.fill(rnd.nextInt(6)) {
        rnd.nextInt(4) match {
          case 0 => codeFrag(rnd, allowSemi)
          case 1 => literalFrag(rnd)
          case 2 => lineCommentFrag(rnd)
          case 3 => blockCommentFrag(rnd)
        }
      }
    val text = frags.map(_.text).mkString
    Frag(text, frags.flatMap(f => f.inside.take(f.text.length)))
  }

  test("literalSpans matches the constructed truth on assembled SQL") {
    val rnd = new scala.util.Random(42)
    (1 to 300).foreach { i =>
      val st = statement(rnd, allowSemi = true)
      val got = LakeSql.literalSpans(st.text).toSeq
      assert(got == st.inside,
        s"iteration $i diverged on:\n${st.text}\n" +
          s"got:      ${got.map(b => if (b) '1' else '0').mkString}\n" +
          s"expected: ${st.inside.map(b => if (b) '1' else '0').mkString}")
    }
  }

  test("unterminated literal or bracket comment marks through to the " +
      "end (fail-safe: never treated as code)") {
    // the last two: a backslash-escaped delimiter (and a trailing lone
    // backslash) must keep the literal open, never close it early
    Seq("SELECT 'open", "SELECT \"open", "SELECT /* open /* deep */",
        "SELECT 'a\\';b", "SELECT 'a\\")
      .foreach { s =>
        val in = LakeSql.literalSpans(s)
        val start = s.indexWhere(c => c == '\'' || c == '"' || c == '/')
        assert((start until s.length).forall(in(_)), s)
      }
  }

  test("splitTopSemis reassembles exactly the generated statement list") {
    val rnd = new scala.util.Random(7)
    (1 to 300).foreach { i =>
      // statements themselves carry NO top-level semicolons (allowSemi =
      // false keeps them out of code runs; literals/comments still get
      // them), so the join points are the only true boundaries
      val stmts = Seq.fill(1 + rnd.nextInt(5))(
        statement(rnd, allowSemi = false).text)
      val joined = stmts.mkString(";")
      val got = LakeSql.splitTopSemis(joined)
      assert(got == stmts.map(_.trim).filter(_.nonEmpty),
        s"iteration $i fragmented wrongly on:\n$joined\ngot: $got")
    }
  }
}

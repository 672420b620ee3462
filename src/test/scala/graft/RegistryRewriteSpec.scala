package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Registry0

/** The oracle-text rewriters are applied to EVERY registered oracle
  * (Registry0.e / eRawDims) with no gate between a bad rewrite and a
  * malformed oracle — so the lexer rules (skip literals, quoted
  * identifiers, -- comments; scan parens across them) are pinned here
  * on adversarial fragments rather than discovered at gate time.
  */
class RegistryRewriteSpec extends AnyFunSuite {

  private val hop = (a: String) => s"CAST(CAST($a AS VARCHAR) AS DOUBLE)"

  test("simple scalar cast gets the VARCHAR hop") {
    assert(Registry0.portableDoubleOut("SELECT CAST(x AS DOUBLE) FROM t")
      === s"SELECT ${hop("x")} FROM t")
  }

  test("nested casts: outer hopped, inner argument recursed") {
    val in = "CAST(CAST(sum(x) AS DOUBLE) / 7 AS DOUBLE)"
    assert(Registry0.portableDoubleOut(in)
      === hop(s"${hop("sum(x)")} / 7"))
  }

  test("case-insensitive match without uppercased-copy indexing") {
    assert(Registry0.portableDoubleOut("cast(x as double)") ===
      "CAST(CAST(x AS VARCHAR) AS DOUBLE)")
    // non-ASCII text whose uppercase mapping changes length ('ß'→"SS")
    // before the cast must not shift the rewrite window
    val in = "SELECT 'straße', CAST(x AS DOUBLE) FROM t"
    assert(Registry0.portableDoubleOut(in)
      === s"SELECT 'straße', ${hop("x")} FROM t")
  }

  test("AS DOUBLE[] (array type) is left alone") {
    val in = "SELECT CAST(xs AS DOUBLE[]) FROM t"
    assert(Registry0.portableDoubleOut(in) === in)
  }

  test("unbalanced paren inside a string literal does not derail depth") {
    val in = "SELECT CAST(len(regexp_extract(s, '\\(', 0)) AS DOUBLE), y FROM t"
    assert(Registry0.portableDoubleOut(in)
      === s"SELECT ${hop("len(regexp_extract(s, '\\(', 0))")}, y FROM t")
  }

  test("escaped '' inside a literal keeps the literal one island") {
    val in = "SELECT CAST(instr(s, 'it''s (') AS DOUBLE) FROM t"
    assert(Registry0.portableDoubleOut(in)
      === s"SELECT ${hop("instr(s, 'it''s (')")} FROM t")
  }

  test("CAST text inside a literal or comment is not rewritten") {
    val lit = "SELECT 'CAST(x AS DOUBLE)' AS s FROM t"
    assert(Registry0.portableDoubleOut(lit) === lit)
    val cmt = "SELECT y -- CAST(x AS DOUBLE)\nFROM t"
    assert(Registry0.portableDoubleOut(cmt) === cmt)
  }

  test("unbalanced paren inside a -- comment does not derail depth") {
    val in = "SELECT CAST(x + -- stray ( paren\n y AS DOUBLE) FROM t"
    assert(Registry0.portableDoubleOut(in)
      === s"SELECT ${hop("x + -- stray ( paren\n y")} FROM t")
  }

  test("arg ending in an open comment gets the comment re-terminated") {
    // the comment's terminating newline is consumed by the AS-DOUBLE
    // whitespace match; without re-termination the appended
    // " AS VARCHAR…" would be swallowed into the comment
    val in = "SELECT CAST(x -- note\n AS DOUBLE) FROM t"
    assert(Registry0.portableDoubleOut(in) ===
      "SELECT CAST(CAST(x -- note\n AS VARCHAR) AS DOUBLE) FROM t")
  }

  test("a quoted identifier with parens is scanned across, not into") {
    val in = "SELECT CAST(\"weird (col\" AS DOUBLE) FROM t"
    assert(Registry0.portableDoubleOut(in)
      === s"SELECT ${hop("\"weird (col\"")} FROM t")
  }

  test("portableCasts skips literals and comments") {
    val in = "SELECT CAST(c_acctbal AS DECIMAL(10,2)), " +
      "'CAST(x AS DECIMAL(10,2))' AS s -- CAST(y AS DECIMAL(9,1))\nFROM t"
    val out = Registry0.portableCasts(in)
    assert(out.contains("CASE WHEN isnan(c_acctbal)"))
    assert(out.contains("'CAST(x AS DECIMAL(10,2))'"))
    assert(out.contains("-- CAST(y AS DECIMAL(9,1))"))
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tokenization and shingling shared by text analysis + dedup, with exact
  * DuckDB SQL mirrors (the oracle must reproduce every intermediate).
  *
  * Everything is built from engine-portable primitives: lower/trim,
  * single-space split, word 3-gram shingles. Spark arrays are 0-indexed,
  * DuckDB lists 1-indexed — the mirrors account for that.
  */
object TextOps {

  /** Whitespace-collapsed, lower-cased normalization. */
  def normText(c: Column): Column = lower(trim(regexp_replace(c, "\\s+", " ")))

  def sqlNormText(expr: String): String =
    s"lower(trim(regexp_replace($expr, '\\s+', ' ', 'g')))"

  /** Tokens of the normalized text. */
  def tokens(c: Column): Column = split(normText(c), " ")

  def sqlTokens(expr: String): String = s"string_split(${sqlNormText(expr)}, ' ')"

  /** Word 3-gram shingles (empty array below 3 tokens). */
  def shingles(toksCol: String): Column = expr(
    s"""CASE WHEN size($toksCol) >= 3
       |  THEN transform(sequence(0, size($toksCol) - 3),
       |                 i -> concat($toksCol[i], ' ', $toksCol[i+1], ' ', $toksCol[i+2]))
       |  ELSE array() END""".stripMargin)

  /** DuckDB mirror of [[shingles]] over a list-typed column/expr. */
  def sqlShingles(toksExpr: String): String =
    s"""list_transform(range(1, greatest(len($toksExpr) - 1, 1)),
       |               i -> concat($toksExpr[i], ' ', $toksExpr[i+1], ' ', $toksExpr[i+2]))""".stripMargin
}

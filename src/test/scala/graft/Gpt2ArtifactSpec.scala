package graft

import graft.functions.Bpe
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** GPT-2 published-artifact interop (r16 — the r15 verdict's #4,
  * zero-egress scope): the exact published byte↔unicode bijection, the
  * published merges.txt/vocab.json formats loaded and encoded to token
  * IDS, and the ONE remaining pretok divergence pinned with exact
  * divergent inputs against the stock pattern (Java regex supports the
  * lookahead RE2 cannot, so the spec computes BOTH sides). */
class Gpt2ArtifactSpec extends SparkSpec {

  test("bytes_to_unicode pins the published bijection (Ġ/Ċ markers, 188 self-mapped)") {
    val m = Bpe.Gpt2ByteToChar
    assert(m.length === 256)
    assert(m.distinct.length === 256, "must be a bijection")
    assert(m(' '.toInt) === 'Ġ', "space renders Ġ — the published marker")
    assert(m('\n'.toInt) === 'Ċ', "newline renders Ċ")
    assert(m('\t'.toInt) === 'ĉ')
    assert(m(0) === 'Ā', "byte 0 is the first shifted point U+0100")
    assert(m('a'.toInt) === 'a' && m('!'.toInt) === '!' && m('~'.toInt) === '~')
    val selfMapped = m.zipWithIndex.count { case (c, b) => c.toInt == b }
    assert(selfMapped === 188, "['!','~'] + ['¡','¬'] + ['®','ÿ'] = 94+12+82")
    // render/unrender round-trips every byte; foreign chars refuse loud
    (0 until 256).foreach { b =>
      val s = b.toChar.toString
      assert(Bpe.gpt2Unrender(Bpe.gpt2Render(s)) === s)
    }
    val e = intercept[IllegalArgumentException](Bpe.gpt2Unrender("Ω"))
    assert(e.getMessage.contains("byte alphabet"))
  }

  test("published merges.txt + vocab.json load and encode to exact token ids") {
    import spark.implicits._
    val dir = Files.createTempDirectory("gpt2art").toString
    // the published format: #version header, printable-alphabet pairs
    Files.write(Paths.get(s"$dir/merges.txt"),
      "#version: 0.2\nĠ t\nh e\nĠt he\n".getBytes("UTF-8"))
    Files.write(Paths.get(s"$dir/vocab.json"),
      """{"t": 83, "he": 258, "Ġthe": 262}""".getBytes("UTF-8"))
    val table = Bpe.loadGpt2Merges(spark, s"$dir/merges.txt")
    assert(table.merges === Seq((" ", "t"), ("h", "e"), (" t", "he")),
      "printable pairs unrender into the leg's latin1 byte alphabet")
    val vocab = Bpe.loadGpt2Vocab(spark, s"$dir/vocab.json")
    assert(vocab === Map("t" -> 83, "he" -> 258, " the" -> 262))
    val df = Seq("the the").toDF("text")
      .select(Bpe.tokenIdsGpt2(col("text"), table.merges, vocab).as("ids"),
        Bpe.encodeTokensGpt2(col("text"), table.merges).as("toks"))
    val row = df.head()
    assert(row.getSeq[String](1).map(Bpe.gpt2Render) === Seq("t", "he", "Ġthe"),
      "rendered tokens are the published-alphabet forms")
    assert(row.getSeq[Int](0) === Seq(83, 258, 262))
    // a token outside the vocab surfaces as -1, never silently drops
    val partial = Bpe.loadGpt2Vocab(spark, s"$dir/vocab.json") - "t"
    val ids2 = Seq("the").toDF("text")
      .select(Bpe.tokenIdsGpt2(col("text"), table.merges, partial).as("ids"))
      .head().getSeq[Int](0)
    assert(ids2 === Seq(-1, 258))
  }

  test("a '# #' merge after the version header survives loading (only the header drops)") {
    val dir = Files.createTempDirectory("gpt2hash").toString
    Files.write(Paths.get(s"$dir/merges.txt"),
      "#version: 0.2\n# #\nĠ t\n".getBytes("UTF-8"))
    val table = Bpe.loadGpt2Merges(spark, s"$dir/merges.txt")
    assert(table.merges === Seq(("#", "#"), (" ", "t")),
      "the '# #' merge is a legal pair and must keep its rank")
  }

  test("tampered published artifacts refuse loud (shuffled ranks, malformed line)") {
    val dir = Files.createTempDirectory("gpt2bad").toString
    // rank order shuffled: the composed merge now precedes its parts
    Files.write(Paths.get(s"$dir/merges.txt"),
      "Ġt he\nĠ t\nh e\n".getBytes("UTF-8"))
    val e1 = intercept[IllegalArgumentException](
      Bpe.loadGpt2Merges(spark, s"$dir/merges.txt"))
    assert(e1.getMessage.contains("topologically valid"))
    Files.write(Paths.get(s"$dir/merges2.txt"), "Ġ t extra\n".getBytes("UTF-8"))
    val e2 = intercept[IllegalArgumentException](
      Bpe.loadGpt2Merges(spark, s"$dir/merges2.txt"))
    assert(e2.getMessage.contains("not 'left right'"))
  }

  test("the ONE remaining divergence — the RE2-safe trailing-space rule — pinned on " +
    "exact inputs against the stock pattern") {
    val stock = """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
    def tile(pattern: String, s: String): Seq[String] = {
      val m = java.util.regex.Pattern.compile(pattern).matcher(s)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (m.find()) out += m.group()
      assert(out.mkString === s, s"pattern must tile '$s' completely")
      out.toSeq
    }
    // divergent input: a multi-space gap. Stock's lookahead re-attaches
    // the LAST gap space to the following word; the RE2-safe rule keeps
    // the whole run together.
    assert(tile(stock, "a  b") === Seq("a", " ", " b"))
    assert(tile(Bpe.PretokPattern, "a  b") === Seq("a", "  ", "b"))
    assert(tile(stock, "x   y") === Seq("x", "  ", " y"))
    assert(tile(Bpe.PretokPattern, "x   y") === Seq("x", "   ", "y"))
    // agreement everywhere else: single-space prose, contractions,
    // punctuation, digits, trailing whitespace
    Seq("hello world", "it's 42 tokens, ok?", "tab\tsep", "end  ").foreach { s =>
      assert(tile(stock, s) === tile(Bpe.PretokPattern, s),
        s"patterns must agree on '$s'")
    }
  }
}

package graft

import graft.operators.Multimodal

/** Every registered operator runs at sf0.001 and the driver's flagship
  * entry returns rows (correctness-against-oracle is the driver gate;
  * this is the fast regression net). */
class OperatorSmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("documents fixture is pure ASCII (mm_features oracle precondition)") {
    import org.apache.spark.sql.functions._
    val bad = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(length(encode(col("text"), "UTF-8")) =!= length(col("text"))).count()
    assert(bad == 0, "non-ASCII text would break the byte==char oracle mirror")
  }

  test("every registered query key has a full oracle — no rows-only checks") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"queries without an oracle: $rowsOnly")
  }

  test("registered query names are unique (a duplicate would silently drop one in the map)") {
    val names = SparkEntry.allDefs.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate query keys: $dups")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("ivf recall curve is monotone in nProbe and exhaustive probing is exact") {
    val t = graft.sources.Tables(spark, sf0001)
    val rows = graft.operators.Similarity.ivfRecall(t)
      .collect().map(r => r.getAs[Int]("n_probe") -> r.getAs[Double]("recall")).toSeq
    assert(rows.map(_._1) == rows.map(_._1).sorted)
    val recalls = rows.map(_._2)
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a }, s"not monotone: $rows")
    assert(recalls.last == 1.0, s"nProbe = nlist must recover exact top-k: $rows")
  }

  test("fakeDecode is deterministic and shaped") {
    val f = Multimodal.fakeDecode("hello".getBytes("UTF-8"))
    assert(f.length == 4 && f(0) == 5.0f)
    assert(f.toSeq == Multimodal.fakeDecode("hello".getBytes("UTF-8")).toSeq)
  }
}

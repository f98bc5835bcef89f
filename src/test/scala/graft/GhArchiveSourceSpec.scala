package graft

import graft.sources.GhArchiveSource
import java.nio.file.Files

class GhArchiveSourceSpec extends SparkSpec {

  private val sample =
    """{"id":"1","type":"PushEvent","public":true,"created_at":"2015-01-01T15:00:01Z","actor":{"id":10,"login":"alice","gravatar_id":"","avatar_url":"http://a/10","url":"http://api/users/alice"},"repo":{"id":100,"name":"alice/repo","url":"http://api/repos/alice/repo"},"payload":{"push_id":1,"size":1}}
      |{"id":"2","type":"WatchEvent","public":true,"created_at":"2015-01-01T15:00:02Z","actor":{"id":11,"login":"bob","gravatar_id":"","avatar_url":"http://a/11","url":"http://api/users/bob"},"repo":{"id":100,"name":"alice/repo","url":"http://api/repos/alice/repo"},"org":{"id":20,"login":"acme","gravatar_id":"","avatar_url":"http://a/20","url":"http://api/orgs/acme"},"payload":{"action":"started"}}
      |{"id":"3","type":"PushEvent","public":false,"created_at":"2015-01-01T15:00:03Z","actor":{"id":10,"login":"alice","gravatar_id":"","avatar_url":"http://a/10","url":"http://api/users/alice"},"repo":{"id":101,"name":"bob/other","url":"http://api/repos/bob/other"},"payload":{}}""".stripMargin

  private lazy val path = {
    val dir = Files.createTempDirectory("gharchive")
    val f = dir.resolve("2015-01-01-15.json")
    Files.writeString(f, sample)
    f.toString
  }

  test("silver read: schema applied, payload/other dropped, timestamp parsed") {
    val silver = GhArchiveSource.readJson(spark, path)
    assert(silver.count() == 3)
    assert(!silver.columns.contains("payload") && !silver.columns.contains("other"))
    assert(silver.schema("created_at").dataType.typeName == "timestamp")
    val ts = silver.selectExpr("min(created_at)").collect()(0).getTimestamp(0)
    assert(ts.toInstant.toString == "2015-01-01T15:00:01Z")
  }

  test("reads the wire format the archive actually serves: gzipped hourly .json.gz") {
    // the reference downloads https://data.gharchive.org/YYYY-MM-DD-H.json.gz
    // (load_data.py:25) and decompresses by hand; Spark's json source
    // decodes the gzip codec by extension, so the silver read takes the
    // raw downloaded file directly
    val dir = Files.createTempDirectory("ghgz")
    val gz = dir.resolve("2015-01-01-15.json.gz")
    val out = new java.util.zip.GZIPOutputStream(java.nio.file.Files.newOutputStream(gz))
    out.write(sample.getBytes("UTF-8")); out.close()
    val silver = GhArchiveSource.readJson(spark, gz.toString)
    assert(silver.count() == 3)
    assert(silver.selectExpr("count(DISTINCT type)").head().getLong(0) == 2)
  }

  test("dead-letter read separates malformed lines from parsed events") {
    val dir = Files.createTempDirectory("ghbad")
    Files.writeString(dir.resolve("mixed.json"),
      sample + "\n{this is not json at all\n" + """{"id":"4","type":"ForkEvent","public":true,"created_at":"2015-01-01T15:00:04Z","actor":{"id":12,"login":"carol","gravatar_id":"","avatar_url":"http://a/12","url":"http://api/users/carol"},"repo":{"id":102,"name":"carol/x","url":"http://api/repos/carol/x"},"payload":{}}""")
    val dl = GhArchiveSource.readJsonWithDeadLetter(spark, dir.toString)
    try {
      assert(dl.good.count() == 4)
      assert(dl.bad.count() == 1)
      assert(dl.bad.collect()(0).getString(0).startsWith("{this is not json"))
    } finally dl.release()
  }

  test("synthetic generator: dims have the declared cardinalities at 10k events") {
    val silver = GhArchiveSource.synthetic(spark, 10000)
    assert(silver.count() == 10000)
    assert(GhArchiveSource.users(silver).count() == 1000)
    assert(GhArchiveSource.repos(silver).count() == 500)
    // org id = id%100 but events with id%5==0 are org-less, and 100 | 5·20:
    // org ids divisible by 5 never surface → 80 distinct orgs
    assert(GhArchiveSource.organizations(silver).count() == 80)
    assert(GhArchiveSource.events(silver).count() == 10000)
  }

  test("gold dims: distinct users/repos/orgs and flattened events") {
    val silver = GhArchiveSource.readJson(spark, path)
    assert(GhArchiveSource.users(silver).count() == 2)   // alice, bob
    assert(GhArchiveSource.repos(silver).count() == 2)   // two repos
    assert(GhArchiveSource.organizations(silver).count() == 1) // acme (null org dropped)
    val ev = GhArchiveSource.events(silver)
    assert(ev.count() == 3)
    assert(ev.columns.toSeq == Seq("actor_id", "org_id", "id", "created_at", "type", "public", "repo_id", "repo_name", "repo_url"))
  }
}

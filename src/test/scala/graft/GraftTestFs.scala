package graft

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem

/** A LocalFS-backed Hadoop filesystem under the fake scheme
  * `graftfs:` — lets specs drive the Iceberg publication seam
  * (create → deletes → compact → expire) through a NON-`file:` scheme
  * end to end, the object-store shape the r12 verdict found untested,
  * without needing a real store in the sandbox. Registered through
  * `META-INF/services/org.apache.hadoop.fs.FileSystem` so EVERY
  * `Configuration` resolves it (the writer's internals and the
  * Hadoop-catalog commit build their own configs). */
class GraftTestFs extends RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: URI = URI.create("graftfs:///")
}

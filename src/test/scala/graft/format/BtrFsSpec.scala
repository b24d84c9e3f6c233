package graft.format

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** The commit protocol (no-clobber version claims, journaled swaps)
  * assumes atomic rename. Known copy+delete-rename object stores must
  * be refused loudly at every mutation entry point — corrupting quietly
  * under concurrent writers is the one unacceptable behavior.
  */
class BtrFsSpec extends AnyFunSuite {

  test("scheme predicate: HDFS family atomic, S3 family not, unknown undecided") {
    assert(BtrFs.renameAtomicity("hdfs") == Some(true))
    assert(BtrFs.renameAtomicity("file") == Some(true))
    assert(BtrFs.renameAtomicity("abfss") == Some(true))
    assert(BtrFs.renameAtomicity("s3a") == Some(false))
    assert(BtrFs.renameAtomicity("S3A") == Some(false))
    assert(BtrFs.renameAtomicity("gs") == Some(false))
    assert(BtrFs.renameAtomicity("wasb") == Some(false))
    assert(BtrFs.renameAtomicity("my-future-fs") == None)
    assert(BtrFs.renameAtomicity(null) == Some(true)) // schemeless = local
  }

  // a local FS masquerading as s3a — only getUri is consulted
  private def fakeS3(conf: Configuration) = {
    val fs = new org.apache.hadoop.fs.RawLocalFileSystem() {
      override def getUri: java.net.URI = new java.net.URI("s3a://bucket/")
    }
    fs.setConf(conf)
    fs
  }

  test("a known non-atomic-rename scheme is refused with guidance") {
    val e = intercept[IllegalStateException] {
      BtrFs.requireAtomicRename(fakeS3(new Configuration()), new Path("s3a://bucket/t"))
    }
    assert(e.getMessage.contains("copy+delete") &&
      e.getMessage.contains("btr.unsafeAllowNonAtomicRename"), e.getMessage)
  }

  test("the single-writer escape hatch admits the scheme") {
    val conf = new Configuration()
    conf.set("btr.unsafeAllowNonAtomicRename", "true")
    BtrFs.requireAtomicRename(fakeS3(conf), new Path("s3a://bucket/t")) // no throw
  }

  test("local and HDFS-semantics schemes pass") {
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(new Configuration())
    BtrFs.requireAtomicRename(fs, new Path("/tmp/anything")) // no throw
  }
}

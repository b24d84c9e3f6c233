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
      BtrFs.requireCommitCapable(fakeS3(new Configuration()), new Path("s3a://bucket/t"))
    }
    assert(e.getMessage.contains("copy+delete") &&
      e.getMessage.contains("btr.unsafeAllowNonAtomicRename"), e.getMessage)
  }

  test("the single-writer escape hatch admits the scheme") {
    val conf = new Configuration()
    conf.set("btr.unsafeAllowNonAtomicRename", "true")
    BtrFs.requireCommitCapable(fakeS3(conf), new Path("s3a://bucket/t")) // no throw
  }

  test("local and HDFS-semantics schemes pass") {
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(new Configuration())
    BtrFs.requireCommitCapable(fs, new Path("/tmp/anything")) // no throw
  }

  test("conditional-put protocol admits object-store schemes") {
    val conf = new Configuration()
    conf.set(BtrCommitProtocol.ConfKey, "conditional-put")
    BtrFs.requireCommitCapable(fakeS3(conf), new Path("s3a://bucket/t")) // no throw
  }

  test("an unknown commit protocol value is refused loudly") {
    val conf = new Configuration()
    conf.set(BtrCommitProtocol.ConfKey, "banana")
    val e = intercept[IllegalArgumentException] {
      BtrFs.requireCommitCapable(fakeS3(conf), new Path("s3a://bucket/t"))
    }
    assert(e.getMessage.contains("banana"), e.getMessage)
  }

  /** An object store in miniature: rename is COPY+DELETE (non-atomic,
    * silently clobbering — the S3 shape), while create-no-overwrite is
    * a genuinely atomic compare-and-put (CREATE_NEW — what S3
    * If-None-Match / GCS ifGenerationMatch=0 provide).
    */
  private class MockObjectStore extends org.apache.hadoop.fs.RawLocalFileSystem {
    override def rename(src: Path, dst: Path): Boolean = {
      if (!exists(src)) return false
      val in = open(src)
      val out = super.create(dst, true)
      try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096)
      finally { in.close(); out.close() }
      delete(src, false)
      true
    }
    override def create(f: Path, overwrite: Boolean)
        : org.apache.hadoop.fs.FSDataOutputStream =
      if (overwrite) super.create(f, true)
      else {
        val local = pathToFile(f).toPath
        java.nio.file.Files.createDirectories(local.getParent)
        val os = java.nio.file.Files.newOutputStream(local,
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        new org.apache.hadoop.fs.FSDataOutputStream(os, null)
      }
  }

  private def mockStore(): org.apache.hadoop.fs.FileSystem = {
    val conf = new Configuration()
    conf.set(BtrCommitProtocol.ConfKey, "conditional-put")
    val fs = new MockObjectStore
    fs.initialize(java.net.URI.create("file:///"), conf)
    fs
  }

  test("putIfAbsent on a copy+delete-rename store: exactly one of N racing claimers wins") {
    val fs = mockStore()
    val dir = new java.io.File("/tmp/btr-fs-spec/claim-race")
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    dir.mkdirs()
    val dst = new Path(dir.getAbsolutePath, "v1.json")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val barrier = new java.util.concurrent.CyclicBarrier(8)
    (0 until 8).foreach { i =>
      pool.submit(new Runnable {
        def run(): Unit = {
          barrier.await()
          if (ConditionalPutCommit.putIfAbsent(fs, dst, s"body-$i".getBytes))
            wins.incrementAndGet()
        }
      })
    }
    pool.shutdown()
    assert(pool.awaitTermination(30, java.util.concurrent.TimeUnit.SECONDS))
    assert(wins.get() == 1, s"expected exactly one winner, got ${wins.get()}")
  }

  test("two committers racing full log claims on the mock store serialize to distinct versions") {
    val fs = mockStore()
    val dir = new java.io.File("/tmp/btr-fs-spec/log-race")
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    dir.mkdirs()
    val root = fs.makeQualified(new Path(dir.getAbsolutePath))
    graft.sources.BtrLog.record(fs, root, "write")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val barrier = new java.util.concurrent.CyclicBarrier(8)
    val claimed = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    (0 until 8).foreach { i =>
      pool.submit(new Runnable {
        def run(): Unit = {
          barrier.await()
          claimed.add(graft.sources.BtrLog.recordDelta(
            fs, root, "append", added = Seq(s"f$i.btr"), removed = Nil))
        }
      })
    }
    pool.shutdown()
    assert(pool.awaitTermination(60, java.util.concurrent.TimeUnit.SECONDS))
    assert(claimed.size() == 8, s"every committer must land on its own version: $claimed")
    // every claimed version resolves and the final snapshot holds all adds
    val latest = graft.sources.BtrLog.latestVersion(fs, root).get
    val snap = graft.sources.BtrLog.resolveSnapshot(fs, root, latest)
    (0 until 8).foreach(i => assert(snap.fileSet.contains(s"f$i.btr")))
  }
}

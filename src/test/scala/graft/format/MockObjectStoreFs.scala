package graft.format

import org.apache.hadoop.fs.{FSDataOutputStream, Path}

/** An object store in miniature, registered as a real Hadoop scheme
  * (`fs.mockobj.impl`) so the WHOLE engine — Spark scans, writers, DML,
  * maintenance, the log — can run on it end to end: rename is
  * COPY+DELETE (non-atomic, silently clobbering — the S3 shape; a
  * directory rename is emulated object-by-object), while
  * `create(f, overwrite = false)` is a genuinely atomic compare-and-put
  * (`CREATE_NEW` — what S3 `If-None-Match` PUT / GCS
  * `ifGenerationMatch=0` provide).
  *
  * The instance scopes `btr.commitProtocol=conditional-put` to its own
  * conf COPY, so tables on this scheme exercise the object-store commit
  * protocol while local-FS tables in the same session keep rename
  * commits — mirroring a real mixed deployment.
  */
class MockObjectStoreFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mockobj"
  override def getUri: java.net.URI = java.net.URI.create("mockobj:///")

  override def initialize(uri: java.net.URI,
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    val scoped = new org.apache.hadoop.conf.Configuration(conf)
    scoped.set(BtrCommitProtocol.ConfKey, "conditional-put")
    super.initialize(uri, scoped)
  }

  override def rename(src: Path, dst: Path): Boolean = {
    if (!exists(src)) return false
    if (getFileStatus(src).isDirectory) {
      mkdirs(dst)
      listStatus(src).foreach(c => rename(c.getPath, new Path(dst, c.getPath.getName)))
      delete(src, true)
      return true
    }
    val in = open(src)
    val out = super.create(dst, true)
    try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192)
    finally { in.close(); out.close() }
    delete(src, false)
    true
  }

  override def create(f: Path, overwrite: Boolean): FSDataOutputStream =
    if (overwrite) super.create(f, true)
    else {
      val local = pathToFile(f).toPath
      java.nio.file.Files.createDirectories(local.getParent)
      val os = java.nio.file.Files.newOutputStream(local,
        java.nio.file.StandardOpenOption.CREATE_NEW,
        java.nio.file.StandardOpenOption.WRITE)
      new FSDataOutputStream(os, null)
    }
}

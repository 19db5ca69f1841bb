package graft

/** A local-disk FileSystem registered under a NON-default URI scheme — the
  * spec stand-in for an object-store connector in the zero-egress test
  * container. Registering it via `fs.graftfs.impl` and addressing it with
  * `graftfs://` paths exercises exactly the plumbing a real `s3a://` /
  * `abfs://` deployment uses (scheme → FileSystem resolution off the
  * session Hadoop conf); only the byte transport differs. */
class SchemeTestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")
  override def getScheme: String = "graftfs"
  override def open(f: org.apache.hadoop.fs.Path, bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream = {
    SchemeTestFs.opens.incrementAndGet()
    super.open(f, bufferSize)
  }
}

/** Content-read counter: cheap-mode copyUpdate must re-sync an unchanged
  * tree without OPENING a single destination file (listing only). */
object SchemeTestFs {
  val opens = new java.util.concurrent.atomic.AtomicInteger(0)
}

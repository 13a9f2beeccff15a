package graft

/** Test helper: content fingerprints of every file under a directory, for
  * asserting that an append-mode index write never rewrites existing files.
  */
object FileSnapshots {
  /** relative path → (size, md5-of-contents) for every regular file. */
  def snapshot(root: String): Map[String, (Long, String)] = {
    import scala.jdk.CollectionConverters._
    val r = java.nio.file.Paths.get(root)
    val stream = java.nio.file.Files.walk(r)
    try stream.iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .map { p =>
        val bytes = java.nio.file.Files.readAllBytes(p)
        val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        (r.relativize(p).toString,
          (bytes.length.toLong, md.map("%02x".format(_)).mkString))
      }.toMap
    finally stream.close()
  }
}

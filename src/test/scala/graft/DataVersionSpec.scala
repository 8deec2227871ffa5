package graft

import org.scalatest.funsuite.AnyFunSuite

/** The memo-invalidation contract every per-dataset cache (IVF/PQ/BPE
  * models, winnow pairs, PQ stored indexes) keys through: same data →
  * same key (the memo actually memoizes), rewritten data → new key
  * (regenerated testdata can never serve a stale artifact — the
  * round-8/9 advisory).
  */
class DataVersionSpec extends AnyFunSuite {

  private def writeTable(dir: java.io.File, bytes: Array[Byte]): Unit = {
    val t = new java.io.File(dir, "documents.parquet")
    val out = new java.io.FileOutputStream(t)
    try out.write(bytes) finally out.close()
  }

  test("fingerprint is stable for unchanged data, changes on rewrite") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dv").toFile
    try {
      writeTable(dir, Array[Byte](1, 2, 3))
      val f1 = DataVersion.fingerprint(dir.getPath, "documents")
      val f2 = DataVersion.fingerprint(dir.getPath, "documents")
      assert(f1 === f2)
      // a rewrite with different content (size change) keys differently
      writeTable(dir, Array[Byte](1, 2, 3, 4))
      assert(DataVersion.fingerprint(dir.getPath, "documents") !== f1)
      // ...and so does a same-size rewrite with a newer mtime
      val f3 = DataVersion.fingerprint(dir.getPath, "documents")
      new java.io.File(dir, "documents.parquet")
        .setLastModified(System.currentTimeMillis() + 5000)
      assert(DataVersion.fingerprint(dir.getPath, "documents") !== f3)
    } finally {
      Option(dir.listFiles()).foreach(_.foreach(_.delete()))
      dir.delete()
    }
  }

  test("keys separate tags and datasets; directory-parquet is supported") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dv2").toFile
    try {
      // directory-style parquet (a folder of part files)
      val sub = new java.io.File(dir, "documents.parquet")
      sub.mkdir()
      val part = new java.io.File(sub, "part-0.parquet")
      val out = new java.io.FileOutputStream(part)
      try out.write(Array[Byte](9, 9)) finally out.close()
      val k1 = DataVersion.key(dir.getPath, "documents", "ivf")
      val k2 = DataVersion.key(dir.getPath, "documents", "pq256")
      assert(k1 !== k2)
      assert(k1.contains(dir.getPath))
      // part-file rewrite invalidates the directory form too
      val f1 = DataVersion.fingerprint(dir.getPath, "documents")
      val out2 = new java.io.FileOutputStream(part)
      try out2.write(Array[Byte](9, 9, 9)) finally out2.close()
      assert(DataVersion.fingerprint(dir.getPath, "documents") !== f1)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir)
    }
  }
}

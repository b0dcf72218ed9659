package graft.io

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's FileIO suite (io/local_test.go, 289 LoC) —
  * create/open, lengths, delete, exists, mkdir-p, overwrite semantics,
  * empty files, ranged reads — against the Hadoop-backed impl. */
class FileIOSpec extends AnyFunSuite {
  private def fresh(): (FileIO, String) = {
    val dir = Files.createTempDirectory("graft-io-").toString
    (new HadoopFileIO(), dir)
  }

  test("create and open (local_test.go:11-80)") {
    val (io, dir) = fresh()
    val p = s"$dir/a.txt"
    io.writeString(p, "hello world")
    assert(io.readString(p) == "hello world")
    assert(io.exists(p))
    assert(io.length(p) == 11L)
  }

  test("create fails on existing file without overwrite (O_EXCL)") {
    val (io, dir) = fresh()
    val p = s"$dir/b.txt"
    io.writeString(p, "one")
    intercept[Exception](io.writeString(p, "two"))
    assert(io.readString(p) == "one")
    io.writeString(p, "three", overwrite = true)
    assert(io.readString(p) == "three")
  }

  test("create makes parent directories (local_test.go:142-173)") {
    val (io, dir) = fresh()
    val p = s"$dir/x/y/z/deep.txt"
    io.writeString(p, "deep")
    assert(io.readString(p) == "deep")
  }

  test("delete and exists") {
    val (io, dir) = fresh()
    val p = s"$dir/d.txt"
    io.writeString(p, "bye")
    assert(io.exists(p))
    io.delete(p)
    assert(!io.exists(p))
  }

  test("empty file round-trips") {
    val (io, dir) = fresh()
    val p = s"$dir/empty.txt"
    io.writeAllBytes(p, Array.emptyByteArray)
    assert(io.exists(p))
    assert(io.length(p) == 0L)
    assert(io.readAllBytes(p).isEmpty)
  }

  test("ranged reads (io/fileio.go:42)") {
    val (io, dir) = fresh()
    val p = s"$dir/r.txt"
    io.writeString(p, "0123456789")
    val in = io.openRange(p, 3, 4)
    try assert(new String(in.readAllBytes()) == "3456")
    finally in.close()
  }

  test("bulk delete and recursive list (io/fileio.go:68-76)") {
    val (io, dir) = fresh()
    io.writeString(s"$dir/l/a.txt", "a")
    io.writeString(s"$dir/l/sub/b.txt", "b")
    val listed = io.listFiles(s"$dir/l")
    assert(listed.size == 2)
    assert(listed.exists(_.endsWith("a.txt")))
    assert(listed.exists(_.endsWith("b.txt")))
    io.deleteFiles(listed.map(p => new java.net.URI(p).getPath))
    assert(io.listFiles(s"$dir/l").isEmpty)
  }

  test("file:// URIs are accepted") {
    val (io, dir) = fresh()
    val p = s"file://$dir/uri.txt"
    io.writeString(p, "via uri")
    assert(io.readString(p) == "via uri")
    assert(io.exists(p))
  }
}

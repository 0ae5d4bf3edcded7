package graft

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Fixtures

/** Staged-fixture lifecycle: collision-resistant keys and re-staging on
  * source change (ADVICE r3: hashCode keys could collide; a bare
  * _SUCCESS marker reused stale fixtures after the source regenerated). */
class FixturesSpec extends AnyFunSuite {

  private def tmpSource(): File = {
    val d = Files.createTempDirectory("graft_fixsrc_").toFile
    Files.write(new File(d, "data.txt").toPath,
      "v1".getBytes(StandardCharsets.UTF_8))
    d
  }

  test("distinct source paths get distinct fixture paths") {
    val a = tmpSource()
    val b = tmpSource()
    assert(Fixtures.pathTag(a.toString) != Fixtures.pathTag(b.toString))
  }

  test("staged writes once, reuses while unchanged, re-stages on source change") {
    val src = tmpSource()
    var writes = 0
    def stage(): String = Fixtures.staged(src.toString, "spec") { target =>
      writes += 1
      new File(target).mkdirs()
      Files.write(new File(target, "copy.txt").toPath,
        Files.readAllBytes(new File(src, "data.txt").toPath))
    }
    val t1 = stage()
    assert(writes == 1)
    val t2 = stage()
    assert(writes == 1 && t1 == t2, "unchanged source must reuse the fixture")

    // regenerate the source: new content + bumped mtime
    val f = new File(src, "data.txt")
    Files.write(f.toPath, "v2".getBytes(StandardCharsets.UTF_8))
    f.setLastModified(f.lastModified() + 5000)
    stage()
    assert(writes == 2, "changed source must re-stage")
    assert(new String(Files.readAllBytes(
      new File(t1, "copy.txt").toPath), StandardCharsets.UTF_8) == "v2")
  }
}

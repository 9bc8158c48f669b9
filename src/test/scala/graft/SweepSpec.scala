package graft

import org.scalatest.funsuite.AnyFunSuite

/** The crashed-writer tmp sweep must be pid-gated: a LIVE writer's tmp
  * dir, partially deleted mid-publish, could still rename into place —
  * a torn warehouse carrying a valid `_complete` marker that every later
  * session trusts. Pure file-system behavior, no Spark needed. */
class SweepSpec extends AnyFunSuite {

  private def mkTmp(parent: java.io.File, name: String): java.io.File = {
    val d = new java.io.File(parent, name)
    assert(d.mkdirs())
    java.nio.file.Files.writeString(d.toPath.resolve("_complete"), "1")
    java.nio.file.Files.writeString(d.toPath.resolve("part-0.parquet"), "x")
    d
  }

  test("sweep removes dead-pid tmps, keeps live-pid and foreign dirs") {
    val parent = java.nio.file.Files.createTempDirectory("graft-sweep").toFile
    val base = new java.io.File(parent, "wh_v3")
    // a pid that cannot exist (pid_max is < 2^22 on Linux)
    val dead = mkTmp(parent, "wh_v3.tmp-99999999")
    // this test's own pid IS alive
    val live = mkTmp(parent, s"wh_v3.tmp-${ProcessHandle.current().pid()}")
    // unparseable suffix: not ours to judge, must survive
    val foreign = mkTmp(parent, "wh_v3.tmp-backup")
    // parseable-but-negative pid: ProcessHandle.of would throw — must be
    // treated as foreign (left alone), not crash the sweep (ADVICE r5)
    val negative = mkTmp(parent, "wh_v3.tmp--5")
    graft.rdfize.Rdfize.sweepStaleTmp(base.getPath)
    assert(!dead.exists(), "dead-pid tmp should be swept")
    assert(live.exists(), "live writer's tmp must never be touched")
    assert(new java.io.File(live, "_complete").exists(),
      "live tmp's completion marker must survive the sweep")
    assert(foreign.exists(), "unparseable tmp name must survive")
    assert(negative.exists(), "negative-pid tmp must survive, not throw")
  }

  test("bench self-labels contention when the floor leaves the solo band") {
    // synthetic load = a floor above the documented solo ceiling; the
    // warning must name the measured value and say the medians are
    // inflated. In-band floors stay unlabeled.
    val w = graft.Bench.contentionWarning(0.054)
    assert(w.isDefined)
    assert(w.get.contains("CONTENTION WARNING"))
    assert(w.get.contains("0.054"))
    assert(w.get.toLowerCase.contains("inflated"))
    assert(graft.Bench.contentionWarning(0.030).isEmpty)
    assert(graft.Bench.contentionWarning(graft.Bench.SoloFloorCeiling).isEmpty)
  }
}

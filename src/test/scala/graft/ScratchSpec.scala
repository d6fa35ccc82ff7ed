package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The run-scoped scratch sweep must delete exactly what it tracked —
  * and a symlink planted inside (or as) a tracked dir must be removed
  * as a LINK, never traversed (review r12: File.listFiles follows
  * directory symlinks, which would let a link under /tmp scratch point
  * the sweep at data outside it).
  *
  * Isolation (advisor r12): Scratch is a JVM-global registry, and
  * earlier suites in the same forked test JVM may have tracked live
  * paths (stream checkpoints, index roots). Each test drains the
  * global set first and restores it after, so calling sweep() here
  * never deletes another suite's scratch and suite order stays
  * unobservable.
  */
class ScratchSpec extends AnyFunSuite {

  private def isolated[A](body: => A): A = {
    val saved = graft.core.Scratch.drain()
    try body
    finally graft.core.Scratch.restore(saved)
  }

  test("sweep deletes tracked dirs but never traverses symlinks") { isolated {
    val victim = Files.createTempDirectory("graft-scratch-victim")
    val precious = victim.resolve("precious.txt")
    Files.writeString(precious, "do not delete")

    val scratch = Paths.get(graft.core.Scratch.dir("graft-scratch-spec"))
    Files.writeString(scratch.resolve("junk.txt"), "scratch")
    val inner = Files.createDirectory(scratch.resolve("inner"))
    Files.writeString(inner.resolve("more.txt"), "scratch")
    // the attack shape: a symlink inside tracked scratch pointing at
    // data that must survive the sweep
    val link = scratch.resolve("link-to-victim")
    Files.createSymbolicLink(link, victim)

    graft.core.Scratch.sweep()

    assert(!Files.exists(scratch), "tracked scratch dir removed")
    assert(Files.exists(precious), "symlink target's contents survive the sweep")
    assert(Files.readString(precious) == "do not delete")

    // idempotent: sweeping again (shutdown hook path) is a no-op
    graft.core.Scratch.sweep()
    assert(Files.exists(precious))

    Files.delete(precious); Files.delete(victim)
  } }

  test("track returns its argument and untracked paths are left alone") { isolated {
    val untracked = Files.createTempDirectory("graft-scratch-untracked")
    val p = "/tmp/graft-scratch-name-check"
    assert(graft.core.Scratch.track(p) == p)
    graft.core.Scratch.sweep()
    assert(Files.exists(untracked), "untracked dir untouched by sweep")
    Files.delete(untracked)
  } }

  test("drain empties the registry and restore reinstates it") { isolated {
    val a = Files.createTempDirectory("graft-scratch-drain")
    graft.core.Scratch.track(a.toString)
    val saved = graft.core.Scratch.drain()
    assert(saved.contains(a.toString))
    // registry is empty now: sweep must not touch the drained path
    graft.core.Scratch.sweep()
    assert(Files.exists(a), "drained path survives a sweep of the empty registry")
    graft.core.Scratch.restore(saved)
    graft.core.Scratch.sweep()
    assert(!Files.exists(a), "restored path is swept")
  } }
}

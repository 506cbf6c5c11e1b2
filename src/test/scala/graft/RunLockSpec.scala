package graft

import org.scalatest.funsuite.AnyFunSuite

/** The measurement-run lock: second acquirer is refused and told who
  * holds it; release frees it for the next run. (Production mains use
  * acquireOrDie, which is this plus exit 17 — the exit path isn't
  * testable in-JVM, the refusal decision is.) */
class RunLockSpec extends AnyFunSuite {

  test("second concurrent acquire is refused naming the holder; release frees") {
    // RunLock reads SPARK_GRAFT_LOCK each call; env can't be set in-JVM,
    // so this uses the default target/ path but guarantees cleanup
    RunLock.release()
    try {
      assert(RunLock.tryAcquire("SpecOwnerA").isRight)
      val second = RunLock.tryAcquire("SpecOwnerB")
      assert(second.isLeft)
      assert(second.left.exists(_.contains("SpecOwnerA")),
        s"holder description should name the first owner, got: $second")
      assert(second.left.exists(_.contains("pid=")),
        "holder description should carry the pid for ps-level diagnosis")
      RunLock.release()
      assert(RunLock.tryAcquire("SpecOwnerC").isRight)
    } finally RunLock.release()
  }
}

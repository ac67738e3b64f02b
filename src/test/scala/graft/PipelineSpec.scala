package graft

import java.time.LocalDate
import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.funsuite.AnyFunSuite
import graft.flow.{DatasetLatch, FanOut, Pipeline}
import graft.flow.Pipeline._

/** W1-W11 workflow semantics (SURVEY §2.8). */
class PipelineSpec extends AnyFunSuite {

  test("W1: stages run in dependency order, values flow via XCom (W5)") {
    val p = new Pipeline("p", Seq(
      Stage("a", fn = _ => 2),
      Stage("b", deps = Seq("a"), fn = ctx => ctx.xcomPull[Int]("a") * 21)))
    val r = p.run()
    assert(r.value[Int]("b") === 42)
  }

  test("W1: cycles are rejected") {
    intercept[IllegalArgumentException] {
      new Pipeline("p", Seq(
        Stage("a", deps = Seq("b"), fn = _ => 1),
        Stage("b", deps = Seq("a"), fn = _ => 2))).run()
    }
  }

  test("W2: branch runs selected stage, skips the other; skip propagates") {
    val p = new Pipeline("p", Seq(
      Stage("br", branch = true, fn = _ => Seq("yes")),
      Stage("yes", deps = Seq("br"), fn = _ => "ran"),
      Stage("no", deps = Seq("br"), fn = _ => "ran"),
      Stage("after_no", deps = Seq("no"), fn = _ => "ran")))
    val r = p.run()
    assert(r.succeeded("yes"))
    assert(r.outcomes("no") === Skipped)
    assert(r.outcomes("after_no") === Skipped)
  }

  test("W6: NONE_FAILED_MIN_ONE_SUCCESS consumes the surviving branch") {
    val p = new Pipeline("p", Seq(
      Stage("br", branch = true, fn = _ => Seq("left")),
      Stage("left", deps = Seq("br"), fn = _ => "L"),
      Stage("right", deps = Seq("br"), fn = _ => "R"),
      Stage("join", deps = Seq("left", "right"),
        trigger = NoneFailedMinOneSuccess,
        fn = ctx => ctx.xcomPull[String](ctx.xcomPull[Seq[String]]("br").head))))
    val r = p.run()
    assert(r.value[String]("join") === "L")
  }

  test("W6: trigger rule still blocks on real failure") {
    val p = new Pipeline("p", Seq(
      Stage("ok", fn = _ => 1),
      Stage("boom", fn = _ => throw new RuntimeException("x")),
      Stage("join", deps = Seq("ok", "boom"),
        trigger = NoneFailedMinOneSuccess, fn = _ => 2)))
    val r = p.run()
    assert(r.outcomes("join") === Skipped)
  }

  test("W7: retries recover a flaky stage") {
    val calls = new AtomicInteger(0)
    val p = new Pipeline("p", Seq(
      Stage("flaky", retries = 3, fn = _ =>
        if (calls.incrementAndGet() < 3) throw new RuntimeException("flake")
        else "ok")))
    val r = p.run()
    assert(r.value[String]("flaky") === "ok")
    assert(calls.get() === 3)
  }

  test("W7: failure after retries exhausts marks stage failed, deps skipped") {
    val p = new Pipeline("p", Seq(
      Stage("flaky", retries = 1, fn = _ => throw new RuntimeException("always")),
      Stage("next", deps = Seq("flaky"), fn = _ => 1)))
    val r = p.run()
    assert(r.outcomes("flaky").isInstanceOf[Failed])
    assert(r.outcomes("next") === Skipped)
  }

  test("W3: dynamic fan-out maps a runtime-sized list") {
    val out = FanOut.expand(Seq(1, 2, 3))(_ * 2)
    assert(out.flatMap(_.toOption) === Seq(2, 4, 6))
  }

  test("W4: dataset latch fires only on full conjunction, exactly once") {
    val latch = new DatasetLatch(Set("a", "b"))
    latch.markUpdated("a")
    assert(!latch.fireIfReady())
    latch.markUpdated("unrelated")
    assert(!latch.fireIfReady())
    latch.markUpdated("b")
    assert(latch.fireIfReady())
    assert(!latch.fireIfReady()) // resets after firing
  }

  test("W8: params with defaults + injectable clock (C4 determinism)") {
    val cfg = RunConfig(params = Map("t" -> 9),
      clock = () => LocalDate.of(2026, 8, 9)) // a Sunday
    val p = new Pipeline("p", Seq(
      Stage("s", fn = ctx =>
        (ctx.param("t", 7), ctx.param("missing", 5),
          ctx.config.clock().getDayOfWeek.getValue - 1))))
    val r = p.run(cfg)
    assert(r.value[(Int, Int, Int)]("s") === ((9, 5, 6)))
  }
}

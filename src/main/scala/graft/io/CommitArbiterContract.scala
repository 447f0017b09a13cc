package graft.io

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Executable certification of the [[CommitArbiter]] contract — the
  * exact properties the snapshot protocol's safety rests on, packaged
  * so a deployment writing an S3 (`PutObject If-None-Match: *`) or GCS
  * (generation-match 0) arbiter can certify it BEFORE trusting a
  * production lake to it:
  *
  *  1. a publish against an absent destination CREATES it with exactly
  *     the temp file's bytes and returns true;
  *  2. a publish against an existing destination returns false and the
  *     destination's bytes are UNTOUCHED (no-replace — a false "won"
  *     here is the lost-snapshot bug the protocol exists to prevent);
  *  3. the arbiter never deletes the temp file (the caller reclaims it);
  *  4. N racing publishers of the same destination see EXACTLY ONE
  *     winner, and the destination holds the winner's bytes;
  *  5. sequential versions compose: v1..vK publish in order, each
  *     resolvable afterwards.
  *
  * `certify` returns the list of violated properties (empty = certified)
  * rather than throwing per-check, so a deployer sees every violation in
  * one run. It is deliberately dependency-free (no test framework): run
  * it from a main, a REPL, or wrap it in the test-scope
  * `CommitArbiterContractSpec`, which adds the whole-protocol
  * composition checks (racing lake commits + the random-op model) on
  * top.
  *
  * `scratch` must be a writable directory on the SAME storage system the
  * arbiter targets — certifying an S3 arbiter against file:// proves
  * nothing about S3's conditional-PUT behavior.
  */
object CommitArbiterContract {

  def certify(arbiter: CommitArbiter, conf: Configuration,
      scratch: Path, racers: Int = 8): Seq[String] = {
    val fs = scratch.getFileSystem(conf)
    fs.mkdirs(scratch)
    val failures = Seq.newBuilder[String]
    def check(ok: Boolean, what: String): Unit =
      if (!ok) failures += what

    def write(p: Path, s: String): Unit = {
      val out = fs.create(p, true)
      try out.write(s.getBytes("UTF-8")) finally out.close()
    }
    def readAll(p: Path): String = PartitionedLake.readSmallTextFile(fs, p)

    // ---- 1/2/3: create-wins, no-replace, temp preserved ----
    val dst = new Path(scratch, "contract-dst.txt")
    val tmpA = new Path(scratch, "contract-tmp-a")
    val tmpB = new Path(scratch, "contract-tmp-b")
    write(tmpA, "payload-A")
    write(tmpB, "payload-B")
    check(arbiter.publishIfAbsent(fs, tmpA, dst),
      "1. publish against an absent destination must return true")
    check(fs.exists(dst) && readAll(dst) == "payload-A",
      "1. destination must hold exactly the temp file's bytes")
    check(fs.exists(tmpA),
      "3. the arbiter must not delete the temp file (caller reclaims it)")
    check(!arbiter.publishIfAbsent(fs, tmpB, dst),
      "2. publish against an existing destination must return false")
    check(readAll(dst) == "payload-A",
      "2. a lost publish must never replace the existing destination")
    check(fs.exists(tmpB),
      "3. the arbiter must not delete the loser's temp file either")

    // ---- 4: N-way race, exactly one winner ----
    val raceDst = new Path(scratch, "contract-race.txt")
    val tmps = (0 until racers).map { i =>
      val t = new Path(scratch, s"contract-race-tmp-$i")
      write(t, s"racer-$i")
      t
    }
    val wins = new AtomicInteger(0)
    val errors = new AtomicInteger(0)
    val winnerBytes =
      new java.util.concurrent.atomic.AtomicReference[String](null)
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(racers)
    try {
      val done = new CountDownLatch(racers)
      tmps.zipWithIndex.foreach { case (t, i) =>
        pool.execute { () =>
          try {
            start.await()
            if (arbiter.publishIfAbsent(fs, t, raceDst)) {
              wins.incrementAndGet()
              winnerBytes.set(s"racer-$i")
            }
          } catch { case _: Throwable => errors.incrementAndGet() }
          finally done.countDown()
        }
      }
      start.countDown()
      check(done.await(60, TimeUnit.SECONDS), "4. race did not complete")
    } finally pool.shutdown()
    check(errors.get() == 0, "4. racing publishers must not throw")
    check(wins.get() == 1,
      s"4. exactly one racer must win (got ${wins.get()} winners)")
    check(Option(winnerBytes.get()).exists(readAll(raceDst) == _),
      "4. the destination must hold the winner's bytes")

    // ---- 5: sequential versions compose ----
    (1 to 5).foreach { v =>
      val t = new Path(scratch, s"contract-seq-tmp-$v")
      write(t, s"version-$v")
      val d = new Path(scratch, f"contract-seq-v$v%09d.txt")
      check(arbiter.publishIfAbsent(fs, t, d),
        s"5. sequential publish of version $v must win")
      check(readAll(d) == s"version-$v",
        s"5. version $v must hold its own bytes")
    }
    failures.result()
  }
}

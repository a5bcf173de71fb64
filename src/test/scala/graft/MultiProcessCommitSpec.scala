package graft

import java.nio.file.Files
import java.util.concurrent.TimeUnit

import graft.sources.ManifestTable

/** Cross-PROCESS commit arbitration: every other concurrency test races
  * threads of one JVM, which share the process page cache and memory
  * fences. Two forked JVMs hammering the same table through the
  * [[ManifestTable.CommitArbiter]] seam is the honest local stand-in for
  * two cluster drivers committing to shared storage — the object-store
  * deployment contract (conditional put) documented on the seam.
  */
class MultiProcessCommitSpec extends SparkSuite {

  // build.sbt's jdk17AddOpens, verbatim — the forked JVM creates its own
  // SparkSession outside spark-submit exactly like the test JVM does
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("two separate JVMs racing disjoint merges: all land or conflict loudly, never corruption") {
    val dir = Files.createTempDirectory("graft-mp-race")
    val root = dir.resolve("t").toString
    import spark.implicits._
    ManifestTable.commit(
      Seq((0L, "seed", "s1")).toDF("k", "v", "p"), root, Some("p"))

    val rounds = 4
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    def launch(wid: String, parts: String): (Process, java.io.File) = {
      val log = dir.resolve(s"$wid.log").toFile
      val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
        "-Xmx2g", "-Dspark.ui.enabled=false", "-cp", cp,
        "graft.RaceWriterMain", root, wid, parts, rounds.toString))
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      pb.redirectOutput(log)
      (pb.start(), log)
    }
    val (p1, log1) = launch("w1", "a1,a2")
    val (p2, log2) = launch("w2", "b1,b2")
    try {
      // barrier: let both JVMs finish their (slow) Spark init, then release
      // them into the commit loop together so the claim/publish tails race
      val readyDeadline = System.currentTimeMillis() + 150000
      def ready(w: String) = Files.exists(dir.resolve(s"ready.$w"))
      while (!(ready("w1") && ready("w2"))) {
        assert(p1.isAlive || ready("w1"), s"w1 died during init:\n${readLog(log1)}")
        assert(p2.isAlive || ready("w2"), s"w2 died during init:\n${readLog(log2)}")
        assert(System.currentTimeMillis() < readyDeadline,
          s"writers never became ready\nw1:\n${readLog(log1)}\nw2:\n${readLog(log2)}")
        Thread.sleep(50)
      }
      Files.createFile(dir.resolve("start.flag"))
      assert(p1.waitFor(180, TimeUnit.SECONDS), s"w1 hung:\n${readLog(log1)}")
      assert(p2.waitFor(180, TimeUnit.SECONDS), s"w2 hung:\n${readLog(log2)}")
      assert(p1.exitValue() == 0, s"w1 failed:\n${readLog(log1)}")
      assert(p2.exitValue() == 0, s"w2 failed:\n${readLog(log2)}")
    } finally {
      if (p1.isAlive) p1.destroyForcibly()
      if (p2.isAlive) p2.destroyForcibly()
    }

    // every commit landed exactly once: seed + 2 writers × rounds versions,
    // each manifest number published by exactly one writer
    assert(ManifestTable.currentVersion(spark, root).contains(1L + 2 * rounds),
      s"expected ${1 + 2 * rounds} committed versions\n" +
        s"w1:\n${readLog(log1)}\nw2:\n${readLog(log2)}")
    // and the table state equals a serial order of the disjoint rewrites:
    // each writer's partitions hold its LAST round, the seed is untouched
    val got = spark.read.format("graft").load(root)
      .select("k", "v", "p").as[(Long, String, String)].collect().toSet
    val want = Set((0L, "seed", "s1")) ++
      Seq("a1", "a2").map(p => (rounds.toLong, s"w1-$rounds", p)) ++
      Seq("b1", "b2").map(p => (rounds.toLong, s"w2-$rounds", p))
    assert(got == want, s"corrupted table state: $got")
  }

  test("the commit arbiter seam is consulted for every manifest publish") {
    val calls = new java.util.concurrent.atomic.AtomicInteger
    val prev = ManifestTable.commitArbiter
    ManifestTable.commitArbiter = new ManifestTable.CommitArbiter {
      override def publishExclusive(fs: org.apache.hadoop.fs.FileSystem,
                                    tmp: org.apache.hadoop.fs.Path,
                                    dst: org.apache.hadoop.fs.Path): Boolean = {
        calls.incrementAndGet()
        ManifestTable.FsCommitArbiter.publishExclusive(fs, tmp, dst)
      }
    }
    try {
      import spark.implicits._
      val root = Files.createTempDirectory("graft-arb").resolve("t").toString
      ManifestTable.commit(Seq((1L, "a", "x")).toDF("k", "v", "p"), root, Some("p"))
      ManifestTable.append(Seq((2L, "b", "x")).toDF("k", "v", "p"), root, Some("p"))
      assert(calls.get() == 2,
        s"every commit shape must publish through the arbiter, saw ${calls.get()}")
    } finally ManifestTable.commitArbiter = prev
  }

  private def readLog(f: java.io.File): String =
    if (!f.exists()) "<no log>"
    else {
      val s = new String(Files.readAllBytes(f.toPath), "UTF-8")
      if (s.length <= 4000) s else s.substring(s.length - 4000)
    }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the README quickstart entry points: each `graft.examples.*`
 * main the docs tell a new user to run must complete at sf0.001 and
 * print the row-count lines it documents — the public entry path
 * cannot rot silently. The mains create (and stop) their own
 * SparkSession via GraftSession.local(); suites that run after this
 * one re-create theirs through getOrCreate, so the stop is contained.
 */
class QuickstartSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  /** Run a main capturing its Console output (the mains report their
    * results via println / Dataset.show, both of which write through
    * Console.out). */
  private def captured(body: => Unit): String = {
    val bos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(bos, true, "UTF-8")) { body }
    new String(bos.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  private def intAfter(out: String, label: String): Long = {
    val m = (java.util.regex.Pattern.quote(label) + "\\s*(\\d+)").r
      .findFirstMatchIn(out)
    assert(m.isDefined, s"'$label <n>' missing in output:\n$out")
    m.get.group(1).toLong
  }

  test("quickstart: WordCount runs end-to-end and counts words") {
    val out = captured(examples.WordCount.main(Array(sf)))
    assert(intAfter(out, "distinct words:") > 0, out)
    // the typed (bigslice-shaped) path must agree with the DataFrame path
    assert(intAfter(out, "typed-path distinct words:") ==
      intAfter(out, "distinct words:"), out)
  }

  test("quickstart: TrainingDataPipeline runs end-to-end with non-empty splits") {
    val out = captured(examples.TrainingDataPipeline.main(Array(sf)))
    assert(out.contains("docs: "), out)
    assert(out.contains("splits: "), out)
    // the pipeline must keep SOME documents through every gate
    assert(intAfter(out, "(train epoch-0 ordered rows:") > 0, out)
  }

  test("quickstart: IncrementalRefresh runs end-to-end; indexes and maintained view stay exact") {
    val out = captured(examples.IncrementalRefresh.main(Array(sf)))
    assert(out.contains("hits on retired docs: 0"), out)
    assert(out.contains("maintained lang stats == v2 recompute: true"), out)
  }

  test("quickstart: IndexMaintenance runs end-to-end through append/retrain/compact/gc") {
    val out = captured(examples.IndexMaintenance.main(Array(sf)))
    assert(out.contains("after 7 appends: ann v"), out)
    assert(out.contains("retrain -> v"), out)
    assert(out.contains("post-compact+gc: bm25 v"), out)
  }
}

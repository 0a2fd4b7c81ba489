package graft

import graft.functions.Bpe
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Real-BPE tokenizer contracts:
 *  - the greedy lowest-rank encode loop equals an INDEPENDENT
 *    formulation (replay the merges in learned order, Sennrich-style)
 *    on every corpus document and on adversarial unicode — the two
 *    algorithms agree only if the merge table semantics are right;
 *  - training is deterministic and learns the obvious merges on a
 *    hand-checked corpus;
 *  - count bounds: words <= bpe tokens <= codepoints + words (every
 *    word is 1..len+1 symbols);
 *  - the Catalyst kernel equals the Scala function row-for-row;
 *  - BPE-driven packing keeps the packing invariants (capacity
 *    respected, every doc binned exactly once).
 */
class BpeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  /** Independent reference: apply each merge IN LEARNED ORDER to the
    * whole symbol sequence (the original Sennrich training-side
    * formulation), rather than repeatedly taking the lowest-rank
    * adjacent pair. Equivalence between the two is the classic BPE
    * property the encoder relies on. */
  private def referenceEncode(word: String, v: Bpe.Vocab): Seq[String] = {
    var syms: List[String] = {
      val b = List.newBuilder[String]
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        b += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      b += Bpe.EndOfWord
      b.result()
    }
    for ((a, bSym) <- v.merges) {
      val out = List.newBuilder[String]
      var rest = syms
      while (rest.nonEmpty) {
        rest match {
          case x :: y :: t if x == a && y == bSym => out += x + y; rest = t
          case x :: t => out += x; rest = t
          case Nil =>
        }
      }
      syms = out.result()
    }
    syms
  }

  private def refCount(text: String, v: Bpe.Vocab): Int =
    text.split("\\s+").iterator.filter(_.nonEmpty)
      .map(w => referenceEncode(w, v).length).sum

  test("training learns the obvious merges on a hand-checked corpus, deterministically") {
    val wc = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val v = Bpe.trainFromWordCounts(wc, numMerges = 4)
    // 'est</w>' dominates: e+s (9), then es+t (9), then est+</w> (9)
    assert(v.merges.take(3) == Seq(("e", "s"), ("es", "t"), ("est", "</w>")),
      v.merges)
    val v2 = Bpe.trainFromWordCounts(wc, numMerges = 4)
    assert(v.merges == v2.merges, "training must be deterministic")
    // the learned merge compresses: newest = n e w est</w> → 4 tokens
    assert(Bpe.encodeWord("newest", v).length == 4,
      Bpe.encodeWord("newest", v).toSeq)
  }

  test("greedy lowest-rank encode == replay-merges-in-order reference, corpus + unicode") {
    val docs = Tables.load(spark, sf, "documents")
      .select("text").collect().map(_.getString(0))
    val v = Bpe.train(Tables.load(spark, sf, "documents"), "text",
      numMerges = 256, maxWords = 5000)
    assert(v.merges.nonEmpty)
    docs.foreach { t =>
      assert(Bpe.countTokens(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), v)
        == refCount(t, v), s"mismatch on: ${t.take(60)}")
    }
    // adversarial unicode: surrogate pairs, combining marks, the
    // end-of-word marker appearing literally in text
    val rnd = new scala.util.Random(42)
    val alphabet = "ab eé́😀世</w>\t\n"
    val fuzz = (1 to 300).map(_ =>
      (1 to rnd.nextInt(30)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    fuzz.foreach { t =>
      assert(Bpe.countTokens(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), v)
        == refCount(t, v), s"mismatch on fuzz: $t")
    }
  }

  test("count bounds and kernel==function on the corpus") {
    val d = Tables.load(spark, sf, "documents")
    val v = Bpe.train(d, "text", numMerges = 256, maxWords = 5000)
    val rows = d.select(col("doc_id"), col("text"),
      Bpe.bpeTokenCountF(col("text"), v).as("n_bpe"),
      graft.functions.TextFunctions.wsTokenCount(col("text")).as("n_ws"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (text, nBpe, nWs) = (r.getString(1), r.getInt(2), r.getInt(3))
      // kernel == Scala function
      assert(nBpe == Bpe.countTokens(
        org.apache.spark.unsafe.types.UTF8String.fromString(text), v))
      // every word is 1..(codepoints+1) symbols
      val nCp = text.split("\\s+").iterator.filter(_.nonEmpty)
        .map(w => w.codePointCount(0, w.length) + 1).sum
      assert(nBpe >= nWs && nBpe <= nCp, s"doc ${r.getLong(0)}: $nWs <= $nBpe <= $nCp")
      // merges compress: strictly fewer tokens than raw symbols for
      // any doc long enough to contain a learned merge
    }
    // aggregate compression: the learned table must actually bite
    val totalBpe = rows.map(_.getInt(2).toLong).sum
    val totalCp = rows.map(r => r.getString(1).split("\\s+")
      .iterator.filter(_.nonEmpty)
      .map(w => w.codePointCount(0, w.length) + 1).sum.toLong).sum
    assert(totalBpe < totalCp / 2,
      s"256 merges should compress the corpus >2x over raw symbols: $totalBpe vs $totalCp")
  }

  test("query-level cross-check: text_bpe_tokens at sf0.01 == from-scratch encoder over the emitted merges file") {
    val dir = "/root/testdata/sf0.01"
    // the QUERY output (the artifact the driver's correctness gate
    // records rows-only) — n_bpe per doc over the FULL sf0.01 corpus
    val got = SparkEntry.queries("text_bpe_tokens")(spark, dir)
      .select("doc_id", "n_bpe").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the same vocab the query trains (training is deterministic and
    // memoized per dir with Bpe.train's defaults)
    val v = Bpe.train(Tables.load(spark, dir, "documents"), "text")
    // EMIT the merges file the way a deployment ships a tokenizer
    // (symbols never contain whitespace — words are \s+-split — so
    // the classic "a b" line format is unambiguous) …
    val f = java.nio.file.Files.createTempFile("graft_merges", ".txt")
    java.nio.file.Files.write(f,
      v.merges.map { case (a, b) => s"$a $b" }.mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // … and decode it with a FROM-SCRATCH encoder that shares no code
    // with graft.functions.Bpe: its own file parse, its own
    // codepoint split, the replay-merges-in-learned-order algorithm
    // (not the greedy lowest-rank loop), tuple keys (not string keys).
    val merges: Array[(String, String)] = new String(
      java.nio.file.Files.readAllBytes(f),
      java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").filter(_.nonEmpty).map { l =>
        val sp = l.indexOf(' ')
        (l.substring(0, sp), l.substring(sp + 1))
      }
    assert(merges.length == v.merges.length && merges.length > 100)
    def fileEncodeLen(word: String): Int = {
      var syms: Vector[String] = {
        val b = Vector.newBuilder[String]
        var i = 0
        while (i < word.length) {
          val cp = word.codePointAt(i)
          b += new String(Character.toChars(cp))
          i += Character.charCount(cp)
        }
        b += "</w>"
        b.result()
      }
      for ((a, bs) <- merges) {
        if (syms.length > 1) {
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == bs) {
              out += a + bs; j += 2
            } else { out += syms(j); j += 1 }
          }
          syms = out.result()
        }
      }
      syms.length
    }
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
    assert(docs.length == got.size)
    docs.foreach { r =>
      val want = r.getString(1).split("\\s+").iterator.filter(_.nonEmpty)
        .map(fileEncodeLen).sum
      assert(got(r.getLong(0)) == want.toLong,
        s"doc ${r.getLong(0)}: query ${got(r.getLong(0))} != file-replay $want")
    }
  }

  test("BPE-driven packing keeps the packing invariants") {
    val d = Tables.load(spark, sf, "documents")
    val v = Bpe.train(d, "text", numMerges = 256, maxWords = 5000)
    val withN = d.select(col("doc_id"),
      Bpe.bpeTokenCountF(col("text"), v).cast("long").as("n_tokens"))
    val packed = graft.operators.Packing.packBins(
      withN, "doc_id", "n_tokens", capacity = 2048, parts = 4)
    val rows = packed.collect()
    assert(rows.map(_.getLong(0)).toSet ==
      d.select("doc_id").collect().map(_.getLong(0)).toSet,
      "every doc binned exactly once")
    // packBins' contract: bin = floor(prefix-sum-of-tokens / capacity)
    // in doc_id order — reconstruct locally and compare exactly
    var cum = 0L
    rows.sortBy(_.getLong(0)).foreach { r =>
      assert(r.getAs[Long]("bin") == cum / 2048,
        s"doc ${r.getLong(0)}: bin ${r.getAs[Long]("bin")} != ${cum / 2048}")
      cum += r.getAs[Long]("n_tokens")
    }
  }
}

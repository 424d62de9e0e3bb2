package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/**
 * Randomized differential tests: every text metric is recomputed by an
 * independent, naive in-JVM model over generated documents (varied
 * alphabets, whitespace runs, repetition-heavy and degenerate cases)
 * and must agree with the Spark-side expression/UDF exactly.
 */
class TextPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val rng = new scala.util.Random(99)

  private def randomDoc(): String = {
    val vocabSize = 1 + rng.nextInt(8)
    val vocab = Vector.fill(vocabSize)(
      Vector.fill(1 + rng.nextInt(6))(
        ('a' + rng.nextInt(26)).toChar).mkString)
    val n = rng.nextInt(40)
    val sep = () => if (rng.nextInt(5) == 0) "  \t " else " "
    val body = Vector.fill(n)(vocab(rng.nextInt(vocabSize)))
      .mkString(sep())
    if (rng.nextInt(6) == 0) s"  $body " else body
  }

  private val docs: Seq[(Long, String)] =
    (0L until 200L).map(i => (i, randomDoc())) ++
      Seq((200L, ""), (201L, "   "), (202L, "\t\t"), (203L, "one"))

  private def toks(s: String): Array[String] = {
    val t = s.trim
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }

  test("BPE decode∘encode is lossless on random corpora (r11 — the " +
      "property the tx_bpe_encode in-query pin enforces per document)") {
    // train on the random corpus itself, then every doc must round-trip
    val df = docs.toDF("doc_id", "text").repartition(3)
    val model = TextOps.trainBpe(df, "text", numMerges = 50,
      maxWords = 1000)
    docs.foreach { case (id, text) =>
      val ws = toks(text.toLowerCase).toSeq
      val enc = ws.flatMap(w => model.encode(w).toSeq)
      assert(TextOps.decodeBpe(enc) === ws.mkString(" "),
        s"doc $id lost content through encode/decode: '$text'")
    }
    // and an UNSEEN-vocabulary stress: words the merge table never saw
    val unseen = Seq("zzzyx", "q", "aaaaaaaaaa", "xyzzyplugh")
    val enc = unseen.flatMap(w => model.encode(w).toSeq)
    assert(TextOps.decodeBpe(enc) === unseen.mkString(" "))
  }

  test("tokenCount and tokenEntropy match the naive model on random " +
      "documents") {
    val out = docs.toDF("doc_id", "text")
      .select(col("doc_id"),
        TextOps.tokenCount(col("text")).as("n"),
        TextOps.tokenEntropy(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2)))
      .toMap
    docs.foreach { case (id, s) =>
      val t = toks(s)
      assert(out(id)._1 === t.length, s"doc $id [$s]")
      val expH =
        if (t.isEmpty) 0.0
        else {
          val n = t.length.toDouble
          -t.groupBy(identity).values
            .map(g => (g.length / n) * math.log(g.length / n))
            .sum / math.log(2.0)
        }
      assert(math.abs(out(id)._2 - expH) < 1e-9,
        s"doc $id entropy ${out(id)._2} vs $expH [$s]")
    }
  }

  test("repetitionStats match the naive model on random documents") {
    val rep = TextOps.repetitionStats(col("text"))
    val out = docs.toDF("doc_id", "text")
      .withColumn("rep", rep)
      .select(col("doc_id"), col("rep._1"), col("rep._2"), col("rep._3"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    def gramFracs(t: Array[String], k: Int): (Double, Double) = {
      if (t.length < k) (0.0, 0.0)
      else {
        val grams = t.sliding(k).map(_.mkString(" ")).toVector
        val counts = grams.groupBy(identity).values.map(_.length)
        (counts.max.toDouble / grams.length,
          counts.filter(_ > 1).sum.toDouble / grams.length)
      }
    }
    docs.foreach { case (id, s) =>
      val t = toks(s)
      val (mt, _) = gramFracs(t, 1)
      val (t2, _) = gramFracs(t, 2)
      val (_, d3) = gramFracs(t, 3)
      assert(math.abs(out(id)._1 - mt) < 1e-12, s"doc $id max_token [$s]")
      assert(math.abs(out(id)._2 - t2) < 1e-12, s"doc $id top2gram [$s]")
      assert(math.abs(out(id)._3 - d3) < 1e-12, s"doc $id dup3gram [$s]")
    }
  }

  test("fused stopwordAndMeanLen matches the Column formulations") {
    val withStops = docs.map { case (id, s) =>
      (id, if (id % 3 == 0) s + " the of and" else s)
    }
    val sm = TextOps.stopwordAndMeanLen(col("text"))
    val out = withStops.toDF("doc_id", "text")
      .select(col("doc_id"),
        TextOps.stopwordRatio(col("text")).as("sr"),
        TextOps.meanWordLen(col("text")).as("ml"),
        sm.as("sm"))
      .select(col("doc_id"), col("sr"), col("ml"),
        col("sm._1").as("fsr"), col("sm._2").as("fml"))
      .collect()
    out.foreach { r =>
      assert(r.getDouble(1) === r.getDouble(3),
        s"doc ${r.getLong(0)} stopword_ratio")
      assert(r.getDouble(2) === r.getDouble(4),
        s"doc ${r.getLong(0)} mean_word_len")
    }
  }

  test("fingerprint is invariant to whitespace runs and case") {
    val f = docs.toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("f"),
        TextOps.fingerprint(
          upper(regexp_replace(col("text"), " ", "  "))).as("g"))
      .collect()
    f.foreach(r => assert(r.getLong(1) === r.getLong(2),
      s"doc ${r.getLong(0)} fingerprint not normalization-invariant"))
  }

  test("chunkDocs loses no tokens: stride-prefixes reassemble the " +
      "token stream") {
    val df = docs.toDF("doc_id", "text")
    val chunks = TextOps.chunkDocs(df, "doc_id", "text",
      chunkSize = 7, stride = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
      .groupBy(_._1)
    docs.foreach { case (id, s) =>
      val t = toks(s)
      if (t.isEmpty) assert(!chunks.contains(id))
      else {
        val ordered = chunks(id).sortBy(_._2).map(_._3)
        // each chunk contributes its first `stride` tokens; the final
        // chunk contributes everything it holds
        val rebuilt = ordered.zipWithIndex.flatMap { case (c, i) =>
          val ct = c.split(" ")
          if (i == ordered.length - 1) ct else ct.take(5)
        }
        assert(rebuilt.toSeq === t.toSeq, s"doc $id [$s]")
      }
    }
  }

  test("unigramLogProbs matches a naive in-JVM LM on random documents " +
      "(exact integer sums, every vocab cut)") {
    val df = docs.toDF("doc_id", "text")
    // the naive model: lowercased whitespace tokens, global counts,
    // (count desc, token asc) vocab cut, ln rounded HALF_UP to 1e-6
    val allToks = docs.flatMap { case (_, s) => toks(s.toLowerCase) }
    val counts = allToks.groupBy(identity).view.mapValues(_.size.toLong)
      .toMap
    val total = math.max(allToks.size.toLong, 1L)
    def micro(x: Double): Long = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    for (vocabSize <- Seq(1, 3, 1000)) {
      val vocab = counts.toSeq
        .sortBy { case (t, c) => (-c, t) }.take(vocabSize)
        .map { case (t, c) => t -> micro(math.log(c.toDouble / total)) }
        .toMap
      val oov = micro(math.log(0.5 / total))
      val out = TextOps.unigramLogProbs(df, "doc_id", "text",
        vocabSize = vocabSize)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      docs.foreach { case (id, s) =>
        val t = toks(s.toLowerCase)
        val expSum = t.map(w => vocab.getOrElse(w, oov)).sum
        assert(out(id) === ((t.length.toLong, expSum)),
          s"doc $id vocabSize=$vocabSize [$s]: " +
            s"${out(id)} vs (${t.length}, $expSum)")
      }
    }
  }
  // ---- vocabDivergence (X89) ----

  test("vocabDivergence: identical corpora score exactly 0, disjoint " +
      "vocabularies approach ln 2, the measure is symmetric and " +
      "partition-invariant (X89)") {
    import spark.implicits._
    // large enough that the add-half smoothing mass (vocab/2 per
    // side) is negligible next to the real counts
    val a = (1L to 100L).map(i => (i, "x y z x")).toDF("id", "text")
    val b = (201L to 300L).map(i => (i, "p q r q")).toDF("id", "text")
    def js(x: org.apache.spark.sql.DataFrame,
        y: org.apache.spark.sql.DataFrame) = {
      val r = TextOps.vocabDivergence(x, y, "text").head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))
    }
    val same = js(a, a)
    assert(same._4 === 0L && same._5 === 0.0)
    val disj = js(a, b)
    assert(disj._1 === 400L && disj._2 === 400L && disj._3 === 6L)
    assert(disj._5 > 0.65 && disj._5 < math.log(2.0) + 1e-9,
      disj._5.toString)
    // symmetric by construction
    assert(js(b, a)._4 === disj._4)
    // partition invariance: the grid-integer sum is order-free
    val p7 = js(a.repartition(7), b.repartition(5))
    assert(p7 === disj)
  }
}

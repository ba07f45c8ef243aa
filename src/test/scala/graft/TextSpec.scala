package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Poly31Hash
import graft.operators.{Multimodal, Sampling, TextAnalysis}

class TextSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("poly31 expression matches the reference implementation") {
    assert(Poly31Hash.hash("abc") == 96354L) // (('a'*31+'b')*31+'c') mod 2^31−1
    assert(Poly31Hash.hash("") == 0L)
    Poly31Hash.register(spark)
    val viaSql = Seq("abc", "", "the fast key").toDF("t")
      .selectExpr("poly31(t)").collect().map(_.getLong(0)).toSeq
    assert(viaSql == Seq(96354L, 0L, Poly31Hash.hash("the fast key")))
  }

  test("quality stats on a known document") {
    val r = TextAnalysis.quality(Seq((7L, "the a data 42")).toDF("doc_id", "text"))
      .collect().head
    assert(r.getAs[Long]("n_chars") == 13L)
    assert(r.getAs[Long]("n_words") == 4L)
    assert(r.getAs[Double]("stop_ratio") == 0.5)
    assert(r.getAs[Long]("n_digits") == 2L)
  }

  test("token counts: whitespace vs BPE-ish regex") {
    val r = TextAnalysis.tokenCounts(Seq((1L, "ab1 cd!2")).toDF("doc_id", "text"))
      .collect().head
    assert(r.getAs[Long]("ws_tokens") == 2L)
    assert(r.getAs[Long]("bpe_tokens") == 5L) // ab|1|cd|!|2
  }

  test("language ID picks the marker-dense language, en on ties") {
    val out = TextAnalysis.langId(Seq(
      (1L, "el los el perro", "es"),
      (2L, "the a of thing", "en"),
      (3L, "nothing matches here", "zh")
    ).toDF("doc_id", "text", "lang"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("predicted_lang"))).toMap
    assert(out(1L) == "es")
    assert(out(2L) == "en")
    assert(out(3L) == "en") // all-zero scores fall through to the en branch
  }

  test("tfidf: rare term outranks common term, k bounds the output") {
    // "rare" appears once in the corpus, "common" in every doc: idf of
    // common = ln(1) scaled → lowest score, rare ranks first for doc 1.
    val corpus = Seq(
      (1L, "common rare common"),
      (2L, "common other"),
      (3L, "common other")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(corpus, 2).collect()
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.values.forall(_.length <= 2))
    val d1 = byDoc(1L).sortBy(_.getAs[Long]("rn"))
    assert(d1.head.getAs[String]("word") == "rare")
    // common is in all 3 docs: idf = ln(4/4) = 0 → score 0, never first
    assert(d1.head.getAs[Double]("score") > 0.0)
  }

  test("chunking: 50-word windows on 40-word stride cover every word") {
    val text = (1 to 90).map(i => s"w$i").mkString(" ")
    val out = TextAnalysis.chunkWords(Seq((1L, text)).toDF("doc_id", "text"), 50, 40)
      .orderBy("chunk_no").collect()
    // 90 words → ⌊89/40⌋+1 = 3 chunks: [1..50], [41..90], [81..90]
    assert(out.length == 3)
    assert(out.map(_.getAs[Long]("n_chunk_words")).toSeq == Seq(50L, 50L, 10L))
    assert(out(0).getAs[String]("chunk_text").startsWith("w1 w2 "))
    assert(out(1).getAs[String]("chunk_text").startsWith("w41 "))
    assert(out(2).getAs[String]("chunk_text") == (81 to 90).map("w" + _).mkString(" "))
  }

  test("stratified sample is deterministic and respects degenerate rates") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val all = docs.count()
    val keepAll = Sampling.stratified(docs, col("doc_id"), col("lang"), Nil, 1.0).count()
    val keepNone = Sampling.stratified(docs, col("doc_id"), col("lang"), Nil, 0.0).count()
    assert(keepAll == all && keepNone == 0L)
    val ids1 = Sampling.stratified(docs, col("doc_id"), col("lang"),
      Seq("en" -> 0.5), 0.1).select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.stratified(docs, col("doc_id"), col("lang"),
      Seq("en" -> 0.5), 0.1).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2 && ids1.nonEmpty && ids1.size < all)
  }

  test("scrubPii leaves no email or phone surface forms behind") {
    val dirty = Seq(
      (1L, "mail me at alice.smith+x@sub.example.co.uk today"),
      (2L, "call 555-0199 or 555-1234 now"),
      (3L, "both bob@ex.io and 555-7777 appear"),
      (4L, "clean text with no pii at all")
    ).toDF("doc_id", "text")
    val out = dirty.select(col("doc_id"),
        TextAnalysis.scrubPii(col("text")).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out(1) == "mail me at <EMAIL> today")
    assert(out(2) == "call <PHONE> or <PHONE> now")
    assert(out(3) == "both <EMAIL> and <PHONE> appear")
    assert(out(4) == "clean text with no pii at all")
  }

  test("packSequences: per-shard sequences are contiguous and boundary-aligned") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val seqLen = 512L
    val packed = TextAnalysis.packSequences(docs, seqLen, 4L).collect()
    assert(packed.length == docs.count())
    packed.groupBy(r => (r.getAs[String]("lang"), r.getAs[Long]("shard")))
      .foreach { case ((lang, shard), rows) =>
        val ordered = rows.sortBy(_.getAs[Long]("doc_id"))
        var cum = 0L
        ordered.foreach { r =>
          // seq_no is exactly the boundary count the running total has
          // crossed BEFORE this document — greedy streaming pack.
          assert(r.getAs[Long]("seq_no") == cum / seqLen,
            s"($lang,$shard) doc ${r.getAs[Long]("doc_id")}")
          cum += r.getAs[Long]("n_words")
        }
        // sequence ids are non-decreasing and start at 0
        val seqs = ordered.map(_.getAs[Long]("seq_no"))
        assert(seqs.head == 0L && seqs.zip(seqs.tail).forall { case (a, b) => a <= b })
      }
  }

  test("multimodal decode: payload bytes round-trip with correct digest") {
    val feats = Multimodal.extractFeatures(spark,
        Multimodal.packPayload(Seq((5L, "hello")).toDF("doc_id", "text")))
      .collect().head
    assert(feats.payload_len == 5L)
    assert(feats.payload_md5 == "5d41402abc4b2a76b9719d911017c592")
    assert(feats.first_byte == 'h'.toLong)
  }
}

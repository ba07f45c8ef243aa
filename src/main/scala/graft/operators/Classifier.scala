package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Num

/** In-engine quality-classifier TRAINING — the step an LLM curation
  * pipeline runs to distill a hand-written rule set (or a labeled
  * sample) into a scoring model it can apply to the whole corpus:
  * ridge-regularized logistic regression fit by IRLS (iteratively
  * reweighted least squares / Newton-Raphson), here distilling the
  * Gopher pass rule from three continuous signals (n_words,
  * mean_word_len, symbol_ratio).
  *
  * Distribution shape: each IRLS round is ONE map-side-combining
  * aggregate over the feature table — the 4×4 normal matrix XᵀWX (10
  * unique entries) and the 4-entry raw gradient Xᵀ(y−p) are sufficient
  * statistics, so per-partition state is 14 decimal accumulators and
  * NOTHING row-sized crosses the shuffle. The ridge penalty enters in
  * the 1-row solve (H + λI weights-only on the diagonal, g − λβ
  * weights-only on the gradient, intercept unpenalized), which runs on
  * the resulting 1-row frame as closed-form Cramer expressions
  * ([[deltaExprs]]) — no driver-side collect, no linear-algebra
  * library; the fixed point is the genuine ridge optimum (coefficients
  * bounded even on separable data). Feature standardization is two
  * more 1-row aggregates. At 100 TB the cost is `iters + 3` corpus
  * scans; state is O(1).
  *
  * Engine-exactness (the kmeans/pca discipline): features and z-scores
  * round to 6; the linear predictor rounds to 6 BEFORE `exp` (so the
  * only transcendental evaluates on identical doubles) and p/w/r round
  * to 6 after; every cross-partition sum is an exact DECIMAL(38,6)
  * ([[Num.dsumAt]]); the Cramer quotient is a FIXED-association
  * expression tree generated once ([[deltaExprs]]) and executed
  * verbatim by both engines; each β rounds to 6 per round. The whole
  * trajectory replays literal-for-literal in SQL.
  *
  * Known residual (unlike the sqrt-only operators): IEEE requires
  * `sqrt` to be correctly rounded but `exp` only faithfully rounded,
  * so the two engines' exp can differ by 1 ulp on identical inputs;
  * the round-6 canonicalization absorbs it unless the sigmoid lands
  * within that ulp of a half-up boundary (probability ≈ 1e-10 per
  * value). Logistic regression cannot avoid the transcendental; this
  * is the accepted residual, not an oversight.
  */
object Classifier {

  /** Matrix entry accessor names of the 1-row stats frame: m{r}{c}
    * with r ≤ c (symmetric — the lower triangle reuses the upper). */
  private def mName(r: Int, c: Int): String =
    if (r <= c) s"m$r$c" else s"m$c$r"

  /** Ridge-adjusted accessor: the diagonal carries + λ for the weight
    * coordinates; the intercept (0,0) is NOT penalized — the standard
    * ridge convention (shrinking the intercept would make the fit
    * depend on the label base rate in a way no regularizer intends). */
  private def mAt(lambda: Double)(r: Int, c: Int): String =
    if (r == c && r > 0) s"(${mName(r, c)} + $lambda)" else mName(r, c)

  /** Penalized-gradient accessor: ∇ = Xᵀ(y−p) − λβ on the weight
    * coordinates (intercept unpenalized, matching [[mAt]]) — so the
    * IRLS fixed point solves the RIDGE score equation Xᵀ(y−p) = λβ,
    * not the unpenalized MLE, and coefficients stay bounded on
    * separable data. */
  private def gAt(lambda: Double)(r: Int): String =
    if (r == 0) "g0" else s"(g$r - $lambda * b$r)"

  /** det of the 3×3 minor over rows `rs` × cols `cs` of accessor `m` —
    * fixed association order, so the IEEE result is bit-identical on
    * any engine executing the same string. */
  private def det3(m: (Int, Int) => String, rs: Seq[Int], cs: Seq[Int]): String = {
    def t(i: Int, j: Int) = m(rs(i), cs(j))
    s"(${t(0, 0)} * (${t(1, 1)} * ${t(2, 2)} - ${t(1, 2)} * ${t(2, 1)}) - " +
      s"${t(0, 1)} * (${t(1, 0)} * ${t(2, 2)} - ${t(1, 2)} * ${t(2, 0)}) + " +
      s"${t(0, 2)} * (${t(1, 0)} * ${t(2, 1)} - ${t(1, 1)} * ${t(2, 0)}))"
  }

  /** det of the 4×4 accessor `m` by Laplace expansion along row 0. */
  private def det4(m: (Int, Int) => String): String =
    (0 until 4).map { j =>
      val cs = (0 until 4).filterNot(_ == j)
      val term = s"${m(0, j)} * ${det3(m, Seq(1, 2, 3), cs)}"
      if (j % 2 == 0) s"+ $term" else s"- $term"
    }.mkString("(", " ", ")")

  /** The four Newton-step expressions δ_i = det(M_i)/det(M) (Cramer's
    * rule; M_i = ridge'd normal matrix with column i replaced by the
    * PENALIZED gradient Xᵀ(y−p) − λβ, intercept unpenalized on both
    * sides) over the 1-row stats columns m00..m33 (upper triangle),
    * g0..g3, and the current coefficients b0..b3. SHARED with the
    * DuckDB oracle — one spelling of the solve for both engines. */
  def deltaExprs(lambda: Double): Seq[String] = {
    val base = mAt(lambda) _
    val grad = gAt(lambda) _
    (0 until 4).map { i =>
      def mi(r: Int, c: Int): String = if (c == i) grad(r) else base(r, c)
      s"(${det4(mi)} / ${det4(base)})"
    }
  }

  /** Fit the ridge-logistic quality model on (z1, z2, z3, y) rows and
    * report coefficients + training accuracy in ONE output row:
    * (b0, b1, b2, b3, n_docs, n_correct, accuracy). `feats` must carry
    * doc_id, x1, x2, x3 (continuous), y (0/1 double). */
  def logisticFit(feats: DataFrame, iters: Int, lambda: Double): DataFrame = {
    val (beta, zf) = irls(feats, iters, lambda)
    val finalScored = withProb(zf, beta)
      .withColumn("correct",
        (when(col("p") >= 0.5, lit(1.0)).otherwise(lit(0.0)) === col("y"))
          .cast("long"))
    val out = finalScored
      .groupBy("b0", "b1", "b2", "b3")
      .agg(max(col("n")).as("n_docs"), sum(col("correct")).as("n_correct"))
      .select(col("b0"), col("b1"), col("b2"), col("b3"),
        col("n_docs"), col("n_correct"),
        round(col("n_correct") / col("n_docs"), 6).as("accuracy"))
    Dedup.materializeThenRelease(out, zf)
  }

  /** The SCORING half of the distillation story: fit the model, then
    * apply it to EVERY document — per-doc quality score p plus the
    * keep/drop decision at `keepMin` (what the curation pipeline
    * actually ships downstream). Scale: scoring is one broadcast of
    * the 1-row model against the feature table — a narrow per-row
    * dot + sigmoid, no new shuffle. */
  def logisticScore(feats: DataFrame, iters: Int, lambda: Double,
                    keepMin: Double): DataFrame = {
    val (beta, zf) = irls(feats, iters, lambda)
    val out = withProb(zf, beta)
      .select(col("doc_id"), col("p").as("score"),
        (col("p") >= keepMin).cast("long").as("keep"))
    Dedup.materializeThenRelease(out, zf)
  }

  /** η → p chain over the z-features with a broadcast 1-row β — one
    * spelling for the accuracy tail and the scoring query. */
  private def withProb(zf: DataFrame, beta: DataFrame): DataFrame =
    zf.crossJoin(broadcast(beta))
      .withColumn("eta", round(col("b0") + col("b1") * col("z1")
        + col("b2") * col("z2") + col("b3") * col("z3"), 6))
      .withColumn("p", round(lit(1.0) / (lit(1.0) + exp(-col("eta"))), 6))

  /** Standardize + IRLS: returns the final 1-row β (checkpointed) and
    * the PERSISTED z-feature frame — callers release `zf` via
    * `materializeThenRelease(…, zf)`. */
  private def irls(feats: DataFrame, iters: Int,
                   lambda: Double): (DataFrame, DataFrame) = {
    val ss = feats.sparkSession
    def sq(c: org.apache.spark.sql.Column) = c * c
    val m = feats.agg(
      round(Num.dsumAt(col("x1"), 6) / count(lit(1)), 6).as("mu1"),
      round(Num.dsumAt(col("x2"), 6) / count(lit(1)), 6).as("mu2"),
      round(Num.dsumAt(col("x3"), 6) / count(lit(1)), 6).as("mu3"),
      count(lit(1)).as("n"))
    val s = feats.crossJoin(broadcast(m)).agg(
      round(sqrt(Num.dsumAt(sq(col("x1") - col("mu1")), 6) / max(col("n"))), 6).as("s1"),
      round(sqrt(Num.dsumAt(sq(col("x2") - col("mu2")), 6) / max(col("n"))), 6).as("s2"),
      round(sqrt(Num.dsumAt(sq(col("x3") - col("mu3")), 6) / max(col("n"))), 6).as("s3"),
      max(col("mu1")).as("mu1"), max(col("mu2")).as("mu2"),
      max(col("mu3")).as("mu3"), max(col("n")).as("n"))
    // z-scores rounded to 6; a corpus-constant feature (std 0) pins to
    // z = 0 — it carries no signal and must not divide by zero.
    def z(j: Int) = when(col(s"s$j") === 0, lit(0.0))
      .otherwise(round((col(s"x$j") - col(s"mu$j")) / col(s"s$j"), 6))
    val zf = feats.crossJoin(broadcast(s))
      .select(col("doc_id"), col("y"),
        z(1).as("z1"), z(2).as("z2"), z(3).as("z3"), col("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deltas = deltaExprs(lambda)
    var beta = ss.range(1).select(
      lit(0.0).as("b0"), lit(0.0).as("b1"), lit(0.0).as("b2"), lit(0.0).as("b3"))
    var lastCp: Option[DataFrame] = None
    for (t <- 1 to iters) {
      // ONE spelling of the η→p chain (withProb) — the rounding and
      // association order must stay literal-for-literal with the
      // generated oracle CTEs on every path.
      val scored = withProb(zf, beta)
        .withColumn("w", round(col("p") * (lit(1.0) - col("p")), 6))
        .withColumn("r", round(col("y") - col("p"), 6))
      def zc(j: Int) = if (j == 0) lit(1.0) else col(s"z$j")
      val statAggs =
        (for (r <- 0 until 4; c <- r until 4)
          yield Num.dsumAt(zc(r) * zc(c) * col("w"), 6).as(mName(r, c))) ++
        (0 until 4).map(j => Num.dsumAt(zc(j) * col("r"), 6).as(s"g$j"))
      val stats = scored.agg(statAggs.head, statAggs.tail: _*)
      val next = stats.crossJoin(beta).selectExpr(
        (0 until 4).map(i => s"round(b$i + ${deltas(i)}, 6) AS b$i"): _*)
      // β appears twice per round (in the scoring pass and in the
      // update) — without per-round truncation the 1-row plan doubles
      // every iteration (the pcaPower 2^iters trap).
      val cp = Lifecycle.step(next, lastCp)
      lastCp = Some(cp)
      beta = cp
    }
    (beta, zf)
  }

  /** The Gopher signal → (x1, x2, x3, y) training frame shared by the
    * fit and score queries — same signal spellings as
    * `q_text_gopher_quality`, so the oracle rebuilds the identical
    * training set. */
  private def gopherFeatures(docs: DataFrame): DataFrame =
    TextAnalysis.gopherQuality(docs).select(
      col("doc_id"),
      col("n_words").cast("double").as("x1"),
      col("mean_word_len").as("x2"),
      col("symbol_ratio").as("x3"),
      col("passes").cast("double").as("y"))

  /** The Gopher-distillation fit over the documents table. */
  def logisticQuality(docs: DataFrame, iters: Int, lambda: Double): DataFrame =
    logisticFit(gopherFeatures(docs), iters, lambda)

  /** Fit + corpus-wide scoring over the documents table: per-doc
    * quality score and keep/drop flag. */
  def logisticQualityScore(docs: DataFrame, iters: Int, lambda: Double,
                           keepMin: Double): DataFrame =
    logisticScore(gopherFeatures(docs), iters, lambda, keepMin)

  /** Operating-point selection for the quality classifier: the full
    * confusion table + precision/recall/F1 at a threshold grid — the
    * decision artifact a curator reads before fixing `keepMin` (pick
    * the knee, not a folklore 0.5). One scored pass over the corpus,
    * exploded onto the grid and reduced by one keyed aggregate — at
    * 100 TB the sweep costs |grid| counters per partition on top of
    * the scoring scan, nothing more. F1 is computed from the ROUNDED
    * precision/recall (both engines spell the same chain), so no
    * compounded-rounding divergence can cross the oracle hash. */
  def thresholdSweep(docs: DataFrame, iters: Int, lambda: Double,
                     thresholds: Seq[Double]): DataFrame = {
    val (beta, zf) = irls(gopherFeatures(docs), iters, lambda)
    val hit = col("p") >= col("thr")
    val pos = col("y") === 1.0
    val out = withProb(zf, beta)
      .select(col("y"), col("p"),
        explode(array(thresholds.map(lit): _*)).as("thr"))
      .groupBy(col("thr"))
      .agg(
        sum(when(hit && pos, 1L).otherwise(0L)).as("tp"),
        sum(when(hit && !pos, 1L).otherwise(0L)).as("fp"),
        sum(when(!hit && pos, 1L).otherwise(0L)).as("fn"),
        sum(when(!hit && !pos, 1L).otherwise(0L)).as("tn"))
      .withColumn("prec", when(col("tp") + col("fp") === 0L, lit(0.0))
        .otherwise(round(col("tp") / (col("tp") + col("fp")), 6)))
      .withColumn("rec", when(col("tp") + col("fn") === 0L, lit(0.0))
        .otherwise(round(col("tp") / (col("tp") + col("fn")), 6)))
      .withColumn("f1", when(col("prec") + col("rec") === 0.0, lit(0.0))
        .otherwise(round(lit(2.0) * col("prec") * col("rec")
          / (col("prec") + col("rec")), 6)))
    Dedup.materializeThenRelease(out, zf)
  }
}

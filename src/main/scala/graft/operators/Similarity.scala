package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float] in parquet,
  * cast to double for engine-stable arithmetic).
  *
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline
  *    and the oracle-checked query. The query side is tiny and broadcast;
  *    the corpus streams through one scan, so the plan is a single
  *    broadcast-nested-loop + per-query top-k (no shuffle of the corpus).
  *  - [[annTopK]]: random-hyperplane LSH. Signatures are computed per
  *    row (narrow), candidates come from banded signature-bucket joins,
  *    and only candidates get exact scoring — the 100 TB shape where a
  *    full cross join is impossible.
  */
object Similarity {

  /** Cosine similarity of two array<double> columns. `aggregate` folds
    * left-to-right from 0.0 — the exact same sequential IEEE sum DuckDB's
    * `list_reduce` produces, so values match the oracle bit-for-bit. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Exact top-k neighbours for each query row (queries = `queryPred`),
    * ranked by rounded cosine desc with vec_id tiebreak. */
  def bruteForceTopK(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(queryPred)
      .withColumnsRenamed(Map("vec_id" -> "query_id", "v" -> "qv"))
    val scored = broadcast(q).crossJoin(e)
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", round(cosine(col("qv"), col("v")), 6))
    Warehouse.topKPerGroup(scored, Seq("query_id"),
        Seq(col("cosine").desc, col("vec_id").asc), k)
      .select(col("query_id"), col("rn"), col("vec_id"), col("cosine"))
  }

  /** Deterministic random hyperplanes (seeded): nPlanes × dim. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 7L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** LSH ANN top-k: 16-bit sign signature, banded into 4×4-bit buckets;
    * a pair is a candidate if any band matches; exact cosine ranks the
    * candidates. Probabilistic recall (see SimilaritySpec). */
  def annTopK(emb: DataFrame, queryPred: Column, k: Int, dim: Int): DataFrame = {
    val planes = hyperplanes(16, dim)
    val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val sigBits = planes.zipWithIndex.map { case (p, i) =>
      val lp = typedlit(p.toSeq)
      when(aggregate(zip_with(col("v"), lp, (x, y) => x * y),
        lit(0.0), (acc, d) => acc + d) > 0, lit(1L << i)).otherwise(lit(0L))
    }
    val signed = e.withColumn("sig", sigBits.reduce(_ + _))
    val banded = signed.select(col("vec_id"), col("v"), col("sig"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("c"), expr(s"(sig >> ${4 * c}) & 15").as("cv"))): _*)).as("b"))
      .select(col("vec_id"), col("v"), col("b.c").as("c"), col("b.cv").as("cv"))
    val q = banded.filter(queryPred)
      .withColumnsRenamed(Map("vec_id" -> "query_id", "v" -> "qv"))
    val cand = q.join(banded, Seq("c", "cv"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qv"), col("vec_id"), col("v"))
      .distinct()
    val scored = cand.withColumn("cosine", round(cosine(col("qv"), col("v")), 6))
    Warehouse.topKPerGroup(scored, Seq("query_id"),
        Seq(col("cosine").desc, col("vec_id").asc), k)
      .select(col("query_id"), col("rn"), col("vec_id"), col("cosine"))
  }
}

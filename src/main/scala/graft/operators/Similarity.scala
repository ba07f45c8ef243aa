package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.DotProduct

/** Similarity search over an embedding column (Array[Float] in parquet,
  * cast to double for engine-stable arithmetic).
  *
  * Vectors are L2-normalized ONCE per row, so cosine degrades to a
  * single dot product per pair, computed by the codegen'd native
  * [[DotProduct]] expression (no boxed higher-order lambdas in the
  * pairwise hot loop).
  *
  *  - [[bruteForceTopK]]: exact cosine top-k — correctness baseline,
  *    oracle-checked. Tiny broadcast query side × one corpus scan.
  *  - [[annTopK]]: random-hyperplane LSH — signatures per row (narrow),
  *    banded bucket joins produce candidates, exact scoring only on
  *    candidates. The sub-quadratic 100 TB shape.
  */
object Similarity {

  /** Cosine via higher-order functions (reference formulation, used in
    * specs; hot paths use [[normalized]] + [[DotProduct]]). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** vec_id + L2-normalized array<double> vector. Registers the dotp
    * SQL function on the frame's session. */
  def normalized(emb: DataFrame): DataFrame = {
    DotProduct.register(emb.sparkSession)
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("raw"))
      .withColumn("nrm", sqrt(expr("dotp(raw, raw)")))
      .select(col("vec_id"), transform(col("raw"), x => x / col("nrm")).as("v"))
  }

  /** Exact top-k neighbours for each query row (queries = `queryPred`),
    * ranked by rounded cosine desc with vec_id tiebreak. */
  def bruteForceTopK(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val e = normalized(emb)
    val q = e.filter(queryPred)
      .withColumnsRenamed(Map("vec_id" -> "query_id", "v" -> "qv"))
    val scored = broadcast(q).crossJoin(e)
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", round(expr("dotp(qv, v)"), 6))
    Warehouse.topKPerGroup(scored, Seq("query_id"),
        Seq(col("cosine").desc, col("vec_id").asc), k)
      .select(col("query_id"), col("rn"), col("vec_id"), col("cosine"))
  }

  /** Deterministic random hyperplanes (seeded): nPlanes × dim. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 7L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  private def planeSql(p: Array[Double]): String =
    p.map(d => s"${d}D").mkString("array(", ", ", ")")

  /** LSH ANN top-k: 16-bit sign signature, banded into 4×4-bit buckets;
    * a pair is a candidate if any band matches; exact cosine ranks the
    * candidates. Probabilistic recall (see SimilaritySpec). */
  def annTopK(emb: DataFrame, queryPred: Column, k: Int, dim: Int): DataFrame = {
    val planes = hyperplanes(16, dim)
    val sigExpr = planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN dotp(v, ${planeSql(p)}) > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")
    val signed = normalized(emb).withColumn("sig", expr(sigExpr))
    val banded = signed.select(col("vec_id"), col("v"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("c"), expr(s"(sig >> ${4 * c}) & 15").as("cv"))): _*)).as("b"))
      .select(col("vec_id"), col("v"), col("b.c").as("c"), col("b.cv").as("cv"))
    val q = banded.filter(queryPred)
      .withColumnsRenamed(Map("vec_id" -> "query_id", "v" -> "qv"))
    val cand = q.join(banded, Seq("c", "cv"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qv"), col("vec_id"), col("v"))
      .distinct()
    val scored = cand.withColumn("cosine", round(expr("dotp(qv, v)"), 6))
    Warehouse.topKPerGroup(scored, Seq("query_id"),
        Seq(col("cosine").desc, col("vec_id").asc), k)
      .select(col("query_id"), col("rn"), col("vec_id"), col("cosine"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY.md §2.4).
  *
  * Brute-force top-k is the broadcast(query-set) × scan baseline — no
  * shuffle on the corpus side, so at 100 TB it is one pass; the LSH
  * variant buckets vectors by seeded random-hyperplane signs so
  * candidate generation is a bucket-equijoin instead of a cross join.
  */
object Similarity {

  /** Cosine similarity of two array<float/double> columns, computed in
    * double via codegen'd higher-order functions (no UDF).
    */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    dot(ad, bd) / (sqrt(dot(ad, ad)) * sqrt(dot(bd, bd)))
  }

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (excluding itself). Queries are broadcast.
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")))
    val scored = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 4).as("cos"),
        col("rank").cast("long").as("rank"))
  }

  /** Deterministic seeded hyperplane component for (plane, dim):
    * md5-derived uniform in [-1, 1). Reproducible across runs/engines —
    * an ANN index rebuilt on other hardware buckets identically.
    */
  private def planeComponent(plane: Int, d: Column): Column =
    expr(s"conv(substring(md5(concat('$plane', '_', cast(d AS STRING))), 1, 8), 16, 10)")
      .cast("double") / lit(4294967296.0) * 2 - 1

  /** Random-hyperplane LSH bucket ids — `numTables` independent hash
    * tables of `numPlanes` sign bits each (standard multi-table LSH:
    * each table trades precision for recall; the union of table
    * candidates recovers neighbors a single table splits away).
    * Output: (id, table, bucket).
    */
  def lshBucket(df: DataFrame, idCol: String, vecCol: String,
                numPlanes: Int, numTables: Int = 1): DataFrame = {
    val dims = df.select(col(idCol), posexplode(col(vecCol).cast("array<double>"))
      .as(Seq("d", "x")))
    val planes = dims
      .select(col(idCol), col("d"), col("x"),
        explode(sequence(lit(0), lit(numTables * numPlanes - 1))).as("plane"))
      .withColumn("comp", expr(
        "cast(conv(substring(md5(concat(cast(plane AS STRING), '_', cast(d AS STRING))), 1, 8), 16, 10) AS DOUBLE) / 4294967296.0 * 2 - 1"))
    planes.groupBy(col(idCol), col("plane"))
      .agg(sum(col("x") * col("comp")).as("dotp"))
      .withColumn("table", (col("plane") / numPlanes).cast("int"))
      .groupBy(col(idCol), col("table"))
      .agg(sum(when(col("dotp") > 0,
        expr(s"shiftleft(1L, plane % $numPlanes)")).otherwise(0L)).as("bucket"))
  }

  /** LSH-bucketed ANN: candidates share any table's bucket with the
    * query, ranked by exact cosine over the candidate union.
    */
  def lshAnn(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
             numPlanes: Int, k: Int, numTables: Int = 4): DataFrame = {
    val buckets = lshBucket(corpus, idCol, vecCol, numPlanes, numTables)
    val vecs = corpus.select(col(idCol), col(vecCol))
    val qb = buckets.join(broadcast(queries.select(col(idCol))), Seq(idCol))
      .join(vecs, Seq(idCol))
      .select(col(idCol).as("query_id"), col("table"), col("bucket"), col(vecCol).as("q_vec"))
    val cands = buckets
      .join(qb, Seq("table", "bucket"))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("q_vec"))
      .distinct() // a pair can collide in several tables
      .join(vecs.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec")),
        Seq("neighbor_id"))
      .withColumn("cos", cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 4).as("cos"), col("rank"))
  }

  /** Near-duplicate vector pairs within a blocking key (e.g. label):
    * the blocked self-join keeps pair counts linear in block sizes.
    */
  def cosineDedupPairs(df: DataFrame, idCol: String, vecCol: String,
                       blockCol: String, threshold: Double): DataFrame = {
    val a = df.select(col(blockCol).as("blk"), col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = df.select(col(blockCol).as("blk"), col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("blk"), col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
  }
}

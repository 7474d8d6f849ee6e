import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
object CellProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables(spark, "benchdata/sf10", "embeddings")
    val n = emb.count()
    val k = math.max(8, math.ceil(n / 300.0).toInt)
    val cents = Similarity.exactIvfCentroids(emb, "vec_id", "embedding",
      k = k, iters = 2, hexBound = Similarity.ivfHexBound(n))
    val cells = Similarity.assignExactCells(emb, "vec_id", "embedding", cents)
    val sizes = cells.groupBy("cell").count().select("count").collect().map(_.getLong(0))
    val ss = sizes.sorted
    println(s"[probe] k=$k cells-used=${sizes.length} max=${ss.last} p99=${ss((ss.length*99)/100)} p50=${ss(ss.length/2)} sumSq=${sizes.map(s=>s*s).sum}")
    spark.stop()
  }
}

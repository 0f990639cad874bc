package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic for the Q8ServeBench nprobe=4 reading (persisted
  * bytes 1.58× SLOWER than inline quantization): isolates where the
  * delta lives — the parquet scan itself, the tuple deserialization
  * the kernel scan forces, or the kernel loop. Run after Q8ServeBench
  * leaves /tmp/graft_q8serve_index behind. */
object Q8Diag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sp: SparkSession = spark
    import spark.implicits._
    val loaded = graft.operators.SimilaritySearch.ivfLoad(spark, "/tmp/graft_q8serve_index")
    val bytesCq = loaded.quantized.get.select(
      col("vec_id").cast("long").as("__nid"),
      col("cluster").cast("int").as("__cc"), col("__cq"), col("__cn2"))
    val inlineCq = loaded.assigned.select(
        col("vec_id").cast("long").as("__nid"),
        col("cluster").cast("int").as("__cc"),
        graft.functions.VectorFunctions.quantizeInt8(col("embedding")).as("__cq"))
      .withColumn("__cn2",
        graft.functions.VectorFunctions.int8Dot(col("__cq"), col("__cq")))
    def time(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.mode("overwrite").format("noop").save() // warm
      val t = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"[diag] $label ${(System.nanoTime() - t) / 1e9}%.2f s parts=${df.rdd.getNumPartitions}")
    }
    time("bytes scan")(bytesCq)
    time("inline scan")(inlineCq)
    def timeDs(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val ds = df.as[(Long, Int, Array[Byte], Long)]
        .mapPartitions { it => var n = 0L; it.foreach(_ => n += 1); Iterator(n) }
      ds.write.mode("overwrite").format("noop").save() // warm
      val t = System.nanoTime()
      ds.write.mode("overwrite").format("noop").save()
      println(f"[diag] $label ${(System.nanoTime() - t) / 1e9}%.2f s")
    }
    timeDs("bytes scan+deser")(bytesCq)
    timeDs("inline scan+deser")(inlineCq)
    spark.stop()
  }
}

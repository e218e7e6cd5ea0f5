package graft.tools
import org.apache.spark.sql.SparkSession
import graft.pipelines.WikiPipelines

object Scratch {
  def main(a: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled","false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = WikiPipelines.invertedIndex(spark, "/tmp/graft_dump.xml").count()
      println(f"dump_index rep$i ${(System.nanoTime()-t0)/1e9}%8.2f s rows=$n")
    }
    spark.stop()
  }
}

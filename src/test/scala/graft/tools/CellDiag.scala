package graft.tools

// TEMPORARY diagnostic (deleted before round end): band-cell count
// distributions for the SimHash miners and the FastSS variant table,
// to size the grid gate/salt against measured cell mass.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{SparkEntry, Tables}
import graft.ext.Dedup

object CellDiag {
  private def dist(name: String, cells: DataFrame): Unit = {
    val d = cells.groupBy()
      .agg(count(lit(1)).as("cells"), max("n").as("maxN"),
        expr("percentile_approx(n, array(0.5, 0.9, 0.99, 0.999), 10000)")
          .as("p"),
        sum(col("n") * col("n")).as("sumN2"),
        sum(when(col("n") >= 8192, col("n") * col("n"))).as("n2_ge8192"),
        sum(when(col("n") >= 2048, col("n") * col("n"))).as("n2_ge2048"),
        sum(when(col("n") >= 1024, col("n") * col("n"))).as("n2_ge1024"),
        sum(when(col("n") >= 512, col("n") * col("n"))).as("n2_ge512"))
      .collect()(0)
    println(s"[celldiag] $name cells=${d.get(0)} maxN=${d.get(1)} " +
      s"p50/90/99/999=${d.get(2)} sumN2=${d.get(3)} " +
      s"ge8192=${d.get(4)} ge2048=${d.get(5)} ge1024=${d.get(6)} " +
      s"ge512=${d.get(7)}")
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_scale_30x")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.prepare(spark)
    val docs = Tables.documents(spark, dir)

    // portable miner: 6 bands x 10 bits
    val psigs = Dedup.portableSimHashSignatures(docs, "doc_id", "text")
    val pcells = psigs.select(col("simhash"),
        explode(array((0 until 6).map(b => struct(lit(b).as("band"),
          shiftrightunsigned(col("simhash"), b * 10)
            .bitwiseAND(lit((1L << 10) - 1)).as("bk"))): _*)).as("bb"))
      .groupBy(col("bb.band"), col("bb.bk")).agg(count(lit(1)).as("n"))
    dist("portable(6x10b)", pcells)

    // fast miner at maxDist=6: 7 bands x 9 bits
    val fsigs = Dedup.simHash(docs, "doc_id", "text")
    val nBands = 7; val width = 64 / nBands
    val fcells = fsigs.select(col("simhash"),
        explode(array((0 until nBands).map(b => struct(lit(b).as("band"),
          shiftrightunsigned(col("simhash"), b * width)
            .bitwiseAND(lit((1L << width) - 1)).as("bk"))): _*)).as("bb"))
      .groupBy(col("bb.band"), col("bb.bk")).agg(count(lit(1)).as("n"))
    dist(s"fast(${nBands}x${width}b)", fcells)

    // FastSS variants over customer names
    val cust = Tables.customer(spark, dir)
    val vcells = Dedup.editVariants(cust, "c_name")
      .groupBy("__v").agg(count(lit(1)).as("n"))
    dist("fastss(c_name)", vcells)
    spark.stop()
  }
}

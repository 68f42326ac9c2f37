package graft.tools

/** Driver-contract smoke: SparkEntry.entry(spark) must return rows. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("4")
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"ENTRY_ROWS=$n")
    require(n > 0, "flagship entry must return rows")
    spark.stop()
  }
}

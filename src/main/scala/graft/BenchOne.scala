package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timing (diagnostic; not part of the driver
  * contract): `runMain graft.BenchOne <query> [reps]` — warm + N
  * timed reps with steal annotation, same harness as Bench.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.session(cpus)
    val fn = SparkEntry.queries(name)
    Bench.forceMaterialize(fn(spark, sfDir)) // warm
    val out = (1 to reps).map(_ => Bench.timeWithSteal(Bench.forceMaterialize(fn(spark, sfDir))))
    println(s"""{"query":"$name","sf":"$sfDir","cpus":$cpus,""" +
      s""""rep_sec":${out.map(x => f"${x._1}%.3f").mkString("[", ",", "]")},""" +
      s""""rep_steal_pct":${out.map(x => f"${x._2}%.2f").mkString("[", ",", "]")},""" +
      s""""rep_sys_pct":${out.map(x => f"${x._3}%.2f").mkString("[", ",", "]")},""" +
      s""""rep_spin_ms":${out.map(x => f"${x._4}%.1f").mkString("[", ",", "]")}}""")
    spark.stop()
  }
}

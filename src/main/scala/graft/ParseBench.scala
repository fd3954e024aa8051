package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Parse-throughput micro-benchmark: the reference serializes ALL HCL/JSON
  * parsing behind a global mutex (utils.go:35-36 — BASELINE.md pins its
  * parse throughput at ≈ one core regardless of query parallelism), while
  * graft's parse is a plain distributed flatMap over a binaryFile scan.
  *
  * Replicates fixtures/main.tf N times into a temp dir, then times a full
  * parse (all seven tables' superset rows materialized) at local[1] vs
  * local[cpus] — the speedup IS the architectural delta.
  *
  * Usage: sbt "runMain graft.ParseBench [nFiles]"
  */
object ParseBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000)
    val dir = Files.createTempDirectory("graft-parsebench")
    val src = Paths.get("fixtures/main.tf")
    (1 to n).foreach { i =>
      Files.copy(src, dir.resolve(f"f$i%05d.tf"), StandardCopyOption.REPLACE_EXISTING)
    }
    def run(master: String): (Long, Double) = {
      val spark = Engine.session(master)
      // warmup (JIT + codegen) on a subset, then timed full parse
      tf.Terraform.rows(spark,
        tf.Terraform.Paths(configurationFilePaths = Seq(s"$dir/f000*.tf"))).count()
      val t0 = System.nanoTime()
      val rows = tf.Terraform.rows(spark,
        tf.Terraform.Paths(configurationFilePaths = Seq(s"$dir/*.tf"))).count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.stop()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      (rows, sec)
    }
    val (rows1, serial) = run("local[1]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val (rowsN, par) = run(s"local[$cpus]")
    require(rows1 == rowsN, s"row mismatch: $rows1 vs $rowsN")
    println(f"""{"files":$n,"rows":$rows1,"serial_sec":$serial%.2f,"parallel_sec":$par%.2f,"cores":$cpus,"speedup":${serial / par}%.1f}""")
  }
}

package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.tools.TpcRunner

/** CLI parity gate for the reference's TPC harness flags
  * (`/root/reference/tpc/src/main.rs:160-177`): `--exclude` removes
  * queries from the run set, `--config` loads key=value lines with
  * `#` comments, and the applied config is echoed into results.json. */
class TpcRunnerSpec extends AnyFunSuite {

  // hold the session so TpcRunner reuses it instead of owning/stopping it
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("--exclude and --config are honored and echoed") {
    spark.sparkContext.setLogLevel("WARN")
    val out = Files.createTempDirectory("graft_tpc_spec").toString
    val conf = Files.createTempFile("graft", ".conf")
    Files.writeString(conf,
      """# comment line is skipped
        |spark.sql.shuffle.partitions=3
        |malformed line without equals
        |""".stripMargin)

    TpcRunner.main(Array(
      "--data-path", "/root/testdata/sf0.001",
      "--queries", "q2_filter_project,s1_sort_limit,pj_inner",
      "--exclude", "s1_sort_limit",
      "--config", conf.toString,
      "--iterations", "1",
      "--concurrency", "4",
      "--out", out))

    val json = Files.readString(Paths.get(s"$out/results.json"))
    assert(json.contains("\"q2_filter_project\""))
    assert(json.contains("\"pj_inner\""))
    assert(!json.contains("\"s1_sort_limit\""), "excluded query must not run")
    assert(json.contains("\"spark.sql.shuffle.partitions\": \"3\""),
      "applied config must be echoed like the reference's results.config")
    assert(spark.conf.get("spark.sql.shuffle.partitions") == "3")
    val csv = Files.readString(Paths.get(s"$out/results.csv"))
    assert(csv.linesIterator.count(_.startsWith("q2_filter_project")) == 1)
    // session reused, not stopped
    assert(!spark.sparkContext.isStopped)
    spark.conf.set("spark.sql.shuffle.partitions", "4")
  }

  test("an empty run set still writes valid JSON") {
    val out = Files.createTempDirectory("graft_tpc_empty").toString
    TpcRunner.main(Array(
      "--data-path", "/root/testdata/sf0.001",
      "--queries", "pj_inner", "--exclude", "pj_inner",
      "--iterations", "1", "--concurrency", "4", "--out", out))
    val json = Files.readString(Paths.get(s"$out/results.json"))
    import spark.implicits._
    val parsed = spark.read.json(Seq(json).toDS)
    assert(!parsed.columns.contains("_corrupt_record"), s"invalid JSON: $json")
  }

  test("--exclude rejects unknown query names") {
    intercept[IllegalArgumentException] {
      TpcRunner.main(Array("--data-path", "/root/testdata/sf0.001",
        "--queries", "pj_inner", "--exclude", "no_such_query"))
    }
  }
}

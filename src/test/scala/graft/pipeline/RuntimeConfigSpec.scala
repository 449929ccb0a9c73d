package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** The declarative runtime-config contract (reference
  * config_loader.py analog): ${ENV} substitution, defaults, fail-fast
  * on unset/unknown, and the typed mappings into the session builder
  * inputs and IncrementalPipeline.Config.
  */
class RuntimeConfigSpec extends AnyFunSuite {

  private val env = Map(
    "SPARK_MASTER_HOST" -> "spark-main",
    "SPARK_MASTER_PORT" -> "7077",
    "DATA_ROOT" -> "/data/in")

  test("parses a full config with ${ENV} substitution") {
    val cfg = RuntimeConfig.parse(
      """# comments survive properties parsing
        |spark.master = spark://${SPARK_MASTER_HOST}:${SPARK_MASTER_PORT}
        |spark.app_name = graft-prod
        |spark.shuffle_partitions = 256
        |spark.conf.spark.sql.adaptive.enabled = true
        |pipeline.input_base_dir = ${DATA_ROOT}/batches
        |pipeline.batch_prefix = policies_
        |pipeline.manifest_path = ${DATA_ROOT}/state/manifest.json
        |pipeline.metadata_path = /etc/graft/metadata.json
        |sub.env_name = prod
        |""".stripMargin, env)
    assert(cfg.master == "spark://spark-main:7077")
    assert(cfg.appName == "graft-prod")
    assert(cfg.shufflePartitions.contains(256))
    assert(cfg.sparkConf == Map("spark.sql.adaptive.enabled" -> "true"))
    assert(cfg.inputBaseDir.contains("/data/in/batches"))
    assert(cfg.substitutions == Map("env_name" -> "prod"))
    val pc = cfg.pipelineConfig("run-42")
    assert(pc.inputBaseDir == "/data/in/batches")
    assert(pc.batchPrefix == "policies_")
    assert(pc.manifestPath == "/data/in/state/manifest.json")
    assert(pc.runId == "run-42")
    assert(pc.substitutions == Map("env_name" -> "prod"))
  }

  test("${NAME:-default} falls back; set variables win over defaults") {
    val cfg = RuntimeConfig.parse(
      "spark.master = local[${CORES:-8}]\nspark.app_name = ${DATA_ROOT:-x}", env)
    assert(cfg.master == "local[8]")
    assert(cfg.appName == "/data/in")
  }

  test("unset variable without default fails at load, naming the variable") {
    val e = intercept[IllegalArgumentException] {
      RuntimeConfig.parse("spark.master = spark://${NO_SUCH_HOST}:7077", env)
    }
    assert(e.getMessage.contains("NO_SUCH_HOST"))
  }

  test("unknown keys are rejected (a typo must not silently configure nothing)") {
    val e = intercept[IllegalArgumentException] {
      RuntimeConfig.parse("spark.mater = local[4]", env)
    }
    assert(e.getMessage.contains("spark.mater"))
  }

  test("non-integer shuffle partitions and incomplete pipeline block fail typed") {
    intercept[IllegalArgumentException] {
      RuntimeConfig.parse("spark.shuffle_partitions = many", env)
    }
    val cfg = RuntimeConfig.parse("pipeline.input_base_dir = /in", env)
    val e = intercept[IllegalArgumentException] { cfg.pipelineConfig("r") }
    assert(e.getMessage.contains("batch_prefix"))
  }

  test("defaults: local[*] master, graft app name, empty maps") {
    val cfg = RuntimeConfig.parse("", env)
    assert(cfg.master == "local[*]")
    assert(cfg.appName == "graft")
    assert(cfg.shufflePartitions.isEmpty)
    assert(cfg.sparkConf.isEmpty && cfg.substitutions.isEmpty)
  }
}

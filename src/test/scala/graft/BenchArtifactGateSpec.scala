package graft

import org.scalatest.funsuite.AnyFunSuite

/** The committed-perf-record gate (round-15 VERDICT item 6): Bench
  * self-labels a leg `"contaminated": true` when end-of-run load shows
  * another process competed for its cores, but a label nobody checks
  * is not a gate. This spec scans EVERY committed BENCH_*.json and
  * fails the build if any is contaminated, carries failed queries, or
  * does not parse — so `sbt test` (which must stay green to commit a
  * round) refuses a poisoned perf record instead of trusting the
  * committer to notice. tools/gate_bench.py is the same check as a
  * pre-commit CLI for a leg that hasn't been copied into the repo yet.
  */
class BenchArtifactGateSpec extends AnyFunSuite {

  private def repoRoot: java.io.File = {
    // forked tests run with cwd = project base; fail loudly (never
    // skip) if that assumption breaks rather than silently gating
    // nothing
    val d = new java.io.File(sys.props("user.dir")).getCanonicalFile
    assert(new java.io.File(d, "build.sbt").isFile,
      s"cannot locate repo root from ${d.getPath} — gate would scan nothing")
    d
  }

  private def benchFiles: Seq[java.io.File] = {
    val root = repoRoot
    Seq(root, new java.io.File(root, "tools")).flatMap { d =>
      Option(d.listFiles()).toSeq.flatten
        .filter(f => f.getName.startsWith("BENCH_") && f.getName.endsWith(".json"))
    }.sortBy(_.getPath)
  }

  test("every committed bench artifact parses, is uncontaminated, and has no failed queries") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val files = benchFiles
    assert(files.nonEmpty, "no BENCH_*.json artifacts found — gate would pass vacuously")
    val problems = files.flatMap { f =>
      val text = scala.io.Source.fromFile(f, "UTF-8").mkString
      scala.util.Try(JsonMethods.parse(text)) match {
        case scala.util.Failure(e) =>
          Some(s"${f.getName}: does not parse (${e.getMessage}) — truncated artifact?")
        case scala.util.Success(ast) =>
          val o = ast.asInstanceOf[JObject]
          val contaminated = o.obj.collectFirst {
            case ("contaminated", JBool(b)) => b
          }.getOrElse(false) // pre-r15 artifacts predate the label
          val failed = o.obj.collectFirst {
            case ("failed", JArray(xs)) => xs.size
          }.getOrElse(0)
          if (contaminated)
            Some(s"${f.getName}: self-labeled contaminated — its wall times " +
              "measured CPU contention, not the queries; re-run the leg serially")
          else if (failed > 0)
            Some(s"${f.getName}: $failed queries failed during the run — " +
              "a crashed query's time-to-failure must not enter the perf record")
          else None
      }
    }
    assert(problems.isEmpty, problems.mkString("\n"))
  }
}

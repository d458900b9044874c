package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{ExtractionPipelineMain, TransformationPipeline}

/** CLI harness behavior (arg parsing happens before any session exists). */
class TransformationPipelineSpec extends AnyFunSuite {

  test("parseArgs extracts --key value pairs; later occurrence wins") {
    val args = TransformationPipeline.parseArgs(
      Array("--input-dir", "/in", "--output-dir", "/out", "--input-dir", "/in2"))
    assert(args == Map("input-dir" -> "/in2", "output-dir" -> "/out"))
  }

  test("parseArgs ignores tokens that are not --key value shaped") {
    val args = TransformationPipeline.parseArgs(Array("stray", "--a", "1"))
    assert(args.isEmpty) // pairing is positional: (stray, --a) is malformed
  }

  test("main rejects missing required args before building a session") {
    val e = intercept[IllegalArgumentException] {
      ExtractionPipelineMain.main(Array("--input-dir", "/in"))
    }
    assert(e.getMessage.contains("--output-dir"))
  }
}

package graft.steps

import org.scalatest.funsuite.AnyFunSuite

/** Command-surface hygiene for the step transform registries (r13
  * review): the k=v parser accepts any key, so unknown-parameter
  * rejection is what keeps a typo'd OPTIONAL key (`chunks=` for
  * `chunk=`) from silently selecting a default. Spark-free — the
  * rejection runs before any transform body is dispatched.
  */
class TransformsSpec extends AnyFunSuite {

  test("every PIPELINE transform declares its parameter vocabulary") {
    assert(Transforms.registry.keySet === Transforms.allowedKeys.keySet)
  }

  test("every STREAM transform declares its parameter vocabulary") {
    assert(StreamTransforms.registry.keySet === StreamTransforms.allowedKeys.keySet)
  }

  test("a typo'd optional parameter fails loudly instead of using the default") {
    val e = intercept[IllegalArgumentException] {
      Transforms.resolve("paragraph_dedup in=docs chunks=5", null)
    }
    assert(e.getMessage.contains("unknown parameter"))
    assert(e.getMessage.contains("chunks"))
    assert(e.getMessage.contains("chunk")) // the allowed list names the fix
  }

  test("a typo'd STREAM parameter fails loudly") {
    val e = intercept[IllegalArgumentException] {
      StreamTransforms.resolve("bloom_ingest_stream dir=d ckpt=c maxfile=2", null)
    }
    assert(e.getMessage.contains("unknown parameter"))
    assert(e.getMessage.contains("maxfile"))
  }

  test("declared keys still dispatch (rejection is unknown-keys only)") {
    // reaches the transform body, which needs a real ctx — the NPE is
    // proof the command cleared parameter validation
    intercept[NullPointerException] {
      Transforms.resolve("paragraph_dedup in=docs chunk=5", null)
    }
  }
}

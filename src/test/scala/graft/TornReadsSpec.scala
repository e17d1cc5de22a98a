package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TornReads

/** Pins the ONE shared torn-read classification set (VERDICT r18: five
  * drifting copies meant a torn read surfacing as FILE_NOT_EXIST text
  * retried in the demos but was fatal in embeddingDupProbe — a new
  * signature must land in TornReads and nowhere else). */
class TornReadsSpec extends AnyFunSuite {

  test("every pinned signature classifies as torn, at top level and nested") {
    val expected = Seq(
      "PATH_NOT_FOUND", "does not exist", "FILE_NOT_EXIST",
      "FAILED_READ_FILE", "FileNotFound",
      "UNABLE_TO_INFER_SCHEMA", "Unable to infer schema")
    // the set itself is the contract: a removal silently turns clean
    // retries into fatal reader deaths at every call site at once
    assert(TornReads.signatures === expected)
    expected.foreach { sig =>
      assert(TornReads.matches(new RuntimeException(s"xx $sig yy")),
        s"top-level $sig")
      assert(TornReads.matches(new RuntimeException("outer wrapper",
        new IllegalStateException(s"cause carries $sig"))), s"nested $sig")
    }
  }

  test("a raw FileNotFoundException matches by TYPE even with a null message") {
    assert(TornReads.matches(new java.io.FileNotFoundException()))
    assert(TornReads.matches(
      new RuntimeException("wrapped", new java.io.FileNotFoundException())))
  }

  test("non-torn failures propagate: null messages and real errors do not match") {
    assert(!TornReads.matches(new RuntimeException(null: String)))
    assert(!TornReads.matches(new IllegalStateException(
      "store pins a different outlier routing table")))
    assert(!TornReads.matches(new RuntimeException("wrapper",
      new ArithmeticException("/ by zero"))))
  }

  test("the cause walk is depth-bounded, deep enough for Spark's 2-4 wrap") {
    def chain(depth: Int, inner: Throwable): Throwable =
      (1 to depth).foldLeft(inner)((e, i) => new RuntimeException(s"wrap $i", e))
    assert(TornReads.matches(chain(4, new java.io.FileNotFoundException("f"))))
    assert(TornReads.matches(chain(13, new java.io.FileNotFoundException("f"))))
    // past the bound: bounded walks never loop on cyclic causes
    assert(!TornReads.matches(chain(20, new java.io.FileNotFoundException("f"))))
  }
}

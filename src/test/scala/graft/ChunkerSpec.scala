package graft

import graft.functions.TextFns
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

/** Chunker invariants (SURVEY §5.2/§5.3; semantics from vdb.py:41-43). */
class ChunkerSpec extends SparkSpec {

  private def check(prop: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("empty text yields no chunks") {
    assert(TextFns.chunkText("", 128, 64).isEmpty)
  }

  test("short text yields exactly one full chunk") {
    assert(TextFns.chunkText("abc", 128, 64) == Seq("abc"))
  }

  test("chunk boundaries follow stride and size") {
    val s = "0123456789" * 10 // 100 chars
    val got = TextFns.chunkText(s, 40, 10)
    assert(got.forall(_.length <= 40))
    assert(got.head == s.substring(0, 40))
    assert(got(1) == s.substring(30, 70))
  }

  test("non-ASCII text chunks by characters, not bytes") {
    val s = "漢字" * 50 // 100 chars
    val got = TextFns.chunkText(s, 30, 10)
    assert(got.forall(_.length <= 30))
    assert(got.head.length == 30)
  }

  test("property: chunks reconstruct the text (coverage, order)") {
    val gen = for {
      text <- Gen.asciiPrintableStr.suchThat(_.length < 2000)
      size <- Gen.choose(2, 100)
      overlap <- Gen.choose(0, size - 1)
    } yield (text, size, overlap)
    check(Prop.forAll(gen) { case (text, size, overlap) =>
      val stride = size - overlap
      val chunks = TextFns.chunkText(text, size, overlap)
      val rebuilt = chunks.zipWithIndex.map { case (c, i) =>
        // strip the overlap prefix of every non-first chunk
        if (i == 0) c else c.drop(math.min(overlap, c.length))
      }.mkString
      val coverOk = text.isEmpty || rebuilt == text ||
        // trailing chunks fully inside the previous window can shorten rebuilt
        text.startsWith(rebuilt)
      chunks.forall(_.length <= size) && coverOk &&
        chunks.zipWithIndex.forall { case (c, i) =>
          text.drop(i * stride).take(size) == c
        }
    })
  }

  test("Column chunker matches the Scala mirror on real docs") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(50)
    val viaCol = docs
      .select(col("doc_id"), posexplode(TextFns.chunk(col("text"), 128, 64)).as(Seq("pos", "chunk")))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .toSet
    val viaScala = docs.select("doc_id", "text").collect().flatMap { r =>
      TextFns.chunkText(r.getString(1), 128, 64).zipWithIndex.map {
        case (c, i) => (r.getLong(0), i, c)
      }
    }.toSet
    assert(viaCol == viaScala)
  }
}

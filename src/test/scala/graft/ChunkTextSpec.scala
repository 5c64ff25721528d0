package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.ChunkText

/** O-CHUNK properties + hand-computed cases of the public recursive
  * splitter semantics (chunk_splitter_service.py:15 — size 700 /
  * overlap 200). Property loops sample scalacheck generators with a
  * fixed seed (no scalatestplus bridge needed in the offline cache). */
class ChunkTextSpec extends AnyFunSuite {

  private def samples[T](gen: Gen[T], n: Int = 200): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("short text is a single trimmed chunk") {
    assert(ChunkText.splitText("hello world") == Seq("hello world"))
    assert(ChunkText.splitText("  hello  ") == Seq("hello"))
  }

  test("empty and null produce no chunks") {
    assert(ChunkText.splitText("") == Seq.empty)
    assert(ChunkText.splitText(null) == Seq.empty)
    assert(ChunkText.splitText("   ") == Seq.empty)
  }

  test("greedy merge with overlap carry (size 7, overlap 3)") {
    // splits: "ab"(2), " cd"(3), " ef"(3); 2+3+3 > 7 → emit "ab cd",
    // pop "ab", keep " cd" as the overlap, append " ef" → "cd ef"
    assert(ChunkText.splitText("ab cd ef", 7, 3) == Seq("ab cd", "cd ef"))
  }

  test("no overlap kept when tail exceeds overlap budget (size 5, overlap 2)") {
    assert(ChunkText.splitText("ab cd ef", 5, 2) == Seq("ab cd", "ef"))
  }

  test("oversize unsplittable token falls through to char split") {
    assert(ChunkText.splitText("abcdefgh ij", 5, 1) == Seq("abcde", "efgh", "ij"))
  }

  test("paragraph separator preferred over space") {
    val text = "aaa bbb\n\nccc ddd"
    // "\n\n" present → split there first; both halves fit in 8
    assert(ChunkText.splitText(text, 8, 2) == Seq("aaa bbb", "ccc ddd"))
  }

  private val wordGen = Gen.listOfN(3, Gen.alphaLowerChar).map(_.mkString)
  private val textGen = for {
    n <- Gen.choose(0, 300)
    ws <- Gen.listOfN(n, wordGen)
  } yield ws.mkString(" ")

  test("property: every chunk fits in chunkSize unless a single token exceeds it") {
    samples(textGen).foreach { text =>
      ChunkText.splitText(text, 50, 10).foreach { c =>
        assert(c.length <= 50 || !c.contains(" "), s"oversize chunk: '$c'")
      }
    }
  }

  test("property: chunks are trimmed non-empty substrings appearing in order") {
    samples(textGen).foreach { text =>
      val chunks = ChunkText.splitText(text, 50, 10)
      var from = 0
      chunks.foreach { c =>
        assert(c.nonEmpty && c == c.trim)
        val i = text.indexOf(c, from)
        assert(i >= 0, s"chunk '$c' not found in order in '$text'")
        // overlap: the next chunk may start before this one ends, but
        // never before this one starts
        from = i
      }
    }
  }

  test("property: full coverage — every word lands in at least one chunk") {
    samples(textGen).foreach { text =>
      val covered = ChunkText.splitText(text, 50, 10).flatMap(_.split(" ")).toSet
      text.split(" ").filter(_.nonEmpty).foreach { w =>
        assert(covered.contains(w), s"word '$w' lost from '$text'")
      }
    }
  }

  test("default 700/200 on a long text keeps overlap between neighbors") {
    val text = (1 to 400).map(i => s"word$i").mkString(" ")
    val chunks = ChunkText.splitText(text)
    assert(chunks.length > 1)
    assert(chunks.forall(_.length <= 700))
    chunks.sliding(2).foreach {
      case Seq(a, b) =>
        val shared = a.split(" ").toSet.intersect(b.split(" ").toSet)
        assert(shared.nonEmpty, "no overlap carried")
      case _ =>
    }
  }
}

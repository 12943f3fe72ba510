package graft

import graft.ops.TextStats
import org.apache.spark.sql.functions._

/** Sliding-window document chunking (TextStats.chunkDocuments): grain,
  * overlap semantics, trailing-chunk truncation, empty-doc elision, and
  * the map-only plan shape. */
class ChunkSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("chunks advance by stride with size-token windows") {
    // 10 tokens, size 4, stride 3 -> starts 0,3,6,9
    val d = docs(1L -> "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")
    val out = TextStats.chunkDocuments(d, "doc_id", "text", 4, 3)
      .orderBy("chunk_idx").collect()
    assert(out.length == 4)
    assert(out.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(out(0).getString(4) == "t0 t1 t2 t3")
    assert(out(1).getString(4) == "t3 t4 t5 t6")
    assert(out(2).getString(4) == "t6 t7 t8 t9")
    // trailing chunk truncates: one token left at start 9
    assert(out(3).getString(4) == "t9" && out(3).getLong(3) == 1L)
    assert(out.take(3).forall(_.getLong(3) == 4L))
  }

  test("doc shorter than size yields one full-doc chunk; empty doc none") {
    val d = docs(1L -> "a b", 2L -> "", 3L -> "   ")
    val out = TextStats.chunkDocuments(d, "doc_id", "text", 8, 8).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 1L && out.head.getString(4) == "a b")
    assert(out.head.getLong(3) == 2L)
  }

  test("stride == size tiles without overlap and covers every token") {
    val d = docs(1L -> (0 until 17).map(i => s"w$i").mkString(" "))
    val out = TextStats.chunkDocuments(d, "doc_id", "text", 5, 5)
      .orderBy("chunk_idx").collect()
    assert(out.length == 4) // 5+5+5+2
    assert(out.map(_.getLong(3)).sum == 17L)
    val rejoined = out.map(_.getString(4)).mkString(" ")
    assert(rejoined == (0 until 17).map(i => s"w$i").mkString(" "))
  }

  test("invalid size/stride rejected") {
    val d = docs(1L -> "a b c")
    intercept[IllegalArgumentException] {
      TextStats.chunkDocuments(d, "doc_id", "text", 4, 5) // stride > size
    }
    intercept[IllegalArgumentException] {
      TextStats.chunkDocuments(d, "doc_id", "text", 0, 1)
    }
  }

  test("plan is map-only: a Generate inside the scan stage, no exchange") {
    val d = docs(1L -> "a b c d e f g h")
    val plan = TextStats.chunkDocuments(d, "doc_id", "text", 4, 2)
      .queryExecution.executedPlan
    def hasExchange(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.getClass.getSimpleName.contains("Exchange") ||
        p.children.exists(hasExchange)
    assert(!hasExchange(plan))
    assert(plan.toString.contains("Generate"))
  }

  test("lengthBatches: banded (n_tokens, id) order, batchSize cuts, " +
    "per-batch padding accounting — worked example") {
    def word(n: Int) = Seq.fill(n)("w").mkString(" ")
    val d = docs(1L -> word(3), 2L -> word(3), 3L -> word(2),
      4L -> word(5), 5L -> word(6), 6L -> word(7),
      7L -> word(9), 8L -> word(8))
    val out = TextStats.lengthBatches(d, "doc_id", "text",
        bandWidth = 4, batchSize = 2)
      .orderBy("band", "batch_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(out.toSeq == Seq(
      // band 0 (lens 2,3,3): [2,3] pads 1 of 6; [3] pads 0
      (0L, 0L, 2L, 3L, 5L, 6L, 0.166667),
      (0L, 1L, 1L, 3L, 3L, 3L, 0.0),
      // band 1 (lens 5,6,7): [5,6] pads 1 of 12; [7] pads 0
      (1L, 0L, 2L, 6L, 11L, 12L, 0.083333),
      (1L, 1L, 1L, 7L, 7L, 7L, 0.0),
      // band 2 (lens 8,9): [8,9] pads 1 of 18
      (2L, 0L, 2L, 9L, 17L, 18L, 0.055556)))
  }
}

package graft

import graft.ops.FuzzyJoin
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(dom: Seq[(Long, String)], d: Int): Set[(Long, Long, Long)] = {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val t = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      dp(a.length)
    }
    (for {
      (ia, sa) <- dom; (ib, sb) <- dom if ia < ib
      dist = lev(sa, sb) if dist <= d
    } yield (ia, ib, dist.toLong)).toSet
  }

  test("known distances: subst, insert, delete, transposition, over-threshold") {
    val dom = Seq(
      1L -> "kettle", 2L -> "kattle",      // subst → 1
      3L -> "kettles",                     // insert vs 1 → 1
      4L -> "ketle",                       // delete vs 1 → 1
      5L -> "ketlte",                      // transposition vs 1 → 2
      6L -> "bottle",                      // 3 from kettle → excluded at d=2
      7L -> "zzzzzz")
    val out = FuzzyJoin.selfPairs(dom.toDF("id", "s"), "id", "s", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == brute(dom, 2))
    assert(out.contains((1L, 2L, 1L)) && out.contains((1L, 3L, 1L)) &&
      out.contains((1L, 4L, 1L)) && out.contains((1L, 5L, 2L)))
    assert(!out.contains((1L, 6L, 3L))) // kettle↔bottle beyond d=2
    assert(!out.exists(p => p._1 == 7L || p._2 == 7L)) // zzzzzz matches nothing
  }

  test("lossless vs brute force on a mixed fixture (short strings included)") {
    // deterministic mutations of seed words: substitutions, indels,
    // duplicates, and sub-q(d+1) short strings (the nested-loop path)
    val seeds = Seq("alabaster", "alignment", "cardboard", "carpenter",
      "ab", "abc", "a", "", "abcd", "abcde")
    val dom = seeds.zipWithIndex.flatMap { case (w, i) =>
      val base = (i * 10L) -> w
      val sub = (i * 10L + 1) -> (if (w.nonEmpty) "x" + w.drop(1) else "x")
      val ins = (i * 10L + 2) -> (w + "q")
      val del = (i * 10L + 3) -> w.dropRight(1)
      Seq(base, sub, ins, del)
    }
    val out = FuzzyJoin.selfPairs(dom.toDF("id", "s"), "id", "s", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == brute(dom, 2))
    assert(out.nonEmpty)
  }

  test("q=3 and q=4 agree with q=2 (parameter-independent semantics)") {
    val dom = Seq(1L -> "federated", 2L -> "fedarated", 3L -> "federatedly",
      4L -> "confederate", 5L -> "fodder", 6L -> "federated")
    val df = dom.toDF("id", "s")
    val r2 = FuzzyJoin.selfPairs(df, "id", "s", 2, q = 2).collect().toSeq
    val r3 = FuzzyJoin.selfPairs(df, "id", "s", 2, q = 3).collect().toSeq
    val r4 = FuzzyJoin.selfPairs(df, "id", "s", 2, q = 4).collect().toSeq
    assert(r2 == r3 && r3 == r4)
  }

  test("adversarial shared-prefix corpus: hot grams fall out of the" +
    " rarity prefix (candidates bounded, not quadratic) and the join" +
    " stays lossless vs brute force") {
    // every string carries the corpus-wide constant prefix
    // "CAMERA-FEED-" — its grams have df = n and would make an
    // all-grams join quadratic; rare-first prefix indexing must keep
    // them out of every indexed prefix
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    val n = 300
    val base = (0 until n).map(i =>
      i.toLong -> s"CAMERA-FEED-${md5hex(i.toString)}")
    // planted near-dups: chars 2/3 of the suffix transposed on every
    // 10th string (distance ≤ 2)
    val planted = base.collect { case (i, s) if i % 10 == 0 =>
      (i + 100000L) -> (s.substring(0, 13) + s.charAt(14) + s.charAt(13) +
        s.substring(15))
    }
    val dom = base ++ planted
    val df = dom.toDF("id", "s")
    val cand = FuzzyJoin.candidates(df, "id", "s", 2, 4).count()
    val naive = dom.size.toLong * (dom.size - 1) / 2
    // bounded: collisions only through RARE suffix grams, so the
    // candidate count tracks the planted pairs, not n^2
    assert(cand <= 20L * dom.size,
      s"hot-prefix corpus produced $cand candidates (naive $naive)")
    val out = FuzzyJoin.selfPairs(df, "id", "s", 2, q = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == brute(dom, 2))
    assert(out.size >= planted.size) // every planted pair found
  }

  test("autoQ: rarity floor rises on an alphabet-limited corpus, " +
    "short-string ceiling wins on a name corpus, clamped to [2,8], " +
    "and the auto default (q=0) stays lossless") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    // 2000 32-char hex strings: |Σ| = 16, p10 len = 32, maxDist 2 →
    // ceiling (32+1)/3 = 11, floor ceil(log(64·2000)/log 16) = 5
    val hex = (0 until 2000).map(i => i.toLong -> md5hex(i.toString))
    val qHex = FuzzyJoin.autoQ(hex.toDF("id", "s"), "s", 2)
    assert(qHex == 5, s"hex corpus derived q=$qHex")
    // short names: p10 length ~4 → ceiling (4+1)/3 = 1 → clamp to 2
    val names = (0 until 500).map(i => i.toLong -> s"n${i % 97}ab")
    val qNames = FuzzyJoin.autoQ(names.toDF("id", "s"), "s", 2)
    assert(qNames == 2, s"name corpus derived q=$qNames")
    // empty corpus falls back to 2 without dividing by zero
    assert(FuzzyJoin.autoQ(Seq.empty[(Long, String)].toDF("id", "s"),
      "s", 2) == 2)
    // the auto dial is only a candidate-volume choice: same answer
    val dom = Seq(1L -> "federated", 2L -> "fedarated", 3L -> "fodder",
      4L -> "ab", 5L -> "a", 6L -> "federated")
    val auto = FuzzyJoin.selfPairs(dom.toDF("id", "s"), "id", "s", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(auto == brute(dom, 2))
  }

  test("sub-q strings carry NO phantom gram: a len<q corpus flows " +
    "only through the degenerate value-domain block and stays " +
    "lossless") {
    // with q=4 every string here is sub-q; before the guard,
    // sequence(1,0) handed each one a whole-string 'gram' that put it
    // in the prefix index
    val dom = Seq(1L -> "ab", 2L -> "ba", 3L -> "abc", 4L -> "xyz",
      5L -> "ab", 6L -> "", 7L -> "a")
    val out = FuzzyJoin.selfPairs(dom.toDF("id", "s"), "id", "s", 2, q = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == brute(dom, 2))
    // and a mixed corpus (one long string among sub-q ones) keeps the
    // two paths disjoint: no duplicate pairs from double-counting
    val mixed = dom :+ (8L -> "completely-long-string-value")
    val rows = FuzzyJoin.selfPairs(mixed.toDF("id", "s"), "id", "s", 2,
        q = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == rows.distinct.length, "duplicate pairs")
    assert(rows.map(p => (p._1, p._2)).toSet ==
      brute(mixed, 2).map(t => (t._1, t._2)))
  }

  test("resolveEntities: typo CHAINS collapse transitively (pairwise" +
    " distance between extremes exceeds maxDist); canonical is the" +
    " min-id member's name; singletons self-resolve") {
    val df = Seq(
      (10L, "aaaaaaaa"),  // chain a—b—c—d: d(a,d) = 3 > maxDist 2
      (11L, "aaaaaaab"),
      (12L, "aaaaaabb"),
      (13L, "aaaaabbb"),
      (20L, "zzzzzzzz"))  // unrelated singleton
      .toDF("id", "s")
    val out = graft.ops.Pipelines.resolveEntities(df, "id", "s",
        maxDist = 2, q = 2, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (10L, 10L, "aaaaaaaa"), (11L, 10L, "aaaaaaaa"),
      (12L, 10L, "aaaaaaaa"), (13L, 10L, "aaaaaaaa"),
      (20L, 20L, "zzzzzzzz")))
  }
}

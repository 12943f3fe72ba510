package graft

import graft.ops.Checks

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private def t = Seq(
    (1L, Some(5.0), "A"), (2L, Some(20.0), "N"),
    (2L, None, "X"), (3L, Some(-1.0), "A"))
    .toDF("id", "v", "flag")

  test("rowChecks: per-check violation counts; a null splits between" +
    " not_null and in_range, never double-counted") {
    val out = Checks.rowChecks(t, Seq(
      Checks.notNull("v"), Checks.inRange("v", 0.0, 10.0),
      Checks.accepted("flag", Seq("A", "N"))))
      .orderBy("check").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSeq
    assert(out == Seq(
      ("accepted_values", "flag", 4L, 1L, false),
      ("in_range", "v", 4L, 2L, false), // 20.0 and -1.0; null excluded
      ("not_null", "v", 4L, 1L, false)))
  }

  test("rowChecks runs every row-local check in ONE pass — the input" +
    " appears once in the plan") {
    val plan = Checks.rowChecks(t, Seq(
      Checks.notNull("v"), Checks.inRange("v", 0.0, 10.0),
      Checks.accepted("flag", Seq("A", "N"))))
      .queryExecution.executedPlan.toString
    assert(plan.split("LocalTableScan").length - 1 == 1,
      s"expected a single scan of the input:\n$plan")
  }

  test("unique: composite key resolves duplicates the single key" +
    " reports; foreignKey counts unmatched non-null children") {
    val u1 = Checks.unique(t, Seq("id"), "t.id").collect().head
    assert(u1.getLong(2) == 4L && u1.getLong(3) == 1L &&
      !u1.getBoolean(4))
    val u2 = Checks.unique(t, Seq("id", "flag"), "t.(id,flag)")
      .collect().head
    assert(u2.getLong(3) == 0L && u2.getBoolean(4))
    val parent = Seq(1L, 2L).toDF("pid")
    val fk = Checks.foreignKey(t, "id", parent, "pid", "t.id->p.pid")
      .collect().head
    assert(fk.getLong(2) == 4L && fk.getLong(3) == 1L &&
      !fk.getBoolean(4))
  }

  test("kAnonymity: summary counts and suppression worklist; an" +
    " empty table is vacuously anonymous") {
    val d = Seq(("a", "x"), ("a", "x"), ("a", "x"),
      ("b", "y"), ("b", "y"), ("c", "z")).toDF("q1", "q2")
    val s = Checks.kAnonymity(d, Seq("q1", "q2"), 3L).collect().head
    assert((s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3),
      s.getBoolean(4)) == (3L, 2L, 3L, 1L, false))
    val w = Checks.kAnonymityGroups(d, Seq("q1", "q2"), 3L)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2))).toSet
    assert(w == Set(("b", "y", 2L), ("c", "z", 1L)))
    val e = Checks.kAnonymity(
      Seq.empty[(String, String)].toDF("q1", "q2"),
      Seq("q1", "q2"), 3L).collect().head
    assert(e.getLong(0) == 0L && e.getBoolean(4))
  }

  test("lDiversity: distinct-sensitive counts per quasi-group; a" +
    " k-anonymous group with one sensitive value is flagged") {
    // group (a): 3 rows but only 1 distinct sensitive value — the
    // case k-anonymity alone waves through
    val d = Seq(("a", "s1"), ("a", "s1"), ("a", "s1"),
      ("b", "s1"), ("b", "s2")).toDF("q", "s")
    val sumr = Checks.lDiversity(d, Seq("q"), "s", 2L).collect().head
    assert((sumr.getLong(0), sumr.getLong(1), sumr.getLong(2),
      sumr.getBoolean(3)) == (2L, 1L, 1L, false))
    val w = Checks.lDiversityGroups(d, Seq("q"), "s", 2L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(w == Set(("a", 1L)))
  }

  test("empty table: zero rows, every check passes") {
    val e = Seq.empty[(Long, Option[Double], String)]
      .toDF("id", "v", "flag")
    val rows = Checks.suite(Seq(
      Checks.rowChecks(e, Seq(Checks.notNull("v"))),
      Checks.unique(e, Seq("id"), "e.id"),
      Checks.foreignKey(e, "id", Seq(1L).toDF("pid"), "pid", "fk")))
      .collect()
    assert(rows.length == 3)
    assert(rows.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L &&
      r.getBoolean(4)))
  }
}

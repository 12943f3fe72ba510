package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.SparkPlan
import graft.io.Toll

/** Toll-gate wide-CSV source (reference scripts/syntetic.py:20-29 and
  * data/data_tol_500.csv): header row = gate names, cells = dd/MM/yyyy
  * HH:mm:ss arrivals. Pins the unpivot grain, the timestamp parse, the
  * headway math, the malformed-cell quarantine contract, and that the
  * long-grain plan contains no exchange (the unpivot is map-side).
  */
class TollSpec extends SparkSpec {

  private def writeWide(rows: Seq[String], header: String): String = {
    val dir = Files.createTempDirectory("toll").toFile
    val f = new java.io.File(dir, "toll.csv")
    val w = new java.io.PrintWriter(f)
    try { w.println(header); rows.foreach(w.println) } finally w.close()
    f.getAbsolutePath
  }

  test("wide CSV unpivots to (gate, arrival) at rows x gates grain") {
    val path = writeWide(
      Seq("01/01/1970 07:00:00,01/01/1970 06:00:00",
          "01/01/1970 07:00:24,01/01/1970 06:00:29",
          "01/01/1970 07:00:40,01/01/1970 06:00:50"),
      header = "Gate A,Gate B")
    val long = Toll.readWideArrivals(spark, path)
    assert(long.columns.toSeq == Seq("gate", "arrival"))
    assert(long.count() == 6)
    val gates = long.select("gate").distinct().collect().map(_.getString(0))
    assert(gates.toSet == Set("Gate A", "Gate B"))
    // dd/MM/yyyy parse: 01/01/1970 07:00:00 UTC = epoch 25200
    val first = long.filter("gate = 'Gate A'")
      .selectExpr("min(unix_timestamp(arrival))").head.getLong(0)
    assert(first == 25200L)
  }

  test("headwayStats: mean headway telescopes to (last-first)/(n-1)") {
    val path = writeWide(
      Seq("01/01/1970 07:00:00,01/01/1970 06:00:00",
          "01/01/1970 07:00:24,01/01/1970 06:00:29",
          "01/01/1970 07:01:00,01/01/1970 06:00:58"),
      header = "Gate A,Gate B")
    val st = Toll.headwayStats(Toll.readWideArrivals(spark, path)).collect()
    assert(st.length == 2)
    val a = st.find(_.getString(0) == "Gate A").get
    // Gate A: 07:00:00 .. 07:01:00, 3 arrivals -> 60/2 = 30s
    assert(a.getLong(1) == 3L && a.getDouble(4) == 30.0)
    val b = st.find(_.getString(0) == "Gate B").get
    // Gate B: 06:00:00 .. 06:00:58 -> 58/2 = 29s
    assert(b.getDouble(4) == 29.0)
  }

  test("malformed cells become NULL arrivals, excluded from stats") {
    val path = writeWide(
      Seq("01/01/1970 07:00:00,garbage",
          "01/01/1970 07:00:30,01/01/1970 06:00:10"),
      header = "Gate A,Gate B")
    val long = Toll.readWideArrivals(spark, path)
    assert(long.filter("arrival IS NULL").count() == 1)
    val st = Toll.headwayStats(long).collect()
    val b = st.find(_.getString(0) == "Gate B").get
    assert(b.getLong(1) == 1L)
    assert(b.isNullAt(4)) // n=1 -> undefined headway, not a 0/0
  }

  test("single-arrival gate yields NULL mean headway, not divide-by-zero") {
    val path = writeWide(Seq("01/01/1970 07:00:00"), header = "Only Gate")
    val st = Toll.headwayStats(Toll.readWideArrivals(spark, path)).collect()
    assert(st.head.isNullAt(4))
  }

  test("long-grain plan has no exchange: unpivot is map-side Expand") {
    val path = writeWide(
      Seq("01/01/1970 07:00:00,01/01/1970 06:00:00"), header = "A,B")
    val plan: SparkPlan =
      Toll.readWideArrivals(spark, path).queryExecution.executedPlan
    def hasExchange(p: SparkPlan): Boolean =
      p.getClass.getSimpleName.contains("Exchange") ||
        p.children.exists(hasExchange)
    assert(!hasExchange(plan))
    assert(plan.toString.contains("Expand") ||
      plan.toString.toLowerCase.contains("unpivot"))
  }

  test("reads the reference's actual data_tol_500.csv when present") {
    val ref = new java.io.File("/root/reference/data/data_tol_500.csv")
    assume(ref.exists())
    val long = Toll.readWideArrivals(spark, ref.getAbsolutePath)
    assert(long.count() == 1500) // 500 rows x 3 gates (syntetic.py ROWS=500)
    val st = Toll.headwayStats(long).collect()
    assert(st.map(_.getString(0)).toSeq == Seq("Tol Jakarta-Cikampek",
      "Tol Kunciran-Serpong", "Tol Tangerang-Merak"))
    // generator draws gaps uniform in [5, 30]s (syntetic.py:27-28)
    st.foreach { r =>
      assert(r.getDouble(4) >= 5.0 && r.getDouble(4) <= 30.0)
    }
  }
}

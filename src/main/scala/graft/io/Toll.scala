package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Toll-gate wide-CSV source — the reference's auxiliary
  * `data/data_tol_500.csv` (generator `scripts/syntetic.py:20-29`): a wide
  * CSV whose header row is the list of toll-gate names and whose cells are
  * per-gate arrival timestamps in `dd/MM/yyyy HH:mm:ss`. Row *i* holds the
  * *i*-th arrival at every gate, so the wide grain is an artifact of the
  * generator; the analytical grain is the long `(gate, arrival)` event.
  *
  * Spark-first shape: the gate set lives in the header, so the column list
  * is discovered from the file and fed to `unpivot` — which lowers to a
  * single map-side `Expand` (one input row → one output row per gate, no
  * shuffle, no UDF). At 100 TB the CSV scan parallelizes by file splits
  * and the unpivot multiplies rows inside the scan stage; nothing here
  * ever exchanges.
  */
object Toll {

  /** The generator's strftime("%d/%m/%Y %H:%M:%S") (syntetic.py:27). */
  val TsFormat = "dd/MM/yyyy HH:mm:ss"

  /** Read the wide file and unpivot to the long (gate, arrival) grain.
    * Parse failures (a malformed cell) become NULL arrivals rather than
    * aborting the scan — the reference generator never emits them, but a
    * 100 TB ingest must not die on one bad cell; callers can quarantine
    * `arrival IS NULL` rows.
    */
  def readWideArrivals(s: SparkSession, path: String): DataFrame = {
    val wide = s.read.option("header", value = true).csv(path)
    // backtick-quote each header name: col() parses '.' as nested-field
    // access, so a gate named "Tol X. Y" would fail resolution even
    // though the CSV read succeeded (embedded backticks escape as ``)
    val cols: Array[Column] = wide.columns.map(c =>
      col(s"`${c.replace("`", "``")}`"))
    wide
      .unpivot(Array.empty[Column], cols, "gate", "arrival_str")
      .select(col("gate"), // try_: ANSI-safe NULL on malformed cells
        try_to_timestamp(col("arrival_str"), lit(TsFormat)).as("arrival"))
  }

  /** Per-gate arrival/headway summary on the long grain: arrival count,
    * first/last arrival (as epoch seconds — TZ-independent), and the mean
    * inter-arrival gap. The mean headway over a sorted sequence telescopes
    * to (last − first)/(n − 1), so the whole summary is one hash
    * aggregation with map-side partials — no per-gate sort, no window, no
    * hot-key hazard however many arrivals one gate accumulates.
    */
  def headwayStats(arrivals: DataFrame): DataFrame =
    arrivals
      .where(col("arrival").isNotNull)
      .groupBy("gate")
      .agg(
        count(lit(1)).as("n_arrivals"),
        min(unix_timestamp(col("arrival"))).as("first_epoch"),
        max(unix_timestamp(col("arrival"))).as("last_epoch"))
      .withColumn("mean_headway_sec",
        when(col("n_arrivals") > 1,
          (col("last_epoch") - col("first_epoch")).cast("double") /
            (col("n_arrivals") - lit(1)).cast("double")))
      .orderBy("gate")
}

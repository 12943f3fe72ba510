package graft

import graft.ops.Domains
import org.apache.spark.sql.functions._

class DomainsSpec extends SparkSpec {
  import spark.implicits._

  test("registeredDomain: two-label default, generic second-level " +
    "takes three, deep subdomains collapse, degenerate hosts pass " +
    "through, null stays null") {
    val out = Seq(
      "https://example.com/p",
      "https://www.example.co.uk/p",
      "https://a.b.example.org/p",
      "https://deep.sub.site.ac.jp/p",
      "https://localhost/p",
      "not a url at all")
      .toDF("url")
      .select(Domains.registeredDomain(Domains.hostOf(col("url")))
        .as("d"))
      .collect().map(r => Option(r.getString(0)))
    assert(out.toSeq == Seq(
      Some("example.com"),
      Some("example.co.uk"),   // generic 2nd level "co" -> 3 labels
      Some("example.org"),     // deep subdomain collapses to 2
      Some("site.ac.jp"),      // generic "ac" -> 3, extra label dropped
      Some("localhost"),       // single label passes through
      None))                   // unparseable -> null host -> null
  }

  test("domainCard: counts, distinct hosts, mean tokens, en fraction " +
    "and the keep rule") {
    val rows = Seq(
      (1L, "https://a.x.com/1", "en", "one two three"),
      (2L, "https://b.x.com/2", "en", "four five"),
      (3L, "https://a.x.com/3", "es", "seis"),
      (4L, "https://only.y.org/1", "de", "ein zwei"))
      .toDF("doc_id", "url", "lang", "text")
    val card = Domains.domainCard(rows, "url", "lang", "text",
        minDocs = 2L, minEnFrac = 0.5)
      .orderBy("domain").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
    assert(card.toSeq == Seq(
      ("x.com", 3L, 2L, 2.0, 0.666667, true), // en_frac rounded to 6dp
      ("y.org", 1L, 1L, 2.0, 0.0, false)))
  }

  test("filterByDomains: keeps only docs on kept domains, broadcast " +
    "semi-join plan (the corpus never reshuffles)") {
    val rows = (0L until 100L).map(i =>
      (i, s"https://h${i % 4}.dom${i % 5}.com/$i", "en", "w " * 5))
      .toDF("doc_id", "url", "lang", "text")
    val card = Domains.domainCard(rows, "url", "lang", "text",
      minDocs = 2L, minEnFrac = 0.5)
      .filter(col("domain").isin("dom0.com", "dom3.com") || !col("keep"))
    val kept = Domains.filterByDomains(rows, "url",
        card.withColumn("keep",
          col("domain").isin("dom0.com", "dom3.com")))
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == (0L until 100L).filter(i =>
      i % 5 == 0 || i % 5 == 3))
    val plan = Domains.filterByDomains(rows, "url", card)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftSemi"), plan)
  }
}

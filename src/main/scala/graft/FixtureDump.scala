package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.functions.ScalarOps
import graft.operators.RumorPipeline
import graft.sources.RumorSource

/** One-shot fixture generator: freezes the element-row scan of the
  * bundled rumor corpus (the default subjects) to a single parquet file
  * at [[RumorPipeline.ElementRowsFixture]], giving q61 — the relational
  * twin of the flagship pipeline — a DuckDB-readable input. Run via
  * `sbt "runMain graft.FixtureDump"`; the output is committed, so this
  * only needs re-running if the corpus or the HTML parser changes.
  */
object FixtureDump {
  /** Deterministic synthetic tag: 4 pages × 85 items with a 15-item
    * pagination overlap between consecutive pages, within-page repeats,
    * >80 items/page, and enough deduped volume that the 150-cap drops
    * page 4 — so q61's oracle exercises the per-page cap, both dedups,
    * the page cutoff, and every suppressSource branch (the tiny frozen
    * corpus alone never triggers the caps).
    */
  private def syntheticRows: Seq[RumorSource.ElementRow] = {
    val slug = "synthetic_team"
    for {
      page <- 1 to 4
      pos <- 0 to 85
    } yield {
      if (pos == 0) // one date header per page, same date => overlapping
        RumorSource.ElementRow(slug, 2, page, 0, "h2",
          "Rumors from October 15, 2025", "2025-10-15", "", "", "")
      else {
        // item n: pages overlap by 15 (page p covers (p-1)*70+1 .. +85)
        val n0 = (page - 1) * 70 + pos
        val n = if (pos % 9 == 0) n0 - 1 else n0 // within-page repeat
        val url = if (n % 13 == 0) "" else s"https://example.com/story$n"
        val source = (n % 3) match {
          case 0 => "" case 1 => "ESPN" case _ => "The Athletic"
        }
        val title = s"Synthetic rumor item number $n with plenty of text"
        val html = (n % 4) match {
          case 0 => s"""$title <a href="https://example.com/story$n/">Read more</a>"""
          case 1 => s"""$title <a href="https://elsewhere.example/x$n">espn</a>"""
          case 2 => s"""<a href="https://elsewhere.example/y$n">lead</a> $title."""
          case _ => s"$title."
        }
        val tag = if (n % 5 == 0) "li" else "p"
        RumorSource.ElementRow(slug, 2, page, pos, tag, title, "",
          url, source, html)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = Engine.session()
    val slugs = RumorPipeline.DefaultSubjects.split(",")
      .map(ScalarOps.clean).filter(_.nonEmpty).map(ScalarOps.slugify).toSeq
    // The q61 DuckDB oracle keys its per-page-cap / per-tag-dedup /
    // 150-cap windows on slug while the Spark pipeline keys them on
    // subject_idx; parity relies on the fixture's slug↔subject_idx
    // mapping being 1:1 (duplicate subjects would diverge silently).
    require(slugs.distinct.size == slugs.size,
      s"fixture subjects must slugify to distinct slugs, got $slugs")
    val rows = RumorSource.elementRows(spark, RumorPipeline.BundledCorpus, slugs)
      .unionByName(spark.createDataFrame(syntheticRows))
    val tmp = Files.createTempDirectory("element_rows_").toString
    rows.orderBy("subject_idx", "page_no", "doc_pos")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
      .find(_.endsWith(".parquet"))
      .getOrElse(sys.error(s"no parquet part written under $tmp"))
    val dest = Paths.get(RumorPipeline.ElementRowsFixture)
    Files.createDirectories(dest.getParent)
    Files.move(Paths.get(part), dest, StandardCopyOption.REPLACE_EXISTING)
    println(s"wrote $dest (${Files.size(dest)} bytes)")
    spark.stop()
  }
}

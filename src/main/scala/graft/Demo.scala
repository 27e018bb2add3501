package graft

/** End-to-end demo of the reference's signature query: crawl the bundled
  * corpus, run the full pipeline, print the JSON envelope and the
  * Presto-block HTML exactly as the reference would emit them.
  *
  * Usage: sbt "runMain graft.Demo [subjects]"
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val subjects =
      if (args.nonEmpty) args.mkString(" ")
      else operators.RumorPipeline.DefaultSubjects
    val spark = Engine.session(master = "local[4]", appName = "graft-demo")
    val items = operators.RumorPipeline.run(
      spark, operators.RumorPipeline.BundledCorpus, subjects)
    println("=== JSON envelope ===")
    println(operators.RumorPipeline.jsonEnvelope(subjects, items))
    println("=== Presto block ===")
    println(operators.RumorPipeline.prestoBlock(subjects, items))
    spark.stop()
  }
}

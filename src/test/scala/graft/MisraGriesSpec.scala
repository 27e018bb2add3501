package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MisraGriesAgg

/** The Misra-Gries sketch behind q95. The contract under test is the
  * one the two-pass heavy-hitter plan relies on: the candidate set is
  * a SUPERSET of every item with true frequency > n/k, and that
  * guarantee survives map-side partial aggregation + merge under any
  * partitioning (mergeable-summaries property).
  */
class MisraGriesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session(master = "local[4]")

  private def candidates(items: Seq[String], k: Int, parts: Int): Set[String] = {
    import spark.implicits._
    items.toDF("item").repartition(parts)
      .agg(MisraGriesAgg.misra_gries(col("item"), k).as("c"))
      .collect()(0).getSeq[String](0).toSet
  }

  private def trueHitters(items: Seq[String], k: Int): Set[String] =
    items.groupBy(identity).collect {
      case (it, occ) if occ.size.toLong * k > items.size => it
    }.toSet

  test("candidates cover all true hitters on skewed streams, any partitioning") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 8) {
      // zipf-ish: item i drawn with weight ~ 1/(i+1)
      val weights = (0 until 40).map(i => 1.0 / (i + 1))
      val total = weights.sum
      val items = Seq.fill(2000) {
        var u = rnd.nextDouble() * total
        var i = 0
        while (u > weights(i)) { u -= weights(i); i += 1 }
        s"w$i"
      }
      for (k <- Seq(4, 8, 16); parts <- Seq(1, 4, 13)) {
        val cand = candidates(items, k, parts)
        val hit = trueHitters(items, k)
        assert(hit.subsetOf(cand),
          s"trial $trial k=$k parts=$parts: missed ${hit -- cand}")
        assert(cand.size <= k - 1, s"sketch emitted ${cand.size} > k-1 items")
      }
    }
  }

  test("uniform stream with one dominant item isolates it") {
    val items = Seq.fill(900)("hot") ++ (0 until 900).map(i => s"u${i % 300}")
    // hot has 50% share; k=3 threshold is 600
    val cand = candidates(items, 3, 5)
    assert(cand.contains("hot"))
  }

  test("output array is sorted (deterministic regardless of map order)") {
    val items = Seq.fill(50)("b") ++ Seq.fill(50)("a") ++ Seq.fill(5)("z")
    import spark.implicits._
    val arr = items.toDF("item")
      .agg(MisraGriesAgg.misra_gries(col("item"), 4).as("c"))
      .collect()(0).getSeq[String](0)
    assert(arr == arr.sorted)
  }

  test("output order is UTF-8 binary order, matching array_sort") {
    // supplementary-plane item (U+10000, surrogate pair in UTF-16) vs
    // U+FFFD: Java String natural order puts "𐀀" BEFORE
    // "�" (code-unit compare), UTF-8 binary order puts it after —
    // the sketch contract is binary order, same as engine-side sorts
    val astral = new String(Character.toChars(0x10000))
    val items = Seq.fill(40)(astral) ++ Seq.fill(40)("�") ++ Seq.fill(40)("a")
    import spark.implicits._
    val row = items.toDF("item")
      .agg(MisraGriesAgg.misra_gries(col("item"), 5).as("c"),
        sort_array(collect_set(col("item"))).as("engine"))
      .collect()(0)
    val sketch = row.getSeq[String](0)
    val engine = row.getSeq[String](1)
    assert(sketch.toSet == Set(astral, "�", "a"))
    assert(sketch == engine.filter(sketch.contains))
  }
}

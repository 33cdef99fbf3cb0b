package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Filter-funnel audit: how many documents survive each stage of a
  * filtering pipeline — the report every corpus-curation run publishes
  * ("started with N docs; length filter kept X%, language filter kept
  * Y% of those, …"). Knowing WHERE documents die is as important as the
  * final corpus: a stage that drops 90% is either a bug or the whole
  * story of the dataset.
  *
  * Stages are cumulative conjunctions (a document reaches stage k iff it
  * passes filters 1..k), matching how a real pipeline short-circuits.
  *
  * Scale shape: ONE scan, one row of conditional-count aggregate slots —
  * the funnel costs a single pass regardless of stage count, never one
  * job per stage. The output is stage-count-sized (metadata, not data).
  */
object Funnel {

  /** `(stage, filter_name, survivors)` — stage 0 is the unfiltered total;
    * stage k counts rows passing every filter up to and including k. */
  def filterFunnel(df: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "at least one stage required")
    // cumulative conjunction: survivors at stage k passed all of 1..k
    val cum = stages.scanLeft(lit(true)) { case (acc, (_, pred)) => acc && pred }.tail
    val slots = count(lit(1)).as("s0") +:
      cum.zipWithIndex.map { case (c, i) =>
        count(when(c, lit(1))).as(s"s${i + 1}")
      }
    val row = df.agg(slots.head, slots.tail: _*).head()
    val out = ("total" +: stages.map(_._1)).zipWithIndex.map { case (name, i) =>
      Row(i, name, row.getLong(i))
    }
    df.sparkSession.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(out).asJava),
      StructType(Seq(
        StructField("stage", IntegerType, nullable = false),
        StructField("filter_name", StringType, nullable = false),
        StructField("survivors", LongType, nullable = false))))
  }
}

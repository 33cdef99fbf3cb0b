package graft.profiler

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog abstraction (reference R1/R2: Glue `GetTables` +
  * `spark.sqlContext.table`, Glue.java:154-171 / Profiler.scala:188-195,
  * 263). The engine profiles "every table of one database"; what a database
  * IS stays behind this trait so the zero-egress build can use a directory
  * of parquet files while a cluster build would plug in the session
  * catalog. */
trait TableCatalog {
  def name: String
  def listTables: Seq[String]
  def load(table: String): DataFrame
}

/** A directory of `<table>.parquet` files as a database. */
final class ParquetDirCatalog(spark: SparkSession, dir: String) extends TableCatalog {
  override def name: String =
    dir.split('/').filter(_.nonEmpty).lastOption.getOrElse(dir)

  override def listTables: Seq[String] = {
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
    files.iterator
      .map(_.getName)
      .filter(_.endsWith(".parquet"))
      .map(_.stripSuffix(".parquet"))
      .toSeq.sorted
  }

  override def load(table: String): DataFrame =
    spark.read.parquet(s"$dir/$table.parquet")
}

/** The session catalog as a database — the cluster-mode equivalent
  * (reference local path, Profiler.scala:188-195). */
final class SparkSessionCatalog(spark: SparkSession, db: String) extends TableCatalog {
  override def name: String = db
  override def listTables: Seq[String] =
    spark.catalog.listTables(db).collect().map(_.name).toSeq.sorted
  override def load(table: String): DataFrame = spark.table(s"$db.$table")
}

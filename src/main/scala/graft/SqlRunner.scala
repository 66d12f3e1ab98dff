package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's raw-SQL surface (reference sql_wrapper.py:27-37 and
  * the catalog listing in test.ipynb cell-3), engine-native:
  *
  *  - multi-statement execution: ';'-separated statements run in order,
  *    the LAST result is returned. Unlike the reference, errors SURFACE
  *    (sql_wrapper.py:35-36 silently swallowed TypeError/ValueError and
  *    returned the previous statement's result). The naive split is kept
  *    deliberately simple and documented: a ';' inside a string literal
  *    splits — don't put one there (the reference has the same quirk).
  *  - catalog listing: `spark.catalog` over the registered temp views.
  */
object SqlRunner {

  /** Register every testdata table as a temp view so raw SQL can see the
    * same catalog the reference's Postgres exposed.
    */
  def registerTables(spark: SparkSession, dir: String): Unit =
    Tables.all.foreach { case (name, load) =>
      load(spark, dir).createOrReplaceTempView(name)
    }

  /** Run `;`-separated SQL, returning the last statement's result.
    *
    * Non-final statements are EXECUTED, not just analyzed: `spark.sql`
    * runs commands (DDL/DML) eagerly but leaves SELECTs lazy, so a
    * runtime error in an intermediate SELECT would otherwise be
    * silently skipped. The collect is bounded by usage — intermediate
    * statements in multi-statement scripts are setup (views, inserts)
    * whose results are tiny; don't put a billion-row SELECT anywhere
    * but last.
    */
  def q(spark: SparkSession, sql: String): DataFrame = {
    val statements = sql.split(";").map(_.trim).filter(_.nonEmpty)
    require(statements.nonEmpty, "no SQL statements given")
    statements.init.foreach(s => spark.sql(s).collect())
    spark.sql(statements.last)
  }

  /** Catalog listing (S5): table names visible to SQL. */
  def listTables(spark: SparkSession): Seq[String] =
    spark.catalog.listTables().collect().map(_.name).toSeq.sorted
}

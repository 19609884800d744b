package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality gate — the validation stage a training-data
  * pipeline runs before ingesting a drop (null keys, key uniqueness,
  * domain membership, value ranges, referential integrity), reported as
  * one long-format table of (check, violations, total, pass).
  *
  * Scale shape: every row-local predicate folds into ONE full-scan
  * aggregation (map-side combined conditional counts; uniqueness rides
  * the same scan as `count − countDistinct`), and the only other pass is
  * the FK anti-join, which is a plain key-partitioned join. No
  * per-check scans — a 12-check suite still reads the table once, which
  * is the difference between one and twelve 100 TB scans.
  *
  * Reference scope: extends the reference's implicit schema checks (Avro
  * decode failures, SURVEY.md §1.2) into explicit content constraints.
  */
object Quality {

  /** dq_checks — the six-constraint suite over `orders` (FK → customer).
    * `date_in_range` genuinely fires on the testdata (orders spill past
    * 2001-01-01): a report with a failing row is the interesting case.
    */
  def dqOrders(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val agg = orders.agg(
      count(lit(1)).as("total"),
      sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("v_key_null"),
      (count(col("o_orderkey")) - countDistinct(col("o_orderkey")))
        .as("v_key_dup"),
      sum(when(col("o_totalprice") <= 0.0, 1L).otherwise(0L))
        .as("v_price_nonpos"),
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
        .as("v_status_domain"),
      sum(when(col("o_orderdate") < lit("1995-01-01").cast("timestamp") ||
          col("o_orderdate") >= lit("2001-01-01").cast("timestamp"), 1L)
        .otherwise(0L)).as("v_date_range"))
    val fk = orders
      .join(t(s, dir, "customer").select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("v_fk_custkey"))
    agg.crossJoin(fk) // two single-row frames
      .select(expr("stack(6, " +
        "'date_in_range', v_date_range, " +
        "'fk_custkey_exists', v_fk_custkey, " +
        "'key_not_null', v_key_null, " +
        "'key_unique', v_key_dup, " +
        "'price_positive', v_price_nonpos, " +
        "'status_in_domain', v_status_domain) AS (check_name, violations)"),
        col("total"))
      .withColumn("pass", col("violations") === 0L)
      .orderBy("check_name")
  }
}

package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DecimalType, TimestampType}

/** Oracle-portability conventions for every driver-compared query.
  *
  * The driver reads our parquet dump via pandas (Spark decimals surface as
  * `Decimal('137869.00')`, scale zeros kept) but reads the DuckDB oracle via
  * `.df()` (float64 `137869.0`), then hashes the stringified values — so any
  * decimal output column with trailing zeros at its scale hash-mismatches
  * even when values are identical (round-1 verdict: all 12 red rows).
  *
  * Conventions (mirror these in the oracle SQL):
  *  - internal arithmetic stays decimal-exact (sums go through
  *    `CAST(x AS DECIMAL(18,s))` on BOTH sides so summation order can't
  *    flake float compares);
  *  - the FINAL projection casts every decimal column to double — oracles
  *    wrap the matching aggregate in `CAST(... AS DOUBLE)`;
  *  - timestamps are written as parquet TIMESTAMP_MICROS (session config
  *    `spark.sql.parquet.outputTimestampType`, set in [[graft.GraftSession]]);
  *  - every output column is lower_snake_case and explicitly aliased on
  *    both sides; every query ends in a total deterministic ORDER BY.
  */
object Parity {

  /** Cast every decimal column in the final projection to double and every
    * (tz-aware) timestamp to TIMESTAMP_NTZ, keeping names and column order.
    * Apply as the LAST step of a query definition — after this, no decimal
    * and no tz-aware timestamp reaches the driver's pandas/DuckDB compare.
    *
    * The NTZ cast is wall-clock-identity because every session runs in UTC
    * (GraftSession); it makes the parquet dump read back as a NAIVE pandas
    * timestamp, matching DuckDB's naive `.df()` timestamps — a tz-aware
    * `Timestamp('... +0000', tz='UTC')` would strict-hash-mismatch. */
  def outputDoubles(df: DataFrame): DataFrame = {
    val fields = df.schema.fields
    val needs = fields.exists(f => f.dataType.isInstanceOf[DecimalType] ||
      f.dataType == TimestampType)
    if (!needs) df
    else df.select(fields.map { f =>
      f.dataType match {
        case _: DecimalType  => col(f.name).cast("double").as(f.name)
        case TimestampType   => col(f.name).cast("timestamp_ntz").as(f.name)
        case _               => col(f.name)
      }
    }.toIndexedSeq: _*)
  }
}

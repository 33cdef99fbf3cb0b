package graft

/** DuckDB oracle SQL for every oracle=Y query key (SURVEY.md §2).
  *
  * Each SQL string must produce byte-identical values to the Spark query on
  * the same Parquet files, so both sides follow the shared determinism
  * contract (SURVEY.md §7.3): explicit total-order ORDER BY, ROUND(x, 6) on
  * every value, DECIMAL(38,6)-quantized sums (order-independent), identical
  * entropy/stddev algebra, and the declared (count DESC, value ASC) histogram
  * tie-break.
  */
object OracleSql
  extends OracleSqlCore
  with OracleSqlProfiler
  with OracleSqlStats
  with OracleSqlDedup
  with OracleSqlSimilarity
  with OracleSqlText
  with OracleSqlQuality
  with OracleSqlEvents
  with OracleSqlSampling
  with OracleSqlMedia

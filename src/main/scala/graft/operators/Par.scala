package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/**
 * Parallelism normalization for compute-heavy operators.
 *
 * On a production cluster a 100 TB input arrives as tens of thousands of
 * splits, so per-row heavy stages (sketch signatures, n-gram set builds,
 * cosine scoring) parallelize by construction. A local benchmark input is
 * ONE small parquet file = one row group = one task: without an exchange,
 * every downstream map stage — however well codegen'd — runs on a single
 * core while 31 idle.
 *
 * `spread` inserts one hash exchange on the operator's key BEFORE its
 * heavy compute. Cost: a single pass over the slim input rows (ids +
 * text/vector), using `spark.sql.shuffle.partitions` output slots. At
 * scale this is noise next to the compute it parallelizes — and hashing by
 * the record id also rebalances skewed input splits, which is why engines
 * routinely pre-partition before sketch builds. Correctness is unaffected:
 * every operator below it is set-semantic (results independent of row
 * placement).
 */
object Par {
  def spread(df: DataFrame, key: Column): DataFrame = df.repartition(key)
}

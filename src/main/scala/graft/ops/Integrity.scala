package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integrity-as-computation: the reference enforces what BigQuery's missing
  * PK/FK constraints would, by per-row probe queries; here each becomes one
  * set-oriented join per batch (SURVEY.md §2.3 J1-J3, §2.4 A2-A3).
  *
  * Scale note: the probe side of each join is a key set, not full rows. We do
  * NOT hardcode a broadcast hint — an explicit hint overrides
  * `autoBroadcastJoinThreshold`, and broadcasting the key set of a 100 TB fact
  * table would OOM the driver. Callers that KNOW the probe side is a bounded
  * dimension (the reference's places table is 63 rows) pass
  * `broadcastDim = true`; otherwise AQE picks broadcast vs shuffle from
  * measured sizes at runtime.
  */
object Integrity {

  private def keySet(df: DataFrame, cols: Seq[String], broadcastDim: Boolean): DataFrame = {
    val k = df.select(cols.map(col): _*).distinct()
    if (broadcastDim) broadcast(k) else k
  }

  /** J1: rows whose key is NOT already in the target (insert dedup).
    * Reference probes `SELECT 1 FROM t WHERE id=x` per document
    * (reference: src/process_insert_update_weather_data.py:49-62); one
    * left_anti join replaces N round trips.
    */
  def newRowsOnly(incoming: DataFrame, target: DataFrame, key: String,
                  broadcastDim: Boolean = false): DataFrame =
    incoming.join(keySet(target, Seq(key), broadcastDim), Seq(key), "left_anti")

  /** J2: rows whose foreign key exists in the dimension (FK validation).
    * Reference: src/process_insert_update_weather_data.py:66-79.
    */
  def fkValid(facts: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
              broadcastDim: Boolean = false): DataFrame =
    facts.join(
      keySet(dim.select(col(dimKey).as(factKey)), Seq(factKey), broadcastDim),
      Seq(factKey), "left_semi")

  /** J2 rejected leg: FK violations, for the dead-letter/skip log. */
  def fkViolations(facts: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
                   broadcastDim: Boolean = false): DataFrame =
    facts.join(
      keySet(dim.select(col(dimKey).as(factKey)), Seq(factKey), broadcastDim),
      Seq(factKey), "left_anti")

  /** S15 write-time NOT NULL enforcement (reference:
    * src/create_tables.sql:2-41 — the warehouse DDL declares NOT NULL on the
    * key and timestamp columns, which BigQuery enforces at insert time; with
    * parquet sinks nothing enforces it, so the engine must). Splits a batch
    * into schema-conformant rows and a violations relation tagged with the
    * exact set of violated columns (`null_violations: array<string>`, in
    * schema field order) — the dead-letter payload a replay needs.
    *
    * Scale: a pure per-row predicate over the declared NOT NULL columns,
    * fused into the scan — no shuffle, no action; each returned leg is one
    * filter over the input (the fkValid/fkViolations two-leg pattern).
    * Declared-but-absent columns count as violated on every row (a missing
    * required column is a schema violation, not a pass).
    */
  def nullAudit(df: DataFrame, schema: org.apache.spark.sql.types.StructType)
      : (DataFrame, DataFrame) = {
    val required = schema.fields.filterNot(_.nullable).map(_.name)
    val present = df.columns.toSet
    val flags = required.map { n =>
      if (present(n)) when(col(n).isNull, lit(n)) else lit(n)
    }
    val tag = array_compact(array(flags: _*)).as("null_violations")
    val ok = df.filter(flags.map(_.isNull).reduceOption(_ && _).getOrElse(lit(true)))
    val bad = df.select(col("*"), tag).filter(size(col("null_violations")) > 0)
    (ok, bad)
  }

  /** S15 lake→warehouse SCHEMA-DRIFT audit (VERDICT r08 "What's missing" #2):
    * the reference's lake is schemaless (reference: README.md:9 — raw API
    * JSON stored as-is, src/ingest_weather_data.py:63-66) while the engine
    * promotes through fixed StructTypes, so a changed upstream API silently
    * drops NEW fields in the flatten and nulls MISSING ones. This audits the
    * raw JSON document column against the declared schema BEFORE any
    * `from_json` erases the evidence:
    *
    *  - `unknown_fields`: document key paths (top level, plus one level
    *    under each declared struct field) not present in the schema — the
    *    "API grew a field" signal, in document key order.
    *  - `missing_fields`: declared paths absent from the document (absent
    *    key, not present-null — nullability is [[nullAudit]]'s domain), in
    *    schema order.
    *
    * Returns (conforming, drifted): rows with any drift carry both arrays;
    * route the drifted leg to `Sinks.deadLetter` for quarantine + replay
    * after a schema bump.
    *
    * Scale: pure per-row key extraction (`json_object_keys` +
    * `array_except` against a literal path set) fused into the scan — no
    * shuffle, no action, no UDF. Nested audit depth is one level under
    * declared structs (drift inside an UNDECLARED object reports the object
    * itself), which is the lake→warehouse case; recurse by declaring deeper
    * structs.
    */
  def shapeAudit(df: DataFrame, jsonCol: String,
                 schema: org.apache.spark.sql.types.StructType)
      : (DataFrame, DataFrame) = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val structFields = schema.fields.collect {
      case StructField(n, s: StructType, _, _) => (n, s)
    }.toSeq
    val emptyKeys = array().cast("array<string>")
    // actual key paths: top level + one level under each DECLARED struct
    // field (scalar or absent values yield null keys -> empty; same contract
    // as DuckDB json_keys, so the oracle replays exactly)
    val topKeys = coalesce(json_object_keys(col(jsonCol)), emptyKeys)
    val nestedKeys = structFields.map { case (n, _) =>
      transform(
        coalesce(json_object_keys(get_json_object(col(jsonCol), s"$$.$n")), emptyKeys),
        k => concat(lit(n + "."), k))
    }
    val actual = (topKeys +: nestedKeys).reduce(concat(_, _))
    val declared = schema.fields.map(_.name).toSeq ++
      structFields.flatMap { case (n, s) => s.fields.map(f => s"$n.${f.name}") }
    val declaredArr = array(declared.map(lit): _*)
    val unknown = array_except(actual, declaredArr).as("unknown_fields")
    val missing = array_except(declaredArr, actual).as("missing_fields")
    // per-row JSON key extraction is the operator's whole cost — fan it out
    // of a row-group-bounded scan (Tables.fanOut scaladoc), keyed on the
    // document itself
    val tagged = graft.Tables.fanOut(df, col(jsonCol))
      .select(col("*"), unknown, missing)
    (tagged.filter(size(col("unknown_fields")) === 0 &&
        size(col("missing_fields")) === 0)
       .drop("unknown_fields", "missing_fields"),
     tagged.filter(size(col("unknown_fields")) > 0 ||
       size(col("missing_fields")) > 0))
  }

  /** A2: duplicate audit — keys appearing more than once.
    * Reference: src/process_insert_places_data.py:36-37,47-49.
    */
  def dupAudit(df: DataFrame, key: String): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n")).filter(col("n") > 1)

  /** J3: batch dedup against existing keys, first-wins within the batch
    * pinned by an explicit ordering (SURVEY.md §2.10.4 — the reference's
    * scan-order winner is nondeterministic; we pin by `orderCol`).
    * Reference: src/process_insert_places_data.py:36-46.
    */
  def batchDedup(batch: DataFrame, existing: DataFrame, key: String, orderCol: String,
                 broadcastDim: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(key)).orderBy(col(orderCol))
    batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .join(keySet(existing, Seq(key), broadcastDim), Seq(key), "left_anti")
  }
  /** Order- and partitioning-independent content checksum for cross-system
    * table reconciliation (the distcp/replication-validation primitive):
    * per group, `n` plus the SUM of each row's 60-bit md5 hash over the
    * NULL-framed column tuple — a pure function of the row multiset, so two
    * engines (or two replicas) agree iff the data agrees, and per-group
    * sums localize a mismatch to its partition. The sum rides
    * decimal(38,0) (exact to ~2^67 rows of 60-bit hashes) and is emitted as
    * a STRING so any engine compares it textually.
    *
    * Columns are hashed through their Spark `cast(string)` form — callers
    * pre-cast types whose text form is not cross-engine canonical
    * (timestamps, floats with exponents) to a canonical string first.
    */
  def tableChecksum(df: DataFrame, groupCols: Seq[String],
                    cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "tableChecksum needs at least one hashed column")
    val hv = conv(substring(md5(Diff.framedRow(cols.map(col))),
      1, 15), 16, 10).cast("long")
    val base = df.withColumn("__hv", hv)
    val grouped =
      if (groupCols.isEmpty) base.groupBy()
      else base.groupBy(groupCols.map(col): _*)
    grouped.agg(count(lit(1)).as("n"),
      sum(col("__hv").cast("decimal(38,0)")).cast("string").as("checksum"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.implicits._

/** CDC merge: apply a batch of keyed changes (upserts + delete tombstones)
  * to a snapshot table — the maintenance operation every incrementally
  * ingested corpus needs (crawl refreshes, takedown/opt-out deletes,
  * metadata corrections). The reference re-lands whole months per cycle
  * (`cycle.js` overwrites the output grid file for a (layer, time) key —
  * a degenerate whole-partition upsert); at corpus scale the unit of
  * change is the ROW, which is what this operator models.
  *
  * Shape chosen for 100 TB: the CHANGES side — small, by definition of an
  * increment — is collapsed to its latest state per key first (a window
  * over changes only, never over the snapshot), then joined to the
  * snapshot once. The naive alternative (union snapshot + changes, window
  * over everything) shuffles and windows the full snapshot; this shape
  * shuffles the snapshot once for the join — and with the snapshot stored
  * bucketed by key (BucketingSpec's lever) even that exchange disappears,
  * leaving O(changes) work per increment.
  */
object Upsert {

  /** Latest change per key: the row with the highest `seqCol` wins.
    * `row_number() <= 1` compiles to a WindowGroupLimit, so each map
    * partition is trimmed to one candidate row per key before the
    * exchange (the t15 lever) — a hot key with a million queued changes
    * costs O(#partitions) shuffle rows, not a million.
    */
  def collapseChanges(changes: DataFrame, key: String, seqCol: String): DataFrame = {
    // equal-seq ties break on a content hash of the full change row — a
    // column that actually VARIES within the key partition, so the winner
    // is a pure function of the data (partition- and replay-independent);
    // byte-identical duplicate deliveries tie harmlessly. Hash the row's
    // JSON with nulls KEPT, not the raw columns: xxhash64 skips null
    // inputs (two rows whose values shift across null columns would
    // collide), and JSON serialization also covers types hash() rejects
    val tieBreak = xxhash64(to_json(
      struct(changes.columns.sorted.map(col): _*),
      java.util.Map.of("ignoreNullFields", "false")))
    val w = Window.partitionBy(col(key)).orderBy(col(seqCol).desc, tieBreak.desc)
    changes
      .withColumn("__rn", row_number().over(w))
      .where($"__rn" === 1)
      .drop("__rn")
  }

  /** Merge `changes` into `snapshot`, latest-wins per `key`.
    *
    * `changes` carries the snapshot's columns plus `seqCol` (change order,
    * larger = later) and `deleteCol` (boolean tombstone). Semantics are
    * whole-row replacement: the winning change's row replaces the snapshot
    * row entirely (an explicit NULL in a change is kept as NULL — no
    * column-wise coalescing), a winning tombstone removes the key, and
    * keys appearing only in `changes` are inserts.
    */
  def merge(snapshot: DataFrame, changes: DataFrame, key: String,
            seqCol: String = "seq", deleteCol: String = "del"): DataFrame = {
    val dataCols = snapshot.columns.filterNot(_ == key).toSeq
    require(dataCols.forall(changes.columns.contains),
      s"changes must carry the snapshot's columns; missing ${dataCols.filterNot(changes.columns.contains).mkString(", ")}")
    val latest = collapseChanges(changes, key, seqCol)
      .select(col(key) +:
        col(deleteCol).as("__del") +:
        lit(true).as("__hit") +:
        dataCols.map(c => col(c).as(s"__c_$c")): _*)
    snapshot
      .join(latest, Seq(key), "full_outer")
      // a winning tombstone deletes the key whether or not the snapshot has it
      .where(!coalesce($"__del", lit(false)))
      .select(col(key) +: dataCols.map(c =>
        when($"__hit", col("__c_" + c)).otherwise(col(c)).as(c)): _*)
  }

  /** Incremental AGGREGATE maintenance (t33) — the materialized-view
    * pattern: a stored per-key aggregate advanced by a delta batch
    * WITHOUT rescanning history. merged = history ⊕ partial(batch),
    * exact because the stored vector (count, sum, max) is a commutative
    * monoid under (+, +, max) — the same reason Spark's own partial
    * aggregation is correct. Averages are NOT mergeable as stored
    * averages (the classic MV bug); store the moment vector and derive
    * avg at read time.
    *
    * Scale shape: `history` is MV-sized (one row per key — the artifact
    * a pipeline keeps between batches, exactly like d11's hash index
    * and d14's signature index); the batch partial-aggregates map-side,
    * so the merge shuffle carries |history keys| + |batch keys| rows —
    * never the raw history, which no longer needs to exist. Appends
    * only; deletions need a subtractable sketch (max is not invertible)
    * or t17's CDC path.
    */
  def incrementalAgg(history: DataFrame, batch: DataFrame,
                     key: String): DataFrame = {
    val part = batch.groupBy(col(key))
      .agg(count(lit(1)).as("n"), sum($"cents").as("sum_cents"),
        max($"cents").as("max_cents"))
    history.unionByName(part)
      .groupBy(col(key))
      .agg(sum($"n").as("n"), sum($"sum_cents").as("sum_cents"),
        max($"max_cents").as("max_cents"))
  }

  /** Incremental MV maintenance under RETRACTIONS (x13) — the deletion
    * half [[incrementalAgg]] documents as out of scope: takedowns,
    * opt-outs, and late corrections must LEAVE a materialized aggregate
    * without a full rescan. count/sum are groups under subtraction, so
    * they update from the retraction batch alone; max is NOT
    * invertible, and the classic answer is a DIRTY-KEY rescan — only
    * keys whose retracted batch touched the stored max (a key-count
    * bounded set) re-derive their max, and only over THEIR base rows
    * (left-semi pushdown into the base scan). Keys retracted to zero
    * rows leave the MV.
    *
    * Contract: `retract` rows must be a sub-multiset of the rows the MV
    * aggregates (retracting something never ingested under-counts
    * silently — the upstream's invariant, as with [[scd2Apply]]).
    * Scale shape: O(batch) subtraction + a rescan bounded by
    * |dirty keys|' rows, never O(history); every join is keyed on the
    * MV key, so bucketed storage co-locates the whole pass.
    */
  def incrementalAggRetract(history: DataFrame, retract: DataFrame,
                            base: DataFrame, key: String): DataFrame = {
    val part = retract.groupBy(col(key))
      .agg(count(lit(1)).as("rn"), sum($"cents").as("rsum"),
        max($"cents").as("rmax"))
    val merged = history.join(part, Seq(key), "left")
      .select(col(key),
        (col("n") - coalesce($"rn", lit(0L))).as("n"),
        (col("sum_cents") - coalesce($"rsum", lit(0L))).as("sum_cents"),
        col("max_cents"),
        coalesce($"rmax" === col("max_cents"), lit(false)).as("__dirty"))
      .where($"n" > 0)
    val dirtyKeys = merged.where($"__dirty").select(col(key))
    val recomputed = base.join(dirtyKeys, Seq(key), "left_semi")
      .groupBy(col(key)).agg(max($"cents").as("__new_max"))
    merged.join(recomputed, Seq(key), "left")
      .select(col(key), $"n", $"sum_cents",
        when($"__dirty", $"__new_max").otherwise($"max_cents").as("max_cents"))
  }

  // ---- SCD Type-2: effective-dated dimension history (t34) ----
  //
  // t17's latest-wins merge keeps only each key's current state — the
  // reference does the same with its per-dataset state lineage
  // (state.js keeps latest only). The other half every warehouse runs is
  // the EFFECTIVE-DATED history: each change closes the current version
  // (`effective_to` = change ts) and inserts a new one, so a fact row can
  // always join to the attribute values that were true AT ITS OWN
  // timestamp (the q25 as-of join's dimension-side twin).

  /** Build an SCD Type-2 dimension from a full change log: one version
    * row per change, `effective_to` = the key's next change ts (`lead`),
    * open (NULL) for the last. A tombstone change contributes NO version
    * row but still closes its predecessor — the key simply has no current
    * version after it. Ties on `tsCol` within a key break on a content
    * hash of the change row (the [[collapseChanges]] rule: deterministic,
    * partition- and replay-independent).
    *
    * `changes` = (key, attrs..., tsCol, deleteCol). Output = (key,
    * attrs..., effective_from, effective_to, is_current). One shuffle on
    * `key`; the window is per-key and streams — no global sort.
    */
  def scd2Recompute(changes: DataFrame, key: String,
                    tsCol: String = "change_ts",
                    deleteCol: String = "del"): DataFrame = {
    val attrs = changes.columns.filterNot(Set(key, tsCol, deleteCol)).toSeq
    val tieBreak = xxhash64(to_json(
      struct(changes.columns.sorted.map(col): _*),
      java.util.Map.of("ignoreNullFields", "false")))
    val w = Window.partitionBy(col(key)).orderBy(col(tsCol), tieBreak)
    changes
      .withColumn("__eff_to", lead(col(tsCol), 1).over(w))
      .where(!col(deleteCol))
      .select(col(key) +: attrs.map(col) :+
        col(tsCol).as("effective_from") :+
        col("__eff_to").as("effective_to") :+
        col("__eff_to").isNull.as("is_current"): _*)
  }

  /** Apply a batch of changes to an SCD Type-2 dimension incrementally —
    * equal to [[scd2Recompute]] over the concatenated change history, but
    * O(current rows of changed keys + changes), never O(history):
    * closed versions (`is_current` = false) are immutable and pass
    * through untouched; only the changed keys' current rows re-enter the
    * version chain, where they and the batch re-derive `effective_to`/
    * `is_current` by the same `lead` rule. Out-of-order changes WITHIN
    * the batch order themselves by ts; a change at the current row's
    * exact ts supersedes it (the current row sorts first and closes with
    * a zero-length interval, the deterministic reading of "replaced at
    * the same instant").
    *
    * Scale shape: `dim` is never windowed or shuffled — the only contact
    * is one join against the batch's distinct keys (broadcast-sized, by
    * definition of an increment), splitting it into pass-through and
    * re-chain sides. A change earlier than an already-CLOSED version of
    * its key would interleave with immutable history; that is a late-
    * arriving-dimension rewrite, not an increment — use scd2Recompute.
    */
  def scd2Apply(dim: DataFrame, changes: DataFrame, key: String,
                tsCol: String = "change_ts",
                deleteCol: String = "del"): DataFrame = {
    val attrs = dim.columns
      .filterNot(Set(key, "effective_from", "effective_to", "is_current")).toSeq
    require(attrs.forall(changes.columns.contains),
      s"changes must carry the dimension's attribute columns; missing ${
        attrs.filterNot(changes.columns.contains).mkString(", ")}")
    val keys = changes.select(col(key)).distinct()
    // everything except (current row of a changed key) is immutable
    val untouched = dim.join(broadcast(keys), Seq(key), "left_anti")
      .unionByName(dim.join(broadcast(keys), Seq(key), "left_semi")
        .where(!col("is_current")))
    // the changed keys' open versions re-enter the chain as their own
    // change at effective_from (tagged so equal-ts batch changes win)
    val reopened = dim.join(broadcast(keys), Seq(key), "left_semi")
      .where(col("is_current"))
      .select(col(key) +: attrs.map(col) :+
        col("effective_from").as(tsCol) :+
        lit(false).as(deleteCol) :+ lit(0).as("__src"): _*)
    val batch = changes.select(col(key) +: attrs.map(col) :+
      col(tsCol) :+ col(deleteCol).cast("boolean") :+ lit(1).as("__src"): _*)
    val chain = reopened.unionByName(batch)
    val tieBreak = xxhash64(to_json(
      struct((Seq(key, tsCol, deleteCol) ++ attrs).sorted.map(col): _*),
      java.util.Map.of("ignoreNullFields", "false")))
    val w = Window.partitionBy(col(key)).orderBy(col(tsCol), col("__src"), tieBreak)
    val rechained = chain
      .withColumn("__eff_to", lead(col(tsCol), 1).over(w))
      .where(!col(deleteCol))
      .select(col(key) +: attrs.map(col) :+
        col(tsCol).as("effective_from") :+
        col("__eff_to").as("effective_to") :+
        col("__eff_to").isNull.as("is_current"): _*)
    untouched.unionByName(rechained)
  }

  /** Op-aware CDC log apply (x12) — materialize an ordered
    * insert/update/delete log (the Debezium/binlog shape) onto a
    * snapshot. [[merge]] is the degenerate form where every change is
    * an upsert-or-tombstone; a real CDC stream distinguishes ops, and
    * the difference is observable: an UPDATE whose key does not
    * currently exist (never inserted, or deleted earlier in the log)
    * is a no-op that must NOT resurrect the key, while an INSERT
    * always (re)creates it. Per key the log is the existence automaton
    *   exists := key ∈ snapshot;  I → exists, row; U → row if exists;
    *   D → ¬exists
    * and the result is the final state after the whole log.
    *
    * Distributed shape keeps the O(changes) discipline: a U's
    * effectiveness depends only on the nearest PRECEDING non-U op
    * (I → live, D → dead), resolved by one ignore-nulls `last` window
    * over the LOG alone — never the snapshot; only U rows before the
    * key's first I/D fall back to snapshot membership, a key-projected
    * (column-pruned) join. Ineffective Us filtered, the survivor log
    * collapses through [[merge]] (WindowGroupLimit + one full-outer
    * join). `seqCol` must order each key's ops totally — equal seqs
    * within a key are the upstream's ambiguity, not resolvable here.
    */
  def cdcApply(snapshot: DataFrame, log: DataFrame, key: String,
               seqCol: String = "seq", opCol: String = "op"): DataFrame = {
    val dataCols = snapshot.columns.filterNot(_ == key).toSeq
    val checkedOp = when(col(opCol).isin("I", "U", "D"), col(opCol))
      .otherwise(raise_error(concat(
        lit("cdcApply: unknown op '"), col(opCol), lit("' (want I/U/D)"))))
    val w = Window.partitionBy(col(key)).orderBy(col(seqCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prevNonU = last(when(col(opCol) =!= "U", checkedOp), ignoreNulls = true)
      .over(w)
    val inBase = snapshot.select(col(key)).withColumn("__in_base", lit(true))
    val effective = log
      .join(inBase, Seq(key), "left")
      .withColumn("__op", checkedOp)
      .withColumn("__prev", prevNonU)
      // U needs a live key: nearest preceding I/D decides; no preceding
      // non-U -> the snapshot's membership decides
      .where($"__op" =!= "U" ||
        coalesce($"__prev" === "I", $"__in_base", lit(false)))
    val asChanges = effective
      .withColumn("__del", $"__op" === "D")
      .select(col(key) +: col(seqCol).as("__seq") +: $"__del" +:
        dataCols.map(col): _*)
    merge(snapshot, asChanges, key, "__seq", "__del")
  }
}

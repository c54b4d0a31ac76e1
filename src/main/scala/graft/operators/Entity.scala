package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.implicits._

/** Entity resolution: fuzzy self-match over a name column — the
  * "same customer, typo'd name" dedup every master-data pipeline runs.
  *
  * The naive form is a quadratic theta join (`levenshtein(a,b) <= d` as
  * the join condition), which Spark can only execute as a cartesian
  * product — a non-starter at any scale. The distributed shape here is
  * the SymSpell / FastSS deletion-neighborhood algorithm (Schulz &
  * Mihov 2002; public domain): two strings within Levenshtein distance
  * 1 ALWAYS share a member of each other's delete-1 neighborhood
  * (the string itself plus every string obtained by deleting one
  * character) —
  *   - substitution at position i: both sides' delete-at-i agree;
  *   - insertion/deletion: deleting the inserted char from the longer
  *     side yields the shorter side verbatim (its delete-0 member).
  * So candidate generation is an EQUI-join on hashed variants, and the
  * exact `levenshtein` check runs only on the candidate sliver.
  */
object Entity {

  /** All fuzzy pairs (a_id < b_id) within Levenshtein distance 1,
    * found via deletion-neighborhood blocking + exact verification.
    *
    * Scale shape: each name explodes into length+1 variants hashed to
    * 8-byte keys; the candidate join is a plain equi-join on that hash
    * (SortMerge/ShuffledHash — plan-guarded: no cartesian, no
    * broadcast-nested-loop). Per-key expansion is bounded by variant
    * collision counts — for natural-language names a variant bucket is
    * a handful of true neighbors, not a corpus slice. Hash collisions
    * (distinct variants, same xxhash64) only ADD candidates; the
    * levenshtein verify removes them, so the result is exactly the
    * distance-1 pair set. At 100 TB you would carry only (id, hash)
    * through the explode and join names back for the verify; at the
    * name cardinalities entity resolution runs at (dimension tables,
    * not fact tables) riding the name through is the cheaper plan —
    * one join instead of three.
    */
  def fuzzyPairs(rows: DataFrame, idCol: String, nameCol: String): DataFrame = {
    val variants = rows
      .select(col(idCol).as("id"), col(nameCol).as("name"))
      .withColumn("variant",
        // delete-1 neighborhood: the name itself plus every delete-at-i.
        // The delete list is guarded on length > 0: sequence(1, 0) would
        // generate a DESCENDING [1, 0] (Spark's step defaults to -1 when
        // start > stop), turning an empty name into junk variants via
        // negative-length substr
        explode(concat(
          array($"name"),
          when(length($"name") > 0,
            transform(sequence(lit(1), length($"name")), i =>
              concat($"name".substr(lit(1), i - 1),
                     $"name".substr(i + 1, length($"name")))))
            .otherwise(array().cast("array<string>")))))
      .select($"id", $"name", xxhash64($"variant").as("vhash"))
    val a = variants.select($"id".as("a_id"), $"name".as("a_name"), $"vhash")
    val b = variants.select($"id".as("b_id"), $"name".as("b_name"), $"vhash")
    a.join(b, Seq("vhash"))
      .where($"a_id" < $"b_id")
      .select($"a_id", $"a_name", $"b_id", $"b_name")
      .distinct()
      .withColumn("dist", levenshtein($"a_name", $"b_name").cast("long"))
      .where($"dist" <= 1)
      .orderBy($"a_id", $"b_id")
  }
}

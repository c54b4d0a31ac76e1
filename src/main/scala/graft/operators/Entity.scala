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
    * Scale shape, in three stages that keep the quadratic part confined
    * to genuine OUTPUT enumeration:
    *  1. EXACT-DUPLICATE COLLAPSE first: ids group by name, so the
    *     expensive stages run over DISTINCT names. Real corpora (and the
    *     bench's key-shifted scale copies) carry heavy exact duplication;
    *     without this collapse each copy re-pays the variant explode and
    *     join (measured 17.8× at the 10× scale leg — the duplicated
    *     names made the blocking join itself quadratic).
    *  2. Deletion-neighborhood blocking over distinct names: length+1
    *     variants hashed to 8-byte keys; the candidate join is a plain
    *     equi-join on that hash (plan-guarded: no cartesian, no
    *     broadcast-nested-loop), candidates verified with one exact
    *     levenshtein. Hash collisions only ADD candidates; the verify
    *     removes them.
    *  3. Pair expansion: distance-0 pairs unfold within each name group;
    *     distance-1 pairs cross the two groups' id lists. Both are
    *     output-bounded — the pair SET is quadratic in duplication by
    *     definition, and no stage pays more than the rows it emits.
    */
  def fuzzyPairs(rows: DataFrame, idCol: String, nameCol: String): DataFrame = {
    val named = rows.select(col(idCol).as("id"), col(nameCol).as("name"))
    // ids per distinct name, sorted so within-group pairs are (low, high)
    val groups = named.groupBy($"name")
      .agg(sort_array(collect_list($"id")).as("ids"))

    // distance-0: all id pairs within one name group (slice from i+2 in
    // 1-based terms = everything after the current element)
    val dist0 = groups
      .where(size($"ids") > 1)
      .select($"name", posexplode($"ids").as(Seq("i", "x_id")))
      .join(groups, Seq("name"))
      .select($"name", $"x_id",
        explode(slice($"ids", $"i" + lit(2), size($"ids") - $"i" - 1)).as("y_id"))
      .select($"x_id".as("a_id"), $"name".as("a_name"),
        $"y_id".as("b_id"), $"name".as("b_name"), lit(0L).as("dist"))

    // deletion-neighborhood blocking over DISTINCT names. The delete list
    // is guarded on length > 0: sequence(1, 0) would generate a
    // DESCENDING [1, 0] (Spark's step defaults to -1 when start > stop),
    // turning an empty name into junk variants via negative-length substr
    val variants = groups.select($"name")
      .withColumn("variant",
        explode(concat(
          array($"name"),
          when(length($"name") > 0,
            transform(sequence(lit(1), length($"name")), i =>
              concat($"name".substr(lit(1), i - 1),
                     $"name".substr(i + 1, length($"name")))))
            .otherwise(array().cast("array<string>")))))
      .select($"name", xxhash64($"variant").as("vhash"))
      .distinct() // a name's own delete-set can self-collide
    val candidates = variants.select($"name".as("x_name"), $"vhash")
      .join(variants.select($"name".as("y_name"), $"vhash"), Seq("vhash"))
      .where($"x_name" < $"y_name")
      .select($"x_name", $"y_name").distinct()
      .where(levenshtein($"x_name", $"y_name") === 1)

    // expand the verified distinct-name pairs to id pairs; the output
    // pair is ordered by id, so names follow their ids through the swap
    val dist1 = candidates
      .join(groups.select($"name".as("x_name"), $"ids".as("x_ids")), Seq("x_name"))
      .join(groups.select($"name".as("y_name"), $"ids".as("y_ids")), Seq("y_name"))
      .select($"x_name", $"y_name", explode($"x_ids").as("x_id"), $"y_ids")
      .select($"x_name", $"y_name", $"x_id", explode($"y_ids").as("y_id"))
      .select(
        least($"x_id", $"y_id").as("a_id"),
        when($"x_id" < $"y_id", $"x_name").otherwise($"y_name").as("a_name"),
        greatest($"x_id", $"y_id").as("b_id"),
        when($"x_id" < $"y_id", $"y_name").otherwise($"x_name").as("b_name"),
        lit(1L).as("dist"))

    dist0.unionByName(dist1).orderBy($"a_id", $"b_id")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy (edit-distance) self-join for entity resolution —
  * the record-linkage primitive behind "are these two catalog entries /
  * author strings / URLs the same thing?".
  *
  * A naive fuzzy join is O(n²) levenshtein calls — impossible at any
  * scale. The standard fix, implemented here:
  *
  *  1. **Blocking**: only rows sharing a cheap deterministic blocking
  *     key (here: a caller-supplied key expression, e.g. the last
  *     name token, a phonetic code, or a prefix) are ever compared.
  *     The candidate space drops from n² to Σ_b n_b².
  *  2. **Value dedup**: comparisons run on the DISTINCT value table
  *     per block, not the row table — at corpus scale many rows share
  *     the same string, and comparing each distinct pair once then
  *     expanding multiplicities arithmetically turns an m·n row join
  *     into a |values|² micro-join plus one counting aggregate.
  *  3. **Length-band pruning**: levenshtein(a,b) ≥ |len(a)−len(b)|,
  *     so the band |Δlen| ≤ maxDist is checked first inside the join
  *     condition — it discards most candidates before the O(len²)
  *     distance evaluates.
  *
  * Match semantics are symmetric, so pairs are emitted once in
  * canonical (value_a ≤ value_b) order.
  */
object FuzzyJoin {

  /** Distinct-value fuzzy matches with pair multiplicities.
    *
    * Returns one row per matched distinct-value pair:
    * `(name_a, name_b, dist, n_pairs)` where `n_pairs` counts the
    * underlying row pairs (c_a·c_b across values, c·(c−1)/2 within a
    * value — the exact-duplicate diagonal).
    */
  def nameMatches(df: DataFrame, nameCol: String,
                  blockKey: org.apache.spark.sql.Column,
                  maxDist: Int): DataFrame = {
    // blockKey is evaluated against the caller's columns, so project
    // it before the value-dedup aggregate (it is functionally
    // determined by the name, so grouping on both keeps one row per
    // distinct name).
    val vals = df.select(col(nameCol).as("name"), blockKey.as("blk"))
      .groupBy("name", "blk").agg(count(lit(1)).as("c"))
    val a = vals.select(col("blk").as("blk_a"), col("name").as("name_a"),
      col("c").as("c_a"))
    val b = vals.select(col("blk").as("blk_b"), col("name").as("name_b"),
      col("c").as("c_b"))
    // blk equality leads the condition so Catalyst plans an equi-join
    // (hash) on the blocking key; the band + distance predicates are
    // residual filters evaluated only within a block.
    // graft_edit_within (prefix-strip + banded DP, ≡ levenshtein for
    // d ≤ maxDist — property-tested) runs ONCE per candidate instead
    // of the builtin twice (filter + projection).
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    a.join(b,
        col("blk_a") === col("blk_b") &&
          col("name_a") <= col("name_b") &&
          abs(length(col("name_a")) - length(col("name_b"))) <= maxDist,
        "inner")
      .withColumn("dist", call_function("graft_edit_within",
        col("name_a"), col("name_b"), lit(maxDist)))
      .filter(col("dist") >= 0)
      .select(col("name_a"), col("name_b"), col("dist"),
        when(col("name_a") === col("name_b"),
          (col("c_a") * (col("c_a") - 1)) / 2)
          .otherwise(col("c_a") * col("c_b")).cast("long").as("n_pairs"))
      .filter(col("n_pairs") > 0)
  }

  /** Row-level fuzzy pairs (id_a < id_b), for feeding an ER
    * clustering stage ([[Components.connectedComponents]]). Expands
    * [[nameMatches]] back onto ids — candidate verification stays on
    * the distinct-value table; this join only materializes pairs that
    * already matched.
    *
    * The unordered pair is normalized with least/greatest AFTER the
    * expansion, NOT by filtering `id_a < id_b` on the directional
    * name binding: `name_a` is the lexicographically smaller NAME,
    * and when every id bearing it happens to be larger than every id
    * of `name_b`, a directional id filter would silently drop the
    * entire cross-name pair set (found the hard way: two entity
    * clusters that should merge stayed apart at one scale factor).
    * The same-name case produces each unordered pair in both
    * orientations, hence the distinct.
    */
  def fuzzyPairs(df: DataFrame, idCol: String, nameCol: String,
                 blockKey: org.apache.spark.sql.Column,
                 maxDist: Int): DataFrame = {
    val matches = nameMatches(df, nameCol, blockKey, maxDist)
      .select("name_a", "name_b", "dist")
    val ids = df.select(col(idCol), col(nameCol))
    matches
      .join(ids.select(col(idCol).as("id_a"), col(nameCol).as("name_a")),
        "name_a")
      .join(ids.select(col(idCol).as("id_b"), col(nameCol).as("name_b")),
        "name_b")
      .filter(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"), col("dist"))
      .distinct()
  }
}

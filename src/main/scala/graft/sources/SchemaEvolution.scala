package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema evolution for silver parquet tables — the engine analog of
  * the reference's alembic migration lane (`alembic/`, `alembic.ini`:
  * versioned DDL against Postgres). A lake table has no ALTER TABLE;
  * evolution is a READ-TIME policy plus an explicit conform step on the
  * write path:
  *
  *  - **add column**: new generations carry it, old files simply lack
  *    it — conformed reads surface a typed NULL for old rows. No
  *    rewrite, ever.
  *  - **type widen**: only LOSSLESS widenings are legal (integral
  *    up-rank byte→short→int→long, float→double, integral→decimal-
  *    with-room, decimal precision growth at equal-or-wider scale,
  *    anything→its own type). Old files keep their narrow type on
  *    disk; conformed reads up-cast. No rewrite.
  *  - **rename**: a DECLARED rename (an explicit old→new alias map —
  *    the reviewed artifact, like an alembic revision) is pure
  *    metadata: old generations keep the old column name on disk,
  *    conformed reads surface it under the new name through a
  *    projection alias — no rewrite (the alembic chain's 4bcfdcf6e86a
  *    step, response_data→error_data, as read-time policy). An
  *    UNDECLARED rename still fails fast: with no alias map the old
  *    and new names are just two columns, and any type conflict names
  *    the offender.
  *  - **anything else** (narrowing, integral→float, string↔number,
  *    drops): NOT evolution — fails fast with the offending
  *    column named. The policy is an explicit rewrite migration (read
  *    old generation, transform, write a new generation directory) so
  *    the lossy/ambiguous step is a reviewed job, never an implicit
  *    cast. (Parquet's own mergeSchema stops at the first of these
  *    too — it unions columns but refuses conflicting types; this
  *    module is mergeSchema plus the widening lattice plus the
  *    policy error.)
  *
  * Composed with the upsert/CDC lane: [[conformedUnion]] aligns an old
  * silver table and a new-schema batch onto their unified schema, after
  * which [[graft.ops.Upsert.mergeByKey]] / last-write-wins semantics
  * apply unchanged — spec-proven round-trips for add-column and widen
  * through the upsert path.
  */
object SchemaEvolution {

  private def intRank(dt: DataType): Option[Int] = dt match {
    case ByteType => Some(0)
    case ShortType => Some(1)
    case IntegerType => Some(2)
    case LongType => Some(3)
    case _ => None
  }

  /** Is `from` → `to` a lossless widening (or identity)? */
  def canWiden(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b => true
    case (a, b) if intRank(a).isDefined && intRank(b).isDefined =>
      intRank(a).get <= intRank(b).get
    case (FloatType, DoubleType) => true
    case (a, d: DecimalType) if intRank(a).isDefined =>
      // an N-bit integral fits in decimal(p, s) iff p − s digits cover it
      val needed = Seq(3, 5, 10, 20)(intRank(a).get)
      d.precision - d.scale >= needed
    case (a: DecimalType, b: DecimalType) =>
      b.scale >= a.scale && b.precision - b.scale >= a.precision - a.scale
    case _ => false
  }

  /** The wider of two types, if either direction widens losslessly. */
  private def widerOf(a: DataType, b: DataType): Option[DataType] =
    if (canWiden(a, b)) Some(b)
    else if (canWiden(b, a)) Some(a)
    else None

  /** Unified schema of a table generation sequence: union of columns,
    * each at the widest of its appearances; nullable as soon as any
    * generation lacks the column or has it nullable. Field order: first
    * appearance wins (old columns first, additions append). Fails with
    * the offending column named when two generations disagree
    * non-losslessly. */
  def unifiedSchema(schemas: Seq[StructType]): StructType = {
    require(schemas.nonEmpty)
    val order = scala.collection.mutable.LinkedHashMap.empty[String, StructField]
    for (s <- schemas; f <- s.fields) {
      order.get(f.name) match {
        case None =>
          // absent from any earlier generation ⇒ must be nullable
          val everAbsent = schemas.exists(g => !g.fieldNames.contains(f.name))
          order(f.name) = f.copy(nullable = f.nullable || everAbsent)
        case Some(prev) =>
          val wide = widerOf(prev.dataType, f.dataType).getOrElse(
            throw new IllegalArgumentException(
              s"column '${f.name}': ${prev.dataType.simpleString} vs " +
                s"${f.dataType.simpleString} is not a lossless widening — " +
                "this is a rewrite migration, not schema evolution " +
                "(see SchemaEvolution policy)"))
          order(f.name) = prev.copy(dataType = wide,
            nullable = prev.nullable || f.nullable)
      }
    }
    StructType(order.values.toSeq)
  }

  /** Project `df` onto `target`: present columns up-cast (widenings
    * only — anything else throws with the column named), absent columns
    * appear as typed NULLs. */
  def conform(df: DataFrame, target: StructType): DataFrame = {
    val have = df.schema.map(f => f.name -> f.dataType).toMap
    val cols = target.fields.map { f =>
      have.get(f.name) match {
        case Some(dt) =>
          require(canWiden(dt, f.dataType),
            s"column '${f.name}': cannot conform ${dt.simpleString} to " +
              s"${f.dataType.simpleString} losslessly")
          col(f.name).cast(f.dataType).as(f.name)
        case None =>
          require(f.nullable,
            s"column '${f.name}': absent from input but not nullable in target")
          lit(null).cast(f.dataType).as(f.name)
      }
    }
    df.select(cols.toSeq: _*)
  }

  /** Metadata-only RENAME application: wherever `df` still carries an
    * OLD name from the alias map, alias it to the new name (a pure
    * projection — zero IO; column pruning still reaches the physical
    * column through the alias). Generations already written under the
    * new name pass through untouched; a generation carrying BOTH names
    * fails fast (the map is ambiguous for it — that table needs a
    * rewrite migration, not an alias). */
  def applyRenames(df: DataFrame, renames: Map[String, String]): DataFrame =
    renames.foldLeft(df) { case (d, (from, to)) =>
      if (!d.columns.contains(from)) d
      else {
        require(!d.columns.contains(to),
          s"rename '$from'->'$to': generation carries both names — " +
            "ambiguous; this is a rewrite migration, not a read-time alias")
        d.withColumnRenamed(from, to)
      }
    }

  /** Align two generations (e.g. an existing silver table and a
    * new-schema batch) onto their unified schema — the step that makes
    * [[graft.ops.Upsert.mergeByKey]] / CDC apply unchanged across an
    * evolution boundary. Returns (conformed old, conformed new).
    * `renames` is the declared metadata-only alias map (old→new),
    * applied to both sides before unification. */
  def conformedPair(old: DataFrame, nu: DataFrame,
      renames: Map[String, String] = Map.empty): (DataFrame, DataFrame) = {
    val (o, n) = (applyRenames(old, renames), applyRenames(nu, renames))
    val target = unifiedSchema(Seq(o.schema, n.schema))
    (conform(o, target), conform(n, target))
  }

  /** Read a generation-structured silver table (`gen=N` dirs under
    * `root`), each
    * generation written under the schema current at its write time,
    * conformed onto the unified schema. Plain parquet mergeSchema
    * handles added COLUMNS but refuses widened TYPES (int files + long
    * files error out); reading generations separately and conforming
    * handles both, and the per-generation scans remain ordinary pruned
    * parquet scans. */
  def readEvolved(spark: SparkSession, root: String,
      renames: Map[String, String] = Map.empty): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gens = fs.listStatus(new org.apache.hadoop.fs.Path(root)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen="))
      .map(_.getPath.toString).sorted
    require(gens.nonEmpty, s"no gen=* directories under $root")
    val dfs = gens.map(g => applyRenames(spark.read.parquet(g), renames))
    val target = unifiedSchema(dfs.map(_.schema))
    dfs.map(conform(_, target)).reduce(_.unionByName(_))
  }

  /** Outcome of a [[rewriteMigration]]: the Manifest version the
    * migrated table committed as, and how many rows failed validation
    * and went to the dead-letter directory instead. */
  final case class MigrationResult(version: Long, deadLettered: Long)

  /** The REVIEWED lossy-migration job the evolution policy routes to —
    * the step [[unifiedSchema]]/[[conform]] refuse to do implicitly.
    * This is the alembic chain's own shape (a1cbf11c1945_change_fetch_
    * status_to_enum.py: remap 'finished'→'success', UPPER, then a
    * VALIDATED text→enum cast with `status::fetch_status` — a cast
    * Postgres would abort on any unmapped value):
    *
    *  1. read the Manifest table's CURRENT snapshot;
    *  2. apply `migrate` — the reviewed transform (value remaps, lossy
    *     casts, renames — anything evolution refuses);
    *  3. split on `valid` (NULL counts as invalid — a lossy cast that
    *     produced NULL is precisely the violation this exists to
    *     catch): violators append to `deadLetterDir` with the
    *     migration version stamped, survivors COMMIT through
    *     [[Manifest.commit]] as the next version.
    *
    * Atomicity is the Manifest's: a concurrent reader resolves the
    * pre- or post-migration version, never a mix; a failed migration
    * leaves the table at its old version with no partial rewrite
    * visible. Unlike Postgres's abort-on-first-bad-value, violators
    * are CAPTURED (auditable, reprocessable) rather than blocking the
    * migration — the dead-letter discipline of the streaming lane
    * applied to DDL. */
  def rewriteMigration(spark: SparkSession, root: String,
      deadLetterDir: String)(migrate: DataFrame => DataFrame,
      valid: org.apache.spark.sql.Column): MigrationResult = {
    val staged = migrate(Manifest.read(spark, root))
      .withColumn("__valid", coalesce(valid, lit(false)))
      // the violator split reads the migrated relation twice; freeze it
      // once so the two branches cannot observe different evaluations
      // even if the reviewed transform is accidentally nondeterministic
      // (a row must never be both dead-lettered AND committed, or
      // neither). This is a deliberate exception to the
      // "never pin fact-scale relations" rule (SURVEY §4): a migration
      // is a one-shot administrative job run for its table, not a hot
      // query operator — split consistency outranks the memory trade.
      .localCheckpoint(false)
    val bad = staged.filter(!col("__valid")).drop("__valid")
    val badCount = bad.count()
    if (badCount > 0)
      bad.withColumn("__migrated_from",
          lit(Manifest.latestVersion(spark, root).getOrElse(-1L)))
        .write.mode("append").parquet(deadLetterDir)
    val v = Manifest.commit(staged.filter(col("__valid")).drop("__valid"), root)
    MigrationResult(v, badCount)
  }

  /** The a1cbf11c1945 migration itself, generalized: remap a string
    * column's legacy values, uppercase, and constrain to an enum
    * domain. Returns the (migrate, valid) pair for
    * [[rewriteMigration]]. */
  def toEnumMigration(column: String, remap: Map[String, String],
      domain: Set[String]): (DataFrame => DataFrame,
      org.apache.spark.sql.Column) = {
    val migrate = (df: DataFrame) => {
      val remapped = remap.foldLeft(col(column)) { case (c, (from, to)) =>
        when(c === from, to).otherwise(c)
      }
      df.withColumn(column, upper(remapped))
    }
    (migrate, col(column).isin(domain.toSeq: _*))
  }
}

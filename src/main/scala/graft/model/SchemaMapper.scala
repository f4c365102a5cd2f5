package graft.model

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Message-class → relational-schema mapping (SURVEY §2.9): the analog of
  * the reference's recursive table generator
  * [upstream: ros_sql/ros2sql.py::add_schemas], Spark-first.
  *
  * Where the reference SHREDS nested messages and arrays into child
  * tables with FK bookkeeping (an artifact of flat SQL backends), we keep
  * them native: StructType nests, ArrayType stays a list — Parquet
  * stores both columnar (Dremel repetition/definition levels), Catalyst
  * prunes into them, and nothing is joined back at read time. For sinks
  * that genuinely need flat rows (JDBC), `flatten` derives the reference
  * style `parent_child` columns as a VIEW of the nested truth, not as
  * the storage format.
  */
object SchemaMapper {

  /** Topic name → table identifier, e.g. "/robot1/pose" → "robot1_pose"
    * [upstream: ros_sql/util.py::namify]. */
  def namify(topic: String): String = {
    val cleaned = topic.dropWhile(_ == '/').toLowerCase
      .map(c => if (c.isLetterOrDigit) c else '_')
    if (cleaned.isEmpty || !cleaned.head.isLetter) s"t_$cleaned" else cleaned
  }

  /** Schema of a message case class, via its implicit Encoder — the
    * introspection step the reference does with __slots__/_slot_types. */
  def schemaOf[T: Encoder]: StructType =
    implicitly[Encoder[T]].schema

  /** Stable schema fingerprint — the md5sum analog the reference stores
    * in its catalog to detect message-definition drift
    * [upstream: ros_sql/models.py]. */
  def fingerprint(schema: StructType): String =
    MessageDigest.getInstance("SHA-256")
      .digest(schema.catalogString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Flat `a_b_c` names of every leaf under a schema (shared by flatten
    * and the unflatten null-struct guard). */
  private def leafNames(schema: StructType, prefix: String): Seq[String] =
    schema.fields.toSeq.flatMap { f =>
      val flat = if (prefix.isEmpty) f.name else s"${prefix}_${f.name}"
      f.dataType match {
        case st: StructType => leafNames(st, flat)
        case _              => Seq(flat)
      }
    }

  /** Leaf columns of a (possibly nested) schema as `a_b_c`-named flat
    * projections. Arrays/maps/binaries stop recursion (JDBC-side they
    * become opaque values or are exploded explicitly by the caller). */
  def flattenColumns(schema: StructType, prefix: String = ""): Seq[Column] =
    schema.fields.toSeq.flatMap { f =>
      val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      val flat = path.replace('.', '_')
      f.dataType match {
        case st: StructType => flattenColumns(st, path)
        case _              => Seq(col(path).as(flat))
      }
    }

  /** Nested frame → flat frame (reference-style column names). Fails
    * fast on mangled-name collisions (nested `a.b` vs flat sibling
    * `a_b` both become `a_b`) — otherwise the JDBC sink dies mid-batch
    * on a duplicate column, and unflatten resolves ambiguously. */
  def flatten(df: DataFrame): DataFrame = {
    val names = leafNames(df.schema, "")
    val dups = names.groupBy(identity).collect {
      case (n, occ) if occ.length > 1 => n
    }
    require(dups.isEmpty,
      s"flatten: mangled column name collision: ${dups.mkString(", ")} — " +
      "rename the conflicting fields before flattening")
    df.select(flattenColumns(df.schema): _*)
  }

  /** Inverse of [[flatten]]: rebuild the nested shape from reference
    * style `parent_child` flat columns — the sql2msg reconstruction step
    * [upstream: ros_sql/factories.py::sql2msg], done as ONE columnar
    * projection instead of the reference's per-row recursive fetch. */
  def unflattenColumns(target: StructType, prefix: String = ""): Seq[Column] =
    target.fields.toSeq.map { f =>
      val flat = (if (prefix.isEmpty) f.name else s"${prefix}_${f.name}")
      f.dataType match {
        case st: StructType =>
          import org.apache.spark.sql.functions.{lit, struct, when}
          val built = struct(unflattenColumns(st, flat): _*)
          // a null nested struct flattens to all-null leaves; rebuild it
          // as null (not a struct of zeros/defaults) when the target
          // field is nullable — struct(...) alone always constructs a
          // non-null value, silently fabricating default sub-messages.
          // LOSSY corner (documented): a genuinely non-null struct whose
          // leaves happen to be all null is indistinguishable from a
          // null struct after flattening, and rebuilds as null. A
          // zero-leaf struct type has no evidence either way — keep it
          // non-null (reduceOption guard; bare reduce threw on empty).
          val rebuilt =
            if (f.nullable) {
              leafNames(st, flat).map(col(_).isNull)
                .reduceOption(_ && _) match {
                case Some(allNull) =>
                  when(allNull, lit(null).cast(st)).otherwise(built)
                case None => built
              }
            } else built
          rebuilt.as(f.name)
        case _ => col(flat).as(f.name)
      }
    }

  /** Flat frame (as produced by [[flatten]]) → nested frame matching
    * `target`. Extra sink-side columns (e.g. `_recv_us`) are dropped. */
  def unflatten(df: DataFrame, target: StructType): DataFrame =
    df.select(unflattenColumns(target): _*)
}

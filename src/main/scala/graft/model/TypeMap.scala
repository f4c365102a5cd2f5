package graft.model

import org.apache.spark.sql.types._

/** Canonical primitive type mapping for the message-oriented ingest layer
  * (SURVEY §1.2) — the analog of the reference's ROS-primitive →
  * SQL-column map [upstream: ros_sql/ros2sql.py::type_map], re-based onto
  * Spark's type system.
  *
  * Differences from the reference, by design:
  *  - unsigned ints widen to the next signed type (the JVM has no
  *    unsigned); uint64 maps to DECIMAL(20,0) so it is LOSSLESS where the
  *    reference silently wraps at 2^63.
  *  - time/duration keep nanosecond precision as a (secs, nanos) struct —
  *    Spark's TimestampType is µs-only — with a derived µs view for SQL
  *    ergonomics (SURVEY §1.4).
  */
object TypeMap {

  /** ROS `time`/`duration`: two-field struct, ns-lossless. */
  val StampType: StructType = StructType(Seq(
    StructField("secs", LongType, nullable = false),
    StructField("nanos", LongType, nullable = false)))

  val primitives: Map[String, DataType] = Map(
    "bool"     -> BooleanType,
    "int8"     -> ByteType,
    "byte"     -> ByteType,       // legacy ROS alias
    "int16"    -> ShortType,
    "int32"    -> IntegerType,
    "int64"    -> LongType,
    "uint8"    -> ShortType,      // widen: no unsigned on the JVM
    "char"     -> ShortType,      // legacy ROS alias for uint8
    "uint16"   -> IntegerType,
    "uint32"   -> LongType,
    "uint64"   -> DecimalType(20, 0), // lossless (reference wraps)
    "float32"  -> FloatType,
    "float64"  -> DoubleType,
    "string"   -> StringType,
    "time"     -> StampType,
    "duration" -> StampType)

  /** `uint8[]` payloads (images/audio/blobs) are opaque binary, not a
    * shredded child table — the multimodal-column hook. */
  val byteArray: DataType = BinaryType

  /** `T[]`, fixed `T[36]`, and bounded `T[<=10]` array suffixes — ROS
    * message IDL has all three; the relational mapping is the same
    * ArrayType (the bound is a writer-side constraint, not a type). */
  private val ArraySuffix = """^(.*)\[(?:<=)?\d*\]$""".r

  /** Resolve a field type name like "float32", "uint8[]", "float64[36]",
    * "string[<=10]", "Header", "geometry_msgs/Point[]" against known
    * message schemas. */
  def resolve(name: String,
              known: Map[String, StructType] = Map.empty): DataType =
    name match {
      case ArraySuffix(elem) =>
        if (elem == "uint8" || elem == "byte" || elem == "char") byteArray
        else ArrayType(resolve(elem, known), containsNull = false)
      case _ =>
        primitives.getOrElse(name,
          known.getOrElse(name,
            known.getOrElse(name.split('/').last,
              throw new IllegalArgumentException(s"unknown type: $name"))))
    }
}

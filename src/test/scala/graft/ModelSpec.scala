package graft

import org.apache.spark.sql.types._

import graft.model.{SchemaMapper, TypeMap}

/** Unit tests for the schema-mapping core (SURVEY §2.9): name mangling,
  * the primitive type map, fingerprints, flattening. */
class ModelSpec extends SparkSpec {
  import spark.implicits._

  test("namify mangles topic names like the reference") {
    assert(SchemaMapper.namify("/robot1/pose") == "robot1_pose")
    assert(SchemaMapper.namify("/a/b-c.d") == "a_b_c_d")
    assert(SchemaMapper.namify("/CamelTopic") == "cameltopic")
    assert(SchemaMapper.namify("/123start") == "t_123start") // leading digit
  }

  test("primitive type map: signed widening, lossless uint64, ns stamps") {
    assert(TypeMap.resolve("int32") == IntegerType)
    assert(TypeMap.resolve("uint8") == ShortType)
    assert(TypeMap.resolve("uint32") == LongType)
    assert(TypeMap.resolve("uint64") == DecimalType(20, 0)) // ref wraps; we don't
    assert(TypeMap.resolve("time") == TypeMap.StampType)
    assert(TypeMap.resolve("float32[]") ==
      ArrayType(FloatType, containsNull = false))
    assert(TypeMap.resolve("uint8[]") == BinaryType) // blobs stay opaque
    intercept[IllegalArgumentException](TypeMap.resolve("nope"))
  }

  test("nested message types resolve through the known-types registry") {
    val header = StructType(Seq(StructField("seq", LongType)))
    assert(TypeMap.resolve("std_msgs/Header", Map("Header" -> header)) == header)
    assert(TypeMap.resolve("Header[]", Map("Header" -> header)) ==
      ArrayType(header, containsNull = false))
  }

  test("fingerprint is stable and order/type sensitive") {
    val a = StructType(Seq(StructField("x", LongType)))
    val b = StructType(Seq(StructField("x", IntegerType)))
    assert(SchemaMapper.fingerprint(a) == SchemaMapper.fingerprint(a.copy()))
    assert(SchemaMapper.fingerprint(a) != SchemaMapper.fingerprint(b))
  }

  test("flatten produces reference-style parent_child columns") {
    val df = Seq((1L, (2.0, (3L, 4L)))).toDF("id", "pose")
      .withColumnRenamed("pose", "pose")
    val nested = spark.createDataFrame(
      df.rdd,
      StructType(Seq(
        StructField("id", LongType),
        StructField("pose", StructType(Seq(
          StructField("x", DoubleType),
          StructField("stamp", StructType(Seq(
            StructField("secs", LongType),
            StructField("nanos", LongType))))))))))
    val flat = SchemaMapper.flatten(nested)
    assert(flat.columns.toSeq ==
      Seq("id", "pose_x", "pose_stamp_secs", "pose_stamp_nanos"))
    val r = flat.collect().head
    assert(r.getLong(0) == 1L && r.getDouble(1) == 2.0 &&
      r.getLong(2) == 3L && r.getLong(3) == 4L)
  }
}

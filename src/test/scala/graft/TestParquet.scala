package graft

import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType, Types}

/** Writes tiny synthetic `events.parquet` fixtures with an EXPLICIT
  * INT64 TIMESTAMP(unit) annotation on `ts`, via parquet-mr's example API —
  * Spark itself can only write MICROS, so exercising the loader's
  * NANOS/MILLIS paths needs a lower-level writer. Test-only. */
object TestParquet {
  def writeEvents(path: String, unit: String, tsRaw: Long): Unit = {
    val tu = unit match {
      case "NANOS"  => LogicalTypeAnnotation.TimeUnit.NANOS
      case "MICROS" => LogicalTypeAnnotation.TimeUnit.MICROS
      case "MILLIS" => LogicalTypeAnnotation.TimeUnit.MILLIS
    }
    val schema = Types.buildMessage()
      .optional(PrimitiveType.PrimitiveTypeName.INT64).named("event_id")
      .optional(PrimitiveType.PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timestampType(false, tu)).named("ts")
      .optional(PrimitiveType.PrimitiveTypeName.INT64).named("user_id")
      .optional(PrimitiveType.PrimitiveTypeName.BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("event_type")
      .optional(PrimitiveType.PrimitiveTypeName.DOUBLE).named("value")
      .optional(PrimitiveType.PrimitiveTypeName.BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")
    val conf = new org.apache.hadoop.conf.Configuration()
    val w = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(path))
      .withConf(conf)
      .withType(schema)
      .build()
    try {
      val g = new SimpleGroupFactory(schema).newGroup()
        .append("event_id", 1L)
        .append("ts", tsRaw)
        .append("user_id", 7L)
        .append("event_type", "view")
        .append("value", 1.0)
        .append("props", "{}")
      w.write(g)
    } finally w.close()
  }
}

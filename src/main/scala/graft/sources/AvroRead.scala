package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.{AvroInputFormat, AvroWrapper}
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.NullWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Distributed Avro READ path built directly on avro-mapred's Hadoop input
  * format — no spark-avro connector required (this container ships the avro
  * core/mapred jars but not the Spark datasource; the reference reads Avro
  * natively, /root/reference/src/utils.rs:62-84, so a bdt user's `.avro`
  * inputs must work here too).
  *
  * Scale shape: the writer schema is read ONCE on the driver from the file
  * header; records decode inside the scan tasks (`AvroInputFormat` splits
  * on Avro block boundaries, so a large file still fans out across
  * executors) and convert to `Row`s in the same task — Avro objects never
  * cross a shuffle, and the reader's object reuse is safe because every
  * field is copied out per record. Column pruning/pushdown don't apply to
  * row-oriented Avro in ANY engine — converting to parquet (the `convert`
  * op) is the documented fast path, same as the reference.
  *
  * Supported Avro types are the primitive subset the reference's utility
  * reads (int/long/float/double/boolean/string/bytes + nullable unions);
  * anything else fails loudly rather than mis-decoding.
  */
object AvroRead {

  private def toSparkType(s: Schema): (DataType, Boolean) = {
    // logical types (timestamp-millis, date, decimal, ...) annotate a
    // primitive but change its meaning — decoding them as the raw primitive
    // would be silent mis-typing, so they fail loudly instead (convert the
    // producer's file to parquet for full logical-type fidelity)
    if (s.getLogicalType != null)
      throw new IllegalArgumentException(
        s"unsupported avro logical type ${s.getLogicalType.getName} on $s")
    s.getType match {
      case Schema.Type.INT     => (IntegerType, false)
      case Schema.Type.LONG    => (LongType, false)
      case Schema.Type.FLOAT   => (FloatType, false)
      case Schema.Type.DOUBLE  => (DoubleType, false)
      case Schema.Type.BOOLEAN => (BooleanType, false)
      case Schema.Type.STRING  => (StringType, false)
      case Schema.Type.BYTES   => (BinaryType, false)
      case Schema.Type.UNION =>
        val branches = s.getTypes.asScala
        val nonNull = branches.filter(_.getType != Schema.Type.NULL)
        require(nonNull.size == 1 && branches.size != nonNull.size,
          s"unsupported avro union $s (only [null, T] unions)")
        (toSparkType(nonNull.head)._1, true)
      case other =>
        throw new IllegalArgumentException(s"unsupported avro type $other")
    }
  }

  /** The data files under `path` (a file, or every `.avro` part file in a
    * directory — case-insensitive, Spark/Hadoop bookkeeping files skipped)
    * plus the writer schema from the first one's header, via the Hadoop FS
    * API. The explicit file list (rather than handing the directory to the
    * input format) matters: AvroInputFormat's own listing filter is
    * case-SENSITIVE on ".avro", so a `DATA.AVRO` the sniffer accepts would
    * otherwise be silently dropped from the scan — schema resolved, zero
    * rows read.
    */
  private def resolve(spark: SparkSession, path: String): (Seq[Path], Schema) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath)
          .filter { f =>
            val n = f.getName
            n.toLowerCase.endsWith(".avro") &&
              !n.startsWith(".") && !n.startsWith("_")
          }
          .sortBy(_.getName).toSeq
      else Seq(p)
    if (files.isEmpty)
      throw new IllegalArgumentException(s"no .avro file in $path")
    val in = fs.open(files.head)
    var ok = false
    try {
      val stream = new DataFileStream[GenericRecord](
        in, new GenericDatumReader[GenericRecord]())
      // stream.close() also closes `in`; the outer finally covers the case
      // where the constructor itself threw (corrupt / non-Avro file) and
      // the stream never existed to close
      try { val s = stream.getSchema; ok = true; (files, s) }
      finally stream.close()
    } finally if (!ok) in.close()
  }

  def sparkSchema(avro: Schema): StructType = StructType(
    avro.getFields.asScala.toSeq.map { f =>
      val (dt, nullable) = toSparkType(f.schema())
      StructField(f.name(), dt, nullable)
    })

  def read(spark: SparkSession, path: String): DataFrame = {
    val (files, avroSchema) = resolve(spark, path)
    val struct = sparkSchema(avroSchema)
    val nFields = struct.size
    // field layout fingerprint: records decode positionally against the
    // FIRST file's schema, so a part file whose writer schema reordered or
    // retyped fields would silently transpose columns — every task checks
    // its records' actual schema (reference-compare, so once per file in
    // practice) and fails loudly instead
    val expectedLayout = avroSchema.getFields.asScala
      .map(f => f.name + ":" + f.schema().toString).mkString(";")
    // explicit JobConf: AvroInputFormat's own listing filter drops files
    // not ending in lowercase ".avro" even when they are passed explicitly,
    // so its extension filter is disabled — resolve() above already did the
    // (case-insensitive) selection
    val jobConf = new org.apache.hadoop.mapred.JobConf(
      spark.sparkContext.hadoopConfiguration)
    jobConf.setBoolean("avro.mapred.ignore.inputs.without.extension", false)
    org.apache.hadoop.mapred.FileInputFormat.setInputPaths(jobConf, files: _*)
    val rdd = spark.sparkContext
      .hadoopRDD(
        jobConf,
        classOf[AvroInputFormat[GenericRecord]],
        classOf[AvroWrapper[GenericRecord]],
        classOf[NullWritable])
      .mapPartitions { it =>
        var checked: Schema = null
        it.map { case (wrapper, _) =>
          // copy every field out NOW — the record reader reuses its datum
          val rec = wrapper.datum()
          if (rec.getSchema ne checked) {
            val layout = rec.getSchema.getFields.asScala
              .map(f => f.name + ":" + f.schema().toString).mkString(";")
            require(layout == expectedLayout,
              s"avro part file schema differs from ${files.head}: " +
                s"expected [$expectedLayout], got [$layout]")
            checked = rec.getSchema
          }
          val vals = new Array[Any](nFields)
          var i = 0
          while (i < nFields) {
            vals(i) = rec.get(i) match {
              case u: org.apache.avro.util.Utf8 => u.toString
              case b: java.nio.ByteBuffer =>
                val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
              case x => x
            }
            i += 1
          }
          Row.fromSeq(vals.toIndexedSeq)
        }
      }
    spark.createDataFrame(rdd, struct)
  }

  /** TEST-FIXTURE writer: a driver-side Avro file from collected rows via
    * the avro core API. This is NOT a distributed sink (the reference
    * rejects avro OUTPUT too, convert.rs:37-39) — it exists solely so the
    * read path above can be proven end-to-end without a connector jar.
    * Callers must keep it to dimension-sized data.
    */
  def writeFixture(df: DataFrame, out: String): Unit = {
    val struct = df.schema
    val fields = struct.fields.map { f =>
      val base = f.dataType match {
        case IntegerType => Schema.create(Schema.Type.INT)
        case LongType    => Schema.create(Schema.Type.LONG)
        case FloatType   => Schema.create(Schema.Type.FLOAT)
        case DoubleType  => Schema.create(Schema.Type.DOUBLE)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType  => Schema.create(Schema.Type.STRING)
        case BinaryType  => Schema.create(Schema.Type.BYTES)
        case other =>
          throw new IllegalArgumentException(s"unsupported fixture type $other")
      }
      // nullable Spark fields become [null, T] unions so null values write
      // (and so the read path's union branch is actually exercisable)
      val avroType =
        if (f.nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base)
        else base
      new Schema.Field(f.name, avroType, null, null.asInstanceOf[Object])
    }
    val schema = Schema.createRecord("fixture", null, "graft", false, fields.toList.asJava)
    val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    val f = new java.io.File(out)
    Option(f.getParentFile).foreach(_.mkdirs())
    writer.create(schema, f)
    try df.collect().foreach { row =>
      val rec = new GenericData.Record(schema)
      struct.fields.zipWithIndex.foreach { case (sf, i) =>
        val v = row.get(i) match {
          case bytes: Array[Byte] => java.nio.ByteBuffer.wrap(bytes)
          case x => x
        }
        rec.put(sf.name, v)
      }
      writer.append(rec)
    } finally writer.close()
  }
}

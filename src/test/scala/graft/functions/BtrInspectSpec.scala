package graft.functions

import graft.format._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class BtrInspectSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("walker consumes exactly the bytes decode consumes, for every chunk of every table") {
    for (table <- Seq("lineitem", "orders", "documents", "events", "part")) {
      val path = s"/tmp/btr-inspect/$table"
      spark.read.parquet(s"/root/testdata/sf0.001/$table.parquet")
        .write.format("btr").option("btr.blockSize", "1024").mode("overwrite").save(path)
      val dir = new org.apache.hadoop.fs.Path(path)
      val fs = dir.getFileSystem(BtrTableMeta.hadoopConf())
      val schema = BtrTableMeta.readSchema(fs, dir)
      BtrTableMeta.listDataFiles(fs, dir).foreach { f =>
        val bytes = {
          val len = fs.getFileStatus(f).getLen.toInt
          val b = new Array[Byte](len)
          val in = fs.open(f)
          in.readFully(0, b)
          in.close()
          b
        }
        val footer = BtrFile.readFooter(bytes)
        footer.rowGroups.foreach { rg =>
          schema.fields.zipWithIndex.foreach { case (field, c) =>
            val meta = rg.columns(c)
            val tag = PhysType.of(field.dataType)
            val r = new BufReader(bytes, meta.offset.toInt, meta.offset.toInt + meta.length)
            BlockDescribe.describeChunk(r, tag, rg.numRows)
            assert(r.remaining == 0,
              s"$table.${field.name}: walker left ${r.remaining} of ${meta.length} bytes")
          }
        }
      }
    }
  }

  test("describe dataframe has one row per (rowGroup, column) with sane trees") {
    val path = "/tmp/btr-inspect/lineitem"
    val df = BtrInspect.describe(spark, path)
    val rows = df.collect()
    assert(rows.length > 11, s"expected multiple chunks x 11 columns, got ${rows.length}")
    val byCol = rows.groupBy(_.getAs[String]("column"))
    assert(byCol.keySet.size == 11)
    // scheme trees must parse to known scheme heads
    val heads = rows.map(_.getAs[String]("scheme_tree").takeWhile(_ != '(')).toSet
    val known = Set("raw", "one_value", "dict", "rle", "for_bp", "delta_bp", "freq", "pseudodec", "fsst")
    assert(heads.subsetOf(known), s"unknown scheme heads: ${heads -- known}")
    // every chunk reports the null kind
    assert(rows.forall(r => Set("all_valid", "all_null", "sparse_nulls", "sparse_valids")
      .contains(r.getAs[String]("null_kind"))))
  }
}

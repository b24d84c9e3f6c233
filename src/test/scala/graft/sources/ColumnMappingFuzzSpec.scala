package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Property fuzz for the column-mapping layer: random interleavings of
  * appends, RENAME COLUMN, DROP COLUMN and ADD COLUMN (including
  * re-adding previously dropped names) must always read back exactly the
  * model table — same live columns, same rows, nulls exactly where the
  * model has them. Every read exercises the positional slot resolution
  * over files written under DIFFERENT historical layouts.
  */
class ColumnMappingFuzzSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("colmap-fuzz")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.catalog.graft", "graft.sources.BtrCatalog")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(name: String) = {
    val d = s"/tmp/btr-colmap-fuzz/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    d
  }

  test("random DDL/append interleavings read back the model exactly") {
    // SPARK_GRAFT_FUZZ_SEED overrides the base seed for extended hunts
    val rnd = new scala.util.Random(
      sys.env.get("SPARK_GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(20260814L))
    for (round <- 0 until 4) {
      val dir = tmp(s"r$round")
      // model: live column names in order (head is the never-dropped id
      // key) and rows as (id, values per non-id live column by name)
      var cols = Vector("id", s"c${round}a", s"c${round}b")
      var rows = Vector.empty[Map[String, Option[Long]]]
      var nextId = 0L
      var nextCol = 0
      var dropped = Vector.empty[String]

      def freshName(): String = { nextCol += 1; s"n$nextCol" }

      def appendRows(n: Int, mode: String): Unit = {
        val newRows = (0 until n).map { _ =>
          nextId += 1
          cols.map { c =>
            c -> (if (c == "id") Some(nextId)
                  else if (rnd.nextInt(4) == 0) None
                  else Some(rnd.nextInt(1000).toLong))
          }.toMap
        }
        val schema = StructType(cols.map(c =>
          StructField(c, LongType, nullable = c != "id")))
        val df = spark.createDataFrame(
          new java.util.ArrayList[Row](scala.jdk.CollectionConverters
            .SeqHasAsJava(newRows.map(r =>
              Row.fromSeq(cols.map(c => r(c).map(Long.box).orNull)))).asJava),
          schema)
        df.write.format("btr").mode(mode).save(dir)
        rows = (if (mode == "overwrite") Vector.empty else rows) ++ newRows
      }

      appendRows(20, "overwrite")
      for (_ <- 0 until 14) {
        rnd.nextInt(4) match {
          case 0 => appendRows(1 + rnd.nextInt(10), "append")
          case 1 => // rename a non-id column
            val candidates = cols.filter(_ != "id")
            if (candidates.nonEmpty) {
              val from = candidates(rnd.nextInt(candidates.length))
              val to = freshName()
              spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN $from TO $to")
              cols = cols.map(c => if (c == from) to else c)
              rows = rows.map(r => (r - from) + (to -> r(from)))
            }
          case 2 => // drop a non-id column (keep >= 2 live so id is never last)
            val candidates = cols.filter(_ != "id")
            if (candidates.length >= 2) {
              val victim = candidates(rnd.nextInt(candidates.length))
              spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN $victim")
              cols = cols.filterNot(_ == victim)
              rows = rows.map(_ - victim)
              dropped :+= victim
            }
          case 3 => // add a column: fresh name, or RE-ADD a dropped one
            val name =
              if (dropped.nonEmpty && rnd.nextBoolean()) {
                val n = dropped(rnd.nextInt(dropped.length))
                if (cols.contains(n)) freshName() else n
              } else freshName()
            spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMN $name BIGINT")
            cols :+= name
            // pre-existing rows read the new slot as null — including
            // rows that once held values under a dropped namesake
            rows = rows.map(r => r + (name -> None))
        }
        // verify after EVERY op: schema and full contents
        val t = spark.read.format("btr").load(dir)
        assert(t.columns.toSeq == cols.toSeq,
          s"round $round: schema drift — got ${t.columns.toSeq}, want $cols")
        val got = t.collect().map { r =>
          cols.map(c => c -> Option(r.getAs[Any](c)).map(_.asInstanceOf[Long])).toMap
        }.sortBy(_("id").get)
        val want = rows.sortBy(_("id").get)
        assert(got.length == want.length,
          s"round $round: ${got.length} rows, want ${want.length}")
        got.zip(want).foreach { case (g, w) =>
          assert(g == w, s"round $round: row mismatch\n got: $g\nwant: $w")
        }
      }
    }
  }
}

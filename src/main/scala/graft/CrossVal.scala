package graft
import org.apache.spark.sql.SparkSession
import java.util.Base64
import java.nio.file.{Files, Paths}

/** Dumps (html, extracted) pairs for external cross-validation. */
object CrossVal {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200)
    val out = args.lift(1).getOrElse("/tmp/crossval.tsv")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = corpus.PagesGen.pages(spark, n, 8).collect().map { p =>
      val html = new String(p.html, "UTF-8")
      val text = extract.HtmlText.extract(html)
      Base64.getEncoder.encodeToString(html.getBytes("UTF-8")) + "\t" +
        Base64.getEncoder.encodeToString(text.getBytes("UTF-8"))
    }
    Files.writeString(Paths.get(out), rows.mkString("\n"))
    println(s"dumped ${rows.length} pairs to $out")
    spark.stop()
  }
}

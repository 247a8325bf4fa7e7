package graft
object DbgRw {
  def main(args: Array[String]): Unit =
    args.foreach(q => println("[" + graft.sql.DialectRewrites(q) + "]"))
}

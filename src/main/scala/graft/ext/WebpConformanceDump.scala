package graft.ext

/** Dump [[VP8LCodec.encode]] streams for the libwebp cross-check
  * (`tools/webp_conformance.py` — see its header for the workflow).
  * The formulas here are mirrored in that script.
  */
object WebpConformanceDump {
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get(
      args.headOption.getOrElse("/tmp/webp_dump"))
    java.nio.file.Files.createDirectories(dir)
    val cases = Seq(
      ("gradient", 8, 5), ("gradient", 33, 21), ("gradient", 1, 1),
      ("noise", 19, 13), ("noise", 64, 48), ("stripes", 40, 26),
      ("gradient", 64, 1), ("gradient", 1, 48))
    cases.foreach { case (name, w, h) =>
      def f(x: Int, y: Int, c: Int): Int = name match {
        case "gradient" => (x * 3 + y * 5 + c * 7) % 256
        case "noise" => (x * 97 + y * 61 + c * 41 + x * y * 13) % 256
        case _ =>
          c match {
            case 0 => (y * 37) % 256
            case 1 => (y * 91) % 256
            case _ => (y * 53) % 256
          }
      }
      java.nio.file.Files.write(
        dir.resolve(s"${name}_${w}x$h.webp"), VP8LCodec.encode(w, h, f))
    }
    println(s"[webp-dump] wrote ${cases.size} files to $dir")
  }
}

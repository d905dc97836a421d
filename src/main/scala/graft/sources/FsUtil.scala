package graft.sources

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

/** Tiny filesystem helpers shared by demo scratch-dir management and the
  * bench I/O calibration — ONE definition of the close-the-walk
  * recursive delete (the r7 Files.walk descriptor leak was fixed in
  * three copy-pasted sites; r8 review: consolidate so the next fix
  * lands once).
  */
object FsUtil {

  /** Delete `root` and everything under it, if it exists. The walk
    * stream is closed (it holds directory descriptors open until then).
    */
  def deleteTree(root: Path): Unit =
    if (Files.exists(root)) {
      scala.util.Using.resource(Files.walk(root)) { st =>
        st.iterator().asScala.toSeq
          .reverse.foreach(p => Files.deleteIfExists(p))
      }
    }
}

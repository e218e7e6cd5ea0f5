package graft

import graft.sources.{CoordinatedLogStore, FileClaimCoordinator, NioLogStore}

/** Child JVM of the CROSS-PROCESS coordinator race
  * (TxLogCheckpointSpec "two-JVM coordinator race") — a separate
  * process, separate classloader, separate everything, racing the
  * parent's claimants through the SAME [[FileClaimCoordinator]] claims
  * directory. Spark-free on purpose: the whole multi-writer story of
  * the table format reduces to `putIfAbsent`'s at-most-one-winner
  * contract, so that is what the processes race.
  *
  * args: claimsDir baseDir nSlots claimantId wonFile
  * Writes the slots THIS process won (one per line) to `wonFile`,
  * exit 0 on success. */
object ClaimRaceChild {
  def main(args: Array[String]): Unit = {
    val Array(claimsDir, base, nStr, id, wonFile) = args
    val store = new CoordinatedLogStore(NioLogStore,
      new FileClaimCoordinator(java.nio.file.Paths.get(claimsDir)))
    val slots = (0 until nStr.toInt).map(v => f"$base/$v%08d.txt")
    val won = new scala.util.Random(id.hashCode).shuffle(slots.toList)
      .filter(slot => store.putIfAbsent(slot, id.getBytes("UTF-8")))
    java.nio.file.Files.write(java.nio.file.Paths.get(wonFile),
      won.mkString("", "\n", "\n").getBytes("UTF-8"))
  }
}

package graft

import java.util.concurrent.{CyclicBarrier, TimeUnit}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}

/** Base for the scheme-renaming local test filesystems below: statuses
  * are returned as PLAIN FileStatus with permissions preloaded —
  * RawLocalFileSystem's DeprecatedRawLocalFileStatus loads permissions
  * lazily via `new java.io.File(path.toUri)`, which rejects any URI
  * whose scheme is not `file`. */
abstract class LocalBackedSchemeFs extends RawLocalFileSystem {
  private def plain(st: FileStatus): FileStatus = new FileStatus(
    st.getLen, st.isDirectory, st.getReplication, st.getBlockSize,
    st.getModificationTime, st.getAccessTime,
    org.apache.hadoop.fs.permission.FsPermission.getDefault,
    "graft", "graft", st.getPath)
  override def getFileStatus(f: Path): FileStatus = plain(super.getFileStatus(f))
  override def listStatus(f: Path): Array[FileStatus] = super.listStatus(f).map(plain)
}

/** A local filesystem whose `rename` is LAST-WINS (delete-then-rename,
  * always reports success) — the object-store posture
  * `StateLog.publishExclusive`'s read-back verify exists for (VERDICT
  * r14 task 3). Registered in tests under the `lastwins` scheme via
  * `fs.lastwins.impl`; the scheme is deliberately NOT in StateLog's
  * known-non-atomic refusal list, modeling a store the static list
  * cannot know about, where the verify is the only net.
  *
  * When [[LastWinsFileSystem.armRace]] is set, the first two renames
  * targeting the same `g<N>.claim` destination are SEQUENCED into the
  * deterministic double-publish interleaving: both callers rendezvous
  * (so both have already passed the pre-publish `exists` check), their
  * physical writes are serialized, and both return `true` — the
  * mis-reported win — only after BOTH payloads have landed. The
  * surviving content is the second writer's, so exactly one read-back
  * verify can succeed: the first writer MUST be caught by the verify
  * and abort into retry, which is the property under test. */
class LastWinsFileSystem extends LocalBackedSchemeFs {
  override def getScheme: String = "lastwins"
  override def getUri: java.net.URI = java.net.URI.create("lastwins:///")

  private def lastWinsRename(src: Path, dst: Path): Boolean = {
    if (exists(dst)) delete(dst, false)
    super.rename(src, dst)
    true // an object store resolves the replace silently — always a "win"
  }

  override def rename(src: Path, dst: Path): Boolean =
    if (LastWinsFileSystem.armRace.get() && dst.getName.matches("g\\d+\\.claim")) {
      // rendezvous: both racers are inside rename BEFORE either writes,
      // so both passed the exists() pre-check on an absent marker
      LastWinsFileSystem.barrier.await(120, TimeUnit.SECONDS)
      val order = LastWinsFileSystem.order.getAndIncrement()
      LastWinsFileSystem.writeLock.synchronized {
        lastWinsRename(src, dst)
        LastWinsFileSystem.published.incrementAndGet(): Unit
      }
      if (order == 0) {
        // the FIRST physical writer only reports its "win" after the
        // second's content has replaced its own — the last-wins shape
        val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
        while (LastWinsFileSystem.published.get() < 2 &&
            System.nanoTime() < deadline) Thread.sleep(10)
      } else LastWinsFileSystem.armRace.set(false) // one-shot
      true
    } else lastWinsRename(src, dst)
}

/** A stand-in for a KNOWN last-wins scheme: reports scheme `s3a` (so
  * StateLog's refusal list fires) while backing onto the local fs, so
  * reads and single-writer commits still work once the caller accepts
  * the posture explicitly. */
class FakeS3aFileSystem extends LocalBackedSchemeFs {
  override def getScheme: String = "s3a"
  override def getUri: java.net.URI = java.net.URI.create("s3a:///")
  override def rename(src: Path, dst: Path): Boolean = {
    if (exists(dst)) delete(dst, false)
    super.rename(src, dst)
    true
  }
}

/** A local filesystem whose REPORTED mtimes run two hours BEHIND the
  * JVM's wall clock — the store-clock-skew posture the graced GC's probe
  * basis (`StateLog.storeNow`) exists for (VERDICT r15 task 5). With a
  * wall-clock "now", a just-written file on this store reads as two
  * hours old — past any sane grace window — and a live writer's
  * in-flight attempt would be reclaimed; probing "now" through the same
  * store cancels the skew exactly. */
class SkewedClockFileSystem extends LocalBackedSchemeFs {
  override def getScheme: String = "skewclock"
  override def getUri: java.net.URI = java.net.URI.create("skewclock:///")
  private def shift(st: FileStatus): FileStatus = new FileStatus(
    st.getLen, st.isDirectory, st.getReplication, st.getBlockSize,
    st.getModificationTime - SkewedClockFileSystem.SkewMs, st.getAccessTime,
    org.apache.hadoop.fs.permission.FsPermission.getDefault,
    "graft", "graft", st.getPath)
  override def getFileStatus(f: Path): FileStatus = shift(super.getFileStatus(f))
  override def listStatus(f: Path): Array[FileStatus] = super.listStatus(f).map(shift)
}

object SkewedClockFileSystem {
  val SkewMs: Long = 7200000L
}

object LastWinsFileSystem {
  val armRace = new AtomicBoolean(false)
  val barrier = new CyclicBarrier(2)
  val order = new AtomicInteger(0)
  val published = new AtomicInteger(0)
  val writeLock = new Object

  def reset(): Unit = {
    armRace.set(false)
    barrier.reset()
    order.set(0)
    published.set(0)
  }
}

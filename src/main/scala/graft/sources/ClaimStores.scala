package graft.sources

/** The OBJECT-STORE leg of the sharded-table commit protocol.
  *
  * [[Sources.AtomicCreateClaimStore]] (the default) is atomic on
  * local filesystems (NIO O_EXCL) and HDFS (namenode-atomic create) —
  * but on S3-family object stores a Hadoop `create(overwrite=false)`
  * is check-then-act (HEAD then PUT): two concurrent writers can both
  * "win" the claim and one published manifest silently clobbers the
  * other. Where 100 TB tables actually live, the claim must ride the
  * store's own conditional-write primitive:
  *
  *  - S3: `PutObject` with `If-None-Match: *` — the PUT fails with
  *    HTTP 412 if the key already exists (public semantics, available
  *    on S3 since 2024 and on every S3-compatible store that
  *    implements the header).
  *  - GCS: `x-goog-if-generation-match: 0`.
  *  - ABFS / Azure Blob: `If-None-Match: *` ETag precondition.
  *
  * [[ConditionalPutClaimStore]] implements [[Sources.ClaimStore]]
  * over that primitive, abstracted as [[ObjectStoreApi]] so the SAME
  * protocol code is exercised by the local fault-injecting
  * [[EmulatedObjectStore]] in tests and probes (this container has no
  * cloud SDK and zero egress; a production deployment implements
  * `ObjectStoreApi` over its store's SDK in a few lines and installs
  * the store via [[Sources.setClaimStore]]).
  *
  * THE AMBIGUITY PROBLEM — why this is more than "PUT and check the
  * status code": an object-store request can time out AFTER the store
  * applied it. A naive retry then sees 412 "already exists" and
  * concludes it LOST the claim — while actually holding it, leaving
  * the version permanently claimed-but-unpublished (a wedged table)
  * or, worse, two writers each concluding the OTHER one won. The
  * protocol therefore writes a per-attempt UNIQUE TOKEN as the claim
  * body; any ambiguous outcome is resolved by reading the claim back
  * and comparing tokens — `ours` means our earlier attempt landed
  * (claim won), `theirs` means a concurrent writer won (claim lost,
  * retry at the next version). Only a read that finds NO claim after
  * exhausted retries is genuinely unresolvable (our in-flight PUT
  * could still land later); that throws rather than guessing — the
  * audit surfaces the stale claim if it does land, and removing it
  * unblocks the table with no data loss (same remediation as a
  * crashed writer, see [[Sources.publishVersion]]).
  *
  * `release` (undo a claim whose commit failed) must be conditional
  * too: an unconditional DELETE issued by a writer that mis-judged
  * ownership would free a claim a DIFFERENT writer holds, re-opening
  * the double-publish race. The token makes it a compare-and-delete.
  */
object ObjectStoreApi {
  sealed trait PutResult
  /** The store created the object — this caller owns the claim. */
  case object Created extends PutResult
  /** Precondition failed (HTTP 412): the key already exists. This is
    * DEFINITIVE from the store — but the holder might still be an
    * earlier ambiguous attempt of OURS (token check decides). */
  case object AlreadyExists extends PutResult
  /** Timeout / 5xx / connection reset: the outcome is UNKNOWN — the
    * store may or may not have applied the PUT. */
  final case class Transient(cause: String) extends PutResult
}

/** Minimal object-store surface the commit protocol needs; maps 1:1
  * onto S3/GCS/ABFS conditional-write calls (keys are claim paths,
  * bodies are writer tokens — tiny objects, metadata-scale traffic).
  * `get` and `deleteIfMatch` are assumed read-after-write consistent
  * with `putIfAbsent` on the same key (true of S3 since 2020, GCS and
  * ABFS always). */
trait ObjectStoreApi {
  def putIfAbsent(key: String, body: Array[Byte]): ObjectStoreApi.PutResult
  def get(key: String): Option[Array[Byte]]
  /** Delete only if the stored body equals `body` (ETag / generation
    * precondition in a real store). Returns true iff deleted. */
  def deleteIfMatch(key: String, body: Array[Byte]): Boolean
}

/** [[Sources.ClaimStore]] over a conditional-PUT object store — see
  * the object doc above for the token protocol. Stateless between
  * claims except the bounded token map a later `release` needs
  * (claims that PUBLISH never release, so entries are dropped
  * wholesale past a bound — by then their release window is long
  * closed). */
final class ConditionalPutClaimStore(
    store: ObjectStoreApi,
    maxRetries: Int = 4,
    backoffMs: Long = 20L) extends Sources.ClaimStore {

  private val owned =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()

  private def keyOf(p: org.apache.hadoop.fs.Path): String = p.toString

  def tryClaim(fs: org.apache.hadoop.fs.FileSystem,
               p: org.apache.hadoop.fs.Path): Boolean = {
    val key = keyOf(p)
    val token = (java.util.UUID.randomUUID().toString + "@" +
      java.lang.management.ManagementFactory.getRuntimeMXBean.getName)
      .getBytes("UTF-8")
    def won(): Boolean = {
      if (owned.size > 8192) owned.clear()
      owned.put(key, token); true
    }
    var attempt = 0
    while (true) {
      store.putIfAbsent(key, token) match {
        case ObjectStoreApi.Created => return won()
        case ObjectStoreApi.AlreadyExists =>
          // definitive 412 — but the holder might be our OWN earlier
          // ambiguous attempt: token check decides
          return store.get(key)
            .exists(java.util.Arrays.equals(_, token)) && won()
        case ObjectStoreApi.Transient(cause) =>
          attempt += 1
          if (attempt > maxRetries) {
            return store.get(key) match {
              case Some(b) if java.util.Arrays.equals(b, token) => won()
              case Some(_) => false
              case None => throw new IllegalStateException(
                s"claim $key: state unknown after $attempt attempts " +
                  s"(last: $cause) — an in-flight PUT may still land; " +
                  "refusing to guess (the audit reports the claim if " +
                  "it does; removing it unblocks the table)")
            }
          }
          Thread.sleep(backoffMs << (attempt - 1).min(5))
      }
    }
    false // unreachable
  }

  override def release(fs: org.apache.hadoop.fs.FileSystem,
                       p: org.apache.hadoop.fs.Path): Unit = {
    val key = keyOf(p)
    Option(owned.remove(key)).foreach { tok =>
      store.deleteIfMatch(key, tok); ()
    }
  }
}

/** Local emulation of a conditional-PUT object store, with FAULT
  * INJECTION — the test double that lets the ambiguity protocol be
  * exercised without a cloud account. Objects are real files (claim
  * WAITERS in [[Sources.publishVersion]] and the audit check the
  * claim via `fs.exists`, exactly as they would against s3a:// in a
  * real deployment — the emulation must keep that surface live), and
  * the create is NIO O_EXCL, so the emulated `putIfAbsent` is
  * genuinely atomic under the 8-writer probe.
  *
  * `inject` classifies each put: `NoFault` (apply + report
  * truthfully), `TransientBeforeEffect` (report a timeout, apply
  * NOTHING — a request lost on the way out), `TransientAfterEffect`
  * (APPLY the put, then report a timeout — the ambiguous case: the
  * store committed but the client never heard). Injectors should key
  * on the claim path so concurrently-running tests on other tables
  * see a plain store. */
final class EmulatedObjectStore(
    inject: String => EmulatedObjectStore.Fault =
      _ => EmulatedObjectStore.NoFault) extends ObjectStoreApi {
  import EmulatedObjectStore._

  private def nioPath(key: String) = {
    val uri = new java.net.URI(key)
    java.nio.file.Paths.get(
      if (uri.getScheme == null) key else uri.getPath)
  }

  def putIfAbsent(key: String,
                  body: Array[Byte]): ObjectStoreApi.PutResult = {
    val fault = inject(key)
    if (fault == TransientBeforeEffect)
      return ObjectStoreApi.Transient("injected: lost request")
    val p = nioPath(key)
    val applied =
      try {
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.createFile(p) // O_EXCL — atomic
        java.nio.file.Files.write(p, body)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    if (fault == TransientAfterEffect)
      ObjectStoreApi.Transient("injected: response lost after effect")
    else if (applied) ObjectStoreApi.Created
    else ObjectStoreApi.AlreadyExists
  }

  def get(key: String): Option[Array[Byte]] = {
    val p = nioPath(key)
    if (!java.nio.file.Files.exists(p)) None
    else Some(java.nio.file.Files.readAllBytes(p))
  }

  def deleteIfMatch(key: String, body: Array[Byte]): Boolean =
    get(key).exists(java.util.Arrays.equals(_, body)) && {
      java.nio.file.Files.deleteIfExists(nioPath(key))
    }
}

object EmulatedObjectStore {
  sealed trait Fault
  case object NoFault extends Fault
  case object TransientBeforeEffect extends Fault
  case object TransientAfterEffect extends Fault
}

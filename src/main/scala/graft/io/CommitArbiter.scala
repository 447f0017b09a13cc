package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}

/** The ONE primitive the snapshot protocol needs from a storage system:
  * publish `tmp`'s bytes at `dst` if-and-only-if `dst` does not exist,
  * ATOMICALLY — so of two racing committers exactly one returns true.
  *
  * Built-in arbitration covers file:// (hard-link create, EEXIST-atomic)
  * and hdfs:// (rename refuses an existing target by contract). Object
  * stores without an atomic no-replace rename plug in here instead of
  * opting into the unsafe exists()+rename() fallback: set
  *
  * {{{
  * spark.hadoop.graft.lake.commit.arbiter=com.example.S3CasArbiter
  * }}}
  *
  * and implement this trait with the store's compare-and-swap write —
  * on S3 a `PutObject` with `If-None-Match: *` (conditional writes are
  * standard S3 API surface; a 412 Precondition Failed means the other
  * committer won), on GCS `x-goods-if-generation-match: 0`, on ABFS a
  * lease/ETag-conditioned create. The implementation must read `tmp`'s
  * bytes through `fs` and attempt the conditional create of `dst`; it
  * must NOT delete `tmp` (the caller reclaims it) and must NOT replace
  * an existing `dst` under any interleaving — a false "won" here is
  * exactly the lost-snapshot bug the protocol exists to prevent.
  *
  * Implementations need a public no-arg constructor (instantiated
  * reflectively from the conf) and should be stateless; one instance
  * may serve many commits concurrently.
  *
  * CERTIFY an implementation before trusting a lake to it:
  * [[CommitArbiterContract.certify]] checks the primitive's safety
  * properties (create-wins, no-replace, temp preserved, exactly one
  * race winner, sequential composition) with no test-framework
  * dependency — run it against a scratch path ON THE TARGET STORE.
  * For the full three-layer certification (primitive + racing lake
  * commits + the random-op model check), subclass the test-scope
  * `CommitArbiterContractSpec`, the way the in-repo CAS double does.
  */
trait CommitArbiter {
  /** True iff this call CREATED `dst` (won the race); false iff `dst`
    * already existed or was created concurrently. Any other failure
    * should throw — the commit loop treats exceptions as fatal, never
    * as "lost the race".
    */
  def publishIfAbsent(fs: FileSystem, tmp: Path, dst: Path): Boolean
}

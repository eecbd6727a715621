package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.catalog.GraftCatalog
import graft.sources.Snapshots

/** Round-20 pins — the r19 verdict items:
  *  1. fast-forward publish is ATOMIC: a multi-commit branch squashes
  *     into ONE main commit published by a single link; a racing main
  *     committer makes the publish refuse with NOTHING linked; a crash
  *     between the link and the ref/cleanup bookkeeping is finished
  *     idempotently on re-run;
  *  2. squash scoping: branch-staged files re-pin so fork-era deletes
  *     miss them (re-insert semantics survive the publish) and future
  *     main deletes cover them.
  */
class Round20OpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val wh = {
    val dir = Qx.tmpOut("r20wh", sf())
    GraftCatalog.register(spark, "snap", Some(dir))
    dir
  }

  private def sqlDf(q: String) = { wh; spark.sql(q) }

  private def ks(root: String): Set[Long] =
    Snapshots.read(spark, root).select("k").collect().map(_.getLong(0)).toSet

  test("fast-forward squashes a multi-commit branch into ONE atomic main commit") {
    val root = Qx.tmpOut("r20ff", sf())
    Snapshots.commit(root)(out =>
      spark.range(0, 100).selectExpr("id AS k").write.mode("append").parquet(out))
    assert(Snapshots.createBranch(root, "audit") == 1L)
    // three branch commits — the audited-as-a-whole batch
    Seq((100L, 120L), (120L, 140L), (140L, 160L)).foreach { case (a, b) =>
      Snapshots.commitToBranch(root, "audit")(out =>
        spark.range(a, b).selectExpr("id AS k").write.mode("append").parquet(out))
    }
    assert(Snapshots.branchHead(root, "audit") == 4L)
    assert(Snapshots.maxCommitted(root) == 1L, "main untouched pre-publish")
    // ONE new main version, not three: the squash commit at fork+1
    assert(Snapshots.fastForward(root, "audit") == 2L)
    assert(Snapshots.maxCommitted(root) == 2L,
      "a squash publish adds exactly one main commit regardless of branch length")
    assert(ks(root) == (0L until 160L).toSet)
    assert(Snapshots.readAt(spark, root, 1L).count() == 100L, "history intact")
    // the ref advanced to the published version; the branch continues
    assert(Snapshots.branchFork(root, "audit").contains(2L))
    Snapshots.commitToBranch(root, "audit")(out =>
      spark.range(160, 170).selectExpr("id AS k").write.mode("append").parquet(out))
    assert(Snapshots.fastForward(root, "audit") == 3L)
    assert(ks(root) == (0L until 170L).toSet)
  }

  test("a racing main commit makes fast-forward refuse with NOTHING published") {
    val root = Qx.tmpOut("r20ffrace", sf())
    Snapshots.commit(root)(out =>
      spark.range(0, 50).selectExpr("id AS k").write.mode("append").parquet(out))
    Snapshots.createBranch(root, "audit")
    Snapshots.commitToBranch(root, "audit")(out =>
      spark.range(1000, 1050).selectExpr("id AS k").write.mode("append").parquet(out))
    Snapshots.commitToBranch(root, "audit")(out =>
      spark.range(1050, 1100).selectExpr("id AS k").write.mode("append").parquet(out))
    // the racer wins version fork+1 on main
    Snapshots.commitAppend(root)(out =>
      spark.range(50, 60).selectExpr("id AS k").write.mode("append").parquet(out))
    intercept[java.util.ConcurrentModificationException](
      Snapshots.fastForward(root, "audit"))
    // all-or-nothing: main is exactly the racer's state — no branch
    // file leaked into any main manifest, no extra version appeared
    assert(Snapshots.maxCommitted(root) == 2L)
    assert(ks(root) == (0L until 60L).toSet)
    val branchOnly = Snapshots.resolveBranch(root, "audit").files
      .filterNot(Snapshots.resolveAt(root, 1L).files.contains).toSet
    (1L to 2L).foreach { v =>
      val leaked = Snapshots.resolveAt(root, v).files.toSet & branchOnly
      assert(leaked.isEmpty, s"branch files leaked into main v$v: $leaked")
    }
  }

  test("a crash between the publish link and its bookkeeping finishes on re-run") {
    val root = Qx.tmpOut("r20ffcrash", sf())
    Snapshots.commit(root)(out =>
      spark.range(0, 30).selectExpr("id AS k").write.mode("append").parquet(out))
    Snapshots.createBranch(root, "audit")
    Snapshots.commitToBranch(root, "audit")(out =>
      spark.range(30, 40).selectExpr("id AS k").write.mode("append").parquet(out))
    Snapshots.commitToBranch(root, "audit")(out =>
      spark.range(40, 50).selectExpr("id AS k").write.mode("append").parquet(out))
    // snapshot the branch log + ref, publish, then restore them —
    // reconstructing the exact on-disk state of a publisher that died
    // AFTER the atomic link and BEFORE the ref advance + cleanup
    val commits = Paths.get(root, "_commits")
    val refBytes = Files.readAllBytes(commits.resolve("audit.branch"))
    val branchDir = commits.resolve("branch_audit")
    val saved = Files.list(branchDir).iterator()
    val savedManifests = new scala.collection.mutable.HashMap[String, Array[Byte]]
    try saved.forEachRemaining(p =>
      savedManifests(p.getFileName.toString) = Files.readAllBytes(p))
    finally () // Files.list stream closed by iterator exhaustion below
    assert(Snapshots.fastForward(root, "audit") == 2L)
    Files.write(commits.resolve(".crash_ref"), refBytes)
    Files.move(commits.resolve(".crash_ref"), commits.resolve("audit.branch"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    savedManifests.foreach { case (n, bytes) =>
      Files.write(branchDir.resolve(n), bytes) }
    // the crashed publisher's re-run: detects its own squash already
    // linked, finishes the bookkeeping, returns the published version
    assert(Snapshots.fastForward(root, "audit") == 2L)
    assert(Snapshots.maxCommitted(root) == 2L, "no duplicate publish")
    assert(ks(root) == (0L until 50L).toSet)
    assert(Snapshots.branchFork(root, "audit").contains(2L), "ref advanced")
    assert(!Files.exists(branchDir.resolve("00000002.manifest")) &&
      !Files.exists(branchDir.resolve("00000003.manifest")),
      "branch-log copies cleaned up")
  }

  test("squash scoping: fork-era deletes miss branch rows; future deletes cover them") {
    val root = Qx.tmpOut("r20ffscope", sf())
    Snapshots.commit(root)(out =>
      spark.range(0, 10).selectExpr("id AS k").write.mode("append").parquet(out))
    // fork-era MOR delete: k < 5 vanish
    Snapshots.commitDelete(root, "k")(out =>
      spark.range(0, 5).selectExpr("id AS k").write.mode("append").parquet(out))
    assert(ks(root) == (5L until 10L).toSet)
    // the branch RE-INSERTS k = 0,1,2 — staged after the delete, so the
    // branch serves them; the squash must keep serving them on main
    Snapshots.createBranch(root, "fix")
    Snapshots.commitToBranch(root, "fix")(out =>
      spark.range(0, 3).selectExpr("id AS k").write.mode("append").parquet(out))
    assert(Snapshots.readBranch(spark, root, "fix")
      .select("k").collect().map(_.getLong(0)).toSet == Set(0L, 1L, 2L, 5L, 6L, 7L, 8L, 9L))
    Snapshots.fastForward(root, "fix")
    assert(ks(root) == Set(0L, 1L, 2L, 5L, 6L, 7L, 8L, 9L),
      "the fork-era delete must not cover rows the branch re-inserted")
    // a FUTURE main delete covers published branch rows like any other
    Snapshots.commitDelete(root, "k")(out =>
      spark.range(1, 2).selectExpr("id AS k").write.mode("append").parquet(out))
    assert(ks(root) == Set(0L, 2L, 5L, 6L, 7L, 8L, 9L),
      "a post-publish delete must cover branch-staged rows")
  }
}

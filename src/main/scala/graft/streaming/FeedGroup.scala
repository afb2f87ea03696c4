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
  *  - '''Cursors''' (`cursors/log-NNNNN.json`, atomic overwrite): the
  *    log's CURRENT owner records the group-committed positions at each
  *    Spark commit, FENCED by generation — a write is refused unless
  *    the writer owns the log in the CURRENT generation and is not
  *    regressing a newer generation's file. A fenced member (left, or
  *    superseded by a newer generation) can neither advance the group
  *    cursor nor drain newly-arrived data: its next trigger derives an
  *    empty assignment from the current generation.
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

  /** The group-committed cursor map right now: the latest generation's
    * snapshot overlaid with every per-log cursor file (positions only
    * move forward, so max wins).
    */
  def committedCursors(topic: Path): Map[String, Long] = {
    val base = currentGeneration(topic).map(_.cursors).getOrElse(Map.empty)
    val dir = cursorsDir(topic)
    if (!Files.exists(dir)) return base
    val s = Files.list(dir)
    val files =
      try s.iterator().asScala
        .filter(_.getFileName.toString.matches("log-\\d{5}\\.json")).toSeq
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

  private def cursorGenOf(f: Path): Long =
    try "\"gen\":(\\d+)".r
      .findFirstMatchIn(new String(Files.readAllBytes(f), StandardCharsets.UTF_8))
      .map(_.group(1).toLong).getOrElse(-1L)
    catch { case _: java.io.IOException => -1L }

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

  /** FENCED cursor commit: `member`, acting under generation `gen`,
    * records log `logIdx`'s committed positions. Refused (false) when a
    * NEWER generation no longer assigns it the log, or when the cursor
    * file already carries a newer generation — the zombie cases.
    */
  def commitCursors(topic: Path, member: String, gen: Long, logIdx: Int,
      positions: Map[String, Long]): Boolean = {
    // the CURRENT generation must still assign this member the log:
    // under a newer generation that reassigned it, the old owner is
    // fenced even for work it finished before noticing the change
    val cur = currentGeneration(topic)
    if (!cur.exists(g => g.gen >= gen && g.owns(member, logIdx))) return false
    Files.createDirectories(cursorsDir(topic))
    val f = cursorsDir(topic).resolve(f"log-$logIdx%05d.json")
    if (Files.exists(f) && cursorGenOf(f) > cur.map(_.gen).getOrElse(gen))
      return false
    val entries = positions.toSeq.sorted
      .map { case (k, v) => s"${js(k)}:$v" }
    val payload = (s""""gen":${cur.map(_.gen).getOrElse(gen)}""" +: entries)
      .mkString("{", ",", "}")
    val tmp = cursorsDir(topic)
      .resolve(s".log-$logIdx-${java.util.UUID.randomUUID()}.tmp")
    Files.write(tmp, payload.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, f, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    true
  }
}

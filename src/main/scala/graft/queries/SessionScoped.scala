package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** A memo map whose entries are scoped to the OWNING SparkSession's
  * lifetime instead of the JVM's.
  *
  * The naive pattern — a static `ConcurrentHashMap[(SparkSession, K), V]`
  * — strongly retains stopped sessions (and whatever multi-GB derived
  * state hangs off the values) for as long as the JVM lives: a long-lived
  * host running many bench/verify sessions leaks one session graph per
  * run. Weak-keying doesn't work here either, because the cached values
  * (DataFrames, catalog table names) reference their session strongly and
  * would keep the weak key reachable. So entries are released two ways:
  *
  *   - automatically: the first insert for a session registers ONE
  *     SparkListener on its context; `onApplicationEnd` evicts every
  *     entry owned by that session and runs the release hook.
  *   - explicitly: [[evictMatching]] / [[evictSession]] for callers that
  *     keep a session alive but are done with a data directory
  *     (ScaleSmoke/TenX teardown between scale factors).
  *
  * The release hook receives (session, value) so it can unpersist cached
  * frames, drop catalog tables, or delete derived-layout directories.
  * Hook failures are swallowed — eviction during context shutdown races
  * executor teardown by design.
  *
  * [[getOrBuild]] is deliberately NOT `computeIfAbsent`: builders memo
  * their upstream frames through the same map, and a nested
  * computeIfAbsent throws `Recursive update`. A racing double-build is
  * harmless — `putIfAbsent` keeps one winner, and Spark's CacheManager
  * dedupes cached data by plan equality anyway.
  */
final class SessionScoped[K, V](release: (SparkSession, V) => Unit =
    (_: SparkSession, _: V) => ()) {

  private val map = new ConcurrentHashMap[(SparkSession, K), V]()
  // value-less WeakHashMap-backed set: tracks which sessions already have
  // an eviction listener without pinning them
  private val hooked = java.util.Collections.newSetFromMap(
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  private def hook(s: SparkSession): Unit =
    if (hooked.add(s))
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(
            e: SparkListenerApplicationEnd): Unit = evictSession(s)
      })

  def getOrBuild(s: SparkSession, k: K)(build: => V): V = {
    val key = (s, k)
    val hit = map.get(key)
    if (hit != null) hit
    else {
      val built = build
      hook(s)
      val prev = map.putIfAbsent(key, built)
      if (prev != null) prev else built
    }
  }

  def get(s: SparkSession, k: K): Option[V] = Option(map.get((s, k)))

  /** Evict every entry of `s` whose key matches, running the release
    * hook on each. */
  def evictMatching(s: SparkSession)(pred: K => Boolean): Unit = {
    val it = map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 == s && pred(e.getKey._2)) {
        it.remove()
        try release(s, e.getValue)
        catch { case _: Exception => () }
      }
    }
  }

  def evictSession(s: SparkSession): Unit = evictMatching(s)(_ => true)

  /** Entry count for `s`, optionally key-filtered (specs). */
  def sizeFor(s: SparkSession, pred: K => Boolean = _ => true): Int = {
    var n = 0
    map.keySet().forEach(k => if (k._1 == s && pred(k._2)) n += 1)
    n
  }
}

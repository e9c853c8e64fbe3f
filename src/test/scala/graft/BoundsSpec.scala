package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Bounds

/** Mirrors the reference CLI bound-parsing behaviors
  * (reference: /root/reference/ncagg/cli.py:22-100), including the
  * year/month rollover cases its test suite exercises. */
class BoundsSpec extends AnyFunSuite {

  private val us = 1000000L

  test("explicit start:stop") {
    assert(Bounds.parse("T20240105:T20240115") ===
      (1704412800L * us, 1705276800L * us))
  }

  test("second bound T prefix is optional") {
    assert(Bounds.parse("T20240105:20240115") ===
      (1704412800L * us, 1705276800L * us))
  }

  test("year-only infers next year minus 1us") {
    assert(Bounds.parse("T2024") === (1704067200L * us, 1735689600L * us - 1))
  }

  test("month-only infers next month minus 1us (with year rollover)") {
    assert(Bounds.parse("T202402") === (1706745600L * us, 1709251200L * us - 1))
    assert(Bounds.parse("T202312") === (1701388800L * us, 1704067200L * us - 1))
  }

  test("day-only infers next day") {
    assert(Bounds.parse("T20240229") === (1709164800L * us, 1709251200L * us - 1))
  }

  test("hour-only infers next hour (across midnight/year end)") {
    assert(Bounds.parse("T2023123123") ===
      (1704063600L * us, 1704067200L * us - 1))
  }

  test("minute-only infers next minute") {
    assert(Bounds.parse("T202401051030") ===
      (1704450600L * us, 1704450660L * us - 1))
  }

  test("numeric bounds pass through as epoch micros") {
    assert(Bounds.parse("100:200") === (100L, 200L))
  }

  test("malformed specs are rejected") {
    intercept[IllegalArgumentException](Bounds.parse("T202"))
    intercept[IllegalArgumentException](Bounds.parse("100"))
    intercept[IllegalArgumentException](Bounds.parse("Tabcd"))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SnapshotTable.dvMemoKeyOf

/** Pins the dv-position-memo key format against boundary-ambiguity
  * collisions. The memo serves driver-cached deleted-row positions, so
  * a key collision would silently resurrect (or re-delete) rows from
  * ANOTHER table state — the format must keep every distinct
  * (root, pointing-set) distinct by construction, not by luck of real
  * path shapes. Each case below is a pair of pointing sets whose
  * separator-less concatenation (the pre-r19 key) would collide. */
class DvMemoKeySpec extends AnyFunSuite {

  test("path/dv boundary is unambiguous") {
    // "ab"+"c" vs "a"+"bc" concatenate identically without a delimiter
    val k1 = dvMemoKeyOf("r", Seq(("ab", "c")))
    val k2 = dvMemoKeyOf("r", Seq(("a", "bc")))
    assert(k1 != k2)
  }

  test("entry/entry boundary is unambiguous") {
    // ("a","b"),("c","d") vs ("a","bc"),("","d")-style regroupings all
    // flatten to "abcd" without delimiters
    val k1 = dvMemoKeyOf("r", Seq(("a", "b"), ("c", "d")))
    val k2 = dvMemoKeyOf("r", Seq(("a", "bcd")))
    val k3 = dvMemoKeyOf("r", Seq(("abc", "d")))
    assert(Set(k1, k2, k3).size == 3)
  }

  test("root/entries boundary is unambiguous") {
    // root "ra" + path "b…" vs root "r" + path "ab…"
    val k1 = dvMemoKeyOf("ra", Seq(("b", "c")))
    val k2 = dvMemoKeyOf("r", Seq(("ab", "c")))
    assert(k1 != k2)
  }

  test("key is order-insensitive over the pointing set (memo hit shape)") {
    // the same version scanned twice must hit the memo whatever order
    // the manifest iteration yielded entries in
    val k1 = dvMemoKeyOf("r", Seq(("a", "x"), ("b", "y")))
    val k2 = dvMemoKeyOf("r", Seq(("b", "y"), ("a", "x")))
    assert(k1 == k2)
  }

  test("distinct dv repointing changes the key (immutability argument)") {
    // a dv commit repoints a file at a NEW deletes/batch-* dir; the key
    // must move with it or a stale hit serves the old positions
    val k1 = dvMemoKeyOf("r", Seq(("data/f1", "deletes/batch-1")))
    val k2 = dvMemoKeyOf("r", Seq(("data/f1", "deletes/batch-2")))
    assert(k1 != k2)
  }
}

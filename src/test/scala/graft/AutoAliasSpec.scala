package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sql.AutoAlias

/** Reference-style unaliased-column naming (reference
  * `griffin/SqlUtil.java createColumnAlias`, behavior pinned against
  * expected headers in the reference's own JUnit suite).
  */
class AutoAliasSpec extends AnyFunSuite {
  private def rw(q: String): String = AutoAlias.rewriteQuery(q)

  test("operator expressions become `column` with numeric suffixes") {
    assert(rw("select 6 & 4") == "select 6 & 4 AS `column`")
    assert(rw("select a+b, a-b from t") ==
      "select a+b AS `column`, a-b AS `column1` from t")
  }

  test("integer constant names itself") {
    assert(rw("select 1") == "select 1 AS `1`")
  }

  test("function call names after the function") {
    assert(rw("select abs(-1) from t") == "select abs(-1) AS `abs` from t")
    assert(rw("select count() from t") == "select count() AS `count` from t")
    assert(rw("select sum(x) over (order by ts) from t") ==
      "select sum(x) over (order by ts) AS `sum` from t")
  }

  test("cast spellings name `cast`") {
    assert(rw("select cast(x as int) from t") ==
      "select cast(x as int) AS `cast` from t")
    assert(rw("select x::int from t") == "select x::int AS `cast` from t")
  }

  test("case names `case`") {
    assert(rw("select case when x>0 then 1 else 2 end from t") ==
      "select case when x>0 then 1 else 2 end AS `case` from t")
  }

  test("bare refs keep their names; duplicates get suffixes") {
    assert(rw("select a, b from t") == "select a, b from t")
    assert(rw("select key+1, key, key, count(*) from t group by key") ==
      "select key+1 AS `column`, key, key AS `key1`, count(*) AS `count` from t group by key")
    assert(rw("select t.a, u.a from t join u") ==
      "select t.a, u.a AS `a1` from t join u")
  }

  test("explicit and implicit aliases are left alone and pre-claim names") {
    assert(rw("select sum(x) total from t") == "select sum(x) total from t")
    assert(rw("select 'djn', 2.2 column1, 6.4 from t") ==
      "select 'djn' AS `djn`, 2.2 column1, 6.4 AS `column` from t")
  }

  test("star and distinct() survive untouched") {
    assert(rw("select * from t") == "select * from t")
    assert(rw("select distinct(sym) from t") == "select distinct(sym) from t")
  }
}

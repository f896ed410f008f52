#!/usr/bin/env python3
"""Adversarial documents table for cross-engine portability checks.

Dev-only (driver-side python per the environment contract). Copies an
sf directory and replaces documents.parquet with edge-case docs: empty,
whitespace-only, ellipsis-only (normalizes to empty), letter<->digit
boundaries, header-promoted words, punctuation-dense sentences,
accented unicode, CJK, a single 800-char token, tabs/double spaces,
exact duplicates, markdown rules/fences, trailing punctuation+space,
500 one-char tokens.

Usage:
    python3 tools/edge_corpus.py [src_sf_dir] [dst_dir]
    sbt -batch "runMain graft.Verify <dst_dir> /tmp/verify_edge"
    python3 tools/check.py <dst_dir> /tmp/verify_edge

All 77 queries are expected to hash-match DuckDB on this corpus (last
verified round 2).
"""
import shutil, sys, glob, os
import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/edge_sf"

DOCS = [
    (0, "", "en", "src0"),
    (1, "   ", "en", "src0"),
    (2, "...", "en", "src1"),
    (3, "one", "en", "src1"),
    (4, "w123 x9y 7up abc123def", "en", "src1"),
    (5, "spark window merge stream " * 40, "en", "src2"),
    (6, "a! b? c. d! " * 30, "en", "src2"),
    (7, "café naïve Über straße élève " * 20, "fr", "src2"),
    (8, "你好 世界 日本語 " * 30, "zh", "src3"),
    (9, "supercalifragilistic" * 40, "en", "src3"),
    (10, "tab\tseparated\ttokens and  double  spaces", "en", "src3"),
    (11, "the fast key order sort table scan merge part window small hash", "en", "src4"),
    (12, "the fast key order sort table scan merge part window small hash", "en", "src4"),
    (13, "Figure one shows table batch join stream spark results " * 10, "en", "src4"),
    (14, "- - - --- *** ___ ``` code fence ``` # header line", "en", "src5"),
    (15, "ends with punct. ", "en", "src5"),
    (16, "a.b.c.d.e no spaces after dots", "en", "src5"),
    (17, "mixed CASE Text With UPPER and lower", "en", "src6"),
    (18, "x " * 500, "en", "src6"),
    (19, "word", "en", "src6"),
]


def main():
    os.makedirs(DST, exist_ok=True)
    for f in glob.glob(f"{SRC}/*.parquet"):
        shutil.copy(f, DST)
    rows = [(i, t, l, s, len(t)) for (i, t, l, s) in DOCS]
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR,"
                " source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO d VALUES (?,?,?,?,?)", rows)
    con.execute(f"COPY d TO '{DST}/documents.parquet' (FORMAT PARQUET)")
    # Adversarial part row: NEGATIVE p_partkey drives a synthetic figure
    # rect with a negative origin (x0 = -100 % 500 = -100) through every
    # geometry/render query. -100 is divisible by mm_render_roundtrip's
    # every=50 sample, so the PNG roundtrip gate must clamp the off-page
    # edge exactly like the closed-form oracle. Spark and DuckDB agree
    # on sign-of-dividend %, so the rect derivation itself is portable.
    con.execute(
        f"""COPY (SELECT * FROM '{DST}/part.parquet'
                  UNION ALL
                  SELECT CAST(-100 AS BIGINT), 'offpage widget', 'Brand#00',
                         'EDGE', 50, 0.0)
            TO '{DST}/part_tmp.parquet' (FORMAT PARQUET)""")
    os.replace(f"{DST}/part_tmp.parquet", f"{DST}/part.parquet")
    print(f"edge corpus at {DST}: {len(rows)} docs + 1 off-page part rect")


if __name__ == "__main__":
    main()

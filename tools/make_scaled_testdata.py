#!/usr/bin/env python
"""Generate a larger-scale replica of the driver testdata for scaling
measurements (DESIGN.md "Measured scaling").

Replicates every table of a source sf directory K times with per-replica
key offsets, so key cardinalities, join fan-ins, and group counts all
grow ~K-fold — the same shape TPC-H itself scales — instead of K-fold
duplicating the same keys (which would skew group sizes, not group
counts). Document text gets a per-replica suffix token and embeddings a
per-replica per-component epsilon (0.0001*r added to every
component — a uniform shift that keeps replicas distinct without
reshaping the space) so the near-dup operators see K times
the corpus, not K exact copies of it (exact copies would make every LSH
bucket K times hotter and the in-bucket pair expansion K^2 — a
distribution no real 10x corpus growth has).

Output is written OUTSIDE the repo (default /tmp/sfscale/sf1) and is a
measurement artifact only — correctness always runs against the
driver-provided /root/testdata.

Usage: python tools/make_scaled_testdata.py [--src /root/testdata/sf0.1]
           [--dst /tmp/sfscale/sf1] [--k 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sfscale/sf1")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--tables", nargs="*", default=None,
                    help="subset of tables to build (default: all)")
    ap.add_argument("--doc-style",
                    choices=("suffix", "interleave", "permute"),
                    default="suffix",
                    help="document replica construction. 'suffix' "
                    "(default, the historical scheme) appends one "
                    "' repN' token — each replica is a NEAR-DUP of its "
                    "base AND of every sibling replica (one-token "
                    "shingle delta), so near-dup cluster size grows "
                    "with k and in-cluster pair mass with k^2: fine "
                    "at k<=100, OOMs pair-expanding operators at "
                    "k=1000 (the failure the module docstring warns "
                    "exact copies would cause). 'interleave' inserts "
                    "the replica token after every 8th word — better, "
                    "but sibling replicas still share insertion "
                    "positions (pairwise J~0.35, inside an r=2 LSH "
                    "band's fat tail), measured still ~quadratic at "
                    "k=1000. 'permute' applies one pseudo-random "
                    "POSITIONAL word permutation per replica slice "
                    "(same reordering for every doc in slice r): "
                    "3-gram shingles across slices share ~nothing "
                    "(J~0), while ORGANIC near-dup pairs inside each "
                    "slice keep their similarity because both members "
                    "reorder identically — k times the corpus with "
                    "the organic near-dup rate, which is what "
                    "measuring a near-dup operator at large k needs.")
    ap.add_argument("--emb-style", choices=("epsilon", "permute"),
                    default="epsilon",
                    help="embedding replica construction. 'epsilon' "
                    "(default, the historical scheme) adds 0.0001*r to "
                    "every component — replicas of one base vector stay "
                    "cos~1.0 near-dups of each other, so near-dup "
                    "cluster size grows with k and in-block pair mass "
                    "with k^2 (the same degenerate growth doc-style "
                    "'suffix' has). 'permute' applies one pseudo-random "
                    "SIGNED PERMUTATION of the components per replica "
                    "slice (same reordering + sign flips for every "
                    "vector in slice r): a signed permutation is "
                    "orthogonal, so ORGANIC pairs inside each slice "
                    "keep their cosine EXACTLY, while cross-slice "
                    "pairs decorrelate — k times the corpus at the "
                    "organic near-dup rate, which is what measuring "
                    "embedding dedup at large k needs.")
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{args.src}/{t}.parquet')")
    # Per-replica key offsets: one past the max key so replica key
    # ranges never collide.
    off = {k: con.execute(s).fetchone()[0] + 1 for k, s in {
        "cust": "SELECT MAX(c_custkey) FROM customer",
        "supp": "SELECT MAX(s_suppkey) FROM supplier",
        "part": "SELECT MAX(p_partkey) FROM part",
        "order": "SELECT MAX(o_orderkey) FROM orders",
        "event": "SELECT MAX(event_id) FROM events",
        "doc": "SELECT MAX(doc_id) FROM documents",
        "vec": "SELECT MAX(vec_id) FROM embeddings",
    }.items()}
    rep = f"(SELECT UNNEST(range({args.k})) AS r)"

    def write(t: str, select: str) -> None:
        if args.tables and t not in args.tables:
            return
        con.execute(f"COPY ({select}) TO '{args.dst}/{t}.parquet' "
                    f"(FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM "
                        f"read_parquet('{args.dst}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")

    # Fixed dims stay fixed (TPC-H keeps region/nation constant with sf).
    write("region", "SELECT * FROM region")
    write("nation", "SELECT * FROM nation")
    write("customer", f"""
        SELECT c_custkey + r * {off['cust']} AS c_custkey, c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM customer CROSS JOIN {rep}""")
    write("supplier", f"""
        SELECT s_suppkey + r * {off['supp']} AS s_suppkey, s_name,
               s_nationkey, s_acctbal
        FROM supplier CROSS JOIN {rep}""")
    write("part", f"""
        SELECT p_partkey + r * {off['part']} AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice
        FROM part CROSS JOIN {rep}""")
    write("orders", f"""
        SELECT o_orderkey + r * {off['order']} AS o_orderkey,
               o_custkey + r * {off['cust']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM orders CROSS JOIN {rep}""")
    write("lineitem", f"""
        SELECT l_orderkey + r * {off['order']} AS l_orderkey,
               l_partkey + r * {off['part']} AS l_partkey,
               l_suppkey + r * {off['supp']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM lineitem CROSS JOIN {rep}""")
    # user_id references the customer key space (events join customers
    # in the salted-skew / enrichment queries), so replicas must shift
    # it by the CUSTOMER offset — a user-range offset would point every
    # replica's events at replica-0 customers and stop joins scaling.
    write("events", f"""
        SELECT event_id + r * {off['event']} AS event_id, ts,
               user_id + r * {off['cust']} AS user_id,
               event_type, value, props
        FROM events CROSS JOIN {rep}""")
    if args.doc_style == "permute":
        doc_text = """CASE WHEN r = 0 THEN text ELSE array_to_string(
            list_transform(
                list_sort(list_transform(string_split(text, ' '),
                    (w, i) -> struct_pack(
                        k := hash(CAST(i AS VARCHAR) || 'x'
                                  || CAST(r AS VARCHAR)),
                        w := w))),
                x -> x.w), ' ') END"""
    elif args.doc_style == "interleave":
        doc_text = """CASE WHEN r = 0 THEN text ELSE array_to_string(
            list_transform(string_split(text, ' '),
                (w, i) -> CASE WHEN i % 8 = 1
                          THEN w || ' rep' || CAST(r AS VARCHAR)
                          ELSE w END), ' ') END"""
    else:
        doc_text = ("CASE WHEN r = 0 THEN text "
                    "ELSE text || ' rep' || CAST(r AS VARCHAR) END")
    write("documents", f"""
        SELECT doc_id + r * {off['doc']} AS doc_id,
               {doc_text} AS text,
               lang, source,
               CAST(length({doc_text}) AS BIGINT) AS n_chars
        FROM documents CROSS JOIN {rep}""")
    if args.emb_style == "permute":
        emb = """CASE WHEN r = 0 THEN embedding ELSE list_transform(
            list_sort(list_transform(embedding,
                (x, i) -> struct_pack(
                    k := hash(CAST(i AS VARCHAR) || 'p'
                              || CAST(r AS VARCHAR)),
                    v := CASE WHEN hash(CAST(i AS VARCHAR) || 's'
                                       || CAST(r AS VARCHAR)) % 2 = 0
                         THEN x ELSE -x END))),
            s -> CAST(s.v AS FLOAT)) END"""
    else:
        emb = """CASE WHEN r = 0 THEN embedding
                 ELSE list_transform(embedding, x ->
                     CAST(x + 0.0001 * r AS FLOAT)) END"""
    write("embeddings", f"""
        SELECT vec_id + r * {off['vec']} AS vec_id,
               {emb} AS embedding,
               label
        FROM embeddings CROSS JOIN {rep}""")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Deterministic ~10x scale-up of an sf directory (round-10 scaling capture).

Replicates each fact table K times (default 10) with key columns shifted by
replica*OFFSET so cardinalities scale K-fold while per-key group sizes stay
constant — the same growth model a real 10x corpus would have. Dimension
tables (region, nation) are left as-is, like TPC-H at higher SFs. Document
text and embedding vectors are deterministically perturbed per replica so
dedup/ANN operators see K-fold more *distinct* entities, not K-fold exact
duplicates of each entity (which would quadratically inflate candidate
pairs and measure a different workload than "10x more data").

Writes NOTHING inside the repo or /root/testdata. Usage:
    python3 tools/gen_scale10.py /root/testdata/sf0.1 /tmp/sf1_synth [K]
"""
import os
import sys

import duckdb

KEY_OFFSET = 100_000_000  # far above any base key


def main() -> int:
    src, dst = sys.argv[1], sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    # optional 4th arg: comma-separated table subset (frontier corpora only
    # need the tables their operator family reads - K=1000 of everything
    # would be hundreds of GB for nothing)
    tables = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads={os.cpu_count() or 8}")

    def wanted(table: str) -> bool:
        return tables is None or table in tables

    def gen(table: str, select_body: str) -> None:
        if not wanted(table):
            return
        out = os.path.join(dst, f"{table}.parquet")
        q = f"""
        COPY (
          SELECT {select_body}
          FROM read_parquet('{src}/{table}.parquet')
          CROSS JOIN (SELECT unnest(range({k})) AS r) reps
        ) TO '{out}' (FORMAT PARQUET, COMPRESSION SNAPPY)
        """
        con.execute(q)
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{table}: {n} rows")

    def copy(table: str) -> None:
        if not wanted(table):
            return
        out = os.path.join(dst, f"{table}.parquet")
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{table}.parquet')) "
            f"TO '{out}' (FORMAT PARQUET, COMPRESSION SNAPPY)"
        )
        print(f"{table}: copied as-is")

    off = f"CAST(r * {KEY_OFFSET} AS BIGINT)"
    copy("region")
    copy("nation")
    gen("supplier", f"s_suppkey + {off} AS s_suppkey, s_name, s_nationkey, s_acctbal")
    gen("customer", f"c_custkey + {off} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment")
    # Perturb the LAST name token per replica (r>0): q_name_match blocks on
    # (last token, size), so unperturbed replicas would put 1000 copies of
    # every name in one block and pair volume would grow K^2 — a generator
    # artifact, not catalog growth (a real 1000x catalog has ~1000x more
    # DISTINCT names). Suffixing the block token multiplies block COUNT,
    # keeping block SIZE constant — the real growth model — while prefix/
    # first-word/substring consumers of p_name keep their semantics.
    gen(
        "part",
        f"p_partkey + {off} AS p_partkey, "
        "CASE WHEN r = 0 THEN p_name ELSE "
        "  regexp_replace(p_name, '(\\S+)$', '\\1_' || r) "
        "END AS p_name, "
        "p_brand, p_type, p_size, p_retailprice",
    )
    gen(
        "orders",
        f"o_orderkey + {off} AS o_orderkey, o_custkey + {off} AS o_custkey, "
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority",
    )
    gen(
        "lineitem",
        f"l_orderkey + {off} AS l_orderkey, l_partkey + {off} AS l_partkey, "
        f"l_suppkey + {off} AS l_suppkey, l_linenumber, l_quantity, "
        "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate",
    )
    gen(
        "events",
        f"event_id + {off} AS event_id, ts, user_id + {off} AS user_id, "
        "event_type, value, props",
    )
    # Perturb text deterministically: suffix every 3rd word with the replica
    # id (r>0), so shingle/minhash/simhash views of each replica diverge and
    # near-dup candidate sets scale like a real 10x corpus.
    gen(
        "documents",
        f"doc_id + {off} AS doc_id, "
        "CASE WHEN r = 0 THEN text ELSE "
        "  array_to_string(list_transform(string_split(text, ' '), "
        "    (w, i) -> CASE WHEN i % 3 = 0 THEN w || '_' || r ELSE w END), ' ') "
        "END AS text, "
        "lang, source, n_chars",
    )
    # Each replica is an ISOMETRIC copy: a per-replica signed coordinate
    # rotation (an orthogonal transform). cos(P_r a, P_r b) == cos(a, b), so
    # every replica preserves the base corpus's internal pair structure —
    # near-dup edge count and kNN geometry scale exactly K-fold — while
    # cos(P_r a, P_s b) for r != s is decorrelated, so replicas don't form
    # cross-replica near-dup cliques. (A small additive epsilon was tried
    # first and REJECTED: replicas stayed at cos≈0.9999 to their base, the
    # tau=0.4 near-dup edge set grew ~20x super-linearly, and dedup_cc /
    # dedup_embedding timed out measuring an artifact of the generator, not
    # the operators.)
    gen(
        "embeddings",
        f"vec_id + {off} AS vec_id, "
        "CASE WHEN r = 0 THEN embedding ELSE "
        "  list_transform(range(64), i -> CAST("
        "    (CASE WHEN (i + r) % 2 = 0 THEN 1.0 ELSE -1.0 END)"
        "    * embedding[((i + 7 * r) % 64) + 1] AS FLOAT)) "
        "END AS embedding, "
        "label",
    )
    print("done ->", dst)
    return 0


if __name__ == "__main__":
    sys.exit(main())

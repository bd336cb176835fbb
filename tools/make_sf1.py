#!/usr/bin/env python3
"""Synthesize an sf1 calibration fixture (10x sf0.1) for SCALE-FACTOR
benchmarking only — never for correctness (the DuckDB oracle gate runs on
the driver-generated sf0.01 fixtures exclusively).

Usage: python3 tools/make_sf1.py [outDir=/tmp/sf1] [factor=10]

Design: each table is the original plus (factor-1) replica blocks with every
key domain offset by a per-domain stride (max key + 1), so FK structure,
per-key cardinalities, and absent-key (violation) sets replicate exactly.
Content columns:
  - documents.text: replica docs are NEW word-salad text sampled from the
    corpus vocabulary with a seeded RNG (same length distribution, same
    lang/source mix) — replicating the text verbatim would turn every doc
    into a 10-way exact-dup cluster and quadratically inflate every dedup
    candidate set, which a real 10x corpus does not do.
  - embeddings.embedding: seeded Gaussian perturbation of the source vector
    (sigma 0.15), keeping the cluster structure IVF/PQ training costs
    depend on while making replicas distinct.
  - timestamps are kept verbatim: same window, 10x volume per day — the
    "bigger deployment, same period" shape.
Dev-only tool — NOT part of the shipped Scala library.
"""
import sys
from pathlib import Path

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def main(out_dir="/tmp/sf1", factor=10):
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    rep = f"generate_series(1, {factor - 1})"

    def t(name):
        return f"read_parquet('{SRC}/{name}.parquet')"

    def stride(table, col):
        return con.sql(f"SELECT MAX({col}) + 1 FROM {t(table)}").fetchone()[0]

    def write(name, sql):
        con.sql(f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT COUNT(*) FROM read_parquet('{out}/{name}.parquet')").fetchone()[0]
        print(f"{name}: {n} rows")

    # dimension-free copies
    for name in ("nation", "region"):
        write(name, f"SELECT * FROM {t(name)}")

    ck = stride("customer", "c_custkey")
    pk = stride("part", "p_partkey")
    sk = stride("supplier", "s_suppkey")
    ok = stride("orders", "o_orderkey")
    ek = stride("events", "event_id")
    dk = stride("documents", "doc_id")
    vk = stride("embeddings", "vec_id")

    write("customer", f"""
        SELECT * FROM {t('customer')}
        UNION ALL
        SELECT c_custkey + i*{ck}, c_name || '_r' || i, c_nationkey,
               c_acctbal, c_mktsegment
        FROM {t('customer')}, {rep} g(i)""")
    write("part", f"""
        SELECT * FROM {t('part')}
        UNION ALL
        SELECT p_partkey + i*{pk}, p_name || '_r' || i, p_brand, p_type,
               p_size, p_retailprice
        FROM {t('part')}, {rep} g(i)""")
    write("supplier", f"""
        SELECT * FROM {t('supplier')}
        UNION ALL
        SELECT s_suppkey + i*{sk}, s_name || '_r' || i, s_nationkey, s_acctbal
        FROM {t('supplier')}, {rep} g(i)""")
    write("orders", f"""
        SELECT * FROM {t('orders')}
        UNION ALL
        SELECT o_orderkey + i*{ok}, o_custkey + i*{ck}, o_orderstatus,
               o_totalprice, o_orderdate, o_orderpriority
        FROM {t('orders')}, {rep} g(i)""")
    write("lineitem", f"""
        SELECT * FROM {t('lineitem')}
        UNION ALL
        SELECT l_orderkey + i*{ok}, l_partkey + i*{pk}, l_suppkey + i*{sk},
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM {t('lineitem')}, {rep} g(i)""")
    # events.user_id shares the customer key domain -> same stride, so the
    # replicated violation set (ids absent from customer) stays violating.
    write("events", f"""
        SELECT * FROM {t('events')}
        UNION ALL
        SELECT event_id + i*{ek}, ts, user_id + i*{ck}, event_type, value, props
        FROM {t('events')}, {rep} g(i)""")

    # documents: synthetic replica text from the corpus vocabulary
    docs = con.sql(f"SELECT doc_id, text, lang, source FROM {t('documents')} ORDER BY doc_id").fetchall()
    vocab = sorted({w for _, text, _, _ in docs for w in text.split(" ") if w})
    vocab = np.array(vocab)
    rows = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for doc_id, text, lang, source in docs:
        rows["doc_id"].append(doc_id)
        rows["text"].append(text)
        rows["lang"].append(lang)
        rows["source"].append(source)
        rows["n_chars"].append(len(text))
    for i in range(1, factor):
        rng = np.random.default_rng(1234 + i)
        for doc_id, text, lang, source in docs:
            n_words = max(1, len(text.split(" ")))
            words = vocab[rng.integers(0, len(vocab), n_words)]
            new_text = " ".join(words.tolist())
            rows["doc_id"].append(doc_id + i * dk)
            rows["text"].append(new_text)
            rows["lang"].append(lang)
            rows["source"].append(source)
            rows["n_chars"].append(len(new_text))
    pq.write_table(pa.table({
        "doc_id": pa.array(rows["doc_id"], pa.int64()),
        "text": pa.array(rows["text"], pa.string()),
        "lang": pa.array(rows["lang"], pa.string()),
        "source": pa.array(rows["source"], pa.string()),
        "n_chars": pa.array(rows["n_chars"], pa.int64()),
    }), f"{out}/documents.parquet")
    print(f"documents: {len(rows['doc_id'])} rows (vocab {len(vocab)})")

    # embeddings: seeded Gaussian perturbation, cluster structure kept
    emb = con.sql(f"SELECT vec_id, embedding, label FROM {t('embeddings')} ORDER BY vec_id").fetchall()
    base = np.array([e for _, e, _ in emb], dtype=np.float32)
    ids = np.array([v for v, _, _ in emb], dtype=np.int64)
    labels = np.array([l for _, _, l in emb], dtype=np.int32)
    all_ids, all_vecs, all_labels = [ids], [base], [labels]
    for i in range(1, factor):
        rng = np.random.default_rng(5678 + i)
        noise = rng.normal(0.0, 0.15, base.shape).astype(np.float32)
        all_ids.append(ids + i * vk)
        all_vecs.append(base + noise)
        all_labels.append(labels)
    vecs = np.concatenate(all_vecs)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.concatenate(all_ids)),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(np.concatenate(all_labels)),
    }), f"{out}/embeddings.parquet")
    print(f"embeddings: {len(vecs)} rows")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    main(out, factor)

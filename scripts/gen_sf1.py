"""Synthesize an ~sf1 dataset (10x sf0.1) for local scale validation.

The driver ships sf0.001/0.01/0.1 only; the 100x-scale story needs at
least one MEASURED decade. This script tiles each sf0.1 table 10x with
remapped keys so that:

- every foreign-key relationship stays consistent WITHIN a copy
  (orders of copy i reference customers of copy i, lineitems reference
  orders/parts/suppliers of copy i) and never across copies — join
  cardinalities scale linearly;
- document text is transformed by a PER-COPY SHINGLE-SPACE BIJECTION
  (every word gets a copy-specific suffix): within-copy n-gram Jaccard
  relations are preserved exactly, while cross-copy shingles can never
  collide — so near-dup pair families scale ~10x, not ~100x (10 exact
  clones of every doc would square the pair count and measure a
  DIFFERENT workload, not a bigger one);
- embedding labels are remapped per copy, so the label-blocked cosine
  pair family also scales linearly; vectors are reused as-is;
- tiny dims (region, nation) stay fixed — the realistic shape where
  dimensions don't grow with fact data.

Deterministic (pure arithmetic on the source tables, no RNG). Output:
``$SPARK_GRAFT_SF1_DIR`` (default ``<repo>/.testdata/sf1``). Usage::

    python scripts/gen_sf1.py [--copies 10] [--src /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

COPIES_DEFAULT = 10


def default_out_dir() -> str:
    env = os.environ.get("SPARK_GRAFT_SF1_DIR")
    if env:
        return env
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(repo, ".testdata", "sf1")


def _stride(table: pa.Table, col: str) -> int:
    return int(pc.max(table[col]).as_py()) + 1


def _shift(table: pa.Table, col: str, offset: int) -> pa.Table:
    idx = table.schema.get_field_index(col)
    shifted = pc.add(table[col], pa.scalar(offset, type=table.schema.field(col).type))
    return table.set_column(idx, table.schema.field(col), shifted)


def _tile(src: pa.Table, copies: int, key_strides: dict[str, int]) -> pa.Table:
    out = []
    for i in range(copies):
        t = src
        for col, stride in key_strides.items():
            t = _shift(t, col, i * stride)
        out.append(t)
    return pa.concat_tables(out)


def _tile_documents(src: pa.Table, copies: int) -> pa.Table:
    kd = _stride(src, "doc_id")
    doc_ids = src["doc_id"].to_pylist()
    texts = src["text"].to_pylist()
    langs = src["lang"].to_pylist()
    sources = src["source"].to_pylist()
    cols = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for i in range(copies):
        if i == 0:
            new_texts = texts
        else:
            # bijective per-copy transform of the shingle space: every
            # word gains a copy suffix, so within-copy Jaccard is
            # exactly preserved and cross-copy shingles never match
            suf = f"~{i}"
            new_texts = [
                " ".join(w + suf for w in t.split()) if t is not None else None
                for t in texts
            ]
        cols["doc_id"].extend(d + i * kd for d in doc_ids)
        cols["text"].extend(new_texts)
        cols["lang"].extend(langs)
        cols["source"].extend(sources)
        cols["n_chars"].extend(
            len(t) if t is not None else None for t in new_texts
        )
    return pa.table(
        {
            "doc_id": pa.array(cols["doc_id"], type=pa.int64()),
            "text": pa.array(cols["text"], type=pa.string()),
            "lang": pa.array(cols["lang"], type=pa.string()),
            "source": pa.array(cols["source"], type=pa.string()),
            "n_chars": pa.array(cols["n_chars"], type=pa.int64()),
        }
    )


def generate(src_dir: str, out_dir: str, copies: int = COPIES_DEFAULT) -> None:
    os.makedirs(out_dir, exist_ok=True)

    def load(name: str) -> pa.Table:
        return pq.read_table(os.path.join(src_dir, f"{name}.parquet"))

    def save(name: str, t: pa.Table) -> None:
        pq.write_table(t, os.path.join(out_dir, f"{name}.parquet"))
        print(f"{name}: {t.num_rows} rows")

    # fixed dims
    for name in ("region", "nation"):
        save(name, load(name))

    customer = load("customer")
    supplier = load("supplier")
    part = load("part")
    orders = load("orders")
    lineitem = load("lineitem")
    kc = _stride(customer, "c_custkey")
    ks = _stride(supplier, "s_suppkey")
    kp = _stride(part, "p_partkey")
    ko = _stride(orders, "o_orderkey")
    save("customer", _tile(customer, copies, {"c_custkey": kc}))
    save("supplier", _tile(supplier, copies, {"s_suppkey": ks}))
    save("part", _tile(part, copies, {"p_partkey": kp}))
    save("orders", _tile(orders, copies, {"o_orderkey": ko, "o_custkey": kc}))
    save(
        "lineitem",
        _tile(
            lineitem,
            copies,
            {"l_orderkey": ko, "l_partkey": kp, "l_suppkey": ks},
        ),
    )

    events = load("events")
    ke = _stride(events, "event_id")
    ku = _stride(events, "user_id")
    save("events", _tile(events, copies, {"event_id": ke, "user_id": ku}))

    emb = load("embeddings")
    kv = _stride(emb, "vec_id")
    kl = _stride(emb, "label")
    save("embeddings", _tile(emb, copies, {"vec_id": kv, "label": kl}))

    save("documents", _tile_documents(load("documents"), copies))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=COPIES_DEFAULT)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=default_out_dir())
    args = ap.parse_args()
    generate(args.src, args.out, args.copies)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

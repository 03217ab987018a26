#!/usr/bin/env python
"""Build an sf≈1 dataset by replicating /root/testdata/sf0.1 K× with
key offsets, written OUTSIDE the read-only testdata tree (default
/tmp/sf1x). This exists solely for the scaling checkpoint recorded in
BASELINE.md — correctness always runs against the driver's own parquet.

Replication preserves the *shape* that matters for plan behavior at
scale, not the exact value distribution:

- Fact/dim keys are offset per copy by a power-of-ten pad larger than
  the max source key, so join fan-out per key is IDENTICAL to sf0.1
  (each replicated order still has the same lineitems, each customer
  the same orders). A naive concat without offsets would multiply
  join multiplicity by K and measure a different query.
- nation/region stay fixed — they are constant-size dims in TPC-H at
  every scale factor.
- documents in copy i>0 get a copy-specific token interleaved every 7
  words. Byte-identical (or suffix-only-different) copies would leave
  cross-copy MinHash signatures ~identical, so LSH buckets grow K× and
  candidate pairs K² — the dedup queries would measure dup blowup, not
  scan/shuffle scaling. Interleaving rewrites nearly every shingle, so
  copies are genuinely distinct documents while the *within-copy*
  near-dup structure (the thing being measured) is preserved exactly.
- embeddings in copy i>0 get seeded gaussian noise (σ=0.2, rng seed =
  1000+i — deterministic) for the same reason: cross-copy cosine drops
  below near-dup thresholds, keeping pair counts ~linear in K.
- events keep their timestamps (window/session density per user is the
  scaling knob we want constant) but offset user_id/event_id.

Deterministic: all randomness is fixed-seed (the embeddings noise rng
is seeded 1000+i per copy); everything else is pure arithmetic on the
source rows.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _pad(max_val: int) -> int:
    p = 1
    while p <= max_val:
        p *= 10
    return p


def _offset(tbl: pa.Table, col: str, delta: int) -> pa.Table:
    i = tbl.schema.get_field_index(col)
    return tbl.set_column(i, col, pc.add(tbl.column(col), delta))


ALL_TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def replicate(
    src_dir: str,
    out_dir: str,
    copies: int,
    only: list[str] | None = None,
    link_rest_from: str | None = None,
) -> None:
    """Replicate ``only`` (default: every table) ``copies``× into
    ``out_dir``. ``link_rest_from`` hardlinks the NON-replicated
    tables from an existing scale dir so the output stays loadable
    for any table name — the r12 fourth-decade recipe:

        python tools/make_scale_data.py /root/testdata/sf0.1 \
            /tmp/sf100x 1000 --only embeddings --link-rest /tmp/sf10x

    (replicating lineitem 1000× would be 600M rows / ~30 GB; the ANN
    family reads only ``embeddings``, so the fourth decade replicates
    just that — same pad-offset + per-copy seeded noise as always)."""
    os.makedirs(out_dir, exist_ok=True)
    repl = list(only) if only else list(ALL_TABLES)
    unknown = [t for t in repl if t not in ALL_TABLES]
    if unknown:
        raise SystemExit(f"unknown tables: {unknown}")
    if link_rest_from:
        for name in ALL_TABLES:
            if name in repl:
                continue
            dst = os.path.join(out_dir, f"{name}.parquet")
            if not os.path.exists(dst):
                src_f = os.path.join(link_rest_from, f"{name}.parquet")
                try:
                    os.link(src_f, dst)
                except OSError:
                    # cross-filesystem (EXDEV) or FS without hardlinks
                    import shutil

                    shutil.copy(src_f, dst)
    tables = {
        name: pq.read_table(os.path.join(src_dir, f"{name}.parquet"))
        for name in ALL_TABLES
        # key sources (orders/customer/... maxima) are always needed
        # for pads even when the table itself is not replicated
    }
    pads = {
        "order": _pad(pc.max(tables["orders"]["o_orderkey"]).as_py()),
        "cust": _pad(pc.max(tables["customer"]["c_custkey"]).as_py()),
        "supp": _pad(pc.max(tables["supplier"]["s_suppkey"]).as_py()),
        "part": _pad(pc.max(tables["part"]["p_partkey"]).as_py()),
        "doc": _pad(pc.max(tables["documents"]["doc_id"]).as_py()),
        "vec": _pad(pc.max(tables["embeddings"]["vec_id"]).as_py()),
        "event": _pad(pc.max(tables["events"]["event_id"]).as_py()),
        "user": _pad(pc.max(tables["events"]["user_id"]).as_py()),
    }

    # Fixed-size dims: copied through once, unchanged.
    for name in ("region", "nation"):
        if name in repl:
            pq.write_table(
                tables[name], os.path.join(out_dir, f"{name}.parquet")
            )

    def copy_of(name: str, i: int) -> pa.Table:
        t = tables[name]
        if name == "customer":
            return _offset(t, "c_custkey", i * pads["cust"])
        if name == "supplier":
            return _offset(t, "s_suppkey", i * pads["supp"])
        if name == "part":
            return _offset(t, "p_partkey", i * pads["part"])
        if name == "orders":
            t = _offset(t, "o_orderkey", i * pads["order"])
            return _offset(t, "o_custkey", i * pads["cust"])
        if name == "lineitem":
            t = _offset(t, "l_orderkey", i * pads["order"])
            t = _offset(t, "l_partkey", i * pads["part"])
            return _offset(t, "l_suppkey", i * pads["supp"])
        if name == "events":
            t = _offset(t, "event_id", i * pads["event"])
            return _offset(t, "user_id", i * pads["user"])
        if name == "documents":
            t = _offset(t, "doc_id", i * pads["doc"])
            if i:
                j = t.schema.get_field_index("text")
                tok = f"z{i}q"
                out = []
                for v in t.column("text").to_pylist():
                    w = v.split(" ")
                    out.append(
                        " ".join(
                            x
                            for k in range(0, len(w), 7)
                            for x in (w[k : k + 7] + [tok])
                        )
                    )
                t = t.set_column(j, "text", pa.array(out, type=pa.string()))
                # Keep the derived column consistent with the new text.
                jn = t.schema.get_field_index("n_chars")
                t = t.set_column(
                    jn, "n_chars", pc.utf8_length(t.column("text")).cast(pa.int64())
                )
            return t
        if name == "embeddings":
            t = _offset(t, "vec_id", i * pads["vec"])
            if i:
                import numpy as np

                j = t.schema.get_field_index("embedding")
                emb = t.column("embedding").combine_chunks()
                flat = emb.values.to_numpy(zero_copy_only=False).copy()
                rng = np.random.default_rng(1000 + i)
                flat += rng.normal(0.0, 0.2, size=flat.shape).astype("float32")
                new = pa.ListArray.from_arrays(
                    emb.offsets, pa.array(flat, type=pa.float32())
                )
                t = t.set_column(j, "embedding", new)
            return t
        raise ValueError(name)

    for name in (
        "customer supplier part orders lineitem events documents embeddings"
    ).split():
        if name not in repl:
            continue
        # Stream copies through one writer instead of concatenating all
        # K tables in memory first — at K=100 the concat form held ~60M
        # lineitem rows resident and got OOM-killed when run alongside
        # anything else. Output rows/values are identical; only row-group
        # boundaries differ (one group per copy chunk, ~source-sized).
        path = os.path.join(out_dir, f"{name}.parquet")
        n_rows = 0
        writer = None
        try:
            for i in range(copies):
                t = copy_of(name, i)
                if writer is None:
                    writer = pq.ParquetWriter(path, t.schema)
                writer.write_table(t, row_group_size=1 << 20)
                n_rows += t.num_rows
        finally:
            if writer is not None:
                writer.close()
        print(f"{name}: {n_rows} rows", file=sys.stderr)


_USAGE = (
    "usage: make_scale_data.py [SRC_DIR] [OUT_DIR] [COPIES] "
    "[--only t1,t2] [--link-rest DIR]\n"
    "NOTE: --only + --link-rest mixes key spaces — replicated tables "
    "get pad offsets derived from SRC_DIR maxima while linked tables "
    "keep another scale's keys, so cross-table joins between a "
    "replicated and a linked table will NOT align. Safe only when the "
    "measured queries read the replicated tables alone (the "
    "embeddings-only ANN-decade recipe)."
)


if __name__ == "__main__":
    only = None
    link_rest = None
    args = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        if argv[i] in ("--only", "--link-rest"):
            if i + 1 >= len(argv):
                raise SystemExit(f"{argv[i]} needs a value\n{_USAGE}")
            if argv[i] == "--only":
                only = argv[i + 1].split(",")
            else:
                link_rest = argv[i + 1]
            i += 2
        elif argv[i] in ("-h", "--help"):
            raise SystemExit(_USAGE)
        else:
            args.append(argv[i])
            i += 1
    if only and link_rest:
        print(
            "WARNING: --only + --link-rest breaks cross-table key "
            "alignment between replicated and linked tables (see "
            "--help); fine for single-table workloads only",
            file=sys.stderr,
        )
    src = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    out = args[1] if len(args) > 1 else "/tmp/sf1x"
    k = int(args[2]) if len(args) > 2 else 10
    replicate(src, out, k, only=only, link_rest_from=link_rest)

"""Generate an sf1 documents table (10× sf0.1) for the scaling ladder.

The driver ships sf0.001/0.01/0.1 only (TESTDATA.md); the 100 TB claims
in PERF.md extrapolated from the single 10× step sf0.01→sf0.1. This
tool adds a second decade: 50,000 documents whose statistical shape is
fitted to the driver's sf0.1 table, so the data-bound family
(q205/q220/q221/q152/q234) can be measured across TWO decades and the
"sub-linear explode pipelines" claim becomes an observed trend.

Fidelity (measured against /root/testdata/sf0.1/documents.parquet):
  - word frequencies: empirical unigram distribution (31-word vocab)
  - doc length: resampled from the empirical word-length distribution
  - lang: empirical marginal (en ~41%, de/es/fr/zh ~15% each)
  - source: src{doc_id % 20} (exact sf0.1 rule, 20 uniform sources)
  - near-dup structure: sf0.1 has 256 pairs at 3-gram Jaccard ≥ 0.8
    and 8 exact-dup pairs per 5,000 docs, partners uniform over the id
    space (measured median id distance ≈ corpus/4). Planted here at the
    same per-capita rate: ~5.1% of docs are a copy of a uniformly
    random earlier doc with 1-2 word substitutions (3-gram J ≈
    0.85-0.97 at the empirical lengths), ~0.16% are exact copies.
  Deliberately NOT modeled: any higher-order structure the driver's
  generator may have (per-lang length skew, source-lang correlation) —
  the scaling measurement cares about token volume and dup-pair volume,
  both matched per-capita.

Deterministic: numpy PCG64(seed=42). Output is NOT committed — it is
regenerated into --out (default /tmp/sf1_testdata) in ~20 s; PERF.md
records the measurements.
"""

from __future__ import annotations

import argparse
import collections
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1/documents.parquet"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sf1_testdata")
    ap.add_argument("--rows", type=int, default=50_000)
    args = ap.parse_args()

    ref = pq.read_table(SRC, columns=["text", "lang"])
    texts = ref.column("text").to_pylist()
    langs_ref = ref.column("lang").to_pylist()

    word_counts: collections.Counter[str] = collections.Counter()
    lengths: list[int] = []
    for txt in texts:
        ws = txt.split(" ")
        word_counts.update(ws)
        lengths.append(len(ws))
    vocab = sorted(word_counts)
    wfreq = np.array([word_counts[w] for w in vocab], dtype=np.float64)
    wfreq /= wfreq.sum()
    lang_counts = collections.Counter(langs_ref)
    lang_vals = sorted(lang_counts)
    lang_p = np.array([lang_counts[v] for v in lang_vals], dtype=np.float64)
    lang_p /= lang_p.sum()
    lengths_arr = np.array(lengths, dtype=np.int64)

    rng = np.random.default_rng(42)
    n = args.rows
    # per-capita rates measured at sf0.1 (256 near-dup pairs, 8 exact
    # pairs per 5,000 docs -> ~5.12% copies, ~0.16% exact copies)
    p_near, p_exact = 256 / 5000, 8 / 5000

    docs: list[list[str]] = []
    out_texts: list[str] = []
    vocab_arr = np.array(vocab)
    kind = rng.random(n)
    src_idx = rng.integers(0, np.arange(1, n + 1))  # uniform earlier doc
    doc_lengths = rng.choice(lengths_arr, size=n, replace=True)
    for i in range(n):
        if i > 0 and kind[i] < p_exact:
            ws = list(docs[src_idx[i] % i])
        elif i > 0 and kind[i] < p_exact + p_near:
            ws = list(docs[src_idx[i] % i])
            for _ in range(int(rng.integers(1, 3))):
                ws[int(rng.integers(0, len(ws)))] = str(
                    vocab_arr[int(rng.integers(0, len(vocab_arr)))]
                )
        else:
            ws = list(rng.choice(vocab_arr, size=int(doc_lengths[i]), p=wfreq))
        docs.append(ws)
        out_texts.append(" ".join(ws))

    lang_out = rng.choice(np.array(lang_vals), size=n, p=lang_p)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array(out_texts, type=pa.string()),
            "lang": pa.array(lang_out.tolist(), type=pa.string()),
            "source": pa.array([f"src{i % 20}" for i in range(n)], type=pa.string()),
            "n_chars": pa.array([len(t) for t in out_texts], type=pa.int64()),
        }
    )
    os.makedirs(args.out, exist_ok=True)
    pq.write_table(tbl, os.path.join(args.out, "documents.parquet"))
    print(
        f"wrote {n} docs to {args.out}/documents.parquet "
        f"(vocab={len(vocab)}, mean_len={np.mean([len(d) for d in docs]):.1f})"
    )
    gen_embeddings(args.out, rows=args.rows // 5 * 2)


def gen_embeddings(out: str, rows: int = 20_000) -> None:
    """sf1 embeddings (10× sf0.1's 2,000 rows at the same 2/5 ratio to
    documents): per-label diagonal-gaussian fit to the driver's sf0.1
    table (label marginals, per-label component means/stds), so the IVF
    coarse quantizer sees the same cluster structure at 10× the rows —
    the second decade for the ANN serve/ingest ladder (round-7 verdict
    directive #7). Distribution fidelity beyond first/second moments is
    deliberately not modeled: serving cost is rows×dim-bound and
    cell-balance-bound, both matched. Deterministic (PCG64 seed 43)."""
    ref = pq.read_table("/root/testdata/sf0.1/embeddings.parquet")
    emb = np.array(ref.column("embedding").to_pylist(), dtype=np.float64)
    labels = np.array(ref.column("label").to_pylist())
    rng = np.random.default_rng(43)
    uniq, counts = np.unique(labels, return_counts=True)
    lab_out = rng.choice(uniq, size=rows, p=counts / counts.sum())
    vecs = np.empty((rows, emb.shape[1]), dtype=np.float64)
    for u in uniq:
        mask = lab_out == u
        ref_u = emb[labels == u]
        vecs[mask] = rng.normal(
            ref_u.mean(axis=0), ref_u.std(axis=0), size=(int(mask.sum()), emb.shape[1])
        )
    tbl = pa.table(
        {
            "vec_id": pa.array(range(rows), type=pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32).tolist() for v in vecs],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(lab_out.astype(np.int32).tolist(), type=pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(out, "embeddings.parquet"))
    print(f"wrote {rows} embeddings to {out}/embeddings.parquet (dim {emb.shape[1]})")


if __name__ == "__main__":
    main()

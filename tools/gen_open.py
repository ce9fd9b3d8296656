"""Open-vocabulary (Heaps-law) corpora: same shape as gen_sf1 but each
fresh doc draws ~30% of its tokens from a per-doc unique tail vocabulary,
so the 3-gram space grows with the corpus (like real text) instead of
being capped by the driver's closed 31-word vocab."""
import collections, os, sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1/documents.parquet"

def gen(n, out):
    ref = pq.read_table(SRC, columns=["text"])
    lengths = [len(t.split(" ")) for t in ref.column("text").to_pylist()]
    wc = collections.Counter(w for t in ref.column("text").to_pylist() for w in t.split(" "))
    vocab = np.array(sorted(wc)); p = np.array([wc[w] for w in vocab], float); p /= p.sum()
    rng = np.random.default_rng(42)
    p_near, p_exact = 256/5000, 8/5000
    docs, texts = [], []
    kind = rng.random(n)
    src_idx = rng.integers(0, np.arange(1, n+1))
    dl = rng.choice(np.array(lengths), size=n)
    for i in range(n):
        if i and kind[i] < p_exact:
            ws = list(docs[src_idx[i] % i])
        elif i and kind[i] < p_exact + p_near:
            ws = list(docs[src_idx[i] % i])
            for _ in range(int(rng.integers(1, 3))):
                ws[int(rng.integers(0, len(ws)))] = f"u{i}x{int(rng.integers(0,99))}"
        else:
            L = int(dl[i])
            ws = list(rng.choice(vocab, size=L, p=p))
            # ~30% of positions replaced by doc-unique tokens (Heaps tail)
            for j in rng.choice(L, size=max(L//3,1), replace=False):
                ws[int(j)] = f"u{i}x{int(rng.integers(0,40))}"
        docs.append(ws); texts.append(" ".join(ws))
    tbl = pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": pa.array(texts), 
        "lang": pa.array(["en"]*n),
        "source": pa.array([f"src{i%20}" for i in range(n)]),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    })
    os.makedirs(out, exist_ok=True)
    pq.write_table(tbl, os.path.join(out, "documents.parquet"))
    print("wrote", n, "->", out)

gen(5000, "/tmp/open_5k")
gen(50000, "/tmp/open_50k")

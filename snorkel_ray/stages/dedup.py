"""Deduplication operators for large-scale training-data pipelines.

Not present in the reference (SURVEY.md D5 notes their absence) —
first-class here per the build brief: exact, MinHash+LSH, SimHash,
n-gram Jaccard verification, embedding-cosine near-dup.

Scale notes baked into every op:
- hashing/sketching is vectorized per batch (numpy over Arrow);
- the only all-to-all is a groupby on a *short* hash/band key, always
  after a per-batch combiner where semantics allow;
- candidate pairs from LSH are verified (Jaccard) before linking, and
  cluster merge reuses `canonicalize.connected_components` (pure Ray
  Data label propagation, no driver union-find).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

_WORD_RE = re.compile(r"\w+", re.UNICODE)

# ---------------------------------------------------------------------------
# Exact dedup (hash-partition + per-group first; SURVEY.md D1)
# ---------------------------------------------------------------------------


def add_content_hash(ds, column: str, out: str = "content_hash"):
    """128-bit content hash column (full blake2b-16, stable across
    runs/processes unlike Python hash()).  128 bits because at the
    design-target 10^12 documents a 64-bit key expects ~10^4 birthday
    collisions, each silently dropping a distinct document (round-1
    ADVICE); 128 bits puts the expectation at ~10^-14."""

    def _hash(batch: pa.Table) -> pa.Table:
        vals = batch.column(column).to_pylist()
        hs = [hashlib.blake2b(v.encode() if isinstance(v, str) else bytes(v),
                              digest_size=16).hexdigest()
              for v in vals]
        return batch.append_column(out, pa.array(hs, pa.string()))

    return ds.map_batches(_hash, batch_format="pyarrow")


def exact_dedup(ds, column: str, *, keep_key: str | None = None):
    """Keep one row per distinct ``column`` value.  Hash-partition on
    the content hash, per-group first — deterministic when ``keep_key``
    names a tie-break column (min wins), else arbitrary-but-stable
    within a run."""
    hashed = add_content_hash(ds, column)

    def _first(g: pd.DataFrame) -> pd.DataFrame:
        if keep_key is not None:
            g = g.sort_values(keep_key, kind="stable")
        return g.head(1)

    return (
        hashed.groupby("content_hash")
        .map_groups(_first, batch_format="pandas")
        .drop_columns(["content_hash"])
    )


# ---------------------------------------------------------------------------
# Shingles + MinHash + LSH banding (SURVEY.md brief: shingle→minhash→
# band→bucket groupby)
# ---------------------------------------------------------------------------


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """k-word shingles → uint64 hashes (blake2b-8 per shingle)."""
    words = _WORD_RE.findall(text.lower())
    if len(words) < k:
        shingles = [" ".join(words)] if words else [""]
    else:
        shingles = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        out[i] = int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")
    return out


class _MinHashParams:
    """Seeded multiply-shift universal-hash family over uint64 (the
    wraparound mod 2^64 is the hash; fully vectorized, no Python loop)."""

    def __init__(self, num_perm: int, seed: int):
        rng = np.random.default_rng(seed)
        self.a = (rng.integers(0, 1 << 63, num_perm, dtype=np.uint64) << np.uint64(1)) \
            | np.uint64(1)  # odd multipliers
        self.b = rng.integers(0, 1 << 63, num_perm, dtype=np.uint64)

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        if shingles.size == 0:
            return np.full(len(self.a), np.iinfo(np.uint64).max, dtype=np.uint64)
        with np.errstate(over="ignore"):
            prods = shingles[None, :] * self.a[:, None] + self.b[:, None]  # (K, n) wraps
        return prods.min(axis=1)


def minhash_signatures(ds, column: str, id_column: str, *, num_perm: int = 64,
                       shingle_k: int = 3, seed: int = 17):
    """→ Dataset (id, sig list<uint64>). Vectorized per batch."""
    params = _MinHashParams(num_perm, seed)

    def _sig(batch: pa.Table) -> pa.Table:
        texts = batch.column(column).to_pylist()
        ids = batch.column(id_column)
        sigs = np.stack([params.signature(_shingle_hashes(t, shingle_k)) for t in texts]) \
            if texts else np.zeros((0, num_perm), np.uint64)
        offsets = pa.array(np.arange(0, (len(texts) + 1) * num_perm, num_perm,
                                     dtype=np.int32))
        col = pa.ListArray.from_arrays(offsets, pa.array(sigs.reshape(-1), pa.uint64()))
        return pa.table({id_column: ids, "sig": col})

    return ds.map_batches(_sig, batch_format="pyarrow")


def lsh_bucket_pairs(sigs, id_column: str, *, bands: int = 16,
                     dedup: bool = True):
    """signatures → candidate duplicate pairs via band-bucket groupby.

    Explode each row to (band_id, band_hash, id); groupby the bucket
    key; emit pairs (anchor = min id per bucket) so a bucket of m docs
    yields m-1 edges, not m², keeping hot buckets linear."""

    def _bands(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_pylist()
        sig_list = batch.column("sig").to_pylist()
        b_id, b_hash, b_doc = [], [], []
        for i, sig in enumerate(sig_list):
            r = len(sig) // bands
            for b in range(bands):
                h = hashlib.blake2b(np.asarray(sig[b * r : (b + 1) * r],
                                               dtype=np.uint64).tobytes(),
                                    digest_size=8).hexdigest()
                b_id.append(b)
                b_hash.append(h)
                b_doc.append(ids[i])
        return pa.table({"band": pa.array(b_id, pa.int32()),
                         "bucket": pa.array(b_hash, pa.string()),
                         "doc": pa.array(b_doc)})

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": []}).astype(g["doc"].dtype)
        docs = sorted(g["doc"].unique())
        if len(docs) < 2:
            return pd.DataFrame({"a": [], "b": []}).astype(g["doc"].dtype)
        anchor = docs[0]
        return pd.DataFrame({"a": [anchor] * (len(docs) - 1), "b": docs[1:]})

    exploded = sigs.map_batches(_bands, batch_format="pyarrow")
    pairs = exploded.groupby(["band", "bucket"]).map_groups(_pairs, batch_format="pandas")
    if not dedup:
        # caller collects the (small) pair set and dedups driver-side —
        # skips a second all-to-all on a table of candidate pairs
        return pairs
    return pairs.groupby(["a", "b"]).map_groups(lambda g: g.head(1), batch_format="pandas")


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    """Exact n-gram Jaccard similarity (the LSH verification step)."""
    sa = set(map(int, _shingle_hashes(a, k)))
    sb = set(map(int, _shingle_hashes(b, k)))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(len(sa | sb), 1)


def minhash_dedup(ds, column: str, id_column: str, *, num_perm: int = 64,
                  shingle_k: int = 3, bands: int = 16, threshold: float = 0.8,
                  seed: int = 17):
    """Full near-dup pipeline → Dataset (id, cluster) for ALL input ids
    (singletons map to themselves).  Verification joins pair texts via
    a broadcast of the candidate pairs' texts — the pair set after LSH
    is tiny relative to the corpus, so the texts are fetched with a
    semi-join-by-broadcast of the candidate id set."""
    import ray

    sigs = minhash_signatures(ds, column, id_column, num_perm=num_perm,
                              shingle_k=shingle_k, seed=seed)
    pairs_ds = lsh_bucket_pairs(sigs, id_column, bands=bands, dedup=False)
    # candidate PAIRS only — small by design; dedup driver-side
    pairs = pairs_ds.to_pandas().drop_duplicates(["a", "b"]).reset_index(drop=True)
    if len(pairs):
        need = set(pairs["a"]) | set(pairs["b"])
        need_ref = ray.put(need)

        def _texts(batch: pa.Table) -> pa.Table:
            ids = batch.column(id_column).to_pylist()
            keep = [i for i, v in enumerate(ids) if v in ray.get(need_ref)]
            t = batch.take(pa.array(keep, pa.int64()))
            return pa.table({id_column: t.column(id_column), "text": t.column(column)})

        texts = dict(zip(*(lambda d: (d[id_column], d["text"]))(
            ds.map_batches(_texts, batch_format="pyarrow").to_pandas().to_dict("list"))))
        keep_mask = [
            ngram_jaccard(texts[a], texts[b], shingle_k) >= threshold
            for a, b in zip(pairs["a"], pairs["b"])
        ]
        pairs = pairs[np.asarray(keep_mask, bool)] if len(keep_mask) else pairs

    from .canonicalize import connected_components
    import ray.data as rd

    ids_only = ds.select_columns([id_column])
    if len(pairs) == 0:
        return ids_only.map_batches(
            lambda b: pa.table({id_column: b.column(id_column),
                                "cluster": b.column(id_column)}),
            batch_format="pyarrow")

    edges = rd.from_pandas(pairs.rename(columns={"a": "src", "b": "dst"}).astype(str))
    comp = connected_components(edges).to_pandas()
    label_ref = ray.put(dict(zip(comp["node"], comp["label"])))

    def _assign(batch: pa.Table) -> pa.Table:
        lbl = ray.get(label_ref)
        ids = batch.column(id_column).to_pylist()
        clusters = [lbl.get(str(v), str(v)) for v in ids]
        return pa.table({id_column: batch.column(id_column),
                         "cluster": pa.array(clusters, pa.string())})

    return ids_only.map_batches(_assign, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit SimHash over word features (deterministic)."""
    acc = np.zeros(64, dtype=np.int64)
    for w in _WORD_RE.findall(text.lower()):
        h = np.uint64(int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(),
                                     "big"))
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits == np.uint64(1), 1, -1)
    return int("".join("1" if v > 0 else "0" for v in acc[::-1]), 2)


def add_simhash(ds, column: str, out: str = "simhash"):
    def _sh(batch: pa.Table) -> pa.Table:
        vals = [simhash64(t) for t in batch.column(column).to_pylist()]
        return batch.append_column(out, pa.array(np.asarray(vals, np.uint64), pa.uint64()))

    return ds.map_batches(_sh, batch_format="pyarrow")


def simhash_near_dup_pairs(ds, column: str, id_column: str, *, max_hamming: int = 3,
                           blocks: int = 4):
    """Near-dup candidate pairs by SimHash block-banding: split the 64
    bits into ``blocks`` bands; two docs within ``max_hamming`` bits
    share at least one exact band (pigeonhole when blocks > max_hamming)
    → groupby band value, verify Hamming distance within buckets."""
    hashed = add_simhash(ds, column)
    width = 64 // blocks

    def _bands(batch: pa.Table) -> pa.Table:
        hs = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch.column(id_column).to_pylist()
        b_id, b_val, b_doc, b_full = [], [], [], []
        for i, h in enumerate(hs):
            for b in range(blocks):
                b_id.append(b)
                b_val.append(int((int(h) >> (b * width)) & ((1 << width) - 1)))
                b_doc.append(ids[i])
                b_full.append(int(h))
        return pa.table({"band": pa.array(b_id, pa.int32()),
                         "value": pa.array(b_val, pa.uint64()),
                         "doc": pa.array(b_doc),
                         "full": pa.array(b_full, pa.uint64())})

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc").sort_values("doc")
        rows = {"a": [], "b": [], "hamming": []}
        docs = g["doc"].tolist()
        fulls = g["full"].tolist()
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                d = bin(int(fulls[i]) ^ int(fulls[j])).count("1")
                if d <= max_hamming:
                    rows["a"].append(docs[i])
                    rows["b"].append(docs[j])
                    rows["hamming"].append(d)
        return pd.DataFrame(rows)

    exploded = hashed.map_batches(_bands, batch_format="pyarrow")
    pairs = exploded.groupby(["band", "value"]).map_groups(_pairs, batch_format="pandas")
    return pairs.groupby(["a", "b"]).map_groups(lambda g: g.head(1), batch_format="pandas")


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_near_dup_pairs(ds, vec_column: str, id_column: str, *,
                             threshold: float = 0.95, lsh_bits: int = 12, seed: int = 5):
    """Random-hyperplane LSH bucket groupby, then exact cosine within
    buckets.  The scale path: no O(n²) matmul; bucket width is tunable
    via ``lsh_bits``."""
    first = ds.take(1)
    dim = len(first[0][vec_column])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, lsh_bits)).astype(np.float32)

    def _bucket(batch: pa.Table) -> pa.Table:
        vecs = np.asarray(batch.column(vec_column).to_pylist(), dtype=np.float32)
        proj = (vecs @ planes) > 0
        codes = (proj.astype(np.uint64) << np.arange(lsh_bits, dtype=np.uint64)).sum(axis=1)
        return pa.table({id_column: batch.column(id_column),
                         "bucket": pa.array(codes, pa.uint64()),
                         "vec": batch.column(vec_column)})

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = {"a": [], "b": [], "cosine": []}
        if len(g) >= 2:
            g = g.sort_values(id_column)
            V = np.stack(g["vec"].to_numpy())
            V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            S = V @ V.T
            ids = g[id_column].tolist()
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    if S[i, j] >= threshold:
                        rows["a"].append(ids[i])
                        rows["b"].append(ids[j])
                        rows["cosine"].append(float(S[i, j]))
        return pd.DataFrame(rows)

    bucketed = ds.map_batches(_bucket, batch_format="pyarrow")
    return bucketed.groupby("bucket").map_groups(_pairs, batch_format="pandas")

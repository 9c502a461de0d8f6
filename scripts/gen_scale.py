#!/usr/bin/env python3
"""Synthesize a scaled-up copy of the driver's synthetic corpus for
scaling-curve measurements (SCALE.md) — driver-side tooling, never
shipped in the library.

Mimics the measured shape of /root/testdata/sf0.1 (see SCALE.md for
the calibration numbers):
  documents  : 31-word near-uniform vocabulary ('dup' rare at ~0.09%),
               10..100 tokens/doc uniform, 5 langs at the observed
               skew (en 2x), 20 sources round-robin, ~0.16% planted
               exact duplicates + ~2% near-duplicates (copy an
               earlier doc, edit 1-3 tokens) so candidate-pair
               density per doc tracks the original corpus.
  embeddings : unit-normalized random 64-dim float vectors (the
               original's labels carry no geometry: measured
               intra-label cosine == inter-label == ~0), labels 0..9.
  events     : timestamps sorted over a 30-day window, users scaled
               10x, 5 event types uniform, exponential value
               (mean ~50, 2dp), props {"k": 0..99}.

Usage: gen_scale.py OUTDIR SCALE [VOCAB]  (SCALE=10 -> sf1-equivalent)
TPC-H tables are not generated; copy them from sf0.1 if a measured
query needs them (the expensive gates touch only these three).

VOCAB selects the token distribution for documents:
  uniform (default) — the driver-corpus mimic above (31 words,
    near-uniform): the shape every per-round bench already runs.
  zipf — a REALISTIC heavy-tail distribution: 10,000-word vocabulary
    with P(rank r) ∝ 1/r^1.07 (the measured English exponent,
    Zipf's law) — the regime the uniform corpus can't probe, where a
    handful of stop-word-like tokens dominate token mass and
    mass-produce hub shingles/fingerprints. The dedup/text gates'
    df caps (MaxShingleDf, WinnowPairCap) are the levers that must
    bound pair volume Σ df² under this regime; SCALE.md's zipf table
    records whether they did. Same dup-planting machinery as
    uniform, so candidate-pair density stays comparable.
"""
import json
import os
import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ["spark", "window", "merge", "table", "column", "vector",
         "stream", "value", "data", "small", "join", "filter", "big",
         "group", "hash", "customer", "sort", "order", "slow", "line",
         "part", "fast", "row", "the", "agg", "key", "query", "a",
         "scan", "batch"]
LANGS = ["en", "en", "zh", "es", "fr", "de"]  # en 2x as measured

ZIPF_VOCAB_SIZE = 10000
ZIPF_EXPONENT = 1.07  # the measured English-corpus exponent


class ZipfDraw:
    """Heavy-tail token sampler: P(rank r) ∝ 1/r^s over a synthetic
    vocabulary of ZIPF_VOCAB_SIZE words. Word LENGTHS follow the
    natural pattern (frequent words short): rank r maps to a word of
    2 + ~log growth characters, so char-level shingles/k-grams see
    realistic span statistics, not 10k same-length tokens."""

    def __init__(self, seed):
        w = 1.0 / np.power(np.arange(1, ZIPF_VOCAB_SIZE + 1),
                           ZIPF_EXPONENT)
        self.p = w / w.sum()
        self.rng = np.random.default_rng(seed)
        self.words = []
        alphabet = "abcdefghijklmnopqrstuvwxyz"
        for r in range(ZIPF_VOCAB_SIZE):
            # injective: rank in base 26, zero('a')-padded to the
            # log-graded length (r < e^(length-1) << 26^length)
            length = 2 + int(np.log1p(r))
            chars, x = [], r
            for _ in range(length):
                chars.append(alphabet[x % 26])
                x //= 26
            self.words.append("".join(reversed(chars)))

    def draw(self, n):
        return [self.words[i]
                for i in self.rng.choice(ZIPF_VOCAB_SIZE, size=n, p=self.p)]


def gen_documents(out, n, rng, vocab="uniform"):
    zipf = ZipfDraw(rng.randrange(2**63)) if vocab == "zipf" else None
    texts = []
    rows = []
    for i in range(n):
        r = rng.random()
        if i > 100 and r < 0.0016:                   # exact dup
            text = texts[rng.randrange(len(texts))]
        elif i > 100 and r < 0.02 + 0.0016:          # near dup
            toks = texts[rng.randrange(len(texts))].split()
            for _ in range(rng.randint(1, 3)):
                toks[rng.randrange(len(toks))] = (
                    zipf.draw(1)[0] if zipf else rng.choice(VOCAB))
            text = " ".join(toks)
        else:
            ntok = rng.randint(10, 100)
            if zipf:
                toks = zipf.draw(ntok)
            else:
                toks = [("dup" if rng.random() < 0.0009
                         else rng.choice(VOCAB)) for _ in range(ntok)]
            text = " ".join(toks)
        texts.append(text)
        rows.append((i, text, rng.choice(LANGS), f"src{i % 20}", len(text)))
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array([r[3] for r in rows], pa.string()),
        "n_chars": pa.array([r[4] for r in rows], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(out, "documents.parquet"))


def gen_embeddings(out, n, rng):
    np_rng = np.random.default_rng(rng.randrange(2**63))
    v = np_rng.standard_normal((n, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([row.tolist() for row in v],
                              pa.list_(pa.float32())),
        "label": pa.array([rng.randrange(10) for _ in range(n)], pa.int32()),
    })
    pq.write_table(tbl, os.path.join(out, "embeddings.parquet"))


def gen_events(out, n, users, rng):
    start = 1704067200000000  # 2024-01-01 UTC, microseconds
    span = 30 * 24 * 3600 * 1000000
    gaps = [rng.expovariate(n / span) for _ in range(n)]
    scale = span / sum(gaps)
    ts, t = [], start
    for g in gaps:
        t += g * scale
        ts.append(int(t))
    types = ["view", "click", "purchase", "signup", "error"]
    tbl = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([rng.randrange(users) for _ in range(n)],
                            pa.int64()),
        "event_type": pa.array([rng.choice(types) for _ in range(n)],
                               pa.string()),
        "value": pa.array([round(rng.expovariate(1 / 50.0), 2)
                           for _ in range(n)], pa.float64()),
        "props": pa.array([json.dumps({"k": rng.randrange(100)})
                           for _ in range(n)], pa.string()),
    })
    pq.write_table(tbl, os.path.join(out, "events.parquet"))


def main():
    out, scale = sys.argv[1], float(sys.argv[2])
    vocab = sys.argv[3] if len(sys.argv) > 3 else "uniform"
    assert vocab in ("uniform", "zipf"), vocab
    os.makedirs(out, exist_ok=True)
    rng = random.Random(42)
    gen_documents(out, int(5000 * scale), rng, vocab)
    # embeddings grew 4x over the sf0.01->sf0.1 decade in the driver's
    # corpus; follow that curve rather than a flat 10x
    gen_embeddings(out, int(2000 * (4 if scale >= 10 else scale)), rng)
    gen_events(out, int(100000 * scale), int(1500 * scale), rng)
    print(f"wrote scale={scale} corpus to {out}")


if __name__ == "__main__":
    main()
